"""Quantify the cross-kind parity contract (plain waves vs spec waves vs
adaptive demotion) and classify divergences: near-tie argmax flip at
cross-kernel noise scale vs structural bug.

Two geometries:
- tiny (2 layers, 512 hidden): logits differ by ~8e-7 between the chunk
  and s=1 forwards — parity holds across every seed tried.
- deep (4 layers, 1024 hidden, random 0.05-scaled weights, vocab 32k):
  near-uniform logits put argmax margins at ~1 bf16 ulp of the logit
  magnitude, so pure spec AND demotion flip rows routinely. The gap
  report shows every flip sits at an oracle margin of ~2e-2..1e-1
  against a logit range of ~13 (one bf16 ulp) — noise, not a bug.

See the parity-contract docstring in pipeline/serving.py
(_wave_spec_program) and BENCH_NOTES "Kind-switch parity".

Usage: RAGMEUP_PLATFORM=cpu python scripts/debug_demote_parity.py
           [--deep] [--seqs 8] [--new-tokens 128]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ragmeup_tpu.utils.platform import ensure_platform


def build_tiny(seed=3):
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    cfg = LlamaConfig.tiny(hidden_size=512, num_heads=4, num_kv_heads=2,
                           use_flash=False)
    return LocalLLM(cfg, SimpleTokenizer(cfg.vocab_size), seed=seed), 500


def build_deep():
    import importlib.util
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "sgp", os.path.join(here, "spec_gate_probe.py"))
    sgp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sgp)
    return sgp.build_llm(4, 1024), 31000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deep", action="store_true",
                    help="4L/1024h random model (reproduces the flips)")
    ap.add_argument("--seqs", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=128)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    ensure_platform(args.platform)

    from ragmeup_tpu.pipeline.serving import ServingEngine

    llm, vmax = build_deep() if args.deep else build_tiny()
    ps = 128 if args.deep else 16
    plen = (150, 17) if args.deep else (20, 3)

    def fresh(**ekw):
        ekw.setdefault("spec_accept_floor", 0.0)
        e = ServingEngine(llm, num_pages=128, page_size=ps,
                          max_pages_per_seq=8, max_batch=args.seqs, **ekw)
        rng = np.random.default_rng(0)
        pr = {}
        for i in range(args.seqs):
            p = list(rng.integers(5, vmax, plen[0] + plen[1] * i))
            pr[i] = p
            e.add_request(i, p, max_new_tokens=args.new_tokens,
                          temperature=0.0, repetition_penalty=1.0)
        return e, pr

    eng, prompts = fresh()
    ref = eng.run_wave(steps_per_dispatch=8)
    pure = fresh()[0].run_spec(iters=8, draft=8, pipeline=True)
    adp = fresh(spec_accept_floor=99.0, spec_reprobe_every=16)[0].run_spec(
        iters=8, draft=8, pipeline=True)

    for name, out in (("pure spec", pure), ("forced demotion", adp)):
        bad = [i for i in ref if ref[i] != out[i]]
        print(f"{name}: {'PARITY OK' if not bad else f'flipped rows {bad}'}")
        for i in bad:
            a, b = ref[i], out[i]
            k = next((j for j in range(min(len(a), len(b)))
                      if a[j] != b[j]), min(len(a), len(b)))
            lg = np.asarray(llm.forward_logits(prompts[i] + a[:k]),
                            np.float64)
            srt = np.sort(lg)
            ta = a[k] if k < len(a) else None
            tb = b[k] if k < len(b) else None
            gap = (abs(lg[ta] - lg[tb])
                   if ta is not None and tb is not None else float("nan"))
            print(f"  row {i}: step {k} toks {ta}/{tb} "
                  f"oracle-margin={gap:.3e} "
                  f"top1-top2={srt[-1] - srt[-2]:.3e} "
                  f"logit-range={srt[-1] - srt[0]:.2f}", flush=True)


if __name__ == "__main__":
    main()
