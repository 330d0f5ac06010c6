"""Diagnose the adaptive speculation gate's overhead at floor acceptance.

Round-5: `engine_8b_bench --real-ckpt` showed the adaptive row (gate
falls back to plain waves when measured acceptance < floor) running
SLOWER than pure pipelined spec (271 vs 350 tok/s) when it should
recover ~plain-wave throughput (446). This probe reproduces floor
acceptance cheaply — random weights make greedy token streams novel, so
2-gram prompt-lookup drafts miss — on a small model, and traces every
wave: kind (spec/plain), gate decision, prep+dispatch and fetch wall
times, and the acceptance EWMA. Prints a per-wave trace plus row
summaries for plain / pure spec / adaptive.

Usage: python scripts/spec_gate_probe.py [--layers 4] [--hidden 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_llm(layers: int, hidden: int, seed: int = 0):
    import jax
    import jax.numpy as jnp
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer

    cfg = LlamaConfig(num_layers=layers, hidden_size=hidden,
                      intermediate_size=hidden * 2, num_heads=hidden // 128,
                      num_kv_heads=max(hidden // 512, 1), vocab_size=32000,
                      max_seq_len=2048, use_flash=True)
    rng = np.random.default_rng(seed)

    def lin(d_in, d_out):
        return {"kernel": jnp.asarray(
            rng.standard_normal((d_in, d_out)).astype(np.float32) * 0.05,
            jnp.bfloat16)}

    h, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    kvh = cfg.num_kv_heads * cfg.head_dim
    params = {"token_embedding": jnp.asarray(
        rng.standard_normal((v, h)).astype(np.float32) * 0.05, jnp.bfloat16),
        "lm_head": jnp.asarray(
            rng.standard_normal((h, v)).astype(np.float32) * 0.05,
            jnp.bfloat16),
        "final_norm": {"scale": np.ones(h, np.float32)}}
    for i in range(layers):
        params[f"layer_{i}"] = {
            "attention": {"q_proj": lin(h, h), "k_proj": lin(h, kvh),
                          "v_proj": lin(h, kvh), "o_proj": lin(h, h)},
            "input_norm": {"scale": np.ones(h, np.float32)},
            "post_attn_norm": {"scale": np.ones(h, np.float32)},
            "mlp": {"gate_proj": lin(h, inter), "up_proj": lin(h, inter),
                    "down_proj": lin(inter, h)}}
    dev = jax.device_put(params)
    jax.tree_util.tree_leaves(dev)[0].block_until_ready()
    return LocalLLM(cfg, SimpleTokenizer(cfg.vocab_size), params=dev)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--seqs", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--draft", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from ragmeup_tpu.utils.platform import ensure_platform
    print(f"backend: {ensure_platform(args.platform)}", file=sys.stderr)

    from ragmeup_tpu.pipeline.serving import ServingEngine

    llm = build_llm(args.layers, args.hidden)
    it, dr = args.iters, args.draft

    def fresh(new_tok, **ekw):
        ekw.setdefault("spec_accept_floor", 0.0)
        e = ServingEngine(llm, num_pages=64, page_size=128,
                          max_pages_per_seq=6, max_batch=args.seqs, **ekw)
        erng = np.random.default_rng(0)
        for i in range(args.seqs):
            p = list(erng.integers(5, 31000, 150 + 17 * i))
            e.add_request(i, p, max_new_tokens=new_tok, temperature=0.0,
                          repetition_penalty=1.0)
        return e

    # compile passes
    fresh(8).run_wave(steps_per_dispatch=it)
    fresh(8).run_spec(iters=it, draft=dr, pipeline=False)

    rows = []
    for name, run, ekw, trace in (
            ("plain waves", lambda e: e.run_wave(steps_per_dispatch=it),
             {}, False),
            ("spec pure", lambda e: e.run_spec(iters=it, draft=dr,
                                               pipeline=True), {}, False),
            ("spec adaptive", lambda e: e.run_spec(iters=it, draft=dr,
                                                   pipeline=True),
             {"spec_accept_floor": 1.35, "spec_reprobe_every": 16}, True)):
        eng = fresh(args.new_tokens, **ekw)
        eng.wave_timings = []
        gate_log = []
        if trace:
            orig_gate = type(eng)._spec_gate
            orig_sd = type(eng)._spec_dispatch
            orig_wd = type(eng)._wave_dispatch

            def tg(self, _o=orig_gate):
                r = _o(self)
                gate_log.append(
                    ("gate", r, self._spec_mode, self._spec_accept,
                     self._spec_waves, self._spec_probe_left))
                return r

            def tsd(self, *a, _o=orig_sd, **k):
                t0 = time.perf_counter()
                r = _o(self, *a, **k)
                gate_log.append(("spec_dispatch",
                                 "drain" if r == "drain" else "ok",
                                 time.perf_counter() - t0))
                return r

            def twd(self, *a, _o=orig_wd, **k):
                t0 = time.perf_counter()
                r = _o(self, *a, **k)
                gate_log.append(("wave_dispatch",
                                 "drain" if r == "drain" else "ok",
                                 time.perf_counter() - t0))
                return r
            eng._spec_gate = tg.__get__(eng)
            eng._spec_dispatch = tsd.__get__(eng)
            eng._wave_dispatch = twd.__get__(eng)
        t0 = time.time()
        out = run(eng)
        dt = time.time() - t0
        ntok = sum(len(v) for v in out.values())
        rows.append((name, ntok, dt))
        print(f"{name:15s} {ntok:5d} tokens in {dt:6.2f}s -> "
              f"{ntok / dt:7.1f} tok/s")
        if trace:
            print("--- adaptive trace ---")
            for ev in gate_log:
                if ev[0] == "gate":
                    _, r, mode, acc, waves, pl = ev
                    print(f"  gate -> {'SPEC' if r else 'plain'} "
                          f"(mode={mode} acc={acc} waves={waves} "
                          f"probe_left={pl})")
                else:
                    print(f"  {ev[0]:14s} {ev[1]:6s} {ev[2] * 1e3:8.1f} ms")

    base = rows[0][2]
    for name, ntok, dt in rows:
        print(f"{name:15s} {dt / base:5.2f}x plain-wave time")


if __name__ == "__main__":
    main()
