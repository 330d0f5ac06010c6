"""Bisect the bf16-scale K-write deviation between the s=1 decode path
and the s>1 chunk path (spec verify / chunked prefill).

Background (round 5): forcing an adaptive-gate demotion (spec -> plain
waves) broke byte-parity on one row. KV diffing showed the chunk/prefill
paths write K that deviates from an f64 oracle at bf16 scale, while the
single-step decode path matches the oracle exactly; logits (f32
accumulation) stay exact. This script runs the model EAGERLY on CPU for
the same token at the same position through both paths and prints the
first intermediate that differs: embedding -> input_norm -> k_proj ->
rope -> astype -> paged write.

Usage: RAGMEUP_PLATFORM=cpu python scripts/debug_kv_parity.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ragmeup_tpu.utils.platform import ensure_platform

ensure_platform("cpu")

import jax
import jax.numpy as jnp

import ragmeup_tpu.models.decoder as dec
from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
from ragmeup_tpu.models.tokenizer import SimpleTokenizer
from ragmeup_tpu.ops import paged_attention as pa


def main():
    # hd=128 (one-token-per-row layout — the chunk path requires it)
    cfg = LlamaConfig.tiny(hidden_size=512, num_heads=4, num_kv_heads=2,
                           use_flash=False)
    llm = LocalLLM(cfg, SimpleTokenizer(cfg.vocab_size), seed=3)
    params = llm.params
    model = llm.model
    hd, nkv = cfg.head_dim, cfg.num_kv_heads

    page_size, n_pages = 16, 8
    from ragmeup_tpu.ops.paged_attention import PagedKVCache
    cache = PagedKVCache(n_pages, page_size, nkv, hd, cfg.num_layers,
                         dtype=cfg.jdtype)

    t = 123           # the token both paths write at position p
    p = 5             # write position (prompt is tokens 0..4)
    prompt = [7, 11, 13, 17, 19]

    captures = {}

    def snap(tag, **arrs):
        captures.setdefault(tag, {}).update(
            {k: np.asarray(v, np.float64) for k, v in arrs.items()})

    # --- patch points ---------------------------------------------------
    orig_rope = dec.apply_rope
    state = {"path": None}

    def rope_spy(x, cos, sin):
        out = orig_rope(x, cos, sin)
        kind = "k" if x.shape[2] == nkv else "q"
        key = f"{state['path']}:{kind}"
        if key not in captures:
            snap(key, pre=x[0, 0 if state['path'] == 'decode' else 0],
                 cos=cos[0, 0] if cos.ndim == 3 else cos[0],
                 sin=sin[0, 0] if sin.ndim == 3 else sin[0],
                 post=out[0, 0])
        return out

    orig_tok = pa.paged_update_token
    orig_chk = pa.paged_update_chunk

    def tok_spy(pages, kv, pg, sl, hd_):
        key = f"{state['path']}:write"
        if key not in captures:
            snap(key, kv=kv[:, 0])   # (nkv, B, hd) -> first row
        return orig_tok(pages, kv, pg, sl, hd_)

    def chk_spy(pages, kv, pg, sl, hd_):
        key = f"{state['path']}:write"
        if key not in captures:
            snap(key, kv=kv[:, 0, 0])  # (nkv, b, s, hd) -> first token
        return orig_chk(pages, kv, pg, sl, hd_)

    dec.apply_rope = rope_spy
    pa_mod = sys.modules["ragmeup_tpu.ops.paged_attention"]
    pa_mod.paged_update_token = tok_spy
    pa_mod.paged_update_chunk = chk_spy

    with jax.disable_jit():
        # prefill prompt via the single-seq chunk path (writes pos 0..4)
        state["path"] = "prefill"
        ids = jnp.asarray([prompt], jnp.int32)
        pages = jnp.asarray([0] * len(prompt), jnp.int32)
        slots = jnp.arange(len(prompt), dtype=jnp.int32)
        page_idx = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
        out = model.apply(
            {"params": params}, ids, positions=jnp.arange(len(prompt))[None],
            paged_caches=list(zip(cache.k_pages, cache.v_pages)),
            paged_meta=(page_idx, jnp.asarray([len(prompt)]), pages, slots))
        kA = [k for k, _ in out["paged_caches"]]
        vA = [v for _, v in out["paged_caches"]]

        # --- path A: s=1 decode of token t at position p ---
        state["path"] = "decode"
        out_a = model.apply(
            {"params": params}, jnp.asarray([[t]], jnp.int32),
            positions=jnp.asarray([[p]], jnp.int32),
            paged_caches=list(zip(kA, vA)),
            paged_meta=(page_idx, jnp.asarray([p + 1]),
                        jnp.asarray([0], jnp.int32),
                        jnp.asarray([p], jnp.int32)))

        # --- path B: batched chunk [t, x, y, z] at positions p..p+3 ---
        state["path"] = "chunk"
        d = 4
        chunk = jnp.asarray([[t, 29, 31, 37]], jnp.int32)
        positions = (p + jnp.arange(d))[None]
        pg2 = jnp.asarray([[(p + i) // page_size for i in range(d)]],
                          jnp.int32)
        sl2 = jnp.asarray([[(p + i) % page_size for i in range(d)]],
                          jnp.int32)
        out_b = model.apply(
            {"params": params}, chunk, positions=positions,
            paged_caches=list(zip(kA, vA)),
            paged_meta=(page_idx, jnp.asarray([p + d]), pg2, sl2))

    # --- report ----------------------------------------------------------
    def cmp(tag, a, b):
        if a.shape != b.shape:
            print(f"{tag:28s} SHAPE {a.shape} vs {b.shape}")
            return
        d = np.abs(a - b)
        eq = "EXACT" if d.max() == 0 else f"max|d|={d.max():.3e}"
        print(f"{tag:28s} {eq}")

    for stage in ("k", "q"):
        A = captures.get(f"decode:{stage}", {})
        B = captures.get(f"chunk:{stage}", {})
        for field in ("pre", "cos", "sin", "post"):
            if field in A and field in B:
                cmp(f"{stage}.{field} decode vs chunk", A[field], B[field])
    cmp("write.kv decode vs chunk", captures["decode:write"]["kv"],
        captures["chunk:write"]["kv"])
    cmp("write.kv prefill[0] vs chunk? (different tokens, skip)",
        np.zeros(1), np.zeros(1))

    # logits comparison (first chunk token vs decode token)
    la = np.asarray(out_a["logits"][0, 0], np.float64)
    lb = np.asarray(out_b["logits"][0, 0], np.float64)
    cmp("logits decode vs chunk[0]", la, lb)


if __name__ == "__main__":
    main()
