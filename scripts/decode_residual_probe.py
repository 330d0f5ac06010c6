"""Attribute the 8B batch-1 decode residual: attention vs sampling.

Round-4 verdict #7: the gap between the measured int8+kernel decode
(~10.75 ms/token) and the matmul component-sum (~9.6 ms) is attributed
to "attention + sampling (~2.4 ms/step)" but was never decomposed. This
probe measures each increment IN-PROGRAM, the way the fused while_loop
pays for it: a lax.scan over T decode steps inside one jit, slope-timed
over two step counts so dispatch/fetch constants cancel.

Variants (each adds one block to the previous):
  skeleton   all per-step matmuls (q/k/v/o + gate/up/down x32 + lm_head),
             int8 XLA dequant-dot — the component-sum's world
  +attn      real GQA attention against a carried (2048-pos) KV cache,
             including the cache dynamic_update_slice at the step position
  +sample    the sampling epilogue on the logits: repetition penalty over
             a seen-mask, categorical + argmax + select, seen scatter

The difference between consecutive rows IS the block's in-program cost
per step. Reference comparison: the HF pipeline the reference serves
with (RAGHelper_local.py:61-89) steps host-side, so its per-step floor
includes a full dispatch round-trip; everything here is one program.

Usage: python scripts/decode_residual_probe.py [--t1 16] [--t2 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t1", type=int, default=16)
    ap.add_argument("--t2", type=int, default=64)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from ragmeup_tpu.utils.platform import ensure_platform
    print("backend:", ensure_platform(args.platform), file=sys.stderr)
    import jax
    import jax.numpy as jnp

    # Llama-3.1-8B geometry
    h, inter, v = 4096, 14336, 128256
    nq, nkv, hd = 32, 8, 128
    L, cache = args.layers, 2048
    rng = np.random.default_rng(0)

    def qw(d_in, d_out):
        return (jnp.asarray(rng.integers(-127, 127, (d_in, d_out)), jnp.int8),
                jnp.full((d_out,), 1e-3, jnp.float32))

    def mm(x, w):
        wq, ws = w
        return jnp.dot(x, wq.astype(jnp.bfloat16) * ws.astype(jnp.bfloat16),
                       preferred_element_type=jnp.bfloat16)

    layers = [{"q": qw(h, nq * hd), "k": qw(h, nkv * hd),
               "v": qw(h, nkv * hd), "o": qw(nq * hd, h),
               "g": qw(h, inter), "u": qw(h, inter), "d": qw(inter, h)}
              for _ in range(L)]
    lm_head = jnp.asarray(rng.integers(-127, 127, (h, v)), jnp.int8), \
        jnp.full((v,), 1e-3, jnp.float32)
    emb = jnp.asarray(rng.standard_normal((256, h)) * 0.02, jnp.bfloat16)
    k0 = jnp.zeros((L, cache, nkv, hd), jnp.bfloat16)
    v0 = jnp.zeros((L, cache, nkv, hd), jnp.bfloat16)
    pos_iota = jnp.arange(cache)

    def step(tok, kc, vc, pos, seen, key, mode):
        x = emb[tok % 256][None, :]
        for i, w in enumerate(layers):
            q = mm(x, w["q"]).reshape(1, nq, hd)
            kk = mm(x, w["k"]).reshape(1, nkv, hd)
            vv = mm(x, w["v"]).reshape(1, nkv, hd)
            if mode >= 1:
                kc = kc.at[i, pos].set(kk[0])
                vc = vc.at[i, pos].set(vv[0])
                qg = q.reshape(nkv, nq // nkv, hd)
                # scores: (nkv, group, cache)
                sc = jnp.einsum("kgd,ckd->kgc", qg.astype(jnp.float32),
                                kc[i].astype(jnp.float32)) / np.sqrt(hd)
                sc = jnp.where(pos_iota[None, None, :] <= pos, sc, -1e30)
                p = jax.nn.softmax(sc, axis=-1)
                at = jnp.einsum("kgc,ckd->kgd", p,
                                vc[i].astype(jnp.float32))
                x = mm(at.reshape(1, nq * hd).astype(jnp.bfloat16), w["o"])
            else:
                x = mm(q.reshape(1, nq * hd), w["o"])
            a = jax.nn.silu(mm(x, w["g"])) * mm(x, w["u"])
            x = mm(a, w["d"])
        lg = mm(x, lm_head)[0].astype(jnp.float32)
        if mode >= 2:
            penal = jnp.where(lg > 0, lg / 1.1, lg * 1.1)
            lg2 = jnp.where(seen, penal, lg)
            key, sub = jax.random.split(key)
            sampled = jax.random.categorical(sub, lg2 / 0.7)
            tok = jnp.where(False, sampled, jnp.argmax(lg2)).astype(jnp.int32)
            seen = seen.at[tok].set(True)
        else:
            tok = jnp.argmax(lg).astype(jnp.int32)
        return tok, kc, vc, seen, key

    def make(mode, T):
        @jax.jit
        def run(tok0, kc, vc, seen, key):
            def body(c, _):
                tok, kc, vc, pos, seen, key = c
                tok, kc, vc, seen, key = step(tok, kc, vc, pos, seen,
                                              key, mode)
                return (tok, kc, vc, pos + 1, seen, key), tok
            (tok, *_), toks = jax.lax.scan(
                body, (tok0, kc, vc, jnp.int32(1024), seen, key),
                None, length=T)
            return toks
        return run

    seen0 = jnp.zeros((v,), bool)
    key0 = jax.random.PRNGKey(0)
    tok0 = jnp.int32(7)

    def timed(fn):
        r = fn(tok0, k0, v0, seen0, key0)
        float(jnp.asarray(r[-1], jnp.float32))  # fetch-sync (axon!)
        t0 = time.perf_counter()
        r = fn(tok0, k0, v0, seen0, key0)
        float(jnp.asarray(r[-1], jnp.float32))
        return time.perf_counter() - t0

    names = ["skeleton (matmuls only)", "+ attention (2048-pos cache)",
             "+ sampling epilogue"]
    prev = None
    wbytes = (sum(wq.size for l in layers for wq, _ in l.values())
              + lm_head[0].size)
    print(f"weights {wbytes/1e9:.2f} GB int8 -> ideal "
          f"{wbytes/819e9*1e3:.2f} ms/step at 819 GB/s")
    for mode in (0, 1, 2):
        f1, f2 = make(mode, args.t1), make(mode, args.t2)
        tA, tB = timed(f1), timed(f2)
        ms = (tB - tA) / (args.t2 - args.t1) * 1e3
        d = "" if prev is None else f"  (+{ms - prev:.2f} ms)"
        print(f"  {names[mode]:32s} {ms:6.2f} ms/step{d}")
        prev = ms

if __name__ == "__main__":
    main()
