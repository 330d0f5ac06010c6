"""Sparse-MoE decode cost on one chip: gather kernel vs the alternatives.

MoE decode is weight-bandwidth bound: with top_k of E experts routed per
token, a step only NEEDS to read top_k/E of the expert bytes. The three
ways to compute it differ only in HBM traffic:

  gather-kernel  ops/moe_matmul.py — scalar-prefetched BlockSpec index map
                 streams only the routed experts' tiles (slots*k*n bytes,
                 each tile HBM->VMEM->MXU once)
  xla-take-dot   jnp.take + einsum — same bytes in, but the gathered copy
                 is materialized in HBM (read + write + re-read)
  all-experts    the prefill path's batched einsum at t=1 — reads ALL
                 E*k*n bytes (E/top_k more than needed)
  dense-active   plain int8 pallas matmul over the same k,n — the
                 speed-of-light control for ONE expert's bytes

Part 1 slope-times the op on the Mixtral-8x7B MLP shape (k=4096, f=14336,
E=8, top_k=2). Part 2 builds a full 16-layer MoE decoder (8 experts,
h=2048, f=7168 — 5.6 GB int8 total, 1.4 GB active per token) and measures
end-to-end fused-loop decode tok/s against a DENSE decoder with the same
active bytes (intermediate = top_k*f): the MoE model holds 4x the expert
parameters and must decode at ~the dense-active rate.

Reference capability: RAGHelper_local.py:61-89 serves Mixtral-class
checkpoints via AutoModelForCausalLM + bitsandbytes.

Usage: python scripts/moe_decode_bench.py [--op] [--model] (default both)
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def sync(r):
    import jax.numpy as jnp
    float(jnp.asarray(r.reshape(-1)[0], jnp.float32))


def slope_time(fn, iters=20):
    """(t2-t1)/(n2-n1) over dispatch-chained loops with one fetch each —
    cancels the ~26 ms D2H fetch RTT (see CLAUDE.md slope-timing rule)."""
    sync(fn())

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        sync(r)
        return time.perf_counter() - t0

    n1, n2 = iters, iters * 4
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3  # ms per call


def bench_op(iters: int):
    import jax
    import jax.numpy as jnp
    from ragmeup_tpu.ops.moe_matmul import moe_gather_matmul
    from ragmeup_tpu.ops.quant_matmul import int8_matmul

    e, k, n, top_k = 8, 4096, 14336, 2
    slots = top_k  # one decoding token
    C = 4          # weight sets cycled inside one jit (defeats caching)
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.integers(-127, 128, (e, k, n), dtype=np.int8))
          for _ in range(C)]
    ss = [jnp.full((e, n), 1e-3, jnp.float32) for _ in range(C)]
    idss = [jnp.asarray([(2 * c) % e, (2 * c + 3) % e], jnp.int32)
            for c in range(C)]
    x = jnp.asarray(rng.standard_normal((slots, k)), jnp.bfloat16)
    rows = []

    # weights are passed as ARGUMENTS to the jitted chains — closed-over
    # device arrays would be folded into the program as constants and
    # shipped to the remote compile service (gigabytes of proto)
    @jax.jit
    def chain_gather(x, ws, ss, idss):
        acc = x
        for c in range(C):
            y = moe_gather_matmul(acc, ws[c], idss[c], ss[c])
            acc = y[:, :k]
        return acc
    rows.append(("gather-kernel",
                 slope_time(lambda: chain_gather(x, ws, ss, idss), iters),
                 slots * k * n))

    @jax.jit
    def chain_take(x, ws, ss, idss):
        acc = x
        for c in range(C):
            wd = jnp.take(ws[c], idss[c], axis=0).astype(acc.dtype)
            wd = wd * jnp.take(ss[c], idss[c], axis=0)[:, None, :].astype(
                acc.dtype)
            y = jnp.einsum("sk,skn->sn", acc, wd,
                           preferred_element_type=acc.dtype)
            acc = y[:, :k]
        return acc
    rows.append(("xla-take-dot",
                 slope_time(lambda: chain_take(x, ws, ss, idss), iters),
                 slots * k * n))

    @jax.jit
    def chain_all(x, ws, ss, idss):
        acc = x
        for c in range(C):
            wd = ws[c].astype(acc.dtype) * ss[c][:, None, :].astype(acc.dtype)
            y = jnp.einsum("sk,ekn->esn", acc, wd,
                           preferred_element_type=acc.dtype)
            # combine with fixed weights over the routed two (same math
            # shape as the prefill path's one-hot combine)
            y = (y[idss[c][0]] + y[idss[c][1]]) * 0.5
            acc = y[:, :k]
        return acc
    rows.append(("all-experts",
                 slope_time(lambda: chain_all(x, ws, ss, idss), iters),
                 e * k * n))

    wq = [jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
          for _ in range(C)]
    sq = [jnp.full((n,), 1e-3, jnp.float32) for _ in range(C)]

    @jax.jit
    def chain_dense(x, wq, sq):
        acc = x
        for c in range(C):
            y = int8_matmul(acc, wq[c], sq[c])
            acc = y[:, :k]
        return acc
    rows.append(("dense-active",
                 slope_time(lambda: chain_dense(x, wq, sq), iters),
                 k * n))

    print(f"\nMoE op (E={e}, top_k={top_k}, k={k}, n={n}, one token, "
          f"chain={C}):")
    for name, t_ms, wbytes in rows:
        per_us = t_ms / C * 1e3
        gbs = wbytes / (per_us * 1e-6) / 1e9
        print(f"  {name:14s} {per_us:8.1f} us/mlp-matmul  "
              f"({wbytes / 1e6:6.0f} MB weights read, {gbs:5.0f} GB/s, "
              f"ideal {wbytes / 819e9 * 1e6:6.1f} us)")


def bench_prefill(iters: int, e: int = 8, top_k: int = 2, h: int = 4096,
                  f: int = 14336, t: int = 512, quant: bool = False):
    """Grouped-GEMM prefill vs the all-experts einsum.

    Same LlamaMoeMlp module, paths forced via the ``moe_grouped``
    config knob. With ``quant`` the experts are int8: the grouped kernel
    dequantizes in its epilogue while the einsum must materialize
    (E, h, f) bf16 dequant copies in HBM first."""
    import jax
    import jax.numpy as jnp
    from ragmeup_tpu.models.decoder import LlamaConfig, LlamaMoeMlp

    import dataclasses
    cfg = LlamaConfig(vocab_size=64, hidden_size=h, num_layers=1,
                      num_heads=32, num_kv_heads=8, intermediate_size=f,
                      num_experts=e, num_experts_per_tok=top_k,
                      quantization="int8" if quant else "none",
                      dtype="bfloat16")
    rng = np.random.default_rng(0)
    grouped = LlamaMoeMlp(dataclasses.replace(cfg, moe_grouped="on"))
    allexp = LlamaMoeMlp(dataclasses.replace(cfg, moe_grouped="off"))
    x = jnp.asarray(rng.standard_normal((1, t, h)) * 0.1, jnp.bfloat16)
    # params as jit ARGUMENTS (closure constants would ship to the remote
    # compile service) and generated ON DEVICE — host-side normals at
    # these sizes cost minutes of the single host CPU
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    params = {"router": jax.random.normal(ks[0], (h, e), jnp.float32) * 0.2}
    if quant:
        for nm, kk, sh in (("gate", ks[1], (e, h, f)),
                           ("up", ks[2], (e, h, f)),
                           ("down", ks[3], (e, f, h))):
            params[nm + "_q"] = jax.random.randint(kk, sh, -127, 128,
                                                   jnp.int8)
            params[nm + "_s"] = jnp.full((e, sh[2]), 1e-3, jnp.float32)
    else:
        params.update({
            "gate": jax.random.normal(ks[1], (e, h, f), jnp.bfloat16) * 0.02,
            "up": jax.random.normal(ks[2], (e, h, f), jnp.bfloat16) * 0.02,
            "down": jax.random.normal(ks[3], (e, f, h), jnp.bfloat16) * 0.02,
        })
    params = jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, params)
    log("prefill: params built")
    fg = jax.jit(lambda p, xx: grouped.apply({"params": p}, xx))
    fa = jax.jit(lambda p, xx: allexp.apply({"params": p}, xx))
    og = np.asarray(fg(params, x), np.float32)
    log("prefill: grouped compiled + fetched")
    oa = np.asarray(fa(params, x), np.float32)
    log("prefill: all-experts compiled + fetched")
    err = np.max(np.abs(og - oa)) / max(np.max(np.abs(oa)), 1e-9)
    tg = slope_time(lambda: fg(params, x), iters)
    log("prefill: grouped timed")
    ta = slope_time(lambda: fa(params, x), iters)
    log("prefill: all-experts timed")
    gflop_routed = 2 * 3 * t * top_k * h * f / 1e9
    print(f"\nMoE prefill (t={t}, E={e}, top_k={top_k}, h={h}, f={f}, "
          f"{'int8' if quant else 'bf16'} experts; "
          f"routed work {gflop_routed:.0f} GFLOP):")
    print(f"  grouped ragged_dot {tg:8.2f} ms "
          f"({gflop_routed / tg:6.1f} TFLOP/s of routed work)")
    print(f"  all-experts einsum {ta:8.2f} ms ({e / top_k:.0f}x the FLOPs; "
          f"{ta / tg:.2f}x slower)")
    print(f"  max rel disagreement: {err:.2e}")


def build_moe_llm():
    import jax
    import jax.numpy as jnp
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer

    e, top_k, h, f, layers, v = 8, 2, 2048, 7168, 16, 32000
    cfg = LlamaConfig(vocab_size=v, hidden_size=h, num_layers=layers,
                      num_heads=16, num_kv_heads=8, intermediate_size=f,
                      num_experts=e, num_experts_per_tok=top_k,
                      quantization="int8", tie_embeddings=False,
                      use_flash=True, max_seq_len=2048)
    kvh = cfg.num_kv_heads * cfg.head_dim

    # device-side zeros/fulls: the same bytes/FLOPs as a real checkpoint
    # without hauling 5.6 GB through the 200 MB/s tunnel
    def qlin(d_in, d_out):
        return {"kernel_q": jnp.zeros((d_in, d_out), jnp.int8),
                "scale": jnp.full((d_out,), 1e-3, jnp.float32)}

    # token embeddings RANDOM, not zero: zero embeddings make every
    # activation zero, so routing degenerates to constant experts [0, 1]
    # every layer/step and the measured rate exceeds the bandwidth roof
    # (not a realistic decode). Random embeddings vary the routing per
    # token like a real checkpoint.
    params = {"token_embedding": jax.random.normal(
                  jax.random.PRNGKey(99), (v, h), jnp.bfloat16) * 0.02,
              "lm_head": jnp.zeros((h, v), jnp.bfloat16),
              "final_norm": {"scale": jnp.ones(h, jnp.float32)}}
    for i in range(cfg.num_layers):
        params[f"layer_{i}"] = {
            "attention": {"q_proj": qlin(h, h), "k_proj": qlin(h, kvh),
                          "v_proj": qlin(h, kvh), "o_proj": qlin(h, h)},
            "input_norm": {"scale": jnp.ones(h, jnp.float32)},
            "post_attn_norm": {"scale": jnp.ones(h, jnp.float32)},
            "mlp": {
                # random router so tokens route across all experts
                "router": jax.random.normal(jax.random.PRNGKey(i),
                                            (h, e), jnp.float32),
                "gate_q": jnp.zeros((e, h, f), jnp.int8),
                "gate_s": jnp.full((e, f), 1e-3, jnp.float32),
                "up_q": jnp.zeros((e, h, f), jnp.int8),
                "up_s": jnp.full((e, f), 1e-3, jnp.float32),
                "down_q": jnp.zeros((e, f, h), jnp.int8),
                "down_s": jnp.full((e, h), 1e-3, jnp.float32)}}
    jax.tree_util.tree_leaves(params)[0].block_until_ready()
    gc.collect()
    return LocalLLM(cfg, SimpleTokenizer(v), params=params), cfg


def build_dense_llm(intermediate: int):
    import jax
    import jax.numpy as jnp
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer

    h, v = 2048, 32000
    cfg = LlamaConfig(vocab_size=v, hidden_size=h, num_layers=16,
                      num_heads=16, num_kv_heads=8,
                      intermediate_size=intermediate,
                      quantization="int8", tie_embeddings=False,
                      quant_kernel=True,  # like-for-like: pallas dequant
                      use_flash=True, max_seq_len=2048)
    kvh = cfg.num_kv_heads * cfg.head_dim

    def qlin(d_in, d_out):
        return {"kernel_q": jnp.zeros((d_in, d_out), jnp.int8),
                "scale": jnp.full((d_out,), 1e-3, jnp.float32)}

    params = {"token_embedding": jnp.zeros((v, h), jnp.bfloat16),
              "lm_head": jnp.zeros((h, v), jnp.bfloat16),
              "final_norm": {"scale": jnp.ones(h, jnp.float32)}}
    for i in range(cfg.num_layers):
        params[f"layer_{i}"] = {
            "attention": {"q_proj": qlin(h, h), "k_proj": qlin(h, kvh),
                          "v_proj": qlin(h, kvh), "o_proj": qlin(h, h)},
            "input_norm": {"scale": jnp.ones(h, jnp.float32)},
            "post_attn_norm": {"scale": jnp.ones(h, jnp.float32)},
            "mlp": {"gate_proj": qlin(h, intermediate),
                    "up_proj": qlin(h, intermediate),
                    "down_proj": qlin(intermediate, h)}}
    jax.tree_util.tree_leaves(params)[0].block_until_ready()
    gc.collect()
    return LocalLLM(cfg, SimpleTokenizer(v), params=params)


def bench_model(n1: int, n2: int, repeat: int):
    rng = np.random.default_rng(0)
    prompt = rng.integers(5, 30000, 300).tolist()

    def decode_rate(llm):
        def gen(n):
            t0 = time.time()
            out = llm.generate(prompt, max_new_tokens=n, temperature=0.7,
                               repetition_penalty=1.0, speculative="off")
            dt = time.time() - t0
            assert len(out) == n
            return dt
        gen(n1)
        gen(n2)
        best = min((gen(n2) - gen(n1)) / (n2 - n1) for _ in range(repeat))
        return 1.0 / best

    moe, cfg = build_moe_llm()
    e, tk, f, L, h = (cfg.num_experts, cfg.num_experts_per_tok,
                      cfg.intermediate_size, cfg.num_layers, cfg.hidden_size)
    moe_rate = decode_rate(moe)
    total_mb = 3 * h * f * e * L / 1e6
    active_mb = 3 * h * f * tk * L / 1e6
    print(f"\nMoE decoder ({L}L, E={e} top_k={tk}, h={h}, f={f}; expert "
          f"bytes {total_mb:.0f} MB total, {active_mb:.0f} MB active/token):"
          f"  {moe_rate:.1f} tok/s")
    del moe
    gc.collect()

    dense = build_dense_llm(tk * f)
    dense_rate = decode_rate(dense)
    print(f"dense-active control ({L}L, h={h}, inter={tk * f}; MLP bytes "
          f"{active_mb:.0f} MB): {dense_rate:.1f} tok/s")
    print(f"MoE/dense-active ratio: {moe_rate / dense_rate:.2f} "
          f"(1.0 = routed decode at dense speed with {e // tk}x the "
          f"expert parameters resident)")


def bench_batch(iters: int, e: int = 8, top_k: int = 2, k: int = 4096,
                n: int = 14336, t: int = 8):
    """BATCHED decode (round-3 verdict #6): t tokens per step, S = t*top_k
    > E, so the per-slot gather's gate is closed. Compares

      dedup-grouped  sort by expert + grouped kernel (tm=16, no_stack):
                     each UNIQUE routed expert's tiles cross HBM once
      all-experts    the einsum fallback this batch size used to take
      slot-gather    per-slot kernel at S slots (duplicate reads)
      int4 rows      the same for packed int4 (per-slot gather vs the
                     full-stack dequant einsum)

    Weight traffic column counts the bytes the path actually reads."""
    import jax
    import jax.numpy as jnp
    from ragmeup_tpu.ops.moe_matmul import (moe_gather_matmul,
                                            moe_gather_matmul_int4,
                                            moe_grouped_matmul)
    from ragmeup_tpu.ops.quant_matmul import int4_tiling, pack_int4

    s_tot = t * top_k
    C = 2
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.integers(-127, 128, (e, k, n), dtype=np.int8))
          for _ in range(C)]
    ss = [jnp.full((e, n), 1e-3, jnp.float32) for _ in range(C)]
    # realistic routing: concentrated (zipf-ish) expert choice per slot
    probs = 1.0 / np.arange(1, e + 1) ** 1.0
    probs /= probs.sum()
    ids_h = rng.choice(e, size=s_tot, p=probs).astype(np.int32)
    uniq = len(np.unique(ids_h))
    idss = [jnp.asarray(np.sort(ids_h)) for _ in range(C)]
    gszs = [jnp.asarray(np.bincount(ids_h, minlength=e).astype(np.int32))
            for _ in range(C)]
    x = jnp.asarray(rng.standard_normal((s_tot, k)), jnp.bfloat16)
    rows = []

    @jax.jit
    def chain_dedup(x, ws, ss, gszs):
        acc = x
        for c in range(C):
            y = moe_grouped_matmul(acc, ws[c], gszs[c], ss[c], tm=16,
                                   tile_k=2048, tile_n=1024, no_stack=True)
            acc = y[:, :k].astype(x.dtype)
        return acc
    rows.append(("int8 dedup-grouped",
                 slope_time(lambda: chain_dedup(x, ws, ss, gszs), iters),
                 uniq * k * n))

    @jax.jit
    def chain_all(x, ws, ss, gszs):
        acc = x
        for c in range(C):
            wd = ws[c].astype(acc.dtype) * ss[c][:, None, :].astype(acc.dtype)
            y = jnp.einsum("sk,ekn->esn", acc, wd,
                           preferred_element_type=acc.dtype)
            acc = y[0][:, :k].astype(x.dtype)
        return acc
    rows.append(("int8 all-experts",
                 slope_time(lambda: chain_all(x, ws, ss, gszs), iters),
                 e * k * n))

    @jax.jit
    def chain_slot(x, ws, ss, idss):
        acc = x
        for c in range(C):
            y = moe_gather_matmul(acc, ws[c], idss[c], ss[c])
            acc = y[:, :k].astype(x.dtype)
        return acc
    rows.append(("int8 slot-gather",
                 slope_time(lambda: chain_slot(x, ws, ss, idss), iters),
                 s_tot * k * n))

    tile_k, group = int4_tiling(k)
    q4 = rng.integers(-8, 8, (e, k, n)).astype(np.int8)
    wp = [jnp.asarray(np.stack([pack_int4(q4[i], tile_k)
                                for i in range(e)])) for _ in range(C)]
    gs = [jnp.full((e, k // group, n), 1e-3, jnp.float32) for _ in range(C)]

    @jax.jit
    def chain_i4_slot(x, wp, gs, idss):
        acc = x
        for c in range(C):
            y = moe_gather_matmul_int4(acc, wp[c], gs[c], idss[c],
                                       tile_k, group)
            acc = y[:, :k].astype(x.dtype)
        return acc
    rows.append(("int4 slot-gather",
                 slope_time(lambda: chain_i4_slot(x, wp, gs, idss), iters),
                 s_tot * k * n // 2))

    from ragmeup_tpu.ops.moe_matmul import (grouped_int4_viable,
                                            moe_grouped_matmul_int4)
    assert grouped_int4_viable(s_tot, e, k, n, tile_k, group, jnp.bfloat16)

    @jax.jit
    def chain_i4_dedup(x, wp, gs, gszs):
        acc = x
        for c in range(C):
            y = moe_grouped_matmul_int4(acc, wp[c], gs[c], gszs[c],
                                        tile_k, group)
            acc = y[:, :k].astype(x.dtype)
        return acc
    rows.append(("int4 dedup-grouped",
                 slope_time(lambda: chain_i4_dedup(x, wp, gs, gszs), iters),
                 uniq * k * n // 2))

    @jax.jit
    def chain_i4_all(x, wp, gs, gszs):
        from ragmeup_tpu.ops.quant_matmul import unpack_int4
        acc = x
        for c in range(C):
            q = jax.vmap(lambda w: unpack_int4(w, tile_k))(wp[c])
            wd = q.astype(acc.dtype) * jnp.repeat(
                gs[c], group, axis=-2).astype(acc.dtype)
            y = jnp.einsum("sk,ekn->esn", acc, wd,
                           preferred_element_type=acc.dtype)
            acc = y[0][:, :k].astype(x.dtype)
        return acc
    rows.append(("int4 all-experts",
                 slope_time(lambda: chain_i4_all(x, wp, gs, gszs), iters),
                 e * k * n // 2))

    print(f"\nBatched MoE decode (E={e}, top_k={top_k}, k={k}, n={n}, "
          f"t={t} -> S={s_tot} slots, {uniq} unique experts, chain={C}):")
    for name, t_ms, wbytes in rows:
        per_us = t_ms / C * 1e3
        gbs = wbytes / (per_us * 1e-6) / 1e9
        print(f"  {name:18s} {per_us:8.1f} us/mlp-matmul  "
              f"({wbytes / 1e6:6.0f} MB weights read, {gbs:5.0f} GB/s, "
              f"ideal {wbytes / 819e9 * 1e6:6.1f} us)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", action="store_true")
    ap.add_argument("--batch", action="store_true",
                    help="batched decode: dedup-grouped vs all-experts "
                    "vs slot-gather, int8 + int4 (round-3 verdict #6)")
    ap.add_argument("--prefill", action="store_true")
    ap.add_argument("--prefill-large-e", action="store_true",
                    help="Qwen3-MoE-class shape (E=64, top_k=8): the "
                    "regime the grouped kernel exists for")
    ap.add_argument("--model", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n1", type=int, default=64)
    ap.add_argument("--n2", type=int, default=128)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    from ragmeup_tpu.utils.platform import ensure_platform
    print("backend:", ensure_platform(args.platform), file=sys.stderr)
    do_all = not (args.op or args.model or args.prefill
                  or args.prefill_large_e or args.batch)
    if args.op or do_all:
        bench_op(args.iters)
    if args.batch or do_all:
        bench_batch(args.iters)
    if args.prefill or do_all:
        bench_prefill(args.iters)
        bench_prefill(args.iters, quant=True)
    if args.prefill_large_e or do_all:
        bench_prefill(args.iters, e=64, top_k=8, h=2048, f=768)
        bench_prefill(args.iters, e=64, top_k=8, h=2048, f=768,
                      quant=True)
    if args.model or do_all:
        bench_model(args.n1, args.n2, args.repeat)


if __name__ == "__main__":
    main()
