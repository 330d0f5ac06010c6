"""Attention kernels: flash (Pallas), ring (ICI), and blockwise provenance.

Three pieces (SURVEY.md §5.7 — the reference *avoids* long context by
truncation; this framework scales it):

- ``flash_attention``: Pallas forward kernel with online softmax — the
  (seq, seq) score matrix never leaves VMEM. Used for long prefills in the
  local decoder. Causal tiles above the diagonal are skipped entirely.
- ``ring_attention``: context parallelism over a mesh axis — KV blocks
  rotate via ``ppermute`` while each chip computes its partial online
  softmax; communication overlaps compute on ICI (SURVEY.md §2.4 SP/CP
  row).
- ``span_attention_mass``: the attention-provenance primitive. The
  reference materializes the full thread's attention matrix
  (``provenance.py:28-31``, quadratic memory); here the (answer → doc)
  attention mass is accumulated blockwise over keys with a two-pass online
  softmax, so memory is O(answer_len × block) regardless of context length
  (SURVEY.md §7 hard part #6).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Flash attention (Pallas forward kernel)
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, causal: bool, sm_scale: float, block_q: int,
                  block_k: int, kv_blocks: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    run = True
    if causal:
        # skip KV tiles fully above the diagonal
        run = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(run)
    def _compute():
        q = q_ref[0]  # (block_q, d)
        k = k_ref[0]  # (block_k, d)
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            cols = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(cols <= rows, s, MASK_VALUE)
        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[:] = m_next
        l_scr[:] = l_next
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(ki == kv_blocks - 1)
    def _emit():
        l = l_scr[:]
        linv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[:] * linv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale", "block_q",
                                             "block_k", "interpret"))
def _flash_call(q, k, v, causal: bool, sm_scale: float, block_q: int,
                block_k: int, interpret: bool):
    bh, s, d = q.shape
    kv_len = k.shape[1]
    q_blocks = s // block_q
    kv_blocks = kv_len // block_k
    kern = functools.partial(_flash_kernel, causal=causal, sm_scale=sm_scale,
                             block_q=block_q, block_k=block_k,
                             kv_blocks=kv_blocks)
    return pl.pallas_call(
        kern,
        grid=(bh, q_blocks, kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * kv_len * d,
            bytes_accessed=2 * bh * (s + 2 * kv_len) * d,
            transcendentals=bh * s * kv_len,
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool = True, sm_scale: Optional[float] = None,
                    block_q: int = 128, block_k: int = 128,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """softmax(q k^T / √d) v without materializing the score matrix.

    q/k/v: (batch*heads, seq, head_dim); seq divisible by the block sizes
    (pad + mask upstream if needed). Compiled on TPU, interpreted elsewhere.
    """
    if interpret is None:
        interpret = not _on_tpu()
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    bh, s, d = q.shape
    if s % block_q or k.shape[1] % block_k:
        raise ValueError(f"seq lengths ({s}, {k.shape[1]}) must divide block "
                         f"sizes ({block_q}, {block_k})")
    return _flash_call(q, k, v, causal, sm_scale, block_q, block_k, interpret)


# ---------------------------------------------------------------------------
# GQA flash: K/V at native kv-head count, no rep-expansion
# ---------------------------------------------------------------------------

def _flash_gqa_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                      *, causal: bool, sm_scale: float, block_q: int,
                      block_k: int, kv_blocks: int, g: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    run = True
    if causal:
        run = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(run)
    def _compute():
        q = q_ref[0].reshape(g * block_q, q_ref.shape[-1])  # (g·bq, d)
        k = k_ref[0]                                        # (bk, d)
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if causal:
            # row r holds head r // block_q at position r % block_q —
            # all g heads share the same causal structure
            rows = qi * block_q + jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32,
                                         (g * block_q, block_k), 0),
                block_q)
            cols = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (g * block_q, block_k), 1)
            s = jnp.where(cols <= rows, s, MASK_VALUE)
        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_scr[:] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[:] = m_next
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(ki == kv_blocks - 1)
    def _emit():
        l = l_scr[:]
        linv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[:] * linv).reshape(o_ref.shape[1:]).astype(
            o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "sm_scale", "block_q",
                                             "block_k", "interpret"))
def _flash_gqa_call(q, k, v, causal: bool, sm_scale: float, block_q: int,
                    block_k: int, interpret: bool):
    bkv, g, s, d = q.shape
    kv_len = k.shape[1]
    q_blocks = s // block_q
    kv_blocks = kv_len // block_k
    kern = functools.partial(_flash_gqa_kernel, causal=causal,
                             sm_scale=sm_scale, block_q=block_q,
                             block_k=block_k, kv_blocks=kv_blocks, g=g)
    return pl.pallas_call(
        kern,
        grid=(bkv, q_blocks, kv_blocks),
        in_specs=[
            pl.BlockSpec((1, g, block_q, d), lambda b, i, j: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, block_q, d), lambda b, i, j: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bkv, g, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g * block_q, 1), jnp.float32),
            pltpu.VMEM((g * block_q, 1), jnp.float32),
            pltpu.VMEM((g * block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bkv * g * s * kv_len * d,
            bytes_accessed=2 * bkv * (g * s + 2 * kv_len) * d,
            transcendentals=bkv * g * s * kv_len,
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention_gqa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        causal: bool = True,
                        sm_scale: Optional[float] = None,
                        block_q: int = 128, block_k: int = 128,
                        interpret: Optional[bool] = None) -> jnp.ndarray:
    """Grouped-query flash: q (b·nkv, g, seq, hd) — all g query heads of a
    kv head in one grid cell — against k/v (b·nkv, kv_len, hd) at NATIVE
    kv-head count. Each K/V block is DMA'd once per q block instead of g
    times (the rep-expanded path's 4x KV traffic at GQA 32/8; BENCH_NOTES
    "flash prefill" known waste). Output (b·nkv, g, seq, hd)."""
    if interpret is None:
        interpret = not _on_tpu()
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    bkv, g, s, d = q.shape
    if s % block_q or k.shape[1] % block_k:
        raise ValueError(f"seq lengths ({s}, {k.shape[1]}) must divide block "
                         f"sizes ({block_q}, {block_k})")
    return _flash_gqa_call(q, k, v, causal, sm_scale, block_q, block_k,
                           interpret)


def attention_reference(q, k, v, causal: bool = True,
                        sm_scale: Optional[float] = None) -> jnp.ndarray:
    """Naive oracle for tests."""
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if causal:
        qpos = jnp.arange(q.shape[1])[:, None]
        kpos = jnp.arange(k.shape[1])[None, :]
        s = jnp.where(kpos <= qpos, s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", w, v.astype(jnp.float32)).astype(q.dtype)


# ---------------------------------------------------------------------------
# Ring attention (context parallelism over a mesh axis)
# ---------------------------------------------------------------------------

def ring_attention_local(q, k_local, v_local, axis_name: str,
                         causal: bool = True,
                         sm_scale: Optional[float] = None) -> jnp.ndarray:
    """Per-shard body for ring attention — call inside shard_map with q
    sharded over `axis_name` on the sequence dim, k/v likewise.

    KV blocks rotate around the ring via ppermute while each chip maintains
    online-softmax statistics; after N-1 rotations every chip has attended
    its queries over the full sequence. Point-to-point ICI traffic only.
    """
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q.shape[-1]))
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    bh, sq, d = q.shape
    skv = k_local.shape[1]
    qf = q.astype(jnp.float32)

    m = jnp.full((bh, sq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bh, sq, 1), jnp.float32)
    o = jnp.zeros((bh, sq, d), jnp.float32)
    k_blk, v_blk = k_local, v_local
    perm = [(i, (i + 1) % n) for i in range(n)]

    q_pos = my * sq + jnp.arange(sq)

    def step(carry, step_idx):
        m, l, o, k_blk, v_blk = carry
        src = (my - step_idx) % n
        s = jnp.einsum("bqd,bkd->bqk", qf, k_blk.astype(jnp.float32)) * sm_scale
        if causal:
            kv_pos = src * skv + jnp.arange(skv)
            mask = kv_pos[None, None, :] <= q_pos[None, :, None]
            s = jnp.where(mask, s, MASK_VALUE)
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        o_next = alpha * o + jnp.einsum("bqk,bkd->bqd", p,
                                        v_blk.astype(jnp.float32))
        k_new = jax.lax.ppermute(k_blk, axis_name, perm)
        v_new = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_next, l_next, o_next, k_new, v_new), None

    (m, l, o, _, _), _ = jax.lax.scan(step, (m, l, o, k_blk, v_blk),
                                      jnp.arange(n))
    linv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    return (o * linv).astype(q.dtype)


def ring_attention(mesh, q, k, v, axis_name: str = "corpus",
                   causal: bool = True,
                   head_axis: Optional[str] = None) -> jnp.ndarray:
    """Full-array entry: q/k/v (bh, seq, d) get sequence-sharded over
    `axis_name`; output matches single-device attention exactly.

    ``head_axis`` additionally shards dim 0 (the folded batch×head dim)
    over that mesh axis — composes SP with TP when the head projections
    are already model-sharded (each chip rings only its own heads)."""
    from jax.sharding import PartitionSpec as P

    from ragmeup_tpu.parallel.mesh import shard_map_compat
    spec = P(head_axis, axis_name, None)
    fn = shard_map_compat(
        functools.partial(ring_attention_local, axis_name=axis_name,
                          causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec)
    return fn(q, k, v)


# ---------------------------------------------------------------------------
# Blockwise span-attention mass (provenance without the full matrix)
# ---------------------------------------------------------------------------

def span_attention_mass(q_span: jnp.ndarray, k_full: jnp.ndarray,
                        spans: Sequence[Tuple[int, int]],
                        q_offset: int, sm_scale: Optional[float] = None,
                        block_k: int = 512) -> np.ndarray:
    """Mean causal-softmax attention mass from a (small) query span to each
    key span, computed blockwise over keys.

    q_span: (a, d) the answer-span queries (post-RoPE, one head or
    head-averaged); k_full: (L, d) all keys; spans: [(lo, hi)] doc spans;
    q_offset: absolute position of q_span[0] (for the causal mask).
    Memory: O(a × block_k). Two passes (softmax stats, then span sums).
    """
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(q_span.shape[-1]))
    a, d = q_span.shape
    L = k_full.shape[0]
    nblk = -(-L // block_k)
    pad = nblk * block_k - L
    k_pad = jnp.pad(k_full, ((0, pad), (0, 0)))
    q32 = q_span.astype(jnp.float32)
    q_pos = q_offset + jnp.arange(a)

    def block_scores(bi):
        kb = jax.lax.dynamic_slice(k_pad, (bi * block_k, 0), (block_k, d))
        s = (q32 @ kb.astype(jnp.float32).T) * sm_scale
        kv_pos = bi * block_k + jnp.arange(block_k)
        valid = (kv_pos[None, :] <= q_pos[:, None]) & (kv_pos[None, :] < L)
        return jnp.where(valid, s, -jnp.inf)

    # pass 1: global softmax stats per query row
    def stat_step(carry, bi):
        m, l = carry
        s = block_scores(bi)
        m_curr = jnp.max(s, axis=1)
        m_next = jnp.maximum(m, m_curr)
        l = l * jnp.exp(m - m_next) + jnp.sum(
            jnp.exp(jnp.where(jnp.isfinite(s), s - m_next[:, None], -jnp.inf)
                    ), axis=1)
        return (m_next, l), None

    (m, l), _ = jax.lax.scan(stat_step,
                             (jnp.full((a,), -jnp.inf), jnp.zeros((a,))),
                             jnp.arange(nblk))
    l = jnp.maximum(l, 1e-30)

    # pass 2: per-position normalized weights, accumulated into span sums
    span_arr = np.asarray(spans, np.int64).reshape(-1, 2)
    lo = jnp.asarray(span_arr[:, 0])
    hi = jnp.asarray(span_arr[:, 1])

    def mass_step(acc, bi):
        s = block_scores(bi)
        w = jnp.exp(jnp.where(jnp.isfinite(s), s - m[:, None], -jnp.inf)) / l[:, None]
        kv_pos = bi * block_k + jnp.arange(block_k)
        # (spans, block) membership mask
        member = (kv_pos[None, :] >= lo[:, None]) & (kv_pos[None, :] < hi[:, None])
        # acc[span] += sum over q rows and member keys
        contrib = jnp.einsum("ak,sk->s", w, member.astype(jnp.float32))
        return acc + contrib, None

    acc, _ = jax.lax.scan(mass_step, jnp.zeros((len(span_arr),)),
                          jnp.arange(nblk))
    # mean over query rows and span length
    span_len = jnp.maximum((hi - lo).astype(jnp.float32), 1.0)
    return np.asarray(acc / (a * span_len))
