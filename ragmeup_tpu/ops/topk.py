"""Fused dense-scoring + top-k Pallas kernels.

This is the TPU-native replacement for the reference's ANN engines (Milvus /
pgvector HNSW — reference ``RAGHelper.py:385-404``, ``README.md:36-37``).
TPUs hate pointer-chasing graph indexes; the design here is brute-force
scoring of an HBM-resident corpus matrix on the MXU with the k-selection
fused into the matmul epilogue, so per-tile scores live only in VMEM and the
(batch × corpus) score matrix never round-trips to HBM (SURVEY.md §7 hard
part #1).

Layout: the corpus is stored **transposed** as ``corpus_t (d, N)`` so each
grid step loads a ``(d, TILE_N)`` tile and the MXU computes
``Q (b, d) @ tile (d, TILE_N)`` directly. A running top-k buffer
``(b, k)`` of (score, global index) pairs lives in VMEM scratch across the
sequential TPU grid; each tile's scores are merged with an unrolled
k-round select-and-mask. Ties break toward the **lowest global index**,
which is the invariant the multi-shard merge relies on for exactness
(SURVEY.md §7 hard part #7).

Deletions are additive masks (0 live, -1e30 dead) so CRUD never recompiles.
The int8 variant scores on the int8 MXU path with int32 accumulation and
per-vector dequant rescale in the epilogue.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-1e30)
_INT_MAX = np.int32(2**31 - 1)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _merge_topk(best_s, best_i, tile_s, tile_i, k: int):
    """Merge a running (b, k) top-k with a (b, T) tile of scores.

    k unrolled rounds of max → lowest-index tie-break → one-hot mask-out.
    All VPU element-wise work over (b, k+T); no sort, no gather.
    """
    comb_s = jnp.concatenate([best_s, tile_s], axis=1)
    comb_i = jnp.concatenate([best_i, tile_i], axis=1)
    out_s, out_i = [], []
    for _ in range(k):
        m = jnp.max(comb_s, axis=1, keepdims=True)  # (b, 1)
        is_max = comb_s >= m
        sel_i = jnp.min(jnp.where(is_max, comb_i, _INT_MAX), axis=1, keepdims=True)
        out_s.append(m)
        out_i.append(sel_i)
        comb_s = jnp.where(comb_i == sel_i, NEG_INF, comb_s)
    return jnp.concatenate(out_s, axis=1), jnp.concatenate(out_i, axis=1)


def _topk_kernel(q_ref, c_ref, mask_ref, out_s_ref, out_i_ref, best_s, best_i,
                 *, k: int, tile_n: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        best_s[:] = jnp.full(best_s.shape, NEG_INF, dtype=best_s.dtype)
        best_i[:] = jnp.full(best_i.shape, -1, dtype=best_i.dtype)

    q = q_ref[:]
    c = c_ref[:]
    s = jnp.dot(q, c, preferred_element_type=jnp.float32)
    s = s + mask_ref[:]  # (1, T) additive tombstone/padding mask
    b = s.shape[0]
    tile_i = i * tile_n + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    ns, ni = _merge_topk(best_s[:], best_i[:], s, tile_i, k)
    best_s[:] = ns
    best_i[:] = ni

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


def _topk_int8_kernel(q_ref, qs_ref, c_ref, cs_ref, mask_ref,
                      out_s_ref, out_i_ref, best_s, best_i,
                      *, k: int, tile_n: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        best_s[:] = jnp.full(best_s.shape, NEG_INF, dtype=best_s.dtype)
        best_i[:] = jnp.full(best_i.shape, -1, dtype=best_i.dtype)

    acc = jnp.dot(q_ref[:], c_ref[:], preferred_element_type=jnp.int32)
    # per-query scale (b, 1) × per-vector scale (1, T) dequant in the epilogue
    s = acc.astype(jnp.float32) * qs_ref[:] * cs_ref[:]
    s = s + mask_ref[:]
    b = s.shape[0]
    tile_i = i * tile_n + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    ns, ni = _merge_topk(best_s[:], best_i[:], s, tile_i, k)
    best_s[:] = ns
    best_i[:] = ni

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


def _pad_rows(q: jnp.ndarray, mult: int = 8) -> Tuple[jnp.ndarray, int]:
    b = q.shape[0]
    pb = -(-b // mult) * mult
    if pb != b:
        q = jnp.pad(q, ((0, pb - b), (0, 0)))
    return q, b


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def _dense_topk_call(queries, corpus_t, mask, k: int, tile_n: int, interpret: bool):
    b, d = queries.shape
    n = corpus_t.shape[1]
    grid = n // tile_n
    dtype = corpus_t.dtype
    kern = functools.partial(_topk_kernel, k=k, tile_n=tile_n)
    out_s, out_i = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * n,
            bytes_accessed=d * n * dtype.itemsize + b * d * 4 + b * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries.astype(dtype), corpus_t, mask)
    return out_s, out_i


def dense_topk(queries: jnp.ndarray, corpus_t: jnp.ndarray, k: int,
               mask: Optional[jnp.ndarray] = None, tile_n: int = 1024,
               interpret: Optional[bool] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused scores = queries @ corpus_t, returning top-k (scores, indices).

    queries: (b, d) float; corpus_t: (d, N) with N a multiple of tile_n;
    mask: (1, N) additive float mask (0 live / NEG_INF dead+padding).
    Ties break toward the lowest index. Runs the Pallas kernel compiled on
    TPU, interpreted elsewhere (tests on the CPU mesh).
    """
    if interpret is None:
        interpret = not _on_tpu()
    if k > 128:
        raise ValueError(f"k={k} too large for the unrolled merge (max 128); "
                         "use dense_topk_xla for very deep retrieval")
    d, n = corpus_t.shape
    if n % tile_n != 0:
        raise ValueError(f"corpus columns ({n}) must be a multiple of tile_n ({tile_n})")
    if mask is None:
        mask = jnp.zeros((1, n), jnp.float32)
    q, b = _pad_rows(jnp.asarray(queries, jnp.float32))
    out_s, out_i = _dense_topk_call(q, corpus_t, mask, k, tile_n, interpret)
    return out_s[:b], out_i[:b]


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def _dense_topk_int8_call(q_i8, q_scale, corpus_i8, c_scale, mask,
                          k: int, tile_n: int, interpret: bool):
    b, d = q_i8.shape
    n = corpus_i8.shape[1]
    kern = functools.partial(_topk_int8_kernel, k=k, tile_n=tile_n)
    return pl.pallas_call(
        kern,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * n,
            bytes_accessed=d * n + b * d + n * 4 + b * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_i8, q_scale, corpus_i8, c_scale, mask)


def quantize_int8(x: jnp.ndarray, axis: int = -1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-vector int8 quantization along `axis`."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dense_topk_int8(queries: jnp.ndarray, corpus_i8: jnp.ndarray,
                    c_scale: jnp.ndarray, k: int,
                    mask: Optional[jnp.ndarray] = None, tile_n: int = 1024,
                    interpret: Optional[bool] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8 fused top-k: corpus_i8 (d, N) int8, c_scale (1, N) per-vector
    dequant scale. Queries are quantized per-row on the fly; the matmul runs
    on the int8 MXU path with int32 accumulation."""
    if interpret is None:
        interpret = not _on_tpu()
    d, n = corpus_i8.shape
    if n % tile_n != 0:
        raise ValueError(f"corpus columns ({n}) must be a multiple of tile_n ({tile_n})")
    if mask is None:
        mask = jnp.zeros((1, n), jnp.float32)
    q, b = _pad_rows(jnp.asarray(queries, jnp.float32))
    q_i8, q_scale = quantize_int8(q, axis=1)
    out_s, out_i = _dense_topk_int8_call(q_i8, q_scale, corpus_i8, c_scale,
                                         mask, k, tile_n, interpret)
    return out_s[:b], out_i[:b]


# ---------------------------------------------------------------------------
# Pure-XLA path (used for the sharded shard_map variant and as a fallback) and
# a NumPy oracle for tests (SURVEY.md §4: unit-test kernels against oracles).
# ---------------------------------------------------------------------------

def dense_topk_xla(queries: jnp.ndarray, corpus_t: jnp.ndarray, k: int,
                   mask: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA-fused equivalent (materializes (b, n) scores; fine for small n or
    as the inner per-shard op under shard_map)."""
    s = jnp.dot(jnp.asarray(queries, jnp.float32),
                corpus_t.astype(jnp.float32),
                preferred_element_type=jnp.float32)
    if mask is not None:
        s = s + mask
    # lax.top_k is stable (prefers lower index on ties) — same invariant as
    # the Pallas merge.
    return jax.lax.top_k(s, k)


def topk_oracle(queries: np.ndarray, corpus: np.ndarray, k: int,
                dead_rows=()) -> Tuple[np.ndarray, np.ndarray]:
    """Exact NumPy oracle: scores = q @ corpus.T, top-k sorted by
    (-score, index). corpus is (n, d) row-major (NOT transposed)."""
    s = queries.astype(np.float64) @ corpus.astype(np.float64).T
    if len(dead_rows):
        s[:, list(dead_rows)] = -np.inf
    b, n = s.shape
    out_s = np.zeros((b, k), np.float64)
    out_i = np.zeros((b, k), np.int64)
    for r in range(b):
        order = np.lexsort((np.arange(n), -s[r]))[:k]
        out_s[r] = s[r][order]
        out_i[r] = order
    return out_s, out_i


# ---------------------------------------------------------------------------
# Fetch packing: this environment's device→host path has high per-fetch
# latency (and a pathological slow path when a step fetches two arrays
# separately), so every hot query path returns ONE stacked int32 array:
# row 0 = scores bitcast to int32, row 1 = indices.
# ---------------------------------------------------------------------------

def pack_scores_ids(scores: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """(b, k) f32 + (b, k) i32 → (2, b, k) i32 (scores bitcast). Device op."""
    s_bits = jax.lax.bitcast_convert_type(scores.astype(jnp.float32), jnp.int32)
    return jnp.stack([s_bits, ids.astype(jnp.int32)])


def unpack_scores_ids(packed) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side inverse of pack_scores_ids (one D2H fetch)."""
    arr = np.asarray(packed)
    return arr[0].view(np.float32), arr[1]
