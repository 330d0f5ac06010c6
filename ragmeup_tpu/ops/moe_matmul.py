"""Expert-gathered and grouped matmuls for sparse-MoE models.

Two kernels, both reading the stacked ``(E, k, n)`` expert tensors:

- ``moe_gather_matmul`` (decode, few rows): per-slot expert gather via a
  scalar-prefetched index map — reads only the routed experts' bytes.
- ``moe_grouped_matmul`` (prefill/train, many rows): megablocks-class
  grouped GEMM — rows sorted by expert, groups padded to m-tiles, m
  innermost so same-expert weight blocks revisit (copy elided) and the
  whole expert set streams from HBM once; int8 dequant in the epilogue.

The reference serves MoE checkpoints (Mixtral-class) through
``AutoModelForCausalLM`` + bitsandbytes (``RAGHelper_local.py:61-89``),
where CUDA gathers only the routed experts' weights per token. The
TPU-native equivalent is this kernel: expert weights live stacked in HBM
as one ``(E, k, n)`` tensor, and a scalar-prefetched grid index map (the
same mechanism as ``ops/paged_attention.py``) streams ONLY the tiles of
the experts each token routed to — ``S·k·n`` weight bytes instead of the
``E·k·n`` an all-experts einsum reads. At decode (bandwidth-bound,
``S = tokens × top_k ≤ E``) that is the difference between MoE decode
running at dense-model speed and running ``E/top_k`` times slower.

A gather-then-dot in XLA (``jnp.take`` + einsum) materializes the gathered
``(S, k, n)`` weight copy in HBM — read + write + read, 3x the traffic.
Here the gather happens in the BlockSpec index map, so expert tiles go
HBM → VMEM → MXU exactly once.

Works for int8-quantized experts (per-expert per-output-channel scales,
the decoder's int8 scheme) and for bf16/f32 experts (scale = None).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _kernel(ids_ref, x_ref, w_ref, s_ref, o_ref, acc, *, k_tiles: int,
            scaled: bool):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc[:] = jnp.zeros(acc.shape, jnp.float32)

    x = x_ref[0]                      # (8, tile_k) slot rows (row 0 real)
    w = w_ref[0].astype(x.dtype)      # (tile_k, tile_n) this slot's expert
    acc[:] = acc[:] + jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(kb == k_tiles - 1)
    def _emit():
        out = acc[:]
        if scaled:
            out = out * s_ref[0, 0][None, :].astype(jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_k", "tile_n",
                                             "interpret", "out_dtype"))
def _moe_matmul_call(x, w, scale, ids, tile_k: int, tile_n: int,
                     interpret: bool, out_dtype):
    s_slots, k = x.shape
    e, _, n = w.shape
    k_tiles = k // tile_k
    scaled = scale is not None
    # slot rows pad to the 8-sublane tile (rows 1..7 zero); scales pad the
    # same way so every block's second-to-last dim is 8-aligned (Mosaic
    # sublane rule — a (1, tile_n) block lowers in interpret mode only)
    xp = jnp.pad(x[:, None, :], ((0, 0), (0, 7), (0, 0)))
    if scaled:
        sp = jnp.pad(scale[:, None, :].astype(jnp.float32),
                     ((0, 0), (0, 7), (0, 0)))
    else:
        sp = jnp.zeros((e, 8, 128), jnp.float32)  # unread placeholder
    kern = functools.partial(_kernel, k_tiles=k_tiles, scaled=scaled)
    sn = tile_n if scaled else 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_slots, n // tile_n, k_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, tile_k), lambda s, nb, kb, ids_: (s, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, tile_n),
                         lambda s, nb, kb, ids_: (ids_[s], kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sn),
                         lambda s, nb, kb, ids_: (ids_[s], 0,
                                                  nb if scaled else 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tile_n),
                               lambda s, nb, kb, ids_: (s, 0, nb),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, tile_n), jnp.float32)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_slots, 8, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_slots * 8 * k * n,
            bytes_accessed=s_slots * (k * n * w.dtype.itemsize
                                      + k * x.dtype.itemsize
                                      + n * out_dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids, xp, w, sp)
    return out[:, 0, :]


def _grouped_kernel(texp_ref, x_ref, w_ref, s_ref, o_ref, acc, *,
                    k_tiles: int, tm: int, scaled: bool):
    kb = pl.program_id(1)
    m = pl.program_id(2)
    rows = pl.ds(m * tm, tm)

    x = x_ref[...]                    # (tm, tile_k)
    w = w_ref[0].astype(x.dtype)      # (tile_k, tile_n) this tile's expert
    part = jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(kb == 0)
    def _init():
        acc[rows, :] = part

    @pl.when(kb != 0)
    def _accum():
        acc[rows, :] = acc[rows, :] + part

    @pl.when(kb == k_tiles - 1)
    def _emit():
        out = acc[rows, :]
        if scaled:
            out = out * s_ref[0, 0][None, :].astype(jnp.float32)
        o_ref[rows, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tile_k", "tile_n",
                                             "interpret", "out_dtype"))
def _grouped_matmul_call(xp, w, scale, texp, tm: int, tile_k: int,
                         tile_n: int, interpret: bool, out_dtype):
    """Grid (n_tiles, k_tiles, m_tiles) with m INNERMOST: consecutive
    m-tiles of the same expert revisit the same weight block, and the
    Pallas pipeline elides the re-copy — expert weights stream from HBM
    exactly once per (kb, nb) strip (E·k·n bytes total), the property
    that makes the grouped GEMM weight-traffic-optimal. The f32
    accumulator holds the whole padded-m strip for the current n tile
    (k is not innermost, so per-m-tile partials must persist)."""
    mp, k = xp.shape
    e, _, n = w.shape
    k_tiles = k // tile_k
    scaled = scale is not None
    if scaled:
        sp = jnp.pad(scale[:, None, :].astype(jnp.float32),
                     ((0, 0), (0, 7), (0, 0)))
    else:
        sp = jnp.zeros((e, 8, 128), jnp.float32)  # unread placeholder
    kern = functools.partial(_grouped_kernel, k_tiles=k_tiles, tm=tm,
                             scaled=scaled)
    sn = tile_n if scaled else 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n, k_tiles, mp // tm),
        in_specs=[
            pl.BlockSpec((tm, tile_k), lambda nb, kb, m, te: (m, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, tile_n),
                         lambda nb, kb, m, te: (te[m], kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sn),
                         lambda nb, kb, m, te: (te[m], 0,
                                                nb if scaled else 0),
                         memory_space=pltpu.VMEM),
        ],
        # one output block per n strip (visited contiguously); rows are
        # written as their m-tile finishes its last k tile
        out_specs=pl.BlockSpec((mp, tile_n), lambda nb, kb, m, te: (0, nb),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((mp, tile_n), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=e * k * n * w.dtype.itemsize
            + (n // tile_n) * mp * k * xp.dtype.itemsize
            + mp * n * out_dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(texp, xp, w, sp)


def _grouped_fallback(xs, w, gsz, scale):
    """lax.ragged_dot path: correct everywhere, differentiable, but runs
    far off MXU peak on this backend (measured 38 vs 162 TFLOP/s)."""
    wd = w
    if scale is not None:
        wd = w.astype(xs.dtype) * scale[:, None, :].astype(xs.dtype)
    return jax.lax.ragged_dot(xs, wd.astype(xs.dtype),
                              gsz.astype(jnp.int32),
                              preferred_element_type=xs.dtype)


def _stack_kernel(texp_ref, x_ref, w_ref, s_ref, o_ref, acc, *,
                  k_tiles: int, tm: int, m_tiles: int, scaled: bool):
    """Full-expert-stack variant: each grid step holds ALL experts'
    (tile_k, tile_n) tiles in VMEM and an in-kernel loop walks the
    m-tiles, picking each tile's expert by dynamic leading-dim index —
    expert weights are fetched from HBM exactly once per (kb, nb),
    by construction (no reliance on pipeline revisit elision)."""
    kb = pl.program_id(1)

    def body(i, carry):
        e_i = texp_ref[i]
        rows = pl.ds(i * tm, tm)
        x = x_ref[rows, :]
        w = w_ref[e_i].astype(x.dtype)
        part = jnp.dot(x, w, preferred_element_type=jnp.float32)

        @pl.when(kb == 0)
        def _init():
            acc[rows, :] = part

        @pl.when(kb != 0)
        def _accum():
            acc[rows, :] = acc[rows, :] + part

        @pl.when(kb == k_tiles - 1)
        def _emit():
            out = acc[rows, :]
            if scaled:
                out = out * s_ref[e_i, 0][None, :].astype(jnp.float32)
            o_ref[rows, :] = out.astype(o_ref.dtype)

        return carry

    jax.lax.fori_loop(0, m_tiles, body, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("tm", "tile_k", "tile_n",
                                             "interpret", "out_dtype"))
def _grouped_stack_call(xp, w, scale, texp, tm: int, tile_k: int,
                        tile_n: int, interpret: bool, out_dtype):
    mp, k = xp.shape
    e, _, n = w.shape
    k_tiles = k // tile_k
    scaled = scale is not None
    if scaled:
        sp = jnp.pad(scale[:, None, :].astype(jnp.float32),
                     ((0, 0), (0, 7), (0, 0)))
    else:
        sp = jnp.zeros((e, 8, 128), jnp.float32)  # unread placeholder
    kern = functools.partial(_stack_kernel, k_tiles=k_tiles, tm=tm,
                             m_tiles=mp // tm, scaled=scaled)
    sn = tile_n if scaled else 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n, k_tiles),
        in_specs=[
            pl.BlockSpec((mp, tile_k), lambda nb, kb, te: (0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, tile_k, tile_n),
                         lambda nb, kb, te: (0, kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, 8, sn),
                         lambda nb, kb, te: (0, 0, nb if scaled else 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, tile_n), lambda nb, kb, te: (0, nb),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((mp, tile_n), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=e * k * n * w.dtype.itemsize
            + (n // tile_n) * mp * k * xp.dtype.itemsize
            + mp * n * out_dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(texp, xp, w, sp)


def _grouped_tm(e: int, dtype) -> int:
    """Largest m-tile whose worst-case per-call padding (E·(tm-1) rows)
    stays within the strip budget; bf16 needs ≥ 16 sublanes."""
    floor = 16 if dtype == jnp.bfloat16 else 8
    for tm in (128, 64, 32, 16, 8):
        if tm <= floor:
            break
        if e * (tm - 1) <= 1024:
            return tm
    return floor


def _stack_tiles(mp: int, e: int, k: int, n: int, wb: int, xb: int):
    """Pick (tile_k, tile_n) for the full-stack kernel so the VMEM
    footprint (double-buffered x strip, expert stack, out strip + the
    f32 accumulator) fits the ~16 MB budget. Prefer a wide n tile (the
    x strip refetches once per n tile). None if nothing fits."""
    best = None
    for tn in (512, 256, 128):
        if n % tn:
            continue
        for tk in (512, 256, 128):
            if k % tk:
                continue
            est = (2 * mp * tk * xb + 2 * e * tk * tn * wb
                   + 2 * mp * tn * xb + mp * tn * 4
                   + 2 * e * 8 * tn * 4)
            if est <= 14 << 20:
                cand = (tn, tk)
                if best is None or cand > best:
                    best = cand
    return (best[1], best[0]) if best else None


def _scatter_layout(xs, gsz, tm, e):
    """Pad each expert group to a ``tm``-row multiple and scatter rows
    into the padded layout so every m-tile reads exactly ONE expert.
    Returns (padded rows, inverse gather indices, per-tile expert ids)."""
    m, k = xs.shape
    mp = -(-(m + e * (tm - 1)) // tm) * tm
    csum = jnp.cumsum(gsz)
    pgs = -(-gsz // tm) * tm
    pcs = jnp.cumsum(pgs)
    idx = jnp.arange(m, dtype=jnp.int32)
    eid = jnp.searchsorted(csum, idx, side="right").astype(jnp.int32)
    dst = (pcs - pgs)[eid] + (idx - (csum - gsz)[eid])
    xp = jnp.zeros((mp, k), xs.dtype).at[dst].set(xs)
    tid = jnp.arange(mp // tm, dtype=jnp.int32) * tm
    texp = jnp.minimum(jnp.searchsorted(pcs, tid, side="right"),
                       e - 1).astype(jnp.int32)
    return xp, dst, texp


def _pad_scatter_call(xs, w, scale, gsz, tm, tile_k, tile_n, interpret,
                      no_stack: bool = False):
    """Pad each group to a tm-row multiple, scatter rows into the padded
    layout (every tile then reads exactly ONE expert), run the kernel,
    gather the real rows back. ``no_stack`` forces the per-tile kernel:
    the full-stack variant reads ALL E experts' tiles per grid step
    (optimal for prefill where every expert is routed anyway), which
    defeats the batched-decode DEDUP gather — there only the UNIQUE
    routed experts' tiles may cross HBM."""
    xp, dst, texp = _scatter_layout(xs, gsz, tm, w.shape[0])
    e = w.shape[0]
    mp = xp.shape[0]
    k, n = w.shape[1], w.shape[2]
    st = None if no_stack else _stack_tiles(mp, e, k, n, w.dtype.itemsize,
                                            xs.dtype.itemsize)
    if st is not None:
        # full expert stack per tile fits VMEM: weights stream once,
        # guaranteed (Mixtral-class E; the in-kernel m loop does the rest)
        yp = _grouped_stack_call(xp, w, scale, texp, tm, st[0], st[1],
                                 interpret, xs.dtype)
    else:
        yp = _grouped_matmul_call(xp, w, scale, texp, tm, tile_k, tile_n,
                                  interpret, xs.dtype)
    return yp[dst]


def _grouped_forward(xs, w, scale, gsz, tm, tile_k, tile_n, interpret,
                     mp_cap, no_stack: bool = False):
    """Chunk rows so each kernel call's padded strip fits VMEM; group
    sizes per chunk are the (dynamic) overlap of each group's row range
    with the chunk window — rows stay sorted, so chunks stay grouped."""
    m = xs.shape[0]
    gsz = gsz.astype(jnp.int32)
    chunk = max(tm, mp_cap - w.shape[0] * (tm - 1))
    if m <= chunk:
        return _pad_scatter_call(xs, w, scale, gsz, tm, tile_k, tile_n,
                                 interpret, no_stack)
    csum = jnp.cumsum(gsz)
    outs = []
    for lo in range(0, m, chunk):
        hi = min(lo + chunk, m)
        g_hi = jnp.clip(csum, lo, hi)
        g_lo = jnp.clip(csum - gsz, lo, hi)
        outs.append(_pad_scatter_call(xs[lo:hi], w, scale, g_hi - g_lo,
                                      tm, tile_k, tile_n, interpret,
                                      no_stack))
    return jnp.concatenate(outs, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _grouped_kernel_path(xs, w, gsz, tiles, interpret):
    tm, tile_k, tile_n, mp_cap, no_stack = tiles
    return _grouped_forward(xs, w, None, gsz, tm, tile_k, tile_n,
                            interpret, mp_cap, no_stack)


def _grouped_kp_fwd(xs, w, gsz, tiles, interpret):
    return _grouped_kernel_path(xs, w, gsz, tiles, interpret), (xs, w, gsz)


def _grouped_kp_bwd(tiles, interpret, res, dy):
    xs, w, gsz = res
    # dx rides the kernel with transposed expert tiles; dw is the
    # per-group outer product — a one-hot masked einsum (XLA), fine for
    # the training path where the forward GEMMs dominate
    dx = moe_grouped_matmul(dy, jnp.swapaxes(w, 1, 2), gsz,
                            interpret=interpret)
    e = w.shape[0]
    csum = jnp.cumsum(gsz)
    eid = jnp.searchsorted(csum, jnp.arange(xs.shape[0]), side="right")
    mask = jax.nn.one_hot(eid, e, dtype=xs.dtype)        # (m, E)
    dw = jnp.einsum("me,mk,mn->ekn", mask, xs, dy,
                    preferred_element_type=jnp.float32).astype(w.dtype)
    return dx.astype(xs.dtype), dw, None


_grouped_kernel_path.defvjp(_grouped_kp_fwd, _grouped_kp_bwd)


def moe_grouped_matmul(xs: jnp.ndarray, w: jnp.ndarray, gsz: jnp.ndarray,
                       scale: Optional[jnp.ndarray] = None,
                       tm: int = 0, tile_k: int = 0, tile_n: int = 0,
                       interpret: Optional[bool] = None,
                       no_stack: bool = False) -> jnp.ndarray:
    """Grouped (megablocks-class) GEMM for MoE prefill: rows of ``xs``
    sorted by expert, ``gsz[e]`` rows for expert e, out[i] = xs[i] @
    dequant(w[expert_of(i)]).

    xs (M, k); w (E, k, n) int8 (scale (E, n)) or float (scale None);
    gsz (E,) int32 summing to M. Kernel path: groups pad to ``tm``-row
    tiles so each tile reads exactly one expert's weight tiles; m runs
    innermost so same-expert tiles revisit (and skip re-copying) the
    weight block — routed FLOPs (+ padding) with weights streamed ONCE,
    and int8 experts dequantize IN the kernel epilogue (no (E, k, n)
    bf16 copy in HBM). Long row sets chunk to bound the VMEM strip.
    Falls back to lax.ragged_dot off-TPU or when shapes don't tile.
    Differentiable (custom VJP) in the float-expert case."""
    if interpret is None:
        interpret = not _on_tpu()
    m, k = xs.shape
    e, kw, n = w.shape
    assert kw == k, (w.shape, xs.shape)
    tm = tm or _grouped_tm(e, xs.dtype)
    tile_k = tile_k or (512 if k % 512 == 0 else 0)
    tile_n = tile_n or (512 if n % 512 == 0 else 0)
    if e * (tm - 1) > 1024:
        # large-E (Qwen3-MoE class): widen the strip so padding doesn't
        # dominate the chunk, and narrow the n tile to keep the f32
        # accumulator strip inside VMEM
        mp_cap, tile_n = 4096, (256 if n % 256 == 0 else 0)
    else:
        mp_cap = 2048
    if not (tile_k and tile_n) or m < tm // 2:
        return _grouped_fallback(xs, w, gsz, scale)
    if scale is None:
        return _grouped_kernel_path(xs, w, gsz,
                                    (tm, tile_k, tile_n, mp_cap, no_stack),
                                    interpret)
    # int8 experts: no gradient path needed (quantized weights are
    # inference-only) — straight to the kernel with in-epilogue dequant
    return _grouped_forward(xs, w, scale, gsz.astype(jnp.int32), tm,
                            tile_k, tile_n, interpret, mp_cap, no_stack)


def _kernel4(ids_ref, x_ref, w_ref, s_ref, o_ref, acc, *, k_tiles: int,
             tile_k: int, group: int):
    """Packed-int4 variant of _kernel: the slot's expert tile arrives as
    two-per-byte nibbles (tile_k//2 rows) + 8-row-padded group scales;
    unpack and dequant IN the kernel (the int32 shift dance — Mosaic
    cannot legalize int8-vector shifts on this libtpu, see
    ops/quant_matmul._kernel4) so only the packed bytes cross HBM."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc[:] = jnp.zeros(acc.shape, jnp.float32)

    x = x_ref[0]                       # (8, tile_k) slot rows (row 0 real)
    bi = w_ref[0].astype(jnp.int32)    # (tile_k//2, tile_n) packed nibbles
    lo = jnp.right_shift(jnp.left_shift(bi, 28), 28)
    hi = jnp.right_shift(bi, 4)
    w = jnp.concatenate([lo, hi], axis=0)     # (tile_k, tile_n) int32
    gpt = tile_k // group
    s = s_ref[0]                              # (8, tile_n) padded scales
    if gpt == 1:
        part = jnp.dot(x, w.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        acc[:] = acc[:] + part * s[0][None, :].astype(jnp.float32)
    else:
        srep = jnp.repeat(s[:gpt], group, axis=0)      # (tile_k, tile_n)
        wd = (w.astype(jnp.float32) * srep).astype(x.dtype)
        acc[:] = acc[:] + jnp.dot(x, wd, preferred_element_type=jnp.float32)

    @pl.when(kb == k_tiles - 1)
    def _emit():
        o_ref[0] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_k", "tile_n", "group",
                                             "interpret", "out_dtype"))
def _moe_matmul4_call(x, w_p, gscale, ids, tile_k: int, tile_n: int,
                      group: int, interpret: bool, out_dtype):
    s_slots, k = x.shape
    e = w_p.shape[0]
    n = w_p.shape[2]
    k_tiles = k // tile_k
    gpt = tile_k // group
    # pad scales to 8 rows per k-tile (Mosaic sublane rule for the block)
    gs = gscale.reshape(e, k_tiles, gpt, n).astype(jnp.float32)
    if gpt < 8:
        gs = jnp.pad(gs, ((0, 0), (0, 0), (0, 8 - gpt), (0, 0)))
    elif gpt > 8:
        raise ValueError(f"groups per tile {gpt} > 8 unsupported")
    gs = gs.reshape(e, k_tiles * 8, n)
    xp = jnp.pad(x[:, None, :], ((0, 0), (0, 7), (0, 0)))
    kern = functools.partial(_kernel4, k_tiles=k_tiles, tile_k=tile_k,
                             group=group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_slots, n // tile_n, k_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, tile_k), lambda s, nb, kb, ids_: (s, 0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k // 2, tile_n),
                         lambda s, nb, kb, ids_: (ids_[s], kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile_n),
                         lambda s, nb, kb, ids_: (ids_[s], kb, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tile_n),
                               lambda s, nb, kb, ids_: (s, 0, nb),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, tile_n), jnp.float32)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_slots, 8, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * s_slots * 8 * k * n,
            bytes_accessed=s_slots * (k * n // 2 + (k // group) * n * 4
                                      + k * x.dtype.itemsize
                                      + n * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids, xp, w_p, gs)
    return out[:, 0, :]


def moe_gather_matmul_int4(x: jnp.ndarray, w_p: jnp.ndarray,
                           gscale: jnp.ndarray, ids: jnp.ndarray,
                           tile_k: int, group: int, tile_n: int = 0,
                           interpret: Optional[bool] = None) -> jnp.ndarray:
    """Per-slot expert matmul over PACKED int4 experts:
    ``out[s] = x[s] @ dequant4(w_p[ids[s]], gscale[ids[s]])``.

    x (S, k); w_p (E, k//2, n) two-per-byte nibbles (ops/quant_matmul
    pack_int4 layout per k-tile); gscale (E, k//group, n) group scales;
    ids (S,) int32. Returns (S, n) in x.dtype.

    The kernel streams only the routed slots' PACKED bytes (half the
    int8 gather's HBM read) and dequantizes in VMEM — closing the
    "int4 MoE decode materializes XLA-take copies" gap (jnp.take wrote
    a gathered (S, k/2, n) copy back to HBM: read + write + read, 3x
    the traffic). XLA fallback (take + unpack + dequant + einsum) when
    shapes don't tile.
    """
    if interpret is None:
        interpret = not _on_tpu()
    s_slots, k = x.shape
    e, k2, n = w_p.shape
    assert k2 * 2 == k, (w_p.shape, x.shape)
    tile_n = tile_n or (1024 if n % 1024 == 0 else
                        512 if n % 512 == 0 else
                        256 if n % 256 == 0 else 0)
    ok = (tile_n and k % tile_k == 0 and tile_k % group == 0
          and tile_k // group <= 8 and (tile_k // 2) % 8 == 0)
    if ok and s_slots <= 64:
        return _moe_matmul4_call(x, w_p, gscale, ids.astype(jnp.int32),
                                 tile_k, tile_n, group, interpret, x.dtype)
    from ragmeup_tpu.ops.quant_matmul import unpack_int4
    wp_s = jnp.take(w_p, ids, axis=0)            # (S, k/2, n)
    gs_s = jnp.take(gscale, ids, axis=0)         # (S, k/group, n)
    q = jax.vmap(functools.partial(unpack_int4, tile_k=tile_k))(wp_s)
    wd = q.astype(x.dtype) * jnp.repeat(gs_s, group, axis=-2).astype(x.dtype)
    return jnp.einsum("sk,skn->sn", x, wd, preferred_element_type=x.dtype)


def _grouped_kernel4(texp_ref, x_ref, w_ref, s_ref, o_ref, acc, *,
                     k_blocks: int, tm: int, pack_tile: int, group: int,
                     sub_tiles: int):
    """Dedup-grouped variant of _kernel4: grid (n, k, m) with m INNERMOST
    so consecutive m-tiles of the same expert revisit (and skip
    re-copying) the PACKED weight block — each unique routed expert's
    packed tiles cross HBM once. A block spans ``sub_tiles`` packing
    tiles; each unpacks (the int32 shift dance — Mosaic cannot legalize
    int8-vector shifts on this libtpu) and group-dequantizes in VMEM."""
    kb = pl.program_id(1)
    m = pl.program_id(2)
    rows = pl.ds(m * tm, tm)
    x = x_ref[...]                     # (tm, sub_tiles*pack_tile)
    wblk = w_ref[0]                    # (sub_tiles*pack_tile//2, tile_n)
    sblk = s_ref[0]                    # (sub_tiles*8, tile_n) padded scales
    gpt = pack_tile // group
    half = pack_tile // 2
    part = jnp.zeros((x.shape[0], wblk.shape[1]), jnp.float32)
    for st in range(sub_tiles):
        bi = wblk[st * half:(st + 1) * half].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(bi, 28), 28)
        hi = jnp.right_shift(bi, 4)
        wq = jnp.concatenate([lo, hi], axis=0)   # (pack_tile, tile_n)
        xs = x[:, st * pack_tile:(st + 1) * pack_tile]
        s = sblk[st * 8:st * 8 + gpt]
        if gpt == 1:
            part = part + (jnp.dot(xs, wq.astype(x.dtype),
                                   preferred_element_type=jnp.float32)
                           * s[0][None, :].astype(jnp.float32))
        else:
            srep = jnp.repeat(s, group, axis=0)  # (pack_tile, tile_n)
            wd = (wq.astype(jnp.float32) * srep).astype(x.dtype)
            part = part + jnp.dot(xs, wd,
                                  preferred_element_type=jnp.float32)

    @pl.when(kb == 0)
    def _init():
        acc[rows, :] = part

    @pl.when(kb != 0)
    def _accum():
        acc[rows, :] = acc[rows, :] + part

    @pl.when(kb == k_blocks - 1)
    def _emit():
        o_ref[rows, :] = acc[rows, :].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "pack_tile", "group",
                                             "sub_tiles", "tile_n",
                                             "interpret", "out_dtype"))
def _grouped_matmul4_call(xp, w_p, gscale, texp, tm: int, pack_tile: int,
                          group: int, sub_tiles: int, tile_n: int,
                          interpret: bool, out_dtype):
    mp, k = xp.shape
    e, _, n = w_p.shape
    tile_k_blk = pack_tile * sub_tiles
    k_blocks = k // tile_k_blk
    gpt = pack_tile // group
    # pad scales to 8 rows per packing tile (Mosaic sublane rule)
    gs = gscale.reshape(e, k // pack_tile, gpt, n).astype(jnp.float32)
    if gpt < 8:
        gs = jnp.pad(gs, ((0, 0), (0, 0), (0, 8 - gpt), (0, 0)))
    gs = gs.reshape(e, (k // pack_tile) * 8, n)
    kern = functools.partial(_grouped_kernel4, k_blocks=k_blocks, tm=tm,
                             pack_tile=pack_tile, group=group,
                             sub_tiles=sub_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n, k_blocks, mp // tm),
        in_specs=[
            pl.BlockSpec((tm, tile_k_blk), lambda nb, kb, m, te: (m, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k_blk // 2, tile_n),
                         lambda nb, kb, m, te: (te[m], kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub_tiles * 8, tile_n),
                         lambda nb, kb, m, te: (te[m], kb, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, tile_n), lambda nb, kb, m, te: (0, nb),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((mp, tile_n), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=e * (k // 2) * n + e * (k // group) * n * 4
            + (n // tile_n) * mp * k * xp.dtype.itemsize
            + mp * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(texp, xp, w_p, gs)


def grouped_int4_viable(m: int, e: int, k: int, n: int, pack_tile: int,
                        group: int, dtype) -> bool:
    """True when ``moe_grouped_matmul_int4`` will take the KERNEL path —
    callers gate on this because the fallback (full-stack dequant +
    ragged_dot) is far worse than the per-slot int4 gather at decode
    shapes, so routing to it by accident would be a regression."""
    tm = 16 if dtype == jnp.bfloat16 else 8
    gpt = pack_tile // max(group, 1)
    tile_n = (1024 if n % 1024 == 0 else 512 if n % 512 == 0 else
              256 if n % 256 == 0 else 0)
    mp = -(-(m + e * (tm - 1)) // tm) * tm
    return bool(tile_n and k % pack_tile == 0 and pack_tile % group == 0
                and gpt <= 8 and (pack_tile // 2) % 8 == 0
                and e * (tm - 1) <= 1024 and mp <= 512)


def moe_grouped_matmul_int4(xs: jnp.ndarray, w_p: jnp.ndarray,
                            gscale: jnp.ndarray, gsz: jnp.ndarray,
                            pack_tile: int, group: int, tm: int = 0,
                            tile_n: int = 0,
                            interpret: Optional[bool] = None) -> jnp.ndarray:
    """Dedup-grouped GEMM over PACKED int4 expert stacks: rows of ``xs``
    sorted by expert (``gsz[e]`` rows for expert e), each UNIQUE routed
    expert's packed tiles crossing HBM exactly once, nibbles unpacked +
    group-dequantized in VMEM.

    xs (M, k); w_p (E, k//2, n) two-per-byte (ops/quant_matmul pack_int4
    layout per ``pack_tile``); gscale (E, k//group, n); gsz (E,) int32
    summing to M. Returns (M, n) in xs.dtype.

    This is the batched-decode int4 path past the per-slot gate: the
    per-slot gather (``moe_gather_matmul_int4``) re-reads an expert's
    packed bytes once PER SLOT routed to it, and the einsum alternative
    dequantizes the full stacks through a bf16 HBM transient measured at
    33 GB/s effective (BENCH_NOTES round 4). Here reads are
    ``unique·k·n/2`` packed bytes — the routed minimum. Fallback
    (non-tiling shapes / off-TPU): full-stack dequant + ragged_dot;
    callers should gate on ``grouped_int4_viable`` to avoid it."""
    if interpret is None:
        interpret = not _on_tpu()
    m, k = xs.shape
    e, k2, n = w_p.shape
    assert k2 * 2 == k, (w_p.shape, xs.shape)
    tm = tm or (16 if xs.dtype == jnp.bfloat16 else 8)
    tile_n = tile_n or (1024 if n % 1024 == 0 else
                        512 if n % 512 == 0 else
                        256 if n % 256 == 0 else 0)
    if not grouped_int4_viable(m, e, k, n, pack_tile, group, xs.dtype):
        from ragmeup_tpu.ops.quant_matmul import unpack_int4
        q = jax.vmap(functools.partial(unpack_int4, tile_k=pack_tile))(w_p)
        wd = (q.astype(xs.dtype)
              * jnp.repeat(gscale, group, axis=-2).astype(xs.dtype))
        return _grouped_fallback(xs, wd, gsz.astype(jnp.int32), None)
    # block spans up to 2048 logical k (the int8 dedup sweep's winner;
    # smaller k-tiles lose to per-tile overhead — BENCH_NOTES round 4)
    sub_tiles = max(1, 2048 // pack_tile)
    while sub_tiles > 1 and k % (pack_tile * sub_tiles):
        sub_tiles -= 1
    xp, dst, texp = _scatter_layout(xs, gsz.astype(jnp.int32), tm, e)
    yp = _grouped_matmul4_call(xp, w_p, gscale, texp, tm, pack_tile,
                               group, sub_tiles, tile_n, interpret,
                               xs.dtype)
    return yp[dst]


def moe_gather_matmul(x: jnp.ndarray, w: jnp.ndarray,
                      ids: jnp.ndarray,
                      scale: Optional[jnp.ndarray] = None,
                      tile_k: int = 0, tile_n: int = 0,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """Per-slot expert matmul: ``out[s] = x[s] @ dequant(w[ids[s]])``.

    x (S, k) bf16/f32 slot activations; w (E, k, n) int8 (with
    scale (E, n) per-output-channel) or bf16/f32 (scale None);
    ids (S,) int32 expert index per slot. Returns (S, n) in x.dtype.

    Kernel path when shapes tile; XLA gather fallback otherwise (correct
    everywhere, 3x the HBM traffic at decode shapes).
    """
    if interpret is None:
        interpret = not _on_tpu()
    s_slots, k = x.shape
    e, kw, n = w.shape
    assert kw == k, (w.shape, x.shape)
    tile_k = tile_k or (1024 if k % 1024 == 0 else 512 if k % 512 == 0 else 0)
    tile_n = tile_n or (1024 if n % 1024 == 0 else 512 if n % 512 == 0 else 0)
    if tile_k and tile_n and s_slots <= 64:
        return _moe_matmul_call(x, w, scale, ids.astype(jnp.int32),
                                tile_k, tile_n, interpret, x.dtype)
    wd = jnp.take(w, ids, axis=0).astype(x.dtype)
    if scale is not None:
        wd = wd * jnp.take(scale, ids, axis=0)[:, None, :].astype(x.dtype)
    return jnp.einsum("sk,skn->sn", x, wd,
                      preferred_element_type=x.dtype)
