"""Expert-gathered matmul for sparse-MoE decode.

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
