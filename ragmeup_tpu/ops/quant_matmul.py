"""Fused int8 weight-dequant matmul.

The quantized decoder's speed-of-light is set by reading int8 weights once
per token. XLA tends to materialize the dequantized bf16 weight tensor
(doubling/tripling HBM traffic); this kernel keeps dequant inside the tile:
each grid step loads an int8 weight tile into VMEM, multiplies on the MXU
with f32 accumulation, and applies the per-output-channel scale in the
epilogue. Activations are tiny at decode time (m ≤ 8 rows).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _kernel(x_ref, w_ref, s_ref, o_ref, acc, *, k_tiles: int):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        acc[:] = jnp.zeros(acc.shape, jnp.float32)

    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)  # int8 tile dequants in VMEM only
    acc[:] = acc[:] + jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(kb == k_tiles - 1)
    def _emit():
        o_ref[:] = (acc[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_k", "tile_n", "interpret",
                                             "out_dtype"))
def _int8_matmul_call(x, w_q, scale, tile_k: int, tile_n: int,
                      interpret: bool, out_dtype):
    m, k = x.shape
    n = w_q.shape[1]
    kern = functools.partial(_kernel, k_tiles=k // tile_k)
    return pl.pallas_call(
        kern,
        grid=(n // tile_n, k // tile_k),
        in_specs=[
            pl.BlockSpec((m, tile_k), lambda nb, kb: (0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda nb, kb: (kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda nb, kb: (0, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tile_n), lambda nb, kb: (0, nb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((m, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n + m * k * 2 + m * n * 2 + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, scale)


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                tile_k: int = 512, tile_n: int = 512,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """x (m, k) bf16/f32 @ (w_q (k, n) int8 · scale (n,)) → (m, n) x.dtype.

    Falls back to plain dequant-then-dot when shapes don't tile."""
    if interpret is None:
        interpret = not _on_tpu()
    m, k = x.shape
    n = w_q.shape[1]
    if k % tile_k != 0 or n % tile_n != 0:
        wd = w_q.astype(x.dtype) * scale.astype(x.dtype)[None, :]
        return jnp.dot(x, wd, preferred_element_type=x.dtype)
    mp = -(-m // 8) * 8
    xp = jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x
    out = _int8_matmul_call(xp, w_q, scale.reshape(1, n), tile_k, tile_n,
                            interpret, x.dtype)
    return out[:m]
