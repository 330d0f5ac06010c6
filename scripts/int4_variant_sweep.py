"""Int4 dequant-matmul variant sweep: where does the unpack cost go?

Slope-timed per-matmul cost at the 8B MLP shape for kernel variants:
  A current   — int32 shifts, f32 scale multiply with jnp.repeat
  B bf16-scale— int32 shifts (Mosaic cannot legalize int8-vector shifts),
                bf16 scale math instead of f32
  C out-scale — unscaled dequant, per-group dots, scale the (m, tile_n)
                OUTPUT per group (moves the big multiply off the tile)
  D tile-scale— one dot per k-tile, per-tile output scaling (coarser
                quant groups = tile_k; quality checked separately)

int8 kernel and ideal figures printed for reference.
"""

import functools
import time

import numpy as np

from ragmeup_tpu.utils import ensure_platform


def main():
    ensure_platform()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ragmeup_tpu.ops.quant_matmul import (int4_matmul, int8_matmul,
                                              quantize_int4_groupwise)

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    C = 8
    m, k, n = 1, 4096, 14336
    tile_k, tile_n, group = 512, 512, 128
    gpt = tile_k // group
    k_tiles = k // tile_k

    def sync(r):
        float(jnp.asarray(r.reshape(-1)[0], jnp.float32))

    def timeit(fn, n1=20, n2=80):
        sync(fn())

        def run(nn):
            t0 = time.perf_counter()
            for _ in range(nn):
                r = fn()
            sync(r)
            return time.perf_counter() - t0
        t1, t2 = run(n1), run(n2)
        return (t2 - t1) / (n2 - n1) * 1e3 / C * 1e3  # us per matmul

    # ---- kernel bodies -----------------------------------------------------
    def kern_B(x_ref, w_ref, s_ref, o_ref, acc, *, k_tiles):
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _i():
            acc[:] = jnp.zeros(acc.shape, jnp.float32)
        x = x_ref[:]
        bi = w_ref[:].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(bi, 28), 28)
        hi = jnp.right_shift(bi, 4)
        w = jnp.concatenate([lo, hi], axis=0)
        wb = w.astype(jnp.bfloat16)
        s = s_ref[pl.ds(kb * 8, 8), :]
        srep = jnp.repeat(s[:gpt], group, axis=0).astype(jnp.bfloat16)
        acc[:] = acc[:] + jax.lax.dot(x, wb * srep,
                                      preferred_element_type=jnp.float32)

        @pl.when(kb == k_tiles - 1)
        def _e():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    def kern_C(x_ref, w_ref, s_ref, o_ref, acc, *, k_tiles):
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _i():
            acc[:] = jnp.zeros(acc.shape, jnp.float32)
        x = x_ref[:]
        bi = w_ref[:].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(bi, 28), 28)
        hi = jnp.right_shift(bi, 4)
        w = jnp.concatenate([lo, hi], axis=0)
        w = w.astype(jnp.bfloat16)
        s = s_ref[pl.ds(kb * 8, 8), :]
        for g in range(gpt):
            part = jax.lax.dot(x[:, g * group:(g + 1) * group],
                               w[g * group:(g + 1) * group],
                               preferred_element_type=jnp.float32)
            acc[:] = acc[:] + part * s[g][None, :].astype(jnp.float32)

        @pl.when(kb == k_tiles - 1)
        def _e():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    def kern_D(x_ref, w_ref, s_ref, o_ref, acc, *, k_tiles):
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _i():
            acc[:] = jnp.zeros(acc.shape, jnp.float32)
        x = x_ref[:]
        bi = w_ref[:].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(bi, 28), 28)
        hi = jnp.right_shift(bi, 4)
        w = jnp.concatenate([lo, hi], axis=0)
        w = w.astype(jnp.bfloat16)
        s = s_ref[pl.ds(kb * 8, 8), :]
        part = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
        acc[:] = acc[:] + part * s[0][None, :].astype(jnp.float32)

        @pl.when(kb == k_tiles - 1)
        def _e():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    def kern_F(x_ref, xs_ref, w_ref, s_ref, o_ref, acc, *, k_tiles):
        # W4A8: activations int8 (per-row scale), unpack nibbles to int8,
        # int8xint8 dot on the MXU with int32 accumulation, scale the
        # OUTPUT by x_scale * tile group scale (gpt==1 layout).
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _i():
            acc[:] = jnp.zeros(acc.shape, jnp.float32)
        xi = x_ref[:]                      # (m, tile_k) int8
        bi = w_ref[:].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(bi, 28), 28)
        hi = jnp.right_shift(bi, 4)
        w = jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)
        s = s_ref[pl.ds(kb * 8, 8), :]
        part = jax.lax.dot(xi, w, preferred_element_type=jnp.int32)
        acc[:] = acc[:] + part.astype(jnp.float32) * \
            xs_ref[:].astype(jnp.float32) * s[0][None, :].astype(jnp.float32)

        @pl.when(kb == k_tiles - 1)
        def _e():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    def kern_G(x_ref, w_ref, s_ref, o_ref, acc, *, k_tiles):
        # split dots, NO concat: dot(x_lo, lo) + dot(x_hi, hi) — tests
        # whether the concat relayout is the unpack bottleneck.
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _i():
            acc[:] = jnp.zeros(acc.shape, jnp.float32)
        x = x_ref[:]
        bi = w_ref[:].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(bi, 28), 28).astype(jnp.bfloat16)
        hi = jnp.right_shift(bi, 4).astype(jnp.bfloat16)
        s = s_ref[pl.ds(kb * 8, 8), :]
        half = tile_k // 2
        p1 = jax.lax.dot(x[:, :half], lo,
                         preferred_element_type=jnp.float32)
        p2 = jax.lax.dot(x[:, half:], hi,
                         preferred_element_type=jnp.float32)
        acc[:] = acc[:] + (p1 + p2) * s[0][None, :].astype(jnp.float32)

        @pl.when(kb == k_tiles - 1)
        def _e():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    def kern_H(x_ref, xs_ref, w_ref, s_ref, o_ref, acc, *, k_tiles):
        # W4A8 + split dots (no concat), int8 MXU.
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _i():
            acc[:] = jnp.zeros(acc.shape, jnp.float32)
        xi = x_ref[:]
        bi = w_ref[:].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(bi, 28), 28).astype(jnp.int8)
        hi = jnp.right_shift(bi, 4).astype(jnp.int8)
        s = s_ref[pl.ds(kb * 8, 8), :]
        half = tile_k // 2
        p1 = jax.lax.dot(xi[:, :half], lo, preferred_element_type=jnp.int32)
        p2 = jax.lax.dot(xi[:, half:], hi, preferred_element_type=jnp.int32)
        acc[:] = acc[:] + (p1 + p2).astype(jnp.float32) * \
            xs_ref[:].astype(jnp.float32) * s[0][None, :].astype(jnp.float32)

        @pl.when(kb == k_tiles - 1)
        def _e():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    def kern_I(x_ref, w_ref, s_ref, o_ref, acc, *, k_tiles):
        # W4A8 with IN-KERNEL per-(row, tile) activation quantization and
        # per-block scale BlockSpec (no padded scale array, no separate
        # xi/xs buffers): reads bf16 x, quantizes in VMEM, int8 dots.
        kb = pl.program_id(1)

        @pl.when(kb == 0)
        def _i():
            acc[:] = jnp.zeros(acc.shape, jnp.float32)
        x = x_ref[:].astype(jnp.float32)            # (m, tile_k)
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        xs = jnp.maximum(amax, 1e-8) / 127.0
        xi = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
        bi = w_ref[:].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(bi, 28), 28).astype(jnp.int8)
        hi = jnp.right_shift(bi, 4).astype(jnp.int8)
        s = s_ref[0]                                 # (tile_n,)
        half = tile_k // 2
        p1 = jax.lax.dot(xi[:, :half], lo, preferred_element_type=jnp.int32)
        p2 = jax.lax.dot(xi[:, half:], hi, preferred_element_type=jnp.int32)
        acc[:] = acc[:] + (p1 + p2).astype(jnp.float32) * xs * \
            s[None, :].astype(jnp.float32)

        @pl.when(kb == k_tiles - 1)
        def _e():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    def build_i(kern):
        f = functools.partial(kern, k_tiles=k_tiles)

        @jax.jit
        def call(x, w_p, gs_tiles):
            # gs_tiles: (k_tiles, n) one scale row per k-tile (gpt == 1)
            return pl.pallas_call(
                f,
                grid=(n // tile_n, k_tiles),
                in_specs=[
                    pl.BlockSpec((m, tile_k), lambda nb, kb: (0, kb),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_k // 2, tile_n), lambda nb, kb: (kb, nb),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tile_n), lambda nb, kb: (kb, nb),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((m, tile_n), lambda nb, kb: (0, nb),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((m, tile_n), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
                cost_estimate=pl.CostEstimate(
                    flops=2 * m * k * n,
                    bytes_accessed=k * n // 2 + m * k * 2 + m * n * 2,
                    transcendentals=0),
            )(x, w_p, gs_tiles)
        return call

    def build_a8(kern):
        f = functools.partial(kern, k_tiles=k_tiles)

        @jax.jit
        def call(x, w_p, gs):
            # per-row int8 activation quantization happens in-jit (fuses)
            amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
            xs = (jnp.maximum(amax, 1e-8) / 127.0).astype(jnp.float32)
            xi = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                          -127, 127).astype(jnp.int8)
            return pl.pallas_call(
                f,
                grid=(n // tile_n, k_tiles),
                in_specs=[
                    pl.BlockSpec((m, tile_k), lambda nb, kb: (0, kb),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((m, 1), lambda nb, kb: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_k // 2, tile_n), lambda nb, kb: (kb, nb),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k_tiles * 8, tile_n), lambda nb, kb: (0, nb),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((m, tile_n), lambda nb, kb: (0, nb),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((m, tile_n), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
                cost_estimate=pl.CostEstimate(
                    flops=2 * m * k * n,
                    bytes_accessed=k * n // 2 + m * k + m * n * 2,
                    transcendentals=0),
            )(xi, xs, w_p, gs)
        return call

    def build(kern, srows):
        f = functools.partial(kern, k_tiles=k_tiles)

        @jax.jit
        def call(x, w_p, gs):
            return pl.pallas_call(
                f,
                grid=(n // tile_n, k_tiles),
                in_specs=[
                    pl.BlockSpec((m, tile_k), lambda nb, kb: (0, kb),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_k // 2, tile_n), lambda nb, kb: (kb, nb),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k_tiles * 8, tile_n), lambda nb, kb: (0, nb),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((m, tile_n), lambda nb, kb: (0, nb),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((m, tile_n), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
                cost_estimate=pl.CostEstimate(
                    flops=2 * m * k * n,
                    bytes_accessed=k * n // 2 + m * k * 2 + m * n * 2,
                    transcendentals=0),
            )(x, w_p, gs)
        return call

    # ---- data --------------------------------------------------------------
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wf = [rng.standard_normal((k, n)).astype(np.float32) * 0.02
          for _ in range(C)]
    w4 = [quantize_int4_groupwise(w) for w in wf]
    # padded scale layout (8 rows per k-tile), as the library kernel uses
    def pad_scales(gs):
        g = gs.reshape(k_tiles, gpt, n)
        g = np.pad(g, ((0, 0), (0, 8 - gpt), (0, 0)))
        return g.reshape(k_tiles * 8, n)
    w4p = [(jnp.asarray(p), jnp.asarray(pad_scales(gs))) for p, gs in w4]
    w4lib = [(jnp.asarray(p), jnp.asarray(gs)) for p, gs in w4]
    wq8 = [(jnp.asarray(np.clip(np.round(w / 1e-3), -127, 127), jnp.int8),
            jnp.full((n,), 1e-3, jnp.float32)) for w in wf]

    def mk_chain(fn, ws):
        @jax.jit
        def run(x, ws):
            acc = x
            for a, b in ws:
                y = fn(acc, a, b)
                acc = jnp.pad(y, ((0, 0), (0, k - n))) if n < k else y[:, :k]
            return acc
        return lambda: run(x, ws)

    callB = build(kern_B, None)
    callC = build(kern_C, None)
    callD = build(kern_D, None)

    ideal4 = k * n / 2 / 819e9 * 1e6
    ideal8 = k * n / 819e9 * 1e6
    print(f"shape ({k},{n}) m={m}; ideal int4 {ideal4:.1f} us, "
          f"int8 {ideal8:.1f} us")
    t = timeit(mk_chain(lambda xx, a, b: int4_matmul(xx, a, b), w4lib))
    print(f"A current lib     : {t:7.1f} us/matmul")
    t = timeit(mk_chain(lambda xx, a, b: callB(xx, a, b), w4p))
    print(f"B int8-dom shifts : {t:7.1f} us/matmul")
    t = timeit(mk_chain(lambda xx, a, b: callC(xx, a, b), w4p))
    print(f"C group out-scale : {t:7.1f} us/matmul")
    t = timeit(mk_chain(lambda xx, a, b: callD(xx, a, b), w4p))
    print(f"D tile out-scale  : {t:7.1f} us/matmul")
    t = timeit(mk_chain(lambda xx, a, b: int8_matmul(xx, a, b), wq8))
    print(f"E int8 kernel ref : {t:7.1f} us/matmul")
    callF = build_a8(kern_F)
    callG = build(kern_G, None)
    callH = build_a8(kern_H)
    t = timeit(mk_chain(lambda xx, a, b: callF(xx, a, b), w4p))
    print(f"F W4A8 int8-dot   : {t:7.1f} us/matmul")
    t = timeit(mk_chain(lambda xx, a, b: callG(xx, a, b), w4p))
    print(f"G split-dots bf16 : {t:7.1f} us/matmul")
    t = timeit(mk_chain(lambda xx, a, b: callH(xx, a, b), w4p))
    print(f"H W4A8 split-dots : {t:7.1f} us/matmul")
    callI = build_i(kern_I)
    w4t = [(p_, gs_[:k_tiles]) for p_, gs_ in
           [(jnp.asarray(pp), jnp.asarray(gg)) for pp, gg in w4]]
    # tile scales: one row per k-tile (take group row 0 of each tile)
    w4t = [(jnp.asarray(pp),
            jnp.asarray(gg.reshape(k_tiles, gpt, n)[:, 0]))
           for pp, gg in w4]
    t = timeit(mk_chain(lambda xx, a, b: callI(xx, a, b), w4t))
    print(f"I W4A8 in-kern aq : {t:7.1f} us/matmul")

    # correctness spot checks for the new variants. F/G/H share D's
    # tile-scale semantics (s[0]), so D is the exactness reference; F/H
    # additionally carry the A8 activation-quant error (expected ~0.5%).
    outD0 = np.asarray(callD(x, *w4p[0]), np.float32)
    oI = np.asarray(callI(x, *w4t[0]), np.float32)
    print("I vs D max rel err:",
          np.abs(oI - outD0).max() / (np.abs(outD0).max() + 1e-9))
    for nm, c in (("F", callF), ("G", callG), ("H", callH)):
        o = np.asarray(c(x, *w4p[0]), np.float32)
        print(f"{nm} vs D max rel err:",
              np.abs(o - outD0).max() / (np.abs(outD0).max() + 1e-9))

    # correctness spot check for B (vs library A)
    outA = np.asarray(int4_matmul(x, *w4lib[0]), np.float32)
    outB = np.asarray(callB(x, *w4p[0]), np.float32)
    print("B vs A max rel err:",
          np.abs(outB - outA).max() / (np.abs(outA).max() + 1e-9))


if __name__ == "__main__":
    main()
