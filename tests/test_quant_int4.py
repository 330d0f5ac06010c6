"""Packed-int4 group-wise matmul (ops/quant_matmul.py): pack/unpack
roundtrip, kernel-vs-XLA parity, and quantizer quality. TPU-native
replacement for bitsandbytes blockwise 4-bit (reference
RAGHelper_local.py:76-89)."""
import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_pack_unpack_roundtrip(rng):
    from ragmeup_tpu.ops.quant_matmul import pack_int4, unpack_int4, int4_tiling
    for k, n in [(1024, 256), (384, 128), (4096, 512)]:
        tile_k, _ = int4_tiling(k)
        q = rng.integers(-8, 8, (k, n)).astype(np.int8)
        packed = pack_int4(q, tile_k)
        assert packed.shape == (k // 2, n)
        back = np.asarray(unpack_int4(jnp.asarray(packed), tile_k))
        np.testing.assert_array_equal(back, q)


def test_int4_matmul_kernel_parity(rng):
    from ragmeup_tpu.ops.quant_matmul import (int4_matmul, int4_tiling,
                                              quantize_int4_groupwise,
                                              unpack_int4)
    for m, k, n in [(1, 1024, 512), (7, 4096, 512), (3, 512, 1024)]:
        tile_k, group = int4_tiling(k)
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        p, gs = quantize_int4_groupwise(w)
        wd = (np.asarray(unpack_int4(jnp.asarray(p), tile_k), np.float32)
              * np.repeat(gs, group, axis=0))
        want = np.asarray(x, np.float32) @ wd
        got = np.asarray(int4_matmul(x, jnp.asarray(p), jnp.asarray(gs)),
                         np.float32)
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.02, (m, k, n, rel)


def test_int4_matmul_unaligned_fallback(rng):
    from ragmeup_tpu.ops.quant_matmul import int4_matmul, quantize_int4_groupwise
    # n not divisible by tile_n -> XLA unpack fallback, same contract
    w = rng.standard_normal((512, 300)).astype(np.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((2, 512)), jnp.bfloat16)
    p, gs = quantize_int4_groupwise(w)
    out = int4_matmul(x, jnp.asarray(p), jnp.asarray(gs))
    assert out.shape == (2, 300)
    assert out.dtype == jnp.bfloat16


def test_groupwise_beats_per_channel_quality(rng):
    """Group-wise scales must track nf4's blockwise quality: quant error
    strictly below a single per-channel int4 scale on outlier rows."""
    from ragmeup_tpu.ops.quant_matmul import (int4_tiling,
                                              quantize_int4_groupwise,
                                              unpack_int4)
    k, n = 1024, 256
    tile_k, group = int4_tiling(k)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    w[:4] *= 20.0  # outlier rows (one group) blow up a per-channel amax
    p, gs = quantize_int4_groupwise(w)
    wd = (np.asarray(unpack_int4(jnp.asarray(p), tile_k), np.float32)
          * np.repeat(gs, group, axis=0))
    g_err = np.abs(wd - w).mean()
    scale_pc = np.maximum(np.abs(w).max(axis=0, keepdims=True), 1e-8) / 7.0
    w_pc = np.clip(np.round(w / scale_pc), -8, 7) * scale_pc
    pc_err = np.abs(w_pc - w).mean()
    assert g_err < 0.5 * pc_err
