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


def test_fused_mlp_int4_parity(rng):
    """One-pallas_call transformer MLP (RMSNorm → gate/up → SiLU·mul →
    down → +residual) with packed-int4 weights vs the dequantized oracle.
    (Kept as an opt-in building block: at batch-1 the per-op savings were
    eaten by the VPU unpack — see BENCH_NOTES int4 notes.)"""
    import jax
    import jax.nn
    from ragmeup_tpu.ops.quant_matmul import (fused_mlp_int4, int4_tiling,
                                              quantize_int4_groupwise,
                                              unpack_int4)
    m, h, inter = 3, 512, 1024
    rms_eps = 1e-5
    x = rng.standard_normal((m, h)).astype(np.float32)
    nw = rng.standard_normal(h).astype(np.float32) * 0.1 + 1.0
    wg = rng.standard_normal((h, inter)).astype(np.float32) * 0.05
    wu = rng.standard_normal((h, inter)).astype(np.float32) * 0.05
    wd = rng.standard_normal((inter, h)).astype(np.float32) * 0.05

    def deq(w):
        k = w.shape[0]
        tile_k, group = int4_tiling(k)
        p, gs = quantize_int4_groupwise(w)
        wq = np.asarray(unpack_int4(jnp.asarray(p), tile_k), np.float32)
        return (jnp.asarray(p), jnp.asarray(gs),
                wq * np.repeat(gs, group, axis=0))

    pg, sg, wgd = deq(wg)
    pu, su, wud = deq(wu)
    pd, sd, wdd = deq(wd)

    xn = x / np.sqrt((x * x).mean(axis=-1, keepdims=True) + rms_eps) * nw
    act = np.asarray(jax.nn.silu(jnp.asarray(xn @ wgd))) * (xn @ wud)
    want = x + act @ wdd

    got = np.asarray(fused_mlp_int4(
        jnp.asarray(x, jnp.float32), jnp.asarray(nw), pg, sg, pu, su,
        pd, sd, rms_eps=rms_eps), np.float32)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.02, rel


def test_int4_fast_group_parity(rng):
    """group == tile_k selects the kernel's output-scaled fast path; it
    must match the dequant oracle for its own (coarser) quantization."""
    from ragmeup_tpu.ops.quant_matmul import (int4_matmul, int4_tiling,
                                              quantize_int4_groupwise,
                                              unpack_int4)
    k, n, m = 1024, 512, 3
    tile_k, _ = int4_tiling(k)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    p, gs = quantize_int4_groupwise(w, group=tile_k)
    assert gs.shape == (k // tile_k, n)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wd = (np.asarray(unpack_int4(jnp.asarray(p), tile_k), np.float32)
          * np.repeat(gs, tile_k, axis=0))
    want = np.asarray(x, np.float32) @ wd
    got = np.asarray(int4_matmul(x, jnp.asarray(p), jnp.asarray(gs)),
                     np.float32)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.02, rel


def test_int4_fast_group_decoder_generates(rng):
    """int4_group=tile through the whole decoder: quantize, load, generate."""
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    from ragmeup_tpu.models.hf_loader import quantize_decoder_params

    cfg = LlamaConfig.tiny(tie_embeddings=False, hidden_size=128,
                           intermediate_size=256)
    tok = SimpleTokenizer(cfg.vocab_size)
    base = LocalLLM(cfg, tok, seed=3)
    from flax import linen as nn
    params = nn.meta.unbox(base.params)
    qcfg = LlamaConfig.tiny(tie_embeddings=False, hidden_size=128,
                            intermediate_size=256, quantization="int4",
                            int4_group=512)
    # tile_k for these dims is the full dim (d % 512 != 0 -> tile_k = d),
    # so int4_group clamps to it; quantizer must agree with QuantDense
    qparams = quantize_decoder_params(params, bits=4, int4_group=512)
    llm = LocalLLM(qcfg, tok, params=qparams)
    out = llm.generate([3, 9, 4], max_new_tokens=6, temperature=0.0,
                       speculative="off")
    assert len(out) == 6


def test_w4a8_matmul_matches_oracle(rng):
    """a8=True (W4A8: int8 activations, int8 MXU dots, output scaling)
    must match the W8-activation oracle for its own quantization: dequant
    weights x int8-quantized activations."""
    from ragmeup_tpu.ops.quant_matmul import (int4_matmul, int4_tiling,
                                              quantize_int4_groupwise,
                                              unpack_int4)
    k, n, m = 1024, 512, 3
    tile_k, _ = int4_tiling(k)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    p, gs = quantize_int4_groupwise(w, group=tile_k)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    # oracle with the same activation quantizer
    xf = np.asarray(x, np.float32)
    xs = np.maximum(np.abs(xf).max(axis=1, keepdims=True), 1e-8) / 127.0
    xi = np.clip(np.round(xf / xs), -127, 127)
    wd = (np.asarray(unpack_int4(jnp.asarray(p), tile_k), np.float32)
          * np.repeat(gs, tile_k, axis=0))
    want = (xi @ wd) * xs
    got = np.asarray(int4_matmul(x, jnp.asarray(p), jnp.asarray(gs),
                                 a8=True), np.float32)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.02, rel
    # and close to the full-precision product (bounded a8 error)
    full = xf @ wd
    rel2 = np.abs(got - full).max() / (np.abs(full).max() + 1e-9)
    assert rel2 < 0.05, rel2


def test_w4a8_decoder_generates(rng):
    """int4_w4a8 through the whole decoder: logits stay close to the plain
    int4 fast-group path (activation-quant error only) and generation
    runs."""
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    from ragmeup_tpu.models.hf_loader import quantize_decoder_params

    dims = dict(tie_embeddings=False, hidden_size=128, intermediate_size=256)
    cfg = LlamaConfig.tiny(**dims)
    tok = SimpleTokenizer(cfg.vocab_size)
    base = LocalLLM(cfg, tok, seed=3)
    from flax import linen as nn
    params = nn.meta.unbox(base.params)
    qparams = quantize_decoder_params(params, bits=4, int4_group=512)
    ref = LocalLLM(LlamaConfig.tiny(**dims, quantization="int4",
                                    int4_group=512), tok, params=qparams)
    a8 = LocalLLM(LlamaConfig.tiny(**dims, quantization="int4",
                                   int4_group=512, int4_w4a8=True), tok,
                  params=qparams)
    lg_ref = ref.forward_logits([3, 9, 4, 17])
    lg_a8 = a8.forward_logits([3, 9, 4, 17])
    rel = np.abs(lg_a8 - lg_ref).max() / (np.abs(lg_ref).max() + 1e-9)
    assert rel < 0.1, rel
    out = a8.generate([3, 9, 4], max_new_tokens=6, temperature=0.0,
                      speculative="off")
    assert len(out) == 6
