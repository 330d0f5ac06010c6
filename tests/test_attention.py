"""Attention kernel tests: flash vs naive oracle, ring attention exactness
on the CPU mesh, blockwise span-mass vs full-matrix provenance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragmeup_tpu.ops.attention import (
    attention_reference, flash_attention, ring_attention, span_attention_mass,
)
from ragmeup_tpu.parallel.mesh import make_mesh


def _qkv(rng, bh, s, d, skv=None):
    skv = skv or s
    q = rng.standard_normal((bh, s, d)).astype(np.float32)
    k = rng.standard_normal((bh, skv, d)).astype(np.float32)
    v = rng.standard_normal((bh, skv, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_flash_matches_reference_noncausal(rng):
    q, k, v = _qkv(rng, 2, 256, 64)
    out = flash_attention(q, k, v, causal=False, block_q=128, block_k=128)
    ref = attention_reference(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_matches_reference_causal(rng):
    q, k, v = _qkv(rng, 2, 256, 64)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_cross_attention_lengths(rng):
    q, k, v = _qkv(rng, 1, 128, 64, skv=384)
    out = flash_attention(q, k, v, causal=False)
    ref = attention_reference(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_rejects_unaligned(rng):
    q, k, v = _qkv(rng, 1, 100, 64)
    with pytest.raises(ValueError):
        flash_attention(q, k, v)


def test_ring_attention_matches_single_device(rng):
    mesh = make_mesh((1, 8, 1))
    q, k, v = _qkv(rng, 2, 8 * 32, 16)
    out = ring_attention(mesh, q, k, v, axis_name="corpus", causal=True)
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_ring_attention_noncausal(rng):
    mesh = make_mesh((1, 8, 1))
    q, k, v = _qkv(rng, 1, 8 * 16, 16)
    out = ring_attention(mesh, q, k, v, axis_name="corpus", causal=False)
    ref = attention_reference(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_span_mass_matches_full_matrix(rng):
    """Blockwise span mass must equal the full-softmax computation."""
    L, d, a = 300, 32, 20
    q_off = L - a  # answer at the end (causal thread layout)
    k = jnp.asarray(rng.standard_normal((L, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((a, d)).astype(np.float32))
    spans = [(0, 100), (100, 200)]
    got = span_attention_mass(q, k, spans, q_offset=q_off, block_k=64)
    # full-matrix oracle
    s = np.asarray(q, np.float64) @ np.asarray(k, np.float64).T / np.sqrt(d)
    pos_q = q_off + np.arange(a)
    mask = np.arange(L)[None, :] <= pos_q[:, None]
    s = np.where(mask, s, -np.inf)
    w = np.exp(s - s.max(1, keepdims=True))
    w /= w.sum(1, keepdims=True)
    want = np.array([w[:, lo:hi].sum() / (a * (hi - lo)) for lo, hi in spans])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_span_mass_future_span_is_zero(rng):
    """A span entirely after the query positions gets zero mass (causal)."""
    L, d, a = 128, 16, 8
    k = jnp.asarray(rng.standard_normal((L, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((a, d)).astype(np.float32))
    got = span_attention_mass(q, k, [(0, 32), (64, 128)], q_offset=32,
                              block_k=32)
    assert got[1] < 1e-9  # span (64,128) is after query positions 32..39
    assert got[0] > 0


def test_decoder_flash_prefill_matches_einsum(rng):
    """use_flash prefill must give identical last-position logits."""
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    base = LlamaConfig.tiny(max_seq_len=512)
    flash = LlamaConfig.tiny(max_seq_len=512, use_flash=True)
    l1 = LocalLLM(base, SimpleTokenizer(base.vocab_size), seed=0)
    l2 = LocalLLM(flash, SimpleTokenizer(flash.vocab_size), params=l1.params)
    prompt = list(rng.integers(5, 500, 40))
    g1 = l1.generate(prompt, max_new_tokens=4, temperature=0.0,
                     repetition_penalty=1.0)
    g2 = l2.generate(prompt, max_new_tokens=4, temperature=0.0,
                     repetition_penalty=1.0)
    assert g1 == g2


def test_blockwise_attention_provenance_matches_full():
    """Blockwise (qk) provenance ~= full-matrix provenance."""
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    from ragmeup_tpu.data.documents import Chunk
    from ragmeup_tpu.pipeline.provenance import compute_attention_provenance
    cfg = LlamaConfig.tiny()
    llm = LocalLLM(cfg, SimpleTokenizer(cfg.vocab_size), seed=0)
    docs = [Chunk(content="the fox document text about foxes"),
            Chunk(content="market earnings text about stocks")]
    full = compute_attention_provenance(llm, "about the fox", "the fox jumps",
                                        docs, blockwise=False)
    blk = compute_attention_provenance(llm, "about the fox", "the fox jumps",
                                       docs, blockwise=True)
    assert np.allclose(full, blk, atol=1e-3), (full, blk)


def test_flash_gqa_matches_reference():
    """GQA flash (native kv-head K/V, q heads grouped per grid cell) must
    equal the rep-expanded reference exactly."""
    from ragmeup_tpu.ops.attention import attention_reference, flash_attention_gqa
    rng = np.random.default_rng(4)
    b, nkv, g, s, d = 2, 3, 4, 256, 64
    q = jnp.asarray(rng.standard_normal((b * nkv, g, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b * nkv, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b * nkv, s, d)).astype(np.float32))
    out = flash_attention_gqa(q, k, v, causal=True, block_q=64, block_k=128)
    assert out.shape == (b * nkv, g, s, d)
    for h in range(b * nkv):
        for gi in range(g):
            ref = attention_reference(q[h, gi][None], k[h][None], v[h][None],
                                      causal=True)[0]
            np.testing.assert_allclose(np.asarray(out[h, gi]),
                                       np.asarray(ref), atol=2e-4)


def test_flash_gqa_noncausal():
    from ragmeup_tpu.ops.attention import attention_reference, flash_attention_gqa
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((2, 2, 128, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 128, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 128, 32)).astype(np.float32))
    out = flash_attention_gqa(q, k, v, causal=False, block_q=64, block_k=64)
    ref = attention_reference(q[1, 0][None], k[1][None], v[1][None],
                              causal=False)[0]
    np.testing.assert_allclose(np.asarray(out[1, 0]), np.asarray(ref),
                               atol=2e-4)


def test_decoder_flash_prefill_high_gqa_ratio(rng):
    """rep=8 (70B-class GQA ratio): the GQA flash block_q must shrink so
    rep*block_q stays within the kernel's VMEM budget, and output must
    still match the einsum path (round-2 review)."""
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    base = LlamaConfig.tiny(num_heads=8, num_kv_heads=1, max_seq_len=512)
    flash = LlamaConfig.tiny(num_heads=8, num_kv_heads=1, max_seq_len=512,
                             use_flash=True)
    l1 = LocalLLM(base, SimpleTokenizer(base.vocab_size), seed=0)
    l2 = LocalLLM(flash, SimpleTokenizer(flash.vocab_size), params=l1.params)
    prompt = list(rng.integers(5, 500, 40))
    g1 = l1.generate(prompt, max_new_tokens=4, temperature=0.0,
                     repetition_penalty=1.0)
    g2 = l2.generate(prompt, max_new_tokens=4, temperature=0.0,
                     repetition_penalty=1.0)
    assert g1 == g2
