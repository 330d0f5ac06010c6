"""Paged KV cache + paged attention kernel tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragmeup_tpu.ops.paged_attention import (
    PagedKVCache, paged_attention, paged_attention_ref,
)


def _setup(rng, b=3, nh=8, nkv=4, hd=32, ps=16, P=64,
           lengths=(100, 37, 128)):
    mp = -(-max(lengths) // ps)
    q = jnp.asarray(rng.standard_normal((b, nh, hd)).astype(np.float32))
    k_pages = jnp.asarray(rng.standard_normal((nkv, P, ps, hd)).astype(np.float32))
    v_pages = jnp.asarray(rng.standard_normal((nkv, P, ps, hd)).astype(np.float32))
    page_idx = np.zeros((b, mp), np.int32)
    used = set()
    for i in range(b):
        need = -(-int(lengths[i]) // ps)
        pages = []
        while len(pages) < need:
            c = int(rng.integers(0, P))
            if c not in used:
                used.add(c)
                pages.append(c)
        page_idx[i, :need] = pages
    return q, k_pages, v_pages, jnp.asarray(page_idx), \
        jnp.asarray(np.asarray(lengths, np.int32))


def test_paged_kernel_matches_reference(rng):
    q, k_pages, v_pages, page_idx, lengths = _setup(rng)
    ref = paged_attention_ref(q, k_pages, v_pages, page_idx, lengths)
    out = paged_attention(q, k_pages, v_pages, page_idx, lengths,
                          pages_per_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_paged_kernel_page_block_padding(rng):
    """max_pages not divisible by pages_per_block → internal padding."""
    q, k_pages, v_pages, page_idx, lengths = _setup(rng, lengths=(50, 40, 45))
    ref = paged_attention_ref(q, k_pages, v_pages, page_idx, lengths)
    out = paged_attention(q, k_pages, v_pages, page_idx, lengths,
                          pages_per_block=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_paged_cache_lifecycle():
    cache = PagedKVCache(num_pages=8, page_size=4, num_kv_heads=2,
                         head_dim=8, num_layers=1, dtype=jnp.float32)
    cache.allocate("a", 6)   # 2 pages
    cache.allocate("b", 4)   # 1 page
    assert cache.pages_in_use == 3
    cache.extend("b", 1)     # crosses into a new page
    assert cache.pages_in_use == 4
    assert cache.seq_len["b"] == 5
    cache.free("a")
    assert cache.pages_in_use == 2
    # pool exhaustion
    cache.allocate("c", 4 * 6)
    with pytest.raises(MemoryError):
        cache.allocate("d", 4)


def test_paged_cache_write_and_attend(rng):
    """End-to-end: write prompt K/V through the cache, attend, compare with
    contiguous attention."""
    nkv, hd, ps = 2, 16, 8
    cache = PagedKVCache(num_pages=16, page_size=ps, num_kv_heads=nkv,
                         head_dim=hd, num_layers=1, dtype=jnp.float32)
    L = 21
    k = jnp.asarray(rng.standard_normal((L, nkv, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((L, nkv, hd)).astype(np.float32))
    cache.allocate("s", L)
    cache.write_prompt(0, "s", k, v)
    # one more token via write_token
    cache.extend("s", 1)
    k1 = jnp.asarray(rng.standard_normal((nkv, hd)).astype(np.float32))
    v1 = jnp.asarray(rng.standard_normal((nkv, hd)).astype(np.float32))
    cache.write_token(0, "s", L, k1, v1)
    page_idx, lengths = cache.gather_meta(["s"], max_pages=4)
    q = jnp.asarray(rng.standard_normal((1, 4, hd)).astype(np.float32))
    out = paged_attention_ref(q, cache.k_pages[0], cache.v_pages[0],
                              jnp.asarray(page_idx), jnp.asarray(lengths))
    # contiguous oracle
    k_full = jnp.concatenate([k, k1[None]], axis=0)
    v_full = jnp.concatenate([v, v1[None]], axis=0)
    g = 4 // nkv
    kf = jnp.repeat(k_full, g, axis=1)
    vf = jnp.repeat(v_full, g, axis=1)
    s = jnp.einsum("bhd,thd->bht", q, kf) / np.sqrt(hd)
    w = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bht,thd->bhd", w, vf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)
