"""BERT-class sentence encoder in flax.

TPU-native replacement for the reference's HF sentence encoder
(``RAGHelper_local.py:107-117``; default model GIST-small-Embedding-v0, a
384-d BERT-small — ``BASELINE.md``). The corpus-embedding hot loop
(reference ``RAGHelper.py:417-434``: batches of 1000 through a torch
forward) becomes one jit'd batched forward per length bucket, bf16 on the
MXU, with mean pooling and L2 normalization fused into the same program.

Weights load from HF safetensors via ``models/hf_loader.py``; without a
checkpoint the encoder initializes deterministically (seeded) so the whole
framework runs self-contained.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ragmeup_tpu.models.layers import (
    LayerNorm, Mlp, MultiHeadAttention, embed_init,
)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def jdtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @staticmethod
    def tiny() -> "BertConfig":
        """Small config for tests."""
        return BertConfig(vocab_size=1024, hidden_size=64, num_layers=2,
                          num_heads=4, intermediate_size=128, max_position=128)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask, capture_weights: bool = False):
        c = self.cfg
        attn_out, weights = MultiHeadAttention(
            num_heads=c.num_heads, head_dim=c.head_dim, dtype=c.jdtype,
            name="attention")(x, mask, capture_weights)
        x = LayerNorm(eps=c.layer_norm_eps, dtype=c.jdtype,
                      name="attention_norm")(x + attn_out)
        mlp_out = Mlp(intermediate=c.intermediate_size, dtype=c.jdtype,
                      name="mlp")(x)
        x = LayerNorm(eps=c.layer_norm_eps, dtype=c.jdtype,
                      name="output_norm")(x + mlp_out)
        return x, weights


class BertEncoder(nn.Module):
    """Token ids → contextual embeddings (post-LN BERT)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 capture_weights: bool = False):
        c = self.cfg
        b, s = input_ids.shape
        tok = self.param("token_embedding", embed_init(("vocab", "embed")),
                         (c.vocab_size, c.hidden_size), jnp.float32)
        pos = self.param("position_embedding", embed_init(("seq", "embed")),
                         (c.max_position, c.hidden_size), jnp.float32)
        typ = self.param("type_embedding", embed_init(("vocab", "embed")),
                         (c.type_vocab_size, c.hidden_size), jnp.float32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (tok[input_ids] + pos[None, :s, :] + typ[token_type_ids])
        x = LayerNorm(eps=c.layer_norm_eps, dtype=c.jdtype,
                      name="embed_norm")(x.astype(c.jdtype))
        all_weights = []
        for i in range(c.num_layers):
            x, w = BertLayer(c, name=f"layer_{i}")(x, attention_mask,
                                                   capture_weights)
            if capture_weights:
                all_weights.append(w)
        return (x, all_weights) if capture_weights else x


def mean_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    m = attention_mask[..., None].astype(hidden.dtype)
    summed = jnp.sum(hidden * m, axis=1)
    count = jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    return summed / count


def _bucket_len(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class SentenceEncoder:
    """Tokenize → bucketed batched forward → mean pool → L2 normalize.

    The public embedding surface of the framework: both corpus embedding
    (ingest) and query embedding (search) go through `encode`.
    """

    LENGTH_BUCKETS = (32, 64, 128, 256, 512)

    def __init__(self, cfg: BertConfig, tokenizer, params=None, seed: int = 0,
                 batch_size: int = 256):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.model = BertEncoder(cfg)
        self.batch_size = batch_size
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 8), jnp.int32),
                jnp.ones((1, 8), jnp.int32))["params"]
        self.params = params
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, params, ids, mask):
        hidden = self.model.apply({"params": params}, ids, mask)
        pooled = mean_pool(hidden.astype(jnp.float32), mask)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)

    def _pad_batch(self, encs: List[List[int]]):
        max_len = max(len(e) for e in encs)
        L = _bucket_len(max_len, self.LENGTH_BUCKETS)
        L = min(L, self.cfg.max_position)
        ids = np.zeros((len(encs), L), np.int32)
        mask = np.zeros((len(encs), L), np.int32)
        for i, e in enumerate(encs):
            e = e[:L]
            ids[i, :len(e)] = e
            mask[i, :len(e)] = 1
        return ids, mask

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        """Embed texts → (n, hidden) float32, L2-normalized."""
        if not len(texts):
            return np.zeros((0, self.cfg.hidden_size), np.float32)
        encs = [self.tokenizer.encode(t) for t in texts]
        # sort by length to minimize padding waste, then restore order
        order = np.argsort([len(e) for e in encs], kind="stable")
        out = np.zeros((len(texts), self.cfg.hidden_size), np.float32)
        bs = self.batch_size
        for i in range(0, len(order), bs):
            sel = order[i:i + bs]
            ids, mask = self._pad_batch([encs[j] for j in sel])
            emb = self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))
            out[sel] = np.asarray(emb)
        return out

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        return self.encode(texts)
