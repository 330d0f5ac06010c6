"""Shared flax building blocks with TP sharding annotations.

All parameter initializers carry flax *logical* partitioning names; the
mesh rules in ``parallel/mesh.py`` map them onto the ``('data', 'corpus',
'model')`` mesh (SURVEY.md §2.4). Head and MLP dimensions are sharded over
the ``model`` axis (Megatron-style TP); batch over ``data``.

Attention exposes an optional ``capture_weights`` path used by the
attention-provenance method (reference ``provenance.py:19-88`` runs a full
forward with ``output_attentions=True``; here capture is a flag on the same
forward, and the blockwise variant for long context lives in
``ops/attention.py``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def dense_init(names: Tuple[str, ...]):
    return nn.with_logical_partitioning(nn.initializers.xavier_uniform(), names)


def bias_init(names: Tuple[str, ...]):
    return nn.with_logical_partitioning(nn.initializers.zeros_init(), names)


def embed_init(names: Tuple[str, ...]):
    return nn.with_logical_partitioning(nn.initializers.normal(0.02), names)


class MultiHeadAttention(nn.Module):
    """Standard MHA (BERT-style, bidirectional unless mask says otherwise).

    Returns (output, attn_weights or None). Weights are (b, h, q, k) when
    captured — only request capture on provenance paths, it materializes the
    full attention matrix.
    """

    num_heads: int
    head_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 capture_weights: bool = False):
        d_model = x.shape[-1]
        features = self.num_heads * self.head_dim

        def proj(name, y):
            k = self.param(f"{name}_kernel", dense_init(("embed", "qkv")),
                           (d_model, features), jnp.float32)
            b = self.param(f"{name}_bias", bias_init(("qkv",)),
                           (features,), jnp.float32)
            out = jnp.dot(y, k.astype(self.dtype),
                          preferred_element_type=self.dtype) + b.astype(self.dtype)
            return out.reshape(y.shape[:-1] + (self.num_heads, self.head_dim))

        q = proj("query", x)
        k = proj("key", x)
        v = proj("value", x)
        scale = 1.0 / jnp.sqrt(self.head_dim).astype(self.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            # mask: (b, k) 1=attend 0=pad, or (b, 1, q, k) additive
            if mask.ndim == 2:
                bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30)
            else:
                bias = mask
            logits = logits + bias
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                         preferred_element_type=self.dtype)
        out = out.reshape(x.shape[:-1] + (features,))
        ok = self.param("out_kernel", dense_init(("qkv", "embed")),
                        (features, d_model), jnp.float32)
        ob = self.param("out_bias", bias_init(("embed",)), (d_model,), jnp.float32)
        out = jnp.dot(out, ok.astype(self.dtype),
                      preferred_element_type=self.dtype) + ob.astype(self.dtype)
        return out, (weights if capture_weights else None)


class Mlp(nn.Module):
    intermediate: int
    dtype: Dtype = jnp.float32
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        d_model = x.shape[-1]
        wi = self.param("wi_kernel", dense_init(("embed", "mlp")),
                        (d_model, self.intermediate), jnp.float32)
        bi = self.param("wi_bias", bias_init(("mlp",)),
                        (self.intermediate,), jnp.float32)
        wo = self.param("wo_kernel", dense_init(("mlp", "embed")),
                        (self.intermediate, d_model), jnp.float32)
        bo = self.param("wo_bias", bias_init(("embed",)), (d_model,), jnp.float32)
        h = jnp.dot(x, wi.astype(self.dtype),
                    preferred_element_type=self.dtype) + bi.astype(self.dtype)
        if self.activation == "gelu":
            h = nn.gelu(h, approximate=False)
        elif self.activation == "relu":
            h = nn.relu(h)
        else:
            raise ValueError(self.activation)
        return jnp.dot(h, wo.astype(self.dtype),
                       preferred_element_type=self.dtype) + bo.astype(self.dtype)


class LayerNorm(nn.Module):
    eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.with_logical_partitioning(
            nn.initializers.ones_init(), ("embed",)), (x.shape[-1],), jnp.float32)
        bias = self.param("bias", bias_init(("embed",)), (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class RMSNorm(nn.Module):
    """RMS norm in f32 with a learned scale. ``offset`` supports the
    Gemma-family convention where the stored weight is an offset from 1
    (HF GemmaRMSNorm multiplies by ``1.0 + weight``): set offset=1.0 and
    load the checkpoint weight as-is."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    offset: float = 0.0

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.with_logical_partitioning(
            nn.initializers.ones_init(), ("embed",)), (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + self.eps)
                * (scale + self.offset)).astype(self.dtype)
