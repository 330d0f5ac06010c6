"""HF safetensors → flax param-tree loading.

Lets real checkpoints (the reference's GIST-small embedder, MiniLM cross-
encoders, Llama decoders — ``.env.template:1-5``) drop into the TPU models.
Torch ``nn.Linear`` weights are (out, in) and are transposed into flax
(in, out) kernels here.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

import numpy as np


def load_safetensors(path_or_dir: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a .safetensors file or a checkpoint dir."""
    from safetensors import safe_open
    paths = []
    if os.path.isdir(path_or_dir):
        paths = sorted(p for p in os.listdir(path_or_dir)
                       if p.endswith(".safetensors"))
        paths = [os.path.join(path_or_dir, p) for p in paths]
    else:
        paths = [path_or_dir]
    out: Dict[str, np.ndarray] = {}
    for p in paths:
        with safe_open(p, framework="numpy") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
    return out


def _strip_prefix(tensors: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize 'bert.' / 'model.' prefixes away."""
    out = {}
    for k, v in tensors.items():
        for pref in ("bert.", "roberta.", "model."):
            if k.startswith(pref):
                k = k[len(pref):]
                break
        out[k] = v
    return out


def bert_params_from_hf(tensors: Dict[str, np.ndarray],
                        num_layers: int) -> dict:
    """Build the BertEncoder param tree from HF BERT-style tensors."""
    t = _strip_prefix(tensors)

    def W(name):  # torch Linear weight -> flax kernel
        return np.ascontiguousarray(t[name].T.astype(np.float32))

    def A(name):
        return t[name].astype(np.float32)

    params = {
        "token_embedding": A("embeddings.word_embeddings.weight"),
        "position_embedding": A("embeddings.position_embeddings.weight"),
        "type_embedding": A("embeddings.token_type_embeddings.weight"),
        "embed_norm": {"scale": A("embeddings.LayerNorm.weight"),
                       "bias": A("embeddings.LayerNorm.bias")},
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query_kernel": W(p + "attention.self.query.weight"),
                "query_bias": A(p + "attention.self.query.bias"),
                "key_kernel": W(p + "attention.self.key.weight"),
                "key_bias": A(p + "attention.self.key.bias"),
                "value_kernel": W(p + "attention.self.value.weight"),
                "value_bias": A(p + "attention.self.value.bias"),
                "out_kernel": W(p + "attention.output.dense.weight"),
                "out_bias": A(p + "attention.output.dense.bias"),
            },
            "attention_norm": {"scale": A(p + "attention.output.LayerNorm.weight"),
                               "bias": A(p + "attention.output.LayerNorm.bias")},
            "mlp": {
                "wi_kernel": W(p + "intermediate.dense.weight"),
                "wi_bias": A(p + "intermediate.dense.bias"),
                "wo_kernel": W(p + "output.dense.weight"),
                "wo_bias": A(p + "output.dense.bias"),
            },
            "output_norm": {"scale": A(p + "output.LayerNorm.weight"),
                            "bias": A(p + "output.LayerNorm.bias")},
        }
    return params


def cross_encoder_params_from_hf(tensors: Dict[str, np.ndarray],
                                 num_layers: int) -> dict:
    """Param tree for CrossEncoderModel (bert + pooler + classifier)."""
    t = _strip_prefix(tensors)
    params = {"bert": bert_params_from_hf(tensors, num_layers)}
    if "pooler.dense.weight" in t:
        params["pooler_kernel"] = np.ascontiguousarray(
            t["pooler.dense.weight"].T.astype(np.float32))
        params["pooler_bias"] = t["pooler.dense.bias"].astype(np.float32)
    if "classifier.weight" in t:
        w = t["classifier.weight"].astype(np.float32)
        if w.shape[0] == 1:  # single-logit relevance head
            params["classifier_kernel"] = np.ascontiguousarray(w.T)
            params["classifier_bias"] = t["classifier.bias"].astype(np.float32)
    return params


def bert_config_from_hf(checkpoint_dir: str):
    """Read config.json → BertConfig."""
    from ragmeup_tpu.models.encoder import BertConfig
    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        c = json.load(f)
    return BertConfig(
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=c["num_attention_heads"],
        intermediate_size=c["intermediate_size"],
        max_position=c.get("max_position_embeddings", 512),
        type_vocab_size=c.get("type_vocab_size", 2),
        layer_norm_eps=c.get("layer_norm_eps", 1e-12),
    )


def load_sentence_encoder(checkpoint_dir: Optional[str], dim: int = 384,
                          seed: int = 0, batch_size: int = 256):
    """Factory: real checkpoint if given, else deterministic random init."""
    from ragmeup_tpu.models.encoder import BertConfig, SentenceEncoder
    from ragmeup_tpu.models.tokenizer import load_tokenizer
    if checkpoint_dir and os.path.isdir(checkpoint_dir):
        cfg = bert_config_from_hf(checkpoint_dir)
        tensors = load_safetensors(checkpoint_dir)
        params = bert_params_from_hf(tensors, cfg.num_layers)
        tok = load_tokenizer(checkpoint_dir, cfg.vocab_size)
        return SentenceEncoder(cfg, tok, params=params, batch_size=batch_size)
    cfg = BertConfig(hidden_size=dim, num_layers=4, num_heads=max(dim // 64, 1),
                     intermediate_size=dim * 4)
    tok = load_tokenizer(None, cfg.vocab_size)
    return SentenceEncoder(cfg, tok, seed=seed, batch_size=batch_size)


def load_cross_encoder(checkpoint_dir: Optional[str], seed: int = 1,
                       batch_size: int = 64):
    from ragmeup_tpu.models.encoder import BertConfig
    from ragmeup_tpu.models.cross_encoder import CrossEncoder
    from ragmeup_tpu.models.tokenizer import load_tokenizer
    if checkpoint_dir and os.path.isdir(checkpoint_dir):
        cfg = bert_config_from_hf(checkpoint_dir)
        tensors = load_safetensors(checkpoint_dir)
        params = cross_encoder_params_from_hf(tensors, cfg.num_layers)
        tok = load_tokenizer(checkpoint_dir, cfg.vocab_size)
        # fill any head params missing from the checkpoint with init values
        import jax, jax.numpy as jnp
        from ragmeup_tpu.models.cross_encoder import CrossEncoderModel
        model = CrossEncoderModel(cfg)
        init = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 8), jnp.int32),
                          jnp.ones((1, 8), jnp.int32),
                          jnp.zeros((1, 8), jnp.int32))["params"]
        for k, v in init.items():
            params.setdefault(k, v)
        return CrossEncoder(cfg, tok, params=params, batch_size=batch_size)
    cfg = BertConfig.tiny()
    tok = load_tokenizer(None, cfg.vocab_size)
    return CrossEncoder(cfg, tok, seed=seed, batch_size=batch_size)
