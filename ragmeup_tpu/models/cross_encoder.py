"""Cross-encoder reranker: batched pairwise (query, doc) scoring on device.

TPU-native replacement for the reference's rerank stage (sentence-
transformers cross-encoder / FlashRank — ``ScoredCrossEncoderReranker.py:42``,
``RAGHelper.py:476-490``): the k candidate pairs are packed into one padded,
length-bucketed batch, scored in a single fused forward (BERT trunk + CLS
head), and sorted on host. Parity detail from the reference
(``ScoredCrossEncoderReranker.py:42-45``): the score is written into each
doc's metadata as ``relevance_score``.

The same path doubles as rerank-provenance (``provenance.py:100-108``): score
docs against query+answer (see pipeline/provenance.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ragmeup_tpu.data.documents import Chunk
from ragmeup_tpu.models.encoder import BertConfig, BertEncoder, _bucket_len
from ragmeup_tpu.models.layers import dense_init, bias_init


class CrossEncoderModel(nn.Module):
    """BERT trunk + single-logit classification head over [CLS]."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids):
        h = BertEncoder(self.cfg, name="bert")(input_ids, attention_mask,
                                               token_type_ids)
        cls = h[:, 0, :].astype(jnp.float32)
        # pooler (tanh) then classifier, matching BERT sequence classification
        pk = self.param("pooler_kernel", dense_init(("embed", "embed")),
                        (self.cfg.hidden_size, self.cfg.hidden_size), jnp.float32)
        pb = self.param("pooler_bias", bias_init(("embed",)),
                        (self.cfg.hidden_size,), jnp.float32)
        pooled = jnp.tanh(cls @ pk + pb)
        ck = self.param("classifier_kernel", dense_init(("embed", "unmodeled")),
                        (self.cfg.hidden_size, 1), jnp.float32)
        cb = self.param("classifier_bias", bias_init(("unmodeled",)),
                        (1,), jnp.float32)
        return (pooled @ ck + cb)[:, 0]  # (b,) raw logits


class CrossEncoder:
    """score(pairs) → np.ndarray; rerank(query, chunks) → top_n chunks."""

    LENGTH_BUCKETS = (64, 128, 256, 512)

    def __init__(self, cfg: BertConfig, tokenizer, params=None, seed: int = 1,
                 batch_size: int = 64, max_len: int = 512,
                 apply_sigmoid: bool = True):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.model = CrossEncoderModel(cfg)
        self.batch_size = batch_size
        self.max_len = min(max_len, cfg.max_position)
        self.apply_sigmoid = apply_sigmoid
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
                jnp.zeros((1, 8), jnp.int32))["params"]
        self.params = params
        self._forward = jax.jit(
            lambda p, ids, mask, types: self.model.apply(
                {"params": p}, ids, mask, types))

    def score(self, pairs: Sequence[Sequence[str]]) -> np.ndarray:
        """Score (query, doc) pairs; one fused forward per length bucket."""
        if not len(pairs):
            return np.zeros((0,), np.float32)
        encs = [self.tokenizer.encode_pair(q, d, max_len=self.max_len)
                for q, d in pairs]
        order = np.argsort([len(ids) for ids, _ in encs], kind="stable")
        out = np.zeros(len(pairs), np.float32)
        bs = self.batch_size
        for i in range(0, len(order), bs):
            sel = order[i:i + bs]
            max_l = max(len(encs[j][0]) for j in sel)
            L = min(_bucket_len(max_l, self.LENGTH_BUCKETS), self.max_len)
            ids = np.zeros((len(sel), L), np.int32)
            mask = np.zeros((len(sel), L), np.int32)
            types = np.zeros((len(sel), L), np.int32)
            for r, j in enumerate(sel):
                e, t = encs[j]
                e, t = e[:L], t[:L]
                ids[r, :len(e)] = e
                mask[r, :len(e)] = 1
                types[r, :len(t)] = t
            logits = np.asarray(self._forward(self.params, jnp.asarray(ids),
                                              jnp.asarray(mask),
                                              jnp.asarray(types)))
            out[sel] = logits
        if self.apply_sigmoid:
            out = 1.0 / (1.0 + np.exp(-out))
        return out

    def rerank(self, query: str, chunks: List[Chunk],
               top_n: Optional[int] = None) -> List[Chunk]:
        """Sort chunks by cross-encoder score desc, keep top_n, write
        relevance_score metadata (ScoredCrossEncoderReranker contract)."""
        if not chunks:
            return []
        scores = self.score([(query, c.content) for c in chunks])
        order = np.argsort(-scores, kind="stable")
        if top_n:
            order = order[:top_n]
        out = []
        for i in order:
            c = chunks[int(i)]
            md = dict(c.metadata)
            md["relevance_score"] = float(scores[int(i)])
            out.append(Chunk(content=c.content, metadata=md, id=c.id))
        return out
