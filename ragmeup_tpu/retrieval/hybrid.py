"""Hybrid retrieval: sparse BM25 + dense cosine, fused with weighted RRF.

Reproduces the reference's EnsembleRetriever wiring (``RAGHelper.py:
492-505``): sparse and dense retrievers with weights 0.5/0.5, the dense side
optionally in MMR mode, and an optional cross-encoder rerank stage on top
(``RAGHelper.py:476-490``). Both engines are in-process device indexes; the
fusion runs on the tiny top-k id lists on host.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from ragmeup_tpu.data.documents import Chunk
from ragmeup_tpu.data.store import ChunkStore
from ragmeup_tpu.ops.fusion import rrf_fuse
from ragmeup_tpu.retrieval.dense import DenseIndex
from ragmeup_tpu.retrieval.sparse import BM25Index


class HybridRetriever:
    """sparse ∪ dense → RRF → (optional) rerank."""

    def __init__(self, store: ChunkStore, dense: DenseIndex, sparse: BM25Index,
                 embed_query_fn: Callable[[Sequence[str]], np.ndarray],
                 k: int = 10, weights: Sequence[float] = (0.5, 0.5),
                 rrf_c: int = 60, search_type: str = "mmr",
                 mmr_fetch_k: int = 20, mmr_lambda: float = 0.5,
                 reranker=None, rerank_k: int = 3,
                 re2_prompt: Optional[str] = None):
        self.store = store
        self.dense = dense
        self.sparse = sparse
        self.embed_query_fn = embed_query_fn
        self.k = k
        self.weights = tuple(weights)
        self.rrf_c = rrf_c
        self.search_type = search_type
        self.mmr_fetch_k = mmr_fetch_k
        self.mmr_lambda = mmr_lambda
        self.reranker = reranker
        self.rerank_k = rerank_k
        self.re2_prompt = re2_prompt

    # -- stages -----------------------------------------------------------------

    def retrieve_rows(self, query: str, k: Optional[int] = None
                      ) -> List[tuple]:
        """Hybrid top-k as (row, fused_score) pairs."""
        k = k or self.k
        sparse_hits = self.sparse.search([query], k, re2_prompt=self.re2_prompt)[0]
        qv = np.asarray(self.embed_query_fn([query]))
        dense_hits = self.dense.search(qv, k, search_type=self.search_type,
                                       fetch_k=self.mmr_fetch_k,
                                       mmr_lambda=self.mmr_lambda)[0]
        fused = rrf_fuse(
            [[r for r, _ in sparse_hits], [r for r, _ in dense_hits]],
            weights=self.weights, c=self.rrf_c, k=k)
        return fused

    def retrieve(self, query: str, k: Optional[int] = None,
                 rerank: Optional[bool] = None) -> List[Chunk]:
        """Full retrieval: hybrid fuse → chunks with relevance_score metadata
        → optional cross-encoder rerank down to rerank_k (the
        ContextualCompressionRetriever stage, RAGHelper.py:476-490)."""
        fused = self.retrieve_rows(query, k)
        chunks: List[Chunk] = []
        for row, score in fused:
            c = self.store[row]
            md = dict(c.metadata)
            md["relevance_score"] = float(score)
            md["pk"] = int(row)
            chunks.append(Chunk(content=c.content, metadata=md, id=c.id))
        do_rerank = self.reranker is not None if rerank is None else (rerank and self.reranker is not None)
        if do_rerank and chunks:
            chunks = self.reranker.rerank(query, chunks, top_n=self.rerank_k)
        return chunks
