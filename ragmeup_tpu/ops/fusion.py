"""Rank fusion and diversity selection.

``rrf_fuse`` reproduces the hybrid-ensemble semantics of the reference
(LangChain ``EnsembleRetriever`` with weights 0.5/0.5 — ``RAGHelper.py:
501-503``): weighted Reciprocal Rank Fusion with constant ``c`` (60).
``mmr_select`` reproduces the dense retriever's ``search_type="mmr"``
(``RAGHelper.py:497-499``). Both operate on the tiny top-k candidate sets
(k ≈ 10–20), so they are host-side NumPy — the device kernels upstream did
the heavy lifting.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def rrf_fuse(ranked_lists: Sequence[Sequence], weights: Sequence[float],
             c: int = 60, k: int = 10) -> List[Tuple[object, float]]:
    """Weighted Reciprocal Rank Fusion.

    ranked_lists: per-retriever lists of doc ids, best first.
    Returns up to k (id, fused_score) pairs, fused desc; ties broken by the
    order ids first appeared (stable)."""
    if len(ranked_lists) != len(weights):
        raise ValueError("one weight per ranked list required")
    scores: Dict[object, float] = {}
    first_seen: Dict[object, int] = {}
    seq = 0
    for lst, w in zip(ranked_lists, weights):
        for rank, doc_id in enumerate(lst):
            scores[doc_id] = scores.get(doc_id, 0.0) + w / (rank + 1 + c)
            if doc_id not in first_seen:
                first_seen[doc_id] = seq
                seq += 1
    order = sorted(scores.items(), key=lambda kv: (-kv[1], first_seen[kv[0]]))
    return order[:k]


def weighted_score_fuse(score_maps: Sequence[Dict[object, float]],
                        weights: Sequence[float],
                        k: int = 10) -> List[Tuple[object, float]]:
    """Alternative fusion: min-max normalize each retriever's scores, then
    weighted sum. Useful when both retrievers emit calibrated scores."""
    fused: Dict[object, float] = {}
    first_seen: Dict[object, int] = {}
    seq = 0
    for smap, w in zip(score_maps, weights):
        if not smap:
            continue
        vals = np.array(list(smap.values()), dtype=np.float64)
        lo, hi = vals.min(), vals.max()
        rng = (hi - lo) if hi > lo else 1.0
        for doc_id, s in smap.items():
            fused[doc_id] = fused.get(doc_id, 0.0) + w * (s - lo) / rng
            if doc_id not in first_seen:
                first_seen[doc_id] = seq
                seq += 1
    order = sorted(fused.items(), key=lambda kv: (-kv[1], first_seen[kv[0]]))
    return order[:k]


def mmr_select(query_vec: np.ndarray, cand_vecs: np.ndarray, k: int,
               lambda_mult: float = 0.5) -> List[int]:
    """Maximal Marginal Relevance over a candidate set.

    query_vec (d,), cand_vecs (m, d); returns indices into cand_vecs of the
    k selected candidates, in selection order. Vectors need not be
    normalized (cosine is computed here)."""
    q = np.asarray(query_vec, np.float64)
    c = np.asarray(cand_vecs, np.float64)
    m = c.shape[0]
    if m == 0 or k <= 0:
        return []
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    rel = cn @ qn  # (m,)
    sim = cn @ cn.T  # (m, m)
    selected: List[int] = [int(np.argmax(rel))]
    while len(selected) < min(k, m):
        remaining = [i for i in range(m) if i not in selected]
        max_sim_sel = sim[np.ix_(remaining, selected)].max(axis=1)
        mmr = lambda_mult * rel[remaining] - (1.0 - lambda_mult) * max_sim_sel
        selected.append(remaining[int(np.argmax(mmr))])
    return selected
