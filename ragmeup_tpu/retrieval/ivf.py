"""IVF (inverted-file) cluster pruning for the dense index.

SURVEY.md §7 hard part #2: TPUs hate pointer-chasing HNSW graphs; the
brute-force path already beats it at equal memory. IVF is the complement
for the regimes brute force doesn't favor — *single-query latency* on very
large corpora — done the TPU way: everything is dense matmuls and gathers,
no graphs.

- **fit**: Lloyd's k-means runs as jit'd device iterations (assign =
  argmax of a (n, K) matmul; update = segment means).
- **layout**: corpus rows regroup into (K, C_pad, d) cluster buckets padded
  to a common size, plus (K, C_pad) original row ids and a validity mask.
- **search**: queries score the centroid matrix (one small matmul), pick
  top-``nprobe`` clusters, gather those buckets, and score them with one
  batched matmul + masked top-k. HBM traffic per query drops from the full
  corpus to ``nprobe · C_pad`` rows.

Exactness: recall@k is measured (tests assert ≥0.9 at modest nprobe on
clustered data); brute force remains the default engine.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ragmeup_tpu.ops.topk import NEG_INF


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def _kmeans(vectors, key, n_clusters: int, iters: int):
    """Lloyd's k-means on device. vectors (n, d) — returns centroids (K, d)
    and assignments (n,)."""
    n, d = vectors.shape
    idx = jax.random.choice(key, n, (n_clusters,), replace=False)
    centroids = vectors[idx]

    def step(centroids, _):
        # cosine/IP assignment (vectors normalized upstream)
        scores = vectors @ centroids.T  # (n, K)
        assign = jnp.argmax(scores, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=vectors.dtype)
        sums = onehot.T @ vectors  # (K, d)
        counts = jnp.maximum(onehot.sum(axis=0)[:, None], 1.0)
        new = sums / counts
        # re-normalize so assignment stays an IP argmax
        new = new / jnp.maximum(
            jnp.linalg.norm(new, axis=1, keepdims=True), 1e-9)
        # keep old centroid for empty clusters
        empty = (onehot.sum(axis=0) == 0)[:, None]
        return jnp.where(empty, centroids, new), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    assign = jnp.argmax(vectors @ centroids.T, axis=1)
    return centroids, assign


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search(q, centroids, buckets, row_ids, valid, k: int, nprobe: int):
    """q (b, d); buckets (K, C, d); row_ids/valid (K, C). Returns
    (scores (b, k), rows (b, k)) with -1 for empty slots."""
    b = q.shape[0]
    K, C, d = buckets.shape
    cscores = q @ centroids.T  # (b, K)
    _, probe = jax.lax.top_k(cscores, nprobe)  # (b, P)
    cand_vecs = buckets[probe]      # (b, P, C, d)
    cand_rows = row_ids[probe]      # (b, P, C)
    cand_valid = valid[probe]
    s = jnp.einsum("bd,bpcd->bpc", q, cand_vecs,
                   preferred_element_type=jnp.float32)
    s = jnp.where(cand_valid, s, NEG_INF).reshape(b, -1)
    rows_flat = cand_rows.reshape(b, -1)
    # two-key sort for deterministic lowest-row tie-break
    neg, rows_sorted = jax.lax.sort((-s, rows_flat), num_keys=2)
    top_s = -neg[:, :k]
    top_r = jnp.where(top_s > NEG_INF / 2, rows_sorted[:, :k], -1)
    return top_s, top_r


class IVFIndex:
    """Cluster-pruned dense index (build-once over a vector set)."""

    def __init__(self, n_clusters: Optional[int] = None, iters: int = 10,
                 normalize: bool = True, seed: int = 0):
        self.n_clusters = n_clusters
        self.iters = iters
        self.normalize = normalize
        self.seed = seed
        self.n = 0
        self.centroids = None
        self.buckets = None
        self.row_ids = None
        self.valid = None

    def fit(self, vectors: np.ndarray, dtype=jnp.bfloat16) -> None:
        v = np.asarray(vectors, np.float32)
        self.n, d = v.shape
        if self.normalize:
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        K = self.n_clusters or max(1, int(np.sqrt(self.n)))
        K = min(K, self.n)
        centroids, assign = _kmeans(jnp.asarray(v),
                                    jax.random.PRNGKey(self.seed), K,
                                    self.iters)
        assign = np.asarray(assign)
        counts = np.bincount(assign, minlength=K)
        C_pad = max(8, int(counts.max()))
        buckets = np.zeros((K, C_pad, d), np.float32)
        row_ids = np.full((K, C_pad), -1, np.int32)
        valid = np.zeros((K, C_pad), bool)
        fill = np.zeros(K, np.int64)
        for row, c in enumerate(assign):
            j = fill[c]
            buckets[c, j] = v[row]
            row_ids[c, j] = row
            valid[c, j] = True
            fill[c] += 1
        self.centroids = jnp.asarray(centroids, dtype)
        self.buckets = jnp.asarray(buckets, dtype)
        self.row_ids = jnp.asarray(row_ids)
        self.valid = jnp.asarray(valid)

    def search(self, queries: np.ndarray, k: int, nprobe: int = 8
               ) -> List[List[Tuple[int, float]]]:
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self.n == 0:
            return [[] for _ in range(q.shape[0])]
        if self.normalize:
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        nprobe = min(nprobe, self.centroids.shape[0])
        s, r = _ivf_search(jnp.asarray(q, self.buckets.dtype), self.centroids,
                           self.buckets, self.row_ids, self.valid,
                           k=min(k, self.n), nprobe=nprobe)
        s = np.asarray(s)
        r = np.asarray(r)
        return [[(int(ri), float(si)) for ri, si in zip(r[i], s[i]) if ri >= 0]
                for i in range(q.shape[0])]

    @property
    def memory_bytes(self) -> int:
        if self.buckets is None:
            return 0
        return (self.buckets.size * self.buckets.dtype.itemsize
                + self.centroids.size * self.centroids.dtype.itemsize
                + self.row_ids.size * 4 + self.valid.size)


class IVFDenseView:
    """Lazily-refreshed IVF view over a mutable ``DenseIndex``.

    Wires IVF into the product (config ``retrieval.ann="ivf"``): the
    DenseIndex stays the system of record (CRUD, persistence, row ids);
    this view rebuilds its cluster layout from the index's device corpus
    (one fetch) whenever the corpus changes (add/delete), and serves dense
    search with
    the same (row, score) contract as ``DenseIndex.search`` — including
    MMR over the top-``fetch_k`` candidates. Positions map back to global
    row ids via the live-row table, so hybrid fusion and the ChunkStore
    see identical ids to the exact path.
    """

    def __init__(self, dense, nprobe: int = 8, n_clusters: int = 0,
                 seed: int = 0):
        self.dense = dense
        self.nprobe = nprobe
        self.n_clusters = n_clusters or None
        self.seed = seed
        self._ivf: Optional[IVFIndex] = None
        self._rows = np.zeros(0, np.int64)
        self._stamp = None

    def _refresh(self) -> None:
        stamp = (self.dense.n, len(self.dense.dead))
        if self._ivf is not None and stamp == self._stamp:
            return
        host = self.dense.host_vectors()
        live = [r for r in range(self.dense.n) if r not in self.dense.dead]
        self._rows = np.asarray(live, np.int64)
        ivf = IVFIndex(n_clusters=self.n_clusters,
                       normalize=self.dense.normalize, seed=self.seed)
        if live:
            ivf.fit(host[live].astype(np.float32))
        self._ivf = ivf
        self._stamp = stamp

    def search(self, queries: np.ndarray, k: int,
               search_type: str = "similarity", fetch_k: int = 20,
               mmr_lambda: float = 0.5) -> List[List[Tuple[int, float]]]:
        self._refresh()
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self._rows.size == 0:
            return [[] for _ in range(q.shape[0])]
        kk = fetch_k if search_type == "mmr" else k
        hits = self._ivf.search(q, min(kk, self._rows.size),
                                nprobe=self.nprobe)
        if search_type == "mmr":
            from ragmeup_tpu.ops.fusion import mmr_select
            if self.dense.normalize:
                q = q / np.maximum(
                    np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        out: List[List[Tuple[int, float]]] = []
        for i, h in enumerate(hits):
            live = [(int(self._rows[p]), float(s)) for p, s in h]
            if search_type == "mmr" and live:
                # per-candidate device gather — no full-corpus host fetch
                cand = self.dense.gather_rows([r for r, _ in live])
                chosen = mmr_select(q[i], cand, k, mmr_lambda)
                live = [live[c] for c in chosen]
            out.append(live[:k])
        return out
