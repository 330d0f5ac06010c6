"""Corpus-sharded dense retrieval over an ICI mesh.

The scale-out design from SURVEY.md §2.4/§7-8: corpus columns partition over
the ``corpus`` mesh axis; each chip scores its shard and selects a local
top-k with *global* indices; one ``all_gather`` of the (score, id) pairs
rides ICI; the final k-way merge sorts by (-score, id) so the result is
**bit-identical to single-device top-k, ties broken by lowest global id**
(hard part #7 — the recall harness depends on this exactness).

Implemented with ``shard_map`` over the XLA scoring path; the per-shard
inner op can be swapped for the fused Pallas kernel when shards are large.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ragmeup_tpu.ops.topk import NEG_INF


def _local_topk(scores: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """top-k along axis 1, ties to the lowest index (lax.top_k is stable)."""
    return jax.lax.top_k(scores, k)


def _merge_sorted(scores: jnp.ndarray, ids: jnp.ndarray, k: int):
    """Sort (b, m) candidates by (-score, id) and keep k. Exact tie-break via
    two-key lax.sort."""
    neg = -scores
    sorted_neg, sorted_ids = jax.lax.sort((neg, ids), num_keys=2)
    return -sorted_neg[:, :k], sorted_ids[:, :k]


def sharded_topk(mesh: Mesh, queries: jnp.ndarray, corpus_t: jnp.ndarray,
                 k: int, mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact global top-k over a corpus sharded on the 'corpus' mesh axis.

    queries: (b, d) replicated; corpus_t: (d, N) with N divisible by the
    corpus axis size; mask: (1, N) additive. Returns (b, k) scores + global
    indices, identical to the single-device result.
    """
    n_shards = mesh.shape["corpus"]
    d, n = corpus_t.shape
    if n % n_shards != 0:
        raise ValueError(f"corpus cols {n} not divisible by corpus axis {n_shards}")
    shard_n = n // n_shards
    if mask is None:
        mask = jnp.zeros((1, n), jnp.float32)

    def per_shard(q, ct, m):
        # ct: (d, shard_n) local block; global ids = axis_index * shard_n + local
        idx = jax.lax.axis_index("corpus")
        s = jnp.dot(q, ct.astype(jnp.float32),
                    preferred_element_type=jnp.float32) + m
        ls, li = _local_topk(s, min(k, shard_n))
        gi = li + idx * shard_n
        # allgather (score, id) pairs over the corpus axis: the ONE collective
        all_s = jax.lax.all_gather(ls, "corpus", axis=0)   # (S, b, k)
        all_i = jax.lax.all_gather(gi, "corpus", axis=0)
        b = q.shape[0]
        cat_s = jnp.transpose(all_s, (1, 0, 2)).reshape(b, -1)
        cat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, -1)
        return _merge_sorted(cat_s, cat_i, k)

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(None, "corpus"), P(None, "corpus")),
        out_specs=(P(), P()), check_vma=False)
    return fn(jnp.asarray(queries, jnp.float32), corpus_t, mask)


class ShardedDenseIndex:
    """Multi-chip dense index: corpus columns live sharded across the mesh's
    'corpus' axis; queries replicate; one all_gather on the query path."""

    def __init__(self, mesh: Mesh, dim: int, tile_n: int = 1024,
                 normalize: bool = True, dtype: str = "bfloat16"):
        self.mesh = mesh
        self.dim = dim
        self.tile_n = tile_n
        self.normalize = normalize
        self.dtype = dtype
        self.n = 0
        self.capacity = 0
        self.dead: set = set()
        self._corpus_t: Optional[jnp.ndarray] = None
        self._mask: Optional[jnp.ndarray] = None
        self._jdtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]

    @property
    def _shards(self) -> int:
        return self.mesh.shape["corpus"]

    def _sharding(self):
        return NamedSharding(self.mesh, P(None, "corpus"))

    def _unit(self) -> int:
        """Capacity growth unit: keep shards tile-aligned."""
        return self.tile_n * self._shards

    def add(self, vectors: np.ndarray) -> List[int]:
        v = np.asarray(vectors, np.float32)
        m = v.shape[0]
        if m == 0:
            return []
        if self.normalize:
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        need = self.n + m
        if need > self.capacity:
            new_cap = max(self._unit(), self.capacity)
            while new_cap < need:
                new_cap *= 2
            # rebuild host-side then re-place sharded (adds are batchy; the
            # amortized cost matches the single-chip index)
            old = np.zeros((self.dim, new_cap), np.float32)
            old_mask = np.full((1, new_cap), NEG_INF, np.float32)
            if self._corpus_t is not None:
                old[:, :self.capacity] = np.asarray(self._corpus_t, np.float32)
                old_mask[:, :self.capacity] = np.asarray(self._mask)
            self.capacity = new_cap
            self._corpus_t = jax.device_put(old.astype(self._jdtype),
                                            self._sharding())
            self._mask = jax.device_put(old_mask, self._sharding())
        host = np.array(self._corpus_t, np.float32)  # writable copy
        host[:, self.n:self.n + m] = v.T
        hmask = np.array(self._mask)
        hmask[0, self.n:self.n + m] = 0.0
        self._corpus_t = jax.device_put(host.astype(self._jdtype), self._sharding())
        self._mask = jax.device_put(hmask, self._sharding())
        rows = list(range(self.n, self.n + m))
        self.n += m
        return rows

    def delete_rows(self, rows) -> None:
        rows = [int(r) for r in rows if 0 <= int(r) < self.n]
        if not rows:
            return
        self.dead.update(rows)
        hmask = np.asarray(self._mask).copy()
        hmask[0, rows] = NEG_INF
        self._mask = jax.device_put(hmask, self._sharding())

    def search(self, queries: np.ndarray, k: int) -> List[List[Tuple[int, float]]]:
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self.n == 0:
            return [[] for _ in range(q.shape[0])]
        if self.normalize:
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        kk = min(k, self.n)
        s, i = sharded_topk(self.mesh, jnp.asarray(q), self._corpus_t, kk,
                            mask=self._mask)
        s = np.asarray(s)
        i = np.asarray(i)
        return [[(int(ix), float(sv)) for ix, sv in zip(i[r], s[r])
                 if sv > NEG_INF / 2]
                for r in range(q.shape[0])]


# ---------------------------------------------------------------------------
# Corpus-sharded BM25 scoring (the sparse engine's multi-chip path)
# ---------------------------------------------------------------------------

def sharded_bm25_topk(mesh: Mesh, qsel, head, docs_cat, con_cat, qid_cat,
                      mask, k: int, nq: int, cap: int):
    """BM25 top-k with the contribution head matrix and tombstone mask
    column-sharded over the 'corpus' axis.

    Inputs match retrieval.sparse._bm25_score_topk: qsel (nq, H) one-hot
    (replicated), head (H, cap), tail stream docs/con/qid (replicated —
    tiny), mask (cap,). Each shard scores its column range (head matmul +
    the tail postings that fall inside it), takes a local top-k with global
    ids, and one all_gather + two-key merge yields the exact global result
    (ties to the lowest doc id)."""
    import jax.numpy as jnp

    n_shards = mesh.shape["corpus"]
    if cap % n_shards != 0:
        raise ValueError(f"cap {cap} not divisible by corpus axis {n_shards}")
    shard_cap = cap // n_shards

    def per_shard(qsel_l, head_l, docs_l, con_l, qid_l, mask_l):
        idx = jax.lax.axis_index("corpus")
        lo = idx * shard_cap
        scores = jnp.zeros((nq, shard_cap + 1), jnp.float32)
        scores = scores.at[:, :shard_cap].add(
            jnp.dot(qsel_l, head_l, preferred_element_type=jnp.float32))
        local = docs_l - lo
        in_range = (local >= 0) & (local < shard_cap)
        local = jnp.where(in_range, local, shard_cap)  # spill slot
        contrib = jnp.where(in_range, con_l, 0.0)
        flat = scores.reshape(-1)
        flat = flat.at[qid_l * (shard_cap + 1) + local].add(contrib)
        scores = flat.reshape(nq, shard_cap + 1)[:, :shard_cap] + mask_l[None, :]
        kk = min(k, shard_cap)
        ls, li = jax.lax.top_k(scores, kk)
        gi = li + lo
        all_s = jax.lax.all_gather(ls, "corpus", axis=0)
        all_i = jax.lax.all_gather(gi, "corpus", axis=0)
        cat_s = jnp.transpose(all_s, (1, 0, 2)).reshape(nq, -1)
        cat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(nq, -1)
        return _merge_sorted(cat_s, cat_i, k)

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(None, "corpus"), P(), P(), P(), P("corpus")),
        out_specs=(P(), P()), check_vma=False)
    return fn(qsel, head, docs_cat, con_cat, qid_cat, mask)
