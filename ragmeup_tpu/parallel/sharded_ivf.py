"""IVF cluster pruning over a corpus-sharded mesh (round-3 verdict #9).

Single-chip IVF (retrieval/ivf.py) is the single-query-latency lever for
very large corpora — exactly the corpora that shard over the 'corpus'
mesh axis. This view shards the CLUSTER layout instead of raising:

- **layout**: the (K, C_pad, d) bucket tensor, row ids, and validity mask
  shard their leading cluster axis over 'corpus' (each device owns K/D
  whole clusters — bucket gathers stay device-local); centroids shard the
  same way, so centroid scoring is a small local matmul per shard.
- **search**: one shard_map program — each device probes its own top-
  ``nprobe`` local clusters (the probed union is a superset of the global
  top-``nprobe``, so recall at equal nprobe is ≥ the single-chip view),
  scores the gathered buckets, takes a local top-k, and the (score, row)
  pairs allgather-merge with the same two-key sort the exact sharded
  path uses (ties to the lowest row id — parallel/sharded_index.py).
- HBM traffic per query per device: ``nprobe · C_pad`` rows instead of
  the shard's full corpus — the same pruning ratio as single-chip IVF.

The view keeps ``IVFDenseView``'s lazy-refresh contract over the mutable
``ShardedDenseIndex`` (system of record for CRUD/persistence/row ids).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ragmeup_tpu.ops.topk import NEG_INF
from ragmeup_tpu.parallel.mesh import shard_map_compat
from ragmeup_tpu.parallel.sharded_index import _merge_sorted


@functools.partial(jax.jit, static_argnames=("mesh", "k", "nprobe"))
def _sharded_ivf_search(mesh, q, centroids, cmask, buckets, row_ids, valid,
                        k: int, nprobe: int):
    """q (b, d) replicated; centroids (K_pad, d), cmask (K_pad, 1),
    buckets (K_pad, C, d), row_ids/valid (K_pad, C) — all sharded on the
    leading cluster axis. Returns (scores (b, k), rows (b, k)), -1 rows
    for empty slots."""

    def per_shard(q, cents, cm, bks, rws, vld):
        kl = cents.shape[0]
        cs = q @ cents.T                                   # (b, Kl)
        cs = jnp.where(cm[None, :, 0] > 0, cs, NEG_INF)
        np_l = min(nprobe, kl)
        _, probe = jax.lax.top_k(cs, np_l)                 # (b, P)
        cand_vecs = bks[probe]                             # (b, P, C, d)
        cand_rows = rws[probe]                             # (b, P, C)
        cand_valid = vld[probe]
        s = jnp.einsum("bd,bpcd->bpc", q, cand_vecs,
                       preferred_element_type=jnp.float32)
        s = jnp.where(cand_valid, s, NEG_INF).reshape(q.shape[0], -1)
        rows_flat = cand_rows.reshape(q.shape[0], -1)
        kk = min(k, s.shape[1])
        ls, lr = _merge_sorted(s, rows_flat, kk)
        if kk < k:
            ls = jnp.pad(ls, ((0, 0), (0, k - kk)),
                         constant_values=NEG_INF)
            lr = jnp.pad(lr, ((0, 0), (0, k - kk)), constant_values=-1)
        all_s = jax.lax.all_gather(ls, "corpus", axis=0)   # (D, b, k)
        all_r = jax.lax.all_gather(lr, "corpus", axis=0)
        b = q.shape[0]
        cat_s = jnp.transpose(all_s, (1, 0, 2)).reshape(b, -1)
        cat_r = jnp.transpose(all_r, (1, 0, 2)).reshape(b, -1)
        return _merge_sorted(cat_s, cat_r, k)

    shard = P("corpus", None)
    shard3 = P("corpus", None, None)
    fn = shard_map_compat(
        per_shard, mesh=mesh,
        in_specs=(P(), shard, shard, shard3, shard, shard),
        out_specs=(P(), P()))
    return fn(q, centroids, cmask, buckets, row_ids, valid)


class ShardedIVFView:
    """Lazily-refreshed sharded IVF view over a ``ShardedDenseIndex``.

    Same (row, score) search contract as ``IVFDenseView`` (including MMR
    over the top-``fetch_k``), so ``HybridRetriever`` wires either view
    behind the one ``ann="ivf"`` knob."""

    def __init__(self, dense, mesh, nprobe: int = 8, n_clusters: int = 0,
                 seed: int = 0):
        self.dense = dense
        self.mesh = mesh
        self.nprobe = nprobe
        self.n_clusters = n_clusters or None
        self.seed = seed
        self._rows = np.zeros(0, np.int64)
        self._stamp = None
        self._centroids = None
        self._cmask = None
        self._buckets = None
        self._row_ids = None
        self._valid = None

    def _refresh(self) -> None:
        stamp = (self.dense.n, len(self.dense.dead))
        if self._centroids is not None and stamp == self._stamp:
            return
        from ragmeup_tpu.retrieval.ivf import IVFIndex
        host = self.dense.host_vectors()
        live = [r for r in range(self.dense.n) if r not in self.dense.dead]
        self._rows = np.asarray(live, np.int64)
        self._stamp = stamp
        if not live:
            self._centroids = None
            return
        ivf = IVFIndex(n_clusters=self.n_clusters,
                       normalize=self.dense.normalize, seed=self.seed)
        ivf.fit(host[live].astype(np.float32))
        cents = np.asarray(ivf.centroids, np.float32)
        bks = np.asarray(ivf.buckets, np.float32)
        rws = np.asarray(ivf.row_ids)
        vld = np.asarray(ivf.valid)
        K, C, d = bks.shape
        D = self.mesh.shape["corpus"]
        K_pad = -(-K // D) * D
        if K_pad != K:
            cents = np.pad(cents, ((0, K_pad - K), (0, 0)))
            bks = np.pad(bks, ((0, K_pad - K), (0, 0), (0, 0)))
            rws = np.pad(rws, ((0, K_pad - K), (0, 0)),
                         constant_values=-1)
            vld = np.pad(vld, ((0, K_pad - K), (0, 0)))
        cmask = np.zeros((K_pad, 1), np.float32)
        cmask[:K] = 1.0
        dt = self._jdtype()
        sh2 = NamedSharding(self.mesh, P("corpus", None))
        sh3 = NamedSharding(self.mesh, P("corpus", None, None))
        self._centroids = jax.device_put(cents.astype(dt), sh2)
        self._cmask = jax.device_put(cmask, sh2)
        self._buckets = jax.device_put(bks.astype(dt), sh3)
        self._row_ids = jax.device_put(rws.astype(np.int32), sh2)
        self._valid = jax.device_put(vld, sh2)

    def _jdtype(self):
        return {"float32": np.float32, "bfloat16": jnp.bfloat16,
                "int8": jnp.bfloat16}[self.dense.dtype]

    def search(self, queries: np.ndarray, k: int,
               search_type: str = "similarity", fetch_k: int = 20,
               mmr_lambda: float = 0.5) -> List[List[Tuple[int, float]]]:
        self._refresh()
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self._rows.size == 0 or self._centroids is None:
            return [[] for _ in range(q.shape[0])]
        if self.dense.normalize:
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                               1e-12)
        kk = min(fetch_k if search_type == "mmr" else k, self._rows.size)
        s, r = _sharded_ivf_search(
            self.mesh, jnp.asarray(q, self._buckets.dtype),
            self._centroids, self._cmask, self._buckets, self._row_ids,
            self._valid, k=kk, nprobe=self.nprobe)
        s = np.asarray(s)
        r = np.asarray(r)
        out: List[List[Tuple[int, float]]] = []
        for i in range(q.shape[0]):
            live = [(int(self._rows[p]), float(si))
                    for p, si in zip(r[i], s[i])
                    if p >= 0 and si > NEG_INF / 2]
            if search_type == "mmr" and live:
                from ragmeup_tpu.ops.fusion import mmr_select
                cand = self.dense.gather_rows([rw for rw, _ in live])
                chosen = mmr_select(q[i], cand, k, mmr_lambda)
                live = [live[c] for c in chosen]
            out.append(live[:k])
        return out
