"""Serving-path benchmark: per-stage latencies on real hardware.

Measures the BASELINE.md config ladder beyond the bench.py headline:

1. query embedding (MiniLM-class sentence encoder forward)
2. hybrid retrieval (fused dense+BM25+RRF, top vector_store_k)
3. cross-encoder rerank p50/p95 (query × top-k pairs, MiniLM-class trunk —
   BASELINE metric 3)
4. end-to-end retrieve→fuse→rerank latency

Models are random-init at the reference's real sizes (GIST-small-class
384-d/12-layer encoder, MiniLM-class cross-encoder) — identical FLOPs to
real checkpoints.

Usage: python scripts/serving_bench.py [--n 65536] [--reps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pct(xs, p):
    return float(np.percentile(np.asarray(xs) * 1e3, p))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=65536)
    parser.add_argument("--reps", type=int, default=30)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--rerank-k", type=int, default=3)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    from ragmeup_tpu.utils.platform import ensure_platform
    backend = ensure_platform(args.platform)
    print(f"backend: {backend}", file=sys.stderr)

    from bench import make_corpus
    from ragmeup_tpu.models.encoder import BertConfig, SentenceEncoder
    from ragmeup_tpu.models.cross_encoder import CrossEncoder
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer
    from ragmeup_tpu.retrieval.dense import DenseIndex
    from ragmeup_tpu.retrieval.sparse import BM25Index
    from ragmeup_tpu.retrieval.hybrid import hybrid_fused_search

    rng = np.random.default_rng(0)
    # GIST-small-class encoder: 384-d, 12 layers (the reference default)
    enc_cfg = BertConfig(vocab_size=30522, hidden_size=384, num_layers=12,
                         num_heads=12, intermediate_size=1536)
    encoder = SentenceEncoder(enc_cfg, SimpleTokenizer(enc_cfg.vocab_size))
    ce = CrossEncoder(enc_cfg, SimpleTokenizer(enc_cfg.vocab_size))

    print("building corpus + indexes...", file=sys.stderr)
    texts = make_corpus(args.n, 4096, 48, rng)
    vecs = rng.standard_normal((args.n, 384)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    dense = DenseIndex(384, dtype="bfloat16", tile_n=2048)
    dense.add(vecs)
    sparse = BM25Index()
    sparse.add(texts)
    sparse._flush()

    queries = make_corpus(args.reps + 5, 4096, 8, rng)
    doc_texts = texts[:64]

    # -- stage 1: query embedding --------------------------------------------
    encoder.encode(["warmup query"])
    t_embed = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        qv = encoder.encode([queries[i]])
        t_embed.append(time.perf_counter() - t0)

    # -- stage 2: hybrid retrieval -------------------------------------------
    qv0 = encoder.encode([queries[0]])
    hybrid_fused_search(dense, sparse, [queries[0]], qv0, args.k)  # compile
    t_retr = []
    hits = None
    for i in range(args.reps):
        qv = encoder.encode([queries[i]])
        t0 = time.perf_counter()
        hits = hybrid_fused_search(dense, sparse, [queries[i]], qv, args.k)[0]
        t_retr.append(time.perf_counter() - t0)

    # -- stage 3: cross-encoder rerank p50 (BASELINE metric 3) ----------------
    pairs = [(queries[0], doc_texts[j]) for j in range(args.k)]
    ce.score(pairs)  # compile
    t_rerank = []
    for i in range(args.reps):
        ps = [(queries[i], doc_texts[(i + j) % len(doc_texts)])
              for j in range(args.k)]
        t0 = time.perf_counter()
        ce.score(ps)
        t_rerank.append(time.perf_counter() - t0)

    # -- end to end: embed -> retrieve -> rerank ------------------------------
    t_e2e = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        qv = encoder.encode([queries[i]])
        rows = hybrid_fused_search(dense, sparse, [queries[i]], qv, args.k)[0]
        ps = [(queries[i], texts[r]) for r, _ in rows[:args.k]]
        if ps:
            ce.score(ps)
        t_e2e.append(time.perf_counter() - t0)

    # -- generation engine: concurrent decoding through the paged cache ----
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.pipeline.serving import ServingEngine
    lcfg = LlamaConfig(vocab_size=32000, hidden_size=1024, num_layers=4,
                       num_heads=8, num_kv_heads=4, intermediate_size=2816,
                       max_seq_len=2048, rope_theta=10000.0, use_flash=True)
    llm = LocalLLM(lcfg, SimpleTokenizer(lcfg.vocab_size), seed=0)

    def fresh_engine():
        e = ServingEngine(llm, num_pages=256, page_size=128,
                          max_pages_per_seq=8)
        erng = np.random.default_rng(0)
        for i in range(8):
            p = list(erng.integers(5, 30000, 150 + 10 * i))
            e.add_request(i, p, max_new_tokens=64, temperature=0.0,
                          repetition_penalty=1.0)
        return e

    fresh_engine().run_wave(steps_per_dispatch=8)  # compile
    eng = fresh_engine()
    t0 = time.perf_counter()
    out = eng.run_wave(steps_per_dispatch=8)
    e_dt = time.perf_counter() - t0
    e_tok = sum(len(v) for v in out.values())

    report = {
        "backend": backend, "corpus": args.n, "k": args.k,
        "query_embed_ms": {"p50": pct(t_embed, 50), "p95": pct(t_embed, 95)},
        "hybrid_retrieval_ms": {"p50": pct(t_retr, 50), "p95": pct(t_retr, 95)},
        "rerank_ms": {"p50": pct(t_rerank, 50), "p95": pct(t_rerank, 95)},
        "end_to_end_ms": {"p50": pct(t_e2e, 50), "p95": pct(t_e2e, 95)},
        "engine_tok_per_s": round(e_tok / e_dt, 1),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
