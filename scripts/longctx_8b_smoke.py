"""Long-context RAG at 8B: a 16k-32k-token prompt through /chat.

Round-2 verdict #8: the reference AVOIDS long context by truncating the
document list (RAGHelper_cloud.py:188-195 combine-and-limit); with the
8192 clamp dropped (rope computed at the requested positions, KV paged)
this framework can instead FEED the model more retrieved context. This
smoke proves it end-to-end on hardware: many long chunks retrieved, a
16k+-token prompt assembled, chunked paged prefill filling hundreds of KV
pages, and a coherent decode — all through the public HTTP surface.

Usage: python scripts/longctx_8b_smoke.py [--ckpt /tmp/ckpt8b]
       [--target-tokens 16384] [--port 5098]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ("mesh corpus shard allgather merge page pool decode wave int8 "
         "kernel scale rope position flash prefill chunk scatter logits "
         "token stream bandwidth tile lane sublane collective").split()


def long_doc(i: int, n_words: int) -> str:
    """Distinct long prose with one recoverable fact per doc."""
    import random
    rng = random.Random(i)
    body = " ".join(rng.choice(WORDS) for _ in range(n_words))
    fact = f"Document {i} records that subsystem-{i} completes in {i * 7} ms."
    return f"{fact}\n\n{body}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/ckpt8b")
    ap.add_argument("--target-tokens", type=int, default=16384)
    ap.add_argument("--docs", type=int, default=14)
    ap.add_argument("--port", type=int, default=5098)
    args = ap.parse_args()

    if not os.path.isdir(args.ckpt):
        raise SystemExit(f"{args.ckpt} missing — run "
                         "scripts/make_synthetic_8b.py first")

    from ragmeup_tpu.utils import ensure_platform
    backend = ensure_platform()
    print(f"backend: {backend}", file=sys.stderr)

    work = tempfile.mkdtemp(prefix="longctx8b_")
    data = os.path.join(work, "docs")
    os.makedirs(data)
    # ~1.05x prompt-target tokens of document text split over the doc set
    # (measured ≈1.08 tokens/word on this corpus vocabulary with the 8B
    # tokenizer) — the assembled prompt lands just past the target WITHOUT
    # hitting the engine's page-budget truncation
    n_words = max(300, int(args.target_tokens * 1.05 / 1.08 / args.docs))
    for i in range(args.docs):
        with open(os.path.join(data, f"doc{i:02d}.txt"), "w") as f:
            f.write(long_doc(i, n_words))

    page = 128
    max_seq = max(args.target_tokens * 2, 8192)
    pages_per_seq = -(-(args.target_tokens + 4096) // page)
    from ragmeup_tpu.config import load_config
    cfg = load_config(overrides={
        "data": {"data_directory": data,
                 "index_directory": os.path.join(work, "index"),
                 # one chunk per long doc: retrieval returns LONG contexts
                 "chunk_size": 80000, "chunk_overlap": 0},
        "model": {"llm_checkpoint": args.ckpt, "quantization": "int8",
                  "head_quantization": "int8", "embedding_dim": 128,
                  "llm_max_seq_len": max_seq},
        "retrieval": {"rerank": False, "vector_store_k": args.docs,
                      "max_document_limit": args.docs,
                      "search_type": "similarity"},
        "pipeline": {"use_provenance": False, "use_rewrite_loop": False,
                     "use_re2": False},
        "server": {"batched_llm": True, "kv_pages": pages_per_seq + 16,
                   "kv_page_size": page,
                   "kv_max_pages_per_seq": pages_per_seq},
    })

    from ragmeup_tpu.pipeline.system import RagSystem
    t0 = time.time()
    system = RagSystem(cfg)
    print(f"system up (load+ingest+index): {time.time() - t0:.0f}s",
          file=sys.stderr)

    from werkzeug.serving import make_server

    from ragmeup_tpu.server.app import create_wsgi_app
    app = create_wsgi_app(cfg, system=system)
    srv = make_server("127.0.0.1", args.port, app, threaded=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{args.port}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=3600) as r:
            return json.loads(r.read())

    t0 = time.time()
    out = post("/chat", {"prompt": "which subsystem completes fastest, and "
                         "what merges the per-shard top-k?",
                         "history": [], "docs": []})
    dt = time.time() - t0
    n_prompt = getattr(system.backend, "last_prompt_tokens", -1)
    n_docs = len(out["documents"])
    assert isinstance(out["reply"], str) and out["documents"], out
    assert n_prompt >= args.target_tokens * 3 // 4, \
        f"prompt only {n_prompt} tokens — raise --docs or doc length"
    print(f"long-context /chat: prompt={n_prompt} tokens over {n_docs} "
          f"retrieved chunks, first call {dt:.1f}s (incl compile)")

    t0 = time.time()
    out = post("/chat", {"prompt": "what rides the ICI during retrieval?",
                         "history": [], "docs": []})
    dt_warm = time.time() - t0
    n_prompt = getattr(system.backend, "last_prompt_tokens", -1)
    print(f"long-context /chat (warm): prompt={n_prompt} tokens, "
          f"{dt_warm:.1f}s end-to-end, reply {len(out['reply'])} chars")

    # Second turn of the SAME thread (round-3 verdict #3 "done" criterion):
    # turn 1's retirement registered its full pages (prompt + generated) in
    # the hash-block prefix cache, and turn 2's assembled prompt — system +
    # docs + turn-1 user + turn-1 assistant + new question — shares that
    # prefix, so both of turn 2's forwards (fetch-new decision, generation)
    # should re-prefill only the short tail instead of the whole 16k thread.
    def get(path):
        with urllib.request.urlopen(base + path, timeout=600) as r:
            return json.loads(r.read())

    pc0 = get("/stats").get("prefix_cache", {})
    t0 = time.time()
    out2 = post("/chat", {"prompt": "and which subsystem is slowest?",
                          "history": out["history"],
                          "docs": out["documents"]})
    dt2 = time.time() - t0
    pc1 = get("/stats").get("prefix_cache", {})
    hits = pc1.get("page_hits", 0) - pc0.get("page_hits", 0)
    n_prompt2 = getattr(system.backend, "last_prompt_tokens", -1)
    assert isinstance(out2["reply"], str)
    print(f"second-turn /chat (prefix cache): prompt={n_prompt2} tokens, "
          f"fetched_new={out2['fetched_new_documents']}, "
          f"{dt2:.1f}s end-to-end vs {dt_warm:.1f}s full-prefill turn, "
          f"{hits} cached pages reused across its forwards "
          f"(~{hits * page} prompt tokens skipped prefill)")
    if not out2["fetched_new_documents"]:
        # follow-up threads extend the previous turn's registered token
        # stream (rag.py _build_thread), so the generate forward must have
        # reused the prior thread's pages
        assert hits > 0, "no-fetch follow-up reused 0 cached pages"
    srv.shutdown()
    print("LONGCTX 8B SMOKE PASS")


if __name__ == "__main__":
    main()
