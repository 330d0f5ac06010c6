"""End-to-end product smoke at real 8B scale on one chip.

Builds a RagSystem exactly as a reference migrant would — .env-style
config pointing at a real Llama-3.1-8B-layout checkpoint — ingests a
small corpus, starts the HTTP server, and drives /chat, /search,
/add_document over the wire. Proves the WHOLE stack (ingest → hybrid
retrieval → prompt assembly → batched 8B generation → provenance-less
reply contract) on hardware, not just its pieces.

Usage: python scripts/e2e_8b_smoke.py --ckpt /tmp/ckpt8b
(Provision the checkpoint first: python scripts/make_synthetic_8b.py)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/ckpt8b")
    ap.add_argument("--port", type=int, default=5099)
    args = ap.parse_args()

    if not os.path.isdir(args.ckpt):
        raise SystemExit(f"{args.ckpt} missing — run "
                         "scripts/make_synthetic_8b.py first")

    from ragmeup_tpu.utils import ensure_platform
    backend = ensure_platform()
    print(f"backend: {backend}", file=sys.stderr)

    work = tempfile.mkdtemp(prefix="e2e8b_")
    data = os.path.join(work, "docs")
    os.makedirs(data)
    docs = {
        "mesh.txt": "The corpus shards over the mesh corpus axis. "
                    "Retrieval merges per-shard top-k with one allgather.",
        "decode.txt": "The decoder streams int8 weights through a fused "
                      "pallas dequant matmul at 93 tokens per second.",
        "paging.txt": "KV pages hold 128 tokens each; chunked prefill "
                      "writes prompt keys straight into the pool.",
    }
    for name, text in docs.items():
        with open(os.path.join(data, name), "w") as f:
            f.write(text)

    from ragmeup_tpu.config import load_config
    cfg = load_config(overrides={
        "data": {"data_directory": data,
                 "index_directory": os.path.join(work, "index")},
        "model": {"llm_checkpoint": args.ckpt, "quantization": "int8",
                  "head_quantization": "int8", "embedding_dim": 128},
        "retrieval": {"rerank": False, "vector_store_k": 2},
        "pipeline": {"use_provenance": False, "use_rewrite_loop": False,
                     "use_re2": False},
        "server": {"batched_llm": True, "kv_pages": 64,
                   "kv_page_size": 128},
    })

    from ragmeup_tpu.pipeline.system import RagSystem
    t0 = time.time()
    system = RagSystem(cfg)
    print(f"system up (load+ingest+index): {time.time() - t0:.0f}s")

    from ragmeup_tpu.server.app import create_wsgi_app
    from werkzeug.serving import make_server
    app = create_wsgi_app(cfg, system=system)
    srv = make_server("127.0.0.1", args.port, app, threaded=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{args.port}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=1800) as r:
            return json.loads(r.read())

    docs_listed = json.loads(urllib.request.urlopen(
        base + "/get_documents", timeout=60).read())
    assert len(docs_listed) == 3, docs_listed
    print("GET /get_documents ok:", docs_listed)

    hits = post("/search", {"query": "how fast does the decoder stream"})
    assert hits["documents"], hits
    print("POST /search ok:", [d["s"] for d in hits["documents"]])

    t0 = time.time()
    out = post("/chat", {"prompt": "how many tokens fit in a KV page?",
                         "history": [], "docs": []})
    dt = time.time() - t0
    assert isinstance(out["reply"], str)
    assert out["documents"], "chat must attach retrieved documents"
    print(f"POST /chat ok in {dt:.1f}s (incl first-compile); "
          f"{len(out['reply'])} chars, "
          f"docs={[d['s'] for d in out['documents']]}")

    t0 = time.time()
    out = post("/chat", {"prompt": "what merges the per-shard top-k?",
                         "history": out["history"], "docs": []})
    print(f"POST /chat (warm) ok in {time.time() - t0:.1f}s")

    # greedy short answer through the product backend -> speculative
    # WAVES in the engine (per-row 2-gram drafts; the solo-only fast path
    # and its cap are gone). (/chat takes sampling knobs from config,
    # reference parity, so this leg drives the same BatchedChatBackend
    # object directly.)
    t0 = time.time()
    reply = system.backend.chat(
        [{"role": "user", "content": "name the page size."}],
        max_new_tokens=128, temperature=0.0, repetition_penalty=1.1)
    print(f"backend greedy chat (speculative waves) ok in "
          f"{time.time() - t0:.1f}s, {len(reply)} chars")
    srv.shutdown()
    print("E2E 8B SMOKE PASS")


if __name__ == "__main__":
    main()
