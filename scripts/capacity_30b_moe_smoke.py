"""int4-MoE capacity proof: a ~28B-total sparse-MoE on ONE 16 GB chip.

Round-3 verdict #7: the "~28B-total MoE fits one chip at int4" claim was
arithmetic, not a run. This drives a Qwen3-30B-A3B-layout checkpoint
(44 layers x 128 experts — 27.9B params, 56 GB bf16 on disk; provision
with scripts/make_synthetic_30b_moe.py --layers 44) through the
STREAMING int4 loader into a full RagSystem, serves /chat over HTTP,
and slope-times decode. Records: load wall time, device memory, tok/s,
and a mini-soak (sequential /chat turns, 0 errors).

int4_group=512 keeps the group scales at 1/4 the default (the capacity
knob documented in CLAUDE.md); the head quantizes int8.

Usage: python scripts/capacity_30b_moe_smoke.py [--ckpt /tmp/ckpt30bmoe]
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
    ap.add_argument("--ckpt", default="/tmp/ckpt30bmoe")
    ap.add_argument("--port", type=int, default=5098)
    ap.add_argument("--turns", type=int, default=6)
    args = ap.parse_args()
    if not os.path.isdir(args.ckpt):
        raise SystemExit(f"{args.ckpt} missing — run "
                         "scripts/make_synthetic_30b_moe.py --layers 44")

    from ragmeup_tpu.utils import ensure_platform
    print(f"backend: {ensure_platform()}", file=sys.stderr)

    work = tempfile.mkdtemp(prefix="cap30b_")
    data = os.path.join(work, "docs")
    os.makedirs(data)
    for name, text in {
        "experts.txt": "Each MoE layer routes every token to eight of its "
                       "one hundred twenty eight experts.",
        "memory.txt": "Packed int4 experts store two weights per byte "
                      "with group-wise scales every 512 inputs.",
    }.items():
        with open(os.path.join(data, name), "w") as f:
            f.write(text)

    from ragmeup_tpu.config import load_config
    cfg = load_config(overrides={
        "data": {"data_directory": data,
                 "index_directory": os.path.join(work, "index")},
        "model": {"llm_checkpoint": args.ckpt, "quantization": "int4",
                  "head_quantization": "int8", "embedding_dim": 128,
                  "int4_group": 512},
        "generation": {"max_new_tokens": 48},
        "retrieval": {"rerank": False, "vector_store_k": 2},
        "pipeline": {"use_provenance": False, "use_rewrite_loop": False,
                     "use_re2": False},
        "server": {"batched_llm": True, "kv_pages": 48,
                   "kv_page_size": 128},
    })

    from ragmeup_tpu.pipeline.system import RagSystem
    t0 = time.time()
    system = RagSystem(cfg)
    t_load = time.time() - t0
    print(f"system up (56 GB ckpt -> int4 stream-load + ingest): "
          f"{t_load:.0f}s")
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        print(f"device memory in use: "
              f"{stats.get('bytes_in_use', 0) / 1e9:.1f} GB")
    except Exception as e:
        print(f"(memory_stats unavailable: {e})")

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
        with urllib.request.urlopen(req, timeout=3600) as r:
            return json.loads(r.read())

    t0 = time.time()
    out = post("/chat", {"prompt": "how many experts per token?",
                         "history": [], "docs": []})
    print(f"POST /chat ok in {time.time() - t0:.1f}s (incl first "
          f"compile); {len(out['reply'])} chars")

    errors = 0
    hist = out["history"]
    t0 = time.time()
    for i in range(args.turns):
        try:
            out = post("/chat", {"prompt": f"turn {i}: what stores two "
                                 "weights per byte?",
                                 "history": hist, "docs": []})
            hist = out["history"]
        except Exception as e:
            errors += 1
            print(f"turn {i} ERROR: {e}")
    print(f"mini-soak: {args.turns} turns in {time.time() - t0:.0f}s, "
          f"{errors} errors")

    # decode tok/s: greedy through the product backend (spec waves)
    be = system.backend
    t0 = time.time()
    reply = be.chat([{"role": "user", "content": "count upward."}],
                    max_new_tokens=96, temperature=0.0,
                    repetition_penalty=1.0)
    dt = time.time() - t0
    ntok = len(system.llm.tokenizer.encode(reply))
    print(f"backend greedy 96-token request: {dt:.1f}s "
          f"({ntok / max(dt, 1e-9):.1f} tok/s incl prefill)")
    print("engine stats:", be.latency_stats())
    srv.shutdown()
    assert errors == 0
    print("CAPACITY 30B-MOE INT4 SMOKE PASS")


if __name__ == "__main__":
    main()
