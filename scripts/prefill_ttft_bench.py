"""TTFT under concurrent arrivals: batched chunked prefill vs serialized.

Round-2 verdict #7's done-criterion: time-to-first-token for 4 simultaneous
2048-token prompts should be ≈ one solo TTFT, not 4x (the reference stack —
RAGHelper_local.py one-generation-at-a-time — serializes by construction).

Builds the zero-weight 8B int8 decoder (identical FLOPs/HBM traffic to a
real checkpoint), admits prompts through the serving engine's chunked paged
prefill, and measures wall time from arrival to every row's first-token
logits fetch (``add_request``/``add_requests`` return after the packed
top-k fetch, which synchronizes):

  solo        — one 2048-token prompt through add_request (batch-1 chunks)
  batched x4  — four prompts through add_requests (one dispatch per chunk
                for the whole group)
  serial x4   — four prompts through sequential add_request calls (what
                the worker loop did before the batched writer)

Usage: python scripts/prefill_ttft_bench.py [--prompt-len 2048] [--seqs 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine_8b_bench import build_llm  # noqa: E402  (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt-len", type=int, default=2048)
    ap.add_argument("--seqs", type=int, default=4)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from ragmeup_tpu.utils.platform import ensure_platform
    backend = ensure_platform(args.platform)
    print(f"backend: {backend}", file=sys.stderr)

    from ragmeup_tpu.pipeline.serving import ServingEngine

    llm = build_llm()
    n, b = args.prompt_len, args.seqs
    page_size = 128
    per_seq = -(-(n + 64) // page_size)
    rng = np.random.default_rng(0)

    def fresh():
        return ServingEngine(llm, num_pages=b * per_seq + 8,
                             page_size=page_size,
                             max_pages_per_seq=per_seq, max_batch=b)

    def reqs(count):
        return [{"id": i, "prompt_ids": list(rng.integers(5, 100000, n)),
                 "max_new": 16, "temperature": 0.0, "rp": 1.0}
                for i in range(count)]

    # compile every program variant once (chunk/final x batch-1, group x b)
    e = fresh()
    e.add_request(900, list(rng.integers(5, 100000, n)), max_new_tokens=16,
                  temperature=0.0, repetition_penalty=1.0)
    e = fresh()
    e.add_requests(reqs(b))

    def timed(label, fn):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        print(f"  {label}: {dt * 1e3:.0f} ms", file=sys.stderr)
        return dt

    e = fresh()
    solo = timed("solo TTFT", lambda: e.add_request(
        0, list(rng.integers(5, 100000, n)), max_new_tokens=16,
        temperature=0.0, repetition_penalty=1.0))

    e = fresh()
    batched = timed(f"batched x{b} TTFT (all rows)",
                    lambda: e.add_requests(reqs(b)))

    e = fresh()

    def serial():
        for r in reqs(b):
            e.add_request(r["id"], r["prompt_ids"], max_new_tokens=16,
                          temperature=0.0, repetition_penalty=1.0)
    ser = timed(f"serial x{b} (last row's TTFT)", serial)

    print("prefill TTFT @%d tokens: solo %.0f ms; %d concurrent batched "
          "%.0f ms (%.2fx solo); serialized %.0f ms (%.2fx solo)"
          % (n, solo * 1e3, b, batched * 1e3, batched / solo,
             ser * 1e3, ser / solo))


if __name__ == "__main__":
    main()
