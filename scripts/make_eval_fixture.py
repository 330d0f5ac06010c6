"""Reproducible answer-quality eval fixture (round-3 verdict #8).

Writes a small factual corpus + fixed QA pairs + a ready .env so
``scripts/deepeval_eval.py --pairs-file`` evaluates the REAL pipeline
(retrieval + rerank + generation at 8B on-chip) with metrics that are
meaningful independent of the generator checkpoint's text quality:
contextual precision/recall/relevancy score the actual retrieval against
known target facts; answer metrics score whatever the model says.

No network egress exists here, so the only 8B checkpoint is
scripts/make_synthetic_8b.py's random-weight layout — answer-side scores
of such a model are an honest floor, while the retrieval-side scores are
real measurements of the product pipeline (see docs/BENCH_NOTES.md
"Answer-quality eval run").

Usage: python scripts/make_eval_fixture.py [--out /tmp/evalfix]
       [--ckpt /tmp/ckpt8b]
"""

from __future__ import annotations

import argparse
import json
import os

SUBSYSTEMS = [
    ("hydra scheduler", "reduces queue latency by 41 percent",
     "released in version 3.2"),
    ("falcon allocator", "cuts fragmentation to under 2 percent",
     "released in version 1.9"),
    ("osprey compiler", "shortens build times by 27 percent",
     "released in version 7.0"),
    ("heron cache", "achieves a 93 percent hit rate",
     "released in version 2.4"),
    ("kestrel router", "sustains 18 gigabits per second",
     "released in version 5.1"),
    ("puffin encoder", "compresses logs 6 to 1",
     "released in version 4.3"),
    ("gannet indexer", "rebuilds indexes in 12 minutes",
     "released in version 8.8"),
    ("avocet profiler", "samples stacks every 250 microseconds",
     "released in version 0.9"),
    ("dunlin balancer", "spreads load within 3 percent of even",
     "released in version 6.6"),
    ("sanderling tracer", "adds under 1 percent overhead",
     "released in version 2.2"),
    ("turnstone verifier", "proves 88 percent of assertions",
     "released in version 3.7"),
    ("godwit archiver", "stores seven years of history",
     "released in version 1.1"),
]

FILLER = ("It integrates with the deployment pipeline, reports to the "
          "central dashboard, and is maintained by the platform team. "
          "Operational runbooks cover upgrades, rollback, and capacity "
          "planning for it. ")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/evalfix")
    ap.add_argument("--ckpt", default="/tmp/ckpt8b")
    args = ap.parse_args()
    docs = os.path.join(args.out, "docs")
    os.makedirs(docs, exist_ok=True)

    for i, (name, perf, rel) in enumerate(SUBSYSTEMS):
        body = (f"The {name} {perf}. The {name} was {rel}. "
                + FILLER * 3)
        with open(os.path.join(docs, f"sub{i:02d}.txt"), "w") as f:
            f.write(body)

    qa = os.path.join(args.out, "qa.jsonl")
    with open(qa, "w", encoding="utf-8") as f:
        for name, perf, rel in SUBSYSTEMS[:8]:
            f.write(json.dumps({
                "question": f"What does the {name} do, and when was it "
                            "released?",
                "ground_truth": f"The {name} {perf}. It was {rel}.",
            }) + "\n")

    env = os.path.join(args.out, "eval.env")
    with open(env, "w") as f:
        f.write(f"""data_directory={docs}
vector_store_uri={os.path.join(args.out, 'index')}
llm_model={args.ckpt}
llm_quantization=int8
llm_head_quantization=int8
splitter=RecursiveCharacterTextSplitter
chunk_size=512
chunk_overlap=0
vector_store_k=4
rerank=True
rerank_k=3
use_rewrite_loop=False
use_re2=False
temperature=0
max_new_tokens=48
deepeval_sample_size=6
deepeval_qa_pairs=4
""")
    print(f"fixture ready: docs={docs} qa={qa} env={env}")
    print("run: PYTHONPATH=/root/repo:/root/.axon_site python "
          f"scripts/deepeval_eval.py --env-file {env} --pairs-file {qa} "
          "--judge local --out /tmp/deepeval_report.json")


if __name__ == "__main__":
    main()
