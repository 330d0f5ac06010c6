"""Offline generative evaluation with metric scoring + thresholds.

Parity with the reference's ``server/DeepEval_eval.py``: QA self-generation
then metric evaluation (answer relevancy, faithfulness, contextual
precision/recall/relevancy, hallucination — ``DeepEval_eval.py:43-51``)
against the configured thresholds (``.env.template:91-97``). Scoring uses
the framework's deterministic embedding metrics (``eval/metrics.py``) — no
external judge required.

Usage: python scripts/deepeval_eval.py [--env-file .env] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env-file", default=".env")
    parser.add_argument("--out", default="deepeval_report.json")
    parser.add_argument("--sample-size", type=int, default=None)
    parser.add_argument("--qa-pairs", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--pairs-file", default=None,
                        help="jsonl of fixed {question, ground_truth} "
                        "pairs (skips LLM self-generation)")
    parser.add_argument("--judge", choices=["none", "local"], default="none",
                        help="'local': add an llm_judge metric scored by "
                        "the system's own backend (the reference's "
                        "LLM-judged scoring with the local model as judge)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from ragmeup_tpu.utils.platform import ensure_platform
    ensure_platform(args.platform)
    from ragmeup_tpu.config import load_config
    from ragmeup_tpu.pipeline.system import RagSystem
    from ragmeup_tpu.eval.generative import evaluate_pairs, generate_qa_pairs

    cfg = load_config(env_file=args.env_file)
    system = RagSystem(cfg)
    if args.pairs_file:
        # fixed QA pairs (jsonl: {question, ground_truth[, context]}) —
        # reproducible eval of the REAL pipeline independent of the
        # generator model's QA-authoring quality
        with open(args.pairs_file, encoding="utf-8") as f:
            pairs = [json.loads(ln) for ln in f if ln.strip()]
        for p in pairs:
            p.setdefault("context", [])
    else:
        pairs = generate_qa_pairs(system,
                                  args.sample_size or cfg.eval.sample_size,
                                  args.qa_pairs or cfg.eval.qa_pairs,
                                  seed=args.seed)
    judge_fn = None
    if args.judge == "local":
        judge_fn = lambda p: system.backend.complete(  # noqa: E731
            p, max_new_tokens=8, temperature=0.0)
    results = evaluate_pairs(system, pairs, judge_fn=judge_fn)
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(results, f, ensure_ascii=False, indent=2)
    print(f"evaluated {len(results['pairs'])} QA pairs -> {args.out}")
    for metric, stats in results["summary"].items():
        print(f"  {metric:24s} mean={stats['mean']:.3f} "
              f"pass_rate={stats['pass_rate']:.2f}")


if __name__ == "__main__":
    main()
