"""Offline generative evaluation — Ragas-style dataset builder.

Parity with the reference's ``server/Ragas_eval.py``: sample chunks,
LLM-generate (question, ground-truth) pairs with the pipeline's own
backend, run the real pipeline per question (rewrite loop disabled,
``Ragas_eval.py:21``), and save the dataset
``{question, answer, contexts, ground_truth}`` (``Ragas_eval.py:137-146``).

Usage: python scripts/ragas_eval.py [--env-file .env] [--out ragas_dataset]
       [--sample-size N] [--qa-pairs N] [--platform cpu|tpu]
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
    parser.add_argument("--out", default="ragas_dataset")
    parser.add_argument("--sample-size", type=int, default=None)
    parser.add_argument("--qa-pairs", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from ragmeup_tpu.utils.platform import ensure_platform
    ensure_platform(args.platform)
    from ragmeup_tpu.config import load_config
    from ragmeup_tpu.pipeline.system import RagSystem
    from ragmeup_tpu.eval.generative import build_eval_dataset

    cfg = load_config(env_file=args.env_file)
    cfg.pipeline.use_rewrite_loop = False  # Ragas_eval.py:21
    system = RagSystem(cfg)
    dataset = build_eval_dataset(system, args.sample_size, args.qa_pairs,
                                 seed=args.seed)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "dataset.jsonl")
    with open(path, "w", encoding="utf-8") as f:
        for row in dataset:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    print(f"saved {len(dataset)} rows to {path}")
    try:  # also save as a HF Dataset when the library is available
        import datasets
        datasets.Dataset.from_list(dataset).save_to_disk(
            os.path.join(args.out, "hf_dataset"))
        print(f"saved HF dataset to {os.path.join(args.out, 'hf_dataset')}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
