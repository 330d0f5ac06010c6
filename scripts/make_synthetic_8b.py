"""Write a full Llama-3.1-8B-LAYOUT checkpoint with random bf16 weights.

Exact HF tensor names, config.json (llama3 rope scaling, 131072 max
positions), generation_config.json — everything load_local_llm reads from
a real `save_pretrained` directory, at real scale (16 GB). No network
egress exists here, so this is how the at-scale product-path tests
(scripts/e2e_8b_smoke.py, the real-checkpoint rounds in BENCH_NOTES)
provision their input. Takes ~6 minutes / 16 GB of disk.

Usage: python scripts/make_synthetic_8b.py [--out /tmp/ckpt8b]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ckpt8b")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    d = args.out
    os.makedirs(d, exist_ok=True)

    cfg = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128256,
           "hidden_size": 4096, "intermediate_size": 14336,
           "num_hidden_layers": 32, "num_attention_heads": 32,
           "num_key_value_heads": 8, "max_position_embeddings": 131072,
           "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
           "tie_word_embeddings": False, "torch_dtype": "bfloat16",
           "rope_scaling": {"rope_type": "llama3", "factor": 8.0,
                            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                            "original_max_position_embeddings": 8192}}
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    with open(os.path.join(d, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": [128001, 128009]}, f)

    import ml_dtypes
    from safetensors.numpy import save_file
    rng = np.random.default_rng(args.seed)
    h, inter, v, kvh = 4096, 14336, 128256, 1024

    def t(shape, scale=0.02):
        return (rng.standard_normal(shape, dtype=np.float32) * scale).astype(
            ml_dtypes.bfloat16)

    t0 = time.time()
    tensors = {"model.embed_tokens.weight": t((v, h)),
               "model.norm.weight": np.ones(h, ml_dtypes.bfloat16),
               "lm_head.weight": t((v, h))}
    for i in range(32):
        p = f"model.layers.{i}."
        tensors[p + "self_attn.q_proj.weight"] = t((h, h))
        tensors[p + "self_attn.k_proj.weight"] = t((kvh, h))
        tensors[p + "self_attn.v_proj.weight"] = t((kvh, h))
        tensors[p + "self_attn.o_proj.weight"] = t((h, h))
        tensors[p + "mlp.gate_proj.weight"] = t((inter, h))
        tensors[p + "mlp.up_proj.weight"] = t((inter, h))
        tensors[p + "mlp.down_proj.weight"] = t((h, inter))
        tensors[p + "input_layernorm.weight"] = np.ones(h, ml_dtypes.bfloat16)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            h, ml_dtypes.bfloat16)
    save_file(tensors, os.path.join(d, "model.safetensors"))
    print(f"{d}: {sum(x.nbytes for x in tensors.values()) / 1e9:.1f} GB "
          f"written in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
