"""Write a Qwen3-30B-A3B-LAYOUT sparse-MoE checkpoint with random weights.

Exact HF Qwen3-MoE tensor names and config.json — everything
load_local_llm reads from a real `save_pretrained` directory, at real
scale: 48 layers x 128 experts x (3 x 2048 x 768) + attention ≈ 30.5B
params ≈ 61 GB bf16 on disk. No network egress exists here, so this is
how the int4-MoE capacity proof (round-3 verdict #7: "~28B-total MoE on
one 16 GB chip" was arithmetic, not a run) provisions its input.

One safetensors shard per layer bounds writer memory; the loader walks
every *.safetensors in the directory (hf_loader.load_safetensors).

--fast draws each expert as a rolled copy of one per-layer random pool
instead of fresh i.i.d. samples: bytes on disk / through the loader /
resident on chip are identical, expert weights stay distinct (different
roll per expert), only the i.i.d.-ness goes — fine for the capacity and
throughput proof, not for statistics of the weights themselves. Fresh
RNG everywhere is ~20x slower (the RNG dominates, not the disk).

Usage: python scripts/make_synthetic_30b_moe.py [--out /tmp/ckpt30bmoe]
       [--layers 48] [--fast]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ckpt30bmoe")
    ap.add_argument("--layers", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()
    d = args.out
    os.makedirs(d, exist_ok=True)

    # Qwen3-30B-A3B geometry (hf Qwen3MoeConfig fields)
    h, f_moe, v = 2048, 768, 151936
    nh, nkv, hd = 32, 4, 128
    E, top_k = 128, 8
    L = args.layers
    cfg = {"architectures": ["Qwen3MoeForCausalLM"],
           "model_type": "qwen3_moe", "vocab_size": v,
           "hidden_size": h, "intermediate_size": 6144,
           "moe_intermediate_size": f_moe, "num_hidden_layers": L,
           "num_attention_heads": nh, "num_key_value_heads": nkv,
           "head_dim": hd, "num_experts": E,
           "num_experts_per_tok": top_k, "decoder_sparse_step": 1,
           "mlp_only_layers": [], "norm_topk_prob": True,
           "max_position_embeddings": 40960, "rope_theta": 1000000.0,
           "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
           "torch_dtype": "bfloat16"}
    with open(os.path.join(d, "config.json"), "w") as fh:
        json.dump(cfg, fh)
    with open(os.path.join(d, "generation_config.json"), "w") as fh:
        json.dump({"eos_token_id": 151645}, fh)

    import ml_dtypes
    from safetensors.numpy import save_file
    rng = np.random.default_rng(args.seed)

    def t(shape, scale=0.02):
        return (rng.standard_normal(shape, dtype=np.float32)
                * scale).astype(ml_dtypes.bfloat16)

    t0 = time.time()
    total = 0
    head = {"model.embed_tokens.weight": t((v, h)),
            "model.norm.weight": np.ones(h, ml_dtypes.bfloat16),
            "lm_head.weight": t((v, h))}
    total += sum(x.nbytes for x in head.values())
    save_file(head, os.path.join(d, "model-head.safetensors"))
    del head
    for i in range(L):
        p = f"model.layers.{i}."
        shard = {
            p + "self_attn.q_proj.weight": t((nh * hd, h)),
            p + "self_attn.k_proj.weight": t((nkv * hd, h)),
            p + "self_attn.v_proj.weight": t((nkv * hd, h)),
            p + "self_attn.o_proj.weight": t((h, nh * hd)),
            p + "self_attn.q_norm.weight": np.ones(hd, ml_dtypes.bfloat16),
            p + "self_attn.k_norm.weight": np.ones(hd, ml_dtypes.bfloat16),
            p + "input_layernorm.weight": np.ones(h, ml_dtypes.bfloat16),
            p + "post_attention_layernorm.weight":
                np.ones(h, ml_dtypes.bfloat16),
            p + "mlp.gate.weight": t((E, h)),
        }
        if args.fast:
            # one fresh pool per layer; experts are distinct rolled copies
            # of it. Distinctness requires every shift (max 4*(E-1) for
            # gate/up over axis h, 3*(E-1) for down over axis f_moe) to
            # stay below the rolled axis length, or shifts collide mod
            # the axis and experts silently alias.
            assert 4 * (E - 1) < h and 3 * (E - 1) < f_moe, \
                "--fast roll shifts would alias experts for this geometry"
            pools = {"gate_proj": t((f_moe, h)), "up_proj": t((f_moe, h)),
                     "down_proj": t((h, f_moe))}
            for e in range(E):
                b = f"{p}mlp.experts.{e}."
                for name, pool in pools.items():
                    shard[b + name + ".weight"] = np.roll(
                        pool, 3 * e + (0 if name == "down_proj" else e),
                        axis=1)
        else:
            for e in range(E):
                b = f"{p}mlp.experts.{e}."
                shard[b + "gate_proj.weight"] = t((f_moe, h))
                shard[b + "up_proj.weight"] = t((f_moe, h))
                shard[b + "down_proj.weight"] = t((h, f_moe))
        total += sum(x.nbytes for x in shard.values())
        save_file(shard, os.path.join(d, f"model-{i:05d}.safetensors"))
        del shard
        if i % 8 == 0:
            print(f"  layer {i}/{L} ({total / 1e9:.1f} GB, "
                  f"{time.time() - t0:.0f}s)", flush=True)
    print(f"{d}: {total / 1e9:.1f} GB written in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
