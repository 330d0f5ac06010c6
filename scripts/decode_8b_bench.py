"""Single-stream 8B decode tok/s on one chip (batch-1 latency headline).

Builds the 8B int8 decoder (zero weights — identical FLOPs/HBM traffic),
runs the fused while_loop generation at two --new-tokens counts and
reports the SLOPE ((t2-t1)/(n2-n1)) so prefill + dispatch + fetch
constants cancel. Compare --quant-kernel on/off (pallas fused dequant
matmul with tuned tiles vs XLA dequant+dot).

Usage: python scripts/decode_8b_bench.py [--quant-kernel] [--n1 32] [--n2 128]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_llm(quant_kernel: bool, int8_head: bool = False,
              quant: str = "int8", int4_group: int = 0,
              w4a8: bool = False):
    import jax
    import jax.numpy as jnp
    from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer

    if w4a8:
        int4_group = 512  # W4A8 requires the output-scaled layout
    cfg = LlamaConfig(quantization=quant, tie_embeddings=False,
                      use_flash=True, max_seq_len=2048,
                      quant_kernel=quant_kernel, int4_group=int4_group,
                      int4_w4a8=w4a8,
                      head_quantization="int8" if int8_head else "none")
    h, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    kvh = cfg.num_kv_heads * cfg.head_dim

    if quant == "int4":
        from ragmeup_tpu.ops.quant_matmul import int4_tiling

        def qlin(d_in, d_out):
            tile_k, group = int4_tiling(d_in)
            if int4_group:
                group = min(int4_group, tile_k)
            return {"kernel_p": np.zeros((d_in // 2, d_out), np.int8),
                    "gscale": np.full((d_in // group, d_out), 1e-3,
                                      np.float32)}
    else:
        def qlin(d_in, d_out):
            return {"kernel_q": np.zeros((d_in, d_out), np.int8),
                    "scale": np.full(d_out, 1e-3, np.float32)}

    params = {"token_embedding": jnp.zeros((v, h), jnp.bfloat16),
              "final_norm": {"scale": np.ones(h, np.float32)}}
    if int8_head:
        params["lm_head_q"] = np.zeros((h, v), np.int8)
        params["lm_head_scale"] = np.full(v, 1e-3, np.float32)
    else:
        params["lm_head"] = jnp.zeros((h, v), jnp.bfloat16)
    for i in range(cfg.num_layers):
        params[f"layer_{i}"] = {
            "attention": {"q_proj": qlin(h, h), "k_proj": qlin(h, kvh),
                          "v_proj": qlin(h, kvh), "o_proj": qlin(h, h)},
            "input_norm": {"scale": np.ones(h, np.float32)},
            "post_attn_norm": {"scale": np.ones(h, np.float32)},
            "mlp": {"gate_proj": qlin(h, inter), "up_proj": qlin(h, inter),
                    "down_proj": qlin(inter, h)}}
    dev = jax.device_put(params)
    jax.tree_util.tree_leaves(dev)[0].block_until_ready()
    del params
    gc.collect()
    return LocalLLM(cfg, SimpleTokenizer(cfg.vocab_size), params=dev)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant-kernel", action="store_true")
    ap.add_argument("--int8-head", action="store_true")
    ap.add_argument("--quant", default="int8", choices=["int8", "int4"])
    ap.add_argument("--int4-group", type=int, default=0)
    ap.add_argument("--w4a8", action="store_true")
    ap.add_argument("--n1", type=int, default=64)
    ap.add_argument("--n2", type=int, default=128)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from ragmeup_tpu.utils.platform import ensure_platform
    backend = ensure_platform(args.platform)
    print(f"backend: {backend} quant_kernel={args.quant_kernel} "
          f"int8_head={args.int8_head}", file=sys.stderr)

    llm = build_llm(args.quant_kernel, args.int8_head, args.quant,
                    args.int4_group, w4a8=args.w4a8)
    rng = np.random.default_rng(0)
    # prompt length chosen so both token counts land in the SAME cache-len
    # bucket (300+64 -> 512, 300+128 -> 512): the slope then compares
    # identical decode-step programs
    prompt = rng.integers(5, 100000, 300).tolist()

    def gen(n):
        # temperature>0 keeps the plain fused loop (no speculative shortcut,
        # which would be instant on an all-zero model)
        t0 = time.time()
        out = llm.generate(prompt, max_new_tokens=n, temperature=0.7,
                           repetition_penalty=1.0, speculative="off")
        dt = time.time() - t0
        assert len(out) == n, (len(out), n)
        return dt

    gen(args.n1)  # compile both bucket shapes
    gen(args.n2)
    slopes = []
    for _ in range(args.repeat):
        t1 = gen(args.n1)
        t2 = gen(args.n2)
        slopes.append((t2 - t1) / (args.n2 - args.n1))
    per_tok = min(slopes)
    print("8B " + args.quant
          + " single-stream decode: %.2f ms/token -> %.1f tok/s "
          "(quant_kernel=%s, slope over %d/%d tokens, best of %d)"
          % (per_tok * 1e3, 1.0 / per_tok,
             f"{args.quant_kernel} int8_head={args.int8_head}",
             args.n1, args.n2, args.repeat))


if __name__ == "__main__":
    main()
