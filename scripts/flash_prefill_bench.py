"""Measure prefill wall time with XLA attention vs the Pallas flash kernel
at 8B-class layer shapes on the real TPU.

Timing rule (CLAUDE.md): block_until_ready does not wait on axon — always
synchronize by fetching a scalar from the result.
"""

import time

import numpy as np

from ragmeup_tpu.utils import ensure_platform

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ragmeup_tpu.models.decoder import (  # noqa: E402
    LlamaConfig, LlamaModel, causal_bias)


def bench(cfg: LlamaConfig, seq: int, iters: int = 10) -> float:
    model = LlamaModel(cfg)
    ids = jnp.zeros((1, seq), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids,
                        positions=jnp.arange(seq))["params"]
    from flax import linen as nn
    params = nn.meta.unbox(params)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    bias = causal_bias(seq, seq)

    @jax.jit
    def fwd(params, ids):
        out = model.apply({"params": params}, ids,
                          positions=jnp.arange(seq), attn_bias=bias)
        return out["logits"][0, -1, :1]

    r = fwd(params, ids)
    float(r[0])  # warm

    def run(n):  # slope timing: cancels the ~26 ms fetch RTT (CLAUDE.md)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fwd(params, ids)
        float(r[0])
        return time.perf_counter() - t0

    t1, t2 = run(iters), run(iters * 3)
    return (t2 - t1) / (iters * 2) * 1e3


def main():
    print(f"backend={jax.default_backend()}")
    # 8B-class layer shapes, 4 layers (per-layer cost scales linearly)
    base = dict(vocab_size=32000, hidden_size=4096, num_layers=4,
                num_heads=32, num_kv_heads=8, intermediate_size=14336,
                max_seq_len=8192, rope_theta=500000.0)
    for seq in (512, 1024, 2048, 4096):
        xla = bench(LlamaConfig(**base, use_flash=False), seq)
        fla = bench(LlamaConfig(**base, use_flash=True), seq)
        print(f"seq={seq:5d}  xla={xla:8.2f} ms  flash={fla:8.2f} ms  "
              f"speedup={xla / fla:5.2f}x")


if __name__ == "__main__":
    main()
