"""Per-op cost of the decode-dominant matmul shapes, by variant.

Chains of C matmuls inside ONE jit (amortizes dispatch; mirrors how the
32-layer decode program executes back-to-back weight-streaming matmuls).
Variants:
  bf16   — plain bf16 dot (weights 2 B/elt): the no-quant baseline
  int8   — XLA dequant+dot (1 B/elt + scale): what QuantDense does today
  int8k  — pallas fused dequant matmul (ops/quant_matmul.int8_matmul)
  int4k  — pallas packed-int4 groupwise matmul (0.5 B/elt)

Prints per-matmul microseconds and achieved GB/s vs the 819 GB/s chip
bandwidth. Fetch-synced timing (block_until_ready lies on this backend).
"""

import argparse
import time

import numpy as np

from ragmeup_tpu.utils import ensure_platform


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--m", type=int, default=1)
    args = ap.parse_args()
    ensure_platform()
    import jax
    import jax.numpy as jnp
    from ragmeup_tpu.ops.quant_matmul import (
        int4_matmul, int8_matmul, quantize_int4_groupwise)

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    C = args.chain

    def sync(r):
        float(jnp.asarray(r.reshape(-1)[0], jnp.float32))

    def timeit(fn):
        """Slope timing: run N1 and N2 dispatch-chained iterations with one
        fetch each; (t2-t1)/(N2-N1) cancels the constant ~26 ms D2H fetch
        RTT that would otherwise inflate every op by RTT/iters."""
        sync(fn())

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn()
            sync(r)
            return time.perf_counter() - t0

        n1, n2 = args.iters, args.iters * 4
        t1, t2 = run(n1), run(n2)
        return (t2 - t1) / (n2 - n1) * 1e3

    for (k, n) in [(4096, 4096), (4096, 14336), (14336, 4096)]:
        x = jnp.asarray(rng.standard_normal((args.m, k)), jnp.bfloat16)
        wf = [rng.standard_normal((k, n)).astype(np.float32) * 0.02
              for _ in range(C)]
        rows = []

        wb = [jnp.asarray(w, jnp.bfloat16) for w in wf]

        @jax.jit
        def chain_bf16(x, ws):
            acc = x
            for w in ws:
                y = jnp.dot(acc, w, preferred_element_type=jnp.bfloat16)
                acc = y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n)))
            return acc
        t = timeit(lambda: chain_bf16(x, wb))
        rows.append(("bf16", t, k * n * 2))

        wq = [(jnp.asarray(np.clip(np.round(w / 1e-3), -127, 127), jnp.int8),
               jnp.full((n,), 1e-3, jnp.float32)) for w in wf]

        @jax.jit
        def chain_int8(x, ws):
            acc = x
            for q, s in ws:
                y = jnp.dot(acc, q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)[None],
                            preferred_element_type=jnp.bfloat16)
                acc = y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n)))
            return acc
        t = timeit(lambda: chain_int8(x, wq))
        rows.append(("int8-xla", t, k * n))

        @jax.jit
        def chain_int8k(x, ws):
            acc = x
            for q, s in ws:
                y = int8_matmul(acc, q, s)
                acc = y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n)))
            return acc
        t = timeit(lambda: chain_int8k(x, wq))
        rows.append(("int8-pallas", t, k * n))

        w4 = [quantize_int4_groupwise(w) for w in wf]
        w4 = [(jnp.asarray(p), jnp.asarray(g)) for p, g in w4]

        @jax.jit
        def chain_int4k(x, ws):
            acc = x
            for p, g in ws:
                y = int4_matmul(acc, p, g)
                acc = y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n)))
            return acc
        t = timeit(lambda: chain_int4k(x, w4))
        rows.append(("int4-pallas", t, k * n // 2))

        print(f"\n(m={args.m}) x [{k},{n}] chain={C}:")
        for name, t, wbytes in rows:
            per = t / C * 1e3
            gbs = wbytes / (per * 1e-6) / 1e9
            print(f"  {name:12s} {per:8.1f} us/matmul  "
                  f"({gbs:6.0f} GB/s of weight stream, ideal "
                  f"{wbytes / 819e9 * 1e6:5.1f} us)")


if __name__ == "__main__":
    main()
