"""Tile sweep for the fused int8 dequant matmul on decode shapes.

Slope-timed chains (see matmul_variants_bench.py) per (tile_k, tile_n);
prints us/matmul and achieved weight GB/s for each, best-first.
"""

import time

import numpy as np

from ragmeup_tpu.utils import ensure_platform


def main():
    ensure_platform()
    import jax
    import jax.numpy as jnp
    from ragmeup_tpu.ops.quant_matmul import int8_matmul

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    C = 8

    def sync(r):
        float(jnp.asarray(r.reshape(-1)[0], jnp.float32))

    def timeit(fn, n1=20, n2=80):
        sync(fn())

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn()
            sync(r)
            return time.perf_counter() - t0
        t1, t2 = run(n1), run(n2)
        return (t2 - t1) / (n2 - n1) * 1e3

    for (k, n) in [(4096, 4096), (4096, 14336), (14336, 4096)]:
        x = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)
        wq = [(jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8),
               jnp.full((n,), 1e-3, jnp.float32)) for _ in range(C)]
        results = []
        for tk in (512, 1024, 2048):
            for tn in (512, 1024, 2048):
                if k % tk or n % tn:
                    continue
                if tk * tn > 4 * 1024 * 1024:  # 4MB int8 tile cap
                    continue

                def chain(x, ws, tk=tk, tn=tn):
                    acc = x
                    for q, s in ws:
                        y = int8_matmul(acc, q, s, tile_k=tk, tile_n=tn)
                        acc = y[:, :k] if n >= k else jnp.pad(
                            y, ((0, 0), (0, k - n)))
                    return acc

                jc = jax.jit(lambda x, ws, tk=tk, tn=tn: chain(x, ws, tk, tn))
                t = timeit(lambda: jc(x, wq)) / C * 1e3
                gbs = k * n / (t * 1e-6) / 1e9
                results.append((t, tk, tn, gbs))
                print(f"  [{k},{n}] tk={tk} tn={tn}: {t:7.1f} us "
                      f"({gbs:5.0f} GB/s)", flush=True)
        best = sorted(results)[0]
        print(f"BEST [{k},{n}]: tk={best[1]} tn={best[2]} "
              f"{best[0]:.1f} us ({best[3]:.0f} GB/s)\n", flush=True)


if __name__ == "__main__":
    main()
