"""Where does the 8B batch-1 decode step spend its time?

Measures on the real chip, fetch-synced:
  (a) one int8 4096x4096 matmul (XLA dequant+dot) alone, and back-to-back
      chains of them (per-op overhead extraction);
  (b) one full transformer layer decode step;
  (c) the full 32-layer fused decode step;
  (d) the same step with layers rolled into lax.scan over stacked weights.

Ideal floor = total weight bytes / HBM bandwidth. 8B int8 = ~8.03 GB
(incl. lm_head bf16 1.05 GB) → ~9.8 ms at 819 GB/s.
"""

import argparse
import gc
import time

import numpy as np

from ragmeup_tpu.utils import ensure_platform


def timeit(fn, iters=20):
    import jax.numpy as jnp
    r = fn()
    float(jnp.asarray(r.reshape(-1)[0], jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(jnp.asarray(r.reshape(-1)[0], jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="unrolled",
                        choices=["unrolled", "scan"])
    args = parser.parse_args()
    ensure_platform()
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend())

    h, inter, v = 4096, 14336, 128256
    rng = np.random.default_rng(0)

    def qw(d_in, d_out):
        return (jnp.asarray(rng.integers(-127, 127, (d_in, d_out)), jnp.int8),
                jnp.full((d_out,), 1e-3, jnp.float32))

    x = jnp.asarray(rng.standard_normal((1, h)), jnp.bfloat16)

    # (a) single dequant matmul + chains
    wq, ws = qw(h, h)

    @jax.jit
    def one(x, wq, ws):
        return jnp.dot(x, (wq.astype(jnp.bfloat16) * ws.astype(jnp.bfloat16))
                       ).astype(jnp.bfloat16)

    chain_ws = [qw(h, h) for _ in range(16)]

    @jax.jit
    def chain16(x, chain_ws):
        for cq, cs in chain_ws:
            x = jnp.dot(x, (cq.astype(jnp.bfloat16) *
                            cs.astype(jnp.bfloat16))).astype(jnp.bfloat16)
        return x

    t1 = timeit(lambda: one(x, wq, ws))
    t16 = timeit(lambda: chain16(x, chain_ws))
    print(f"(a) 1x [h,h] int8 matmul: {t1:.3f} ms; 16x chain: {t16:.3f} ms "
          f"-> per-matmul in chain {t16 / 16 * 1e3:.0f} us "
          f"(bytes 16.8MB -> ideal ~{16.8e6 / 819e9 * 1e3:.3f} ms)")

    # (c/d) full-model comparison: unrolled loop vs lax.scan over stacked
    L = 32
    kvh = 1024

    def layer_weights():
        return dict(q=qw(h, h), k=qw(h, kvh), v=qw(h, kvh), o=qw(h, h),
                    g=qw(h, inter), u=qw(h, inter), d=qw(inter, h))

    # 8 GB of weights: only one variant fits on the chip per process run
    layers = [layer_weights() for _ in range(L)]
    lm_head = jnp.asarray(rng.standard_normal((h, v)), jnp.bfloat16)

    def mm(x, wpair):
        wq_, ws_ = wpair
        return jnp.dot(x, wq_.astype(jnp.bfloat16) * ws_.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def layer_step(x, w):
        # matmul skeleton of a decode layer (no attention math — isolates
        # the weight-streaming/per-op component)
        q = mm(x, w["q"]); k = mm(x, w["k"]); v_ = mm(x, w["v"])
        att = q + jnp.pad(k, ((0, 0), (0, h - kvh))) + \
            jnp.pad(v_, ((0, 0), (0, h - kvh)))
        x = x + mm(att, w["o"])
        gg = mm(x, w["g"]); uu = mm(x, w["u"])
        x = x + mm(jax.nn.silu(gg) * uu, w["d"])
        return x

    @jax.jit
    def unrolled(x, layers, lm_head):
        for w in layers:
            x = layer_step(x, w)
        return jnp.dot(x, lm_head, preferred_element_type=jnp.float32)

    @jax.jit
    def scanned(x, stacked, lm_head):
        def body(xc, w):
            return layer_step(xc, w), None
        xo, _ = jax.lax.scan(body, x, stacked)
        return jnp.dot(xo, lm_head, preferred_element_type=jnp.float32)

    if args.mode == "unrolled":
        tu = timeit(lambda: unrolled(x, layers, lm_head), iters=10)
        print(f"(c) 32-layer matmul skeleton unrolled: {tu:.2f} ms "
              f"({1000 / tu:.1f} tok/s equiv)")
    else:
        host_stack = {kk: (np.stack([np.asarray(w[kk][0]) for w in layers]),
                           np.stack([np.asarray(w[kk][1]) for w in layers]))
                      for kk in layers[0]}
        del layers
        gc.collect()
        stacked = jax.device_put(host_stack)
        ts = timeit(lambda: scanned(x, stacked, lm_head), iters=10)
        print(f"(d) same with lax.scan over stacked weights: {ts:.2f} ms "
              f"({1000 / ts:.1f} tok/s equiv)")
    total_bytes = L * (2 * h * h + 2 * h * kvh + 3 * h * inter) + 2 * h * v
    print(f"weight bytes {total_bytes / 1e9:.2f} GB -> ideal "
          f"{total_bytes / 819e9 * 1e3:.2f} ms "
          f"({819e9 / total_bytes:.1f} tok/s ceiling)")


if __name__ == "__main__":
    main()
