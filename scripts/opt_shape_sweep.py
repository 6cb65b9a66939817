#!/usr/bin/env python
"""Per-shape m8-vs-dense fused-AdamW deltas over the real flux-dev leaf
population (scripts/opt_kernel_bench.py measures one leaf; this sweeps the
trainable state's actual (shape, dtype) histogram and prints the predicted
full-optimizer delta = sum(count x per-leaf delta), isolating whether the
end-to-end moment_bits=8 overhead is per-leaf kernel cost or executable-level
scheduling)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from genhancer_tpu.core.pallas import adamw as pa

# (count, rows, cols, dtype) — flux-dev stage-1 trainable, m8-eligible leaves
POP = [
    (8, 9216, 3072, jnp.bfloat16),
    (7, 3072, 3072, jnp.bfloat16),
    (4, 12288, 3072, jnp.bfloat16),
    (4, 3072, 12288, jnp.bfloat16),
    (4, 18432, 3072, jnp.bfloat16),
    (4, 21504, 3072, jnp.bfloat16),
    (4, 3072, 15360, jnp.bfloat16),
    (2, 3072, 256, jnp.bfloat16),
    (1, 6144, 3072, jnp.bfloat16),
    (1, 64, 3072, jnp.bfloat16),
    (1, 3072, 4096, jnp.bfloat16),
    (1, 3072, 768, jnp.bfloat16),
    (2, 768, 768, jnp.float32),
    (1, 4096, 768, jnp.float32),
    (1, 4096, 4096, jnp.float32),
]
KW = dict(b1=0.9, b2=0.999, eps=1e-8, wd=0.01)


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--stop", type=int, default=len(POP))
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    tot_d = tot_8 = 0.0
    for count, rows, cols, dtype in POP[args.start:args.stop]:
        print(f"... [{rows},{cols}] {np.dtype(dtype).name}", flush=True)
        p = jnp.asarray(rng.standard_normal((rows, cols)) * 0.02, dtype)
        g = jnp.asarray(rng.standard_normal((rows, cols)) * 1e-3, dtype)
        m = jnp.asarray(rng.standard_normal((rows, cols)) * 1e-3, dtype)
        v = jnp.asarray(10.0 ** rng.uniform(-10, -4, (rows, cols)), dtype)
        m8 = pa.Moment8(*pa.m8_encode_m(m.astype(jnp.float32)))
        v8 = pa.Moment8(*pa.m8_encode_v(v.astype(jnp.float32)))
        sc = jnp.asarray([1.0, 1e-3, 1.1, 1.05], jnp.float32)
        quant = dtype == jnp.bfloat16  # DiT leaves emit the int8 cache
        dense = jax.jit(lambda *a: pa._update_leaf_pallas(*a, **KW, quant=quant))
        bit8 = jax.jit(lambda *a: pa._update_leaf_pallas8(*a, **KW, quant=quant))
        td = timeit(dense, p, m, v, g, sc)
        t8 = timeit(bit8, p, m8, v8, g, sc)
        tot_d += count * td
        tot_8 += count * t8
        print(f"{count:2d}x [{rows:6d},{cols:6d}] {np.dtype(dtype).name:8s} "
              f"dense {td:7.3f}  m8 {t8:7.3f}  d {count * (t8 - td):+7.3f} ms",
              flush=True)
    print(f"sum dense {tot_d:.2f} ms   sum m8 {tot_8:.2f} ms   "
          f"delta {tot_8 - tot_d:+.2f} ms (dispatch intercept cancels)")


if __name__ == "__main__":
    main()
