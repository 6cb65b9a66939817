#!/usr/bin/env python
"""Micro-bench: dense vs 8-bit-moment fused AdamW leaf kernels on one chip.

Times `_update_leaf_pallas` (bf16 moments-in-param-dtype) against
`_update_leaf_pallas8` (log-coded int8 moments, core/pallas/adamw.py) on a
DiT-sized leaf, and prints achieved HBM GB/s against the per-variant traffic
model — the fused optimizer is bandwidth-bound, so GB/s vs the ~475 GB/s
practical floor (BASELINE.md) is the roofline that decides whether the
8-bit decode/encode arithmetic is free or rate-limiting.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from genhancer_tpu.core.pallas import adamw as pa


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=12288)
    ap.add_argument("--cols", type=int, default=3072)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--quant", action="store_true",
                    help="also emit the int8 weight cache (bench-default path)")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    rows, cols = args.rows, args.cols
    p = jnp.asarray(rng.standard_normal((rows, cols)) * 0.02, dtype)
    g = jnp.asarray(rng.standard_normal((rows, cols)) * 1e-3, dtype)
    m = jnp.asarray(rng.standard_normal((rows, cols)) * 1e-3, dtype)
    v = jnp.asarray(10.0 ** rng.uniform(-10, -4, (rows, cols)), dtype)
    m8 = pa.Moment8(*pa.m8_encode_m(m.astype(jnp.float32)))
    v8 = pa.Moment8(*pa.m8_encode_v(v.astype(jnp.float32)))
    scalars = jnp.asarray([1.0, 1e-3, 1.1, 1.05], jnp.float32)
    kw = dict(b1=0.9, b2=0.999, eps=1e-8, wd=0.01)

    nbytes = rows * cols
    esz = dtype.itemsize
    # traffic model (bytes/param): p in+out, moments in+out, g in [, wq out]
    dense_traffic = nbytes * (2 * esz + 4 * esz + esz + (1 if args.quant else 0))
    m8_traffic = nbytes * (2 * esz + 4 * 1 + esz + (1 if args.quant else 0))

    dense = jax.jit(lambda *a: pa._update_leaf_pallas(*a, **kw,
                                                      quant=args.quant))
    bit8 = jax.jit(lambda *a: pa._update_leaf_pallas8(*a, **kw,
                                                      quant=args.quant))

    t_dense = timeit(dense, p, m, v, g, scalars, iters=args.iters)
    t_8 = timeit(bit8, p, m8, v8, g, scalars, iters=args.iters)
    print(f"leaf [{rows}x{cols}] {args.dtype} quant={args.quant}")
    print(f"dense : {t_dense:7.3f} ms  {dense_traffic / t_dense / 1e6:6.1f} GB/s")
    print(f"m8    : {t_8:7.3f} ms  {m8_traffic / t_8 / 1e6:6.1f} GB/s")
    print(f"ratio : {t_8 / t_dense:.3f}x "
          f"(traffic model says {m8_traffic / dense_traffic:.3f}x)")


if __name__ == "__main__":
    main()
