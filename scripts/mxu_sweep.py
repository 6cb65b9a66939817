#!/usr/bin/env python
"""Sweep matmul shapes to find this chip's practical MXU ceiling (bf16/int8),
using in-jit repeat loops to mask relay dispatch.  Rectangular outputs are
forced via a full-output reduction folded into the carry (costs one
bandwidth pass over the output, noted per line)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def timed(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters / REPS * 1000.0


def bench(M, K, N, dtype, transpose_rhs=False):
    rng = np.random.default_rng(0)
    int8 = dtype == jnp.int8
    wshape = (N, K) if transpose_rhs else (K, N)
    if int8:
        x = jnp.asarray(rng.integers(-4, 4, (M, K)), jnp.int8)
        w = jnp.asarray(rng.integers(-4, 4, wshape), jnp.int8)
        pet, peak = jnp.int32, 394e12
    else:
        x = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(wshape) * 0.02, jnp.bfloat16)
        pet, peak = jnp.bfloat16, 197e12
    dn = (((1,), (1,)), ((), ())) if transpose_rhs else (((1,), (0,)), ((), ()))

    @jax.jit
    def loop(x, w):
        def body(i, carry):
            c, s = carry
            y = jax.lax.dot_general(c, w, dn, preferred_element_type=pet)
            if N == K:
                nxt = (y & 3).astype(jnp.int8) if int8 else y * jnp.bfloat16(0.1)
                return nxt, s
            # rectangular: fold a full-output reduction into the carry so XLA
            # cannot dead-code any output columns; costs ~1 BW pass over y.
            r = jnp.sum(y, axis=1, keepdims=True)   # [M, 1]
            if int8:
                nxt = ((c.astype(jnp.int32) + r) & 3).astype(jnp.int8)
            else:
                nxt = c + (r * jnp.bfloat16(1e-30)).astype(c.dtype)
            return nxt, s
        out, _ = jax.lax.fori_loop(0, REPS, body, (x, jnp.zeros((), jnp.float32)))
        return out

    ms = timed(loop, x, w)
    flops = 2.0 * M * K * N
    name = "int8" if int8 else "bf16"
    lay = "x@w.T" if transpose_rhs else "x@w"
    print(f"{name} {lay} [{M:5d},{K:5d},{N:5d}]: {ms:7.3f} ms  "
          f"{flops/ms*1e3/peak*100:5.1f}% peak", flush=True)


def bench_conv(B, H, W, Cin, Cout, int8, stride=1):
    rng = np.random.default_rng(0)
    if int8:
        x = jnp.asarray(rng.integers(-4, 4, (B, H, W, Cin)), jnp.int8)
        w = jnp.asarray(rng.integers(-4, 4, (3, 3, Cin, Cout)), jnp.int8)
        pet, peak = jnp.int32, 394e12
    else:
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.02, jnp.bfloat16)
        pet, peak = jnp.bfloat16, 197e12

    @jax.jit
    def loop(x, w):
        def body(i, c):
            y = jax.lax.conv_general_dilated(
                c, w, window_strides=(stride, stride), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pet)
            if int8:
                return (y & 3).astype(jnp.int8)
            return y * jnp.bfloat16(0.1)
        return jax.lax.fori_loop(0, REPS, body, x)

    assert Cin == Cout and stride == 1
    ms = timed(loop, x, w)
    flops = 2.0 * B * H * W * 9 * Cin * Cout
    print(f"{'int8' if int8 else 'bf16'} conv3x3 [{B},{H},{W},{Cin}->{Cout}]: "
          f"{ms:7.3f} ms  {flops/ms*1e3/peak*100:5.1f}% peak", flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    if which == "bf16":
        bench(4096, 4096, 4096, jnp.bfloat16)
        bench(8192, 4096, 4096, jnp.bfloat16)
        bench(16384, 4096, 4096, jnp.bfloat16)
        bench(6304, 3072, 3072, jnp.bfloat16)
        bench(6304, 3072, 12288, jnp.bfloat16)
        bench(6304, 12288, 3072, jnp.bfloat16)
    elif which == "int8":
        bench(4096, 4096, 4096, jnp.int8)
        bench(8192, 4096, 4096, jnp.int8)
        bench(16384, 4096, 4096, jnp.int8)
        bench(6304, 3072, 3072, jnp.int8)
        bench(6304, 3072, 3072, jnp.int8, True)
        bench(6304, 3072, 12288, jnp.int8)
        bench(6304, 12288, 3072, jnp.int8)
        bench(8224, 1024, 4096, jnp.int8)
    elif which == "conv":
        bench_conv(32, 56, 56, 512, 512, False)
        bench_conv(32, 56, 56, 512, 512, True)
        bench_conv(32, 112, 112, 256, 256, False)
        bench_conv(32, 112, 112, 256, 256, True)
