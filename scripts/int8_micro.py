#!/usr/bin/env python
"""Microbench: raw bf16 vs int8 dot on the MXU + int8-linear overhead anatomy.

All timed regions run REPS iterations inside one jit (lax.fori_loop with a
value-carried dependency) so axon-relay dispatch latency doesn't pollute the
numbers; a tiny-op control quantifies that dispatch overhead.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def timed(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters / REPS * 1000.0  # ms per rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=6304)   # 32*197 DiT tokens
    ap.add_argument("--k", type=int, default=3072)
    ap.add_argument("--n", type=int, default=3072)
    args = ap.parse_args()
    M, K, N = args.m, args.k, args.n
    assert N == K, "carry trick needs N == K"

    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
    w16 = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    ws = jnp.asarray(rng.random((N,)) + 0.5, jnp.float32)

    flops = 2.0 * M * K * N
    dn = (((1,), (0,)), ((), ()))

    @jax.jit
    def ctrl(x):
        def body(i, c):
            return c * jnp.bfloat16(1.000001)
        return jax.lax.fori_loop(0, REPS, body, x[:8, :128])

    @jax.jit
    def loop16(x, w):
        def body(i, c):
            y = jax.lax.dot_general(c, w, dn, preferred_element_type=jnp.bfloat16)
            return y * jnp.bfloat16(0.1)
        return jax.lax.fori_loop(0, REPS, body, x)

    @jax.jit
    def loop8(x, w):
        xq = jnp.clip(jnp.round(x * 127), -127, 127).astype(jnp.int8)
        def body(i, c):
            y = jax.lax.dot_general(c, w, dn, preferred_element_type=jnp.int32)
            return (y & 127).astype(jnp.int8)
        return jax.lax.fori_loop(0, REPS, body, xq)

    def qdot(x, wq, f32math: bool):
        if f32math:
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
            sx = jnp.maximum(amax, 1e-12) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        else:
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            sx = jnp.maximum(amax, jnp.bfloat16(1e-6)) * jnp.bfloat16(1.0 / 127.0)
            xq = jnp.clip(jnp.round(x * (1.0 / sx)), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, wq, dn, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx.astype(jnp.float32) * ws
                ).astype(jnp.bfloat16)

    @jax.jit
    def loopq32(x, wq):
        def body(i, c):
            return qdot(c, wq, True) * jnp.bfloat16(0.1)
        return jax.lax.fori_loop(0, REPS, body, x)

    @jax.jit
    def loopq16(x, wq):
        def body(i, c):
            return qdot(c, wq, False) * jnp.bfloat16(0.1)
        return jax.lax.fori_loop(0, REPS, body, x)

    tc = timed(ctrl, x16)
    t16 = timed(loop16, x16, w16)
    t8 = timed(loop8, x16, w8)
    tq32 = timed(loopq32, x16, w8)
    tq16 = timed(loopq16, x16, w8)
    print(f"[{M}x{K}x{N}] dispatch control: {tc*REPS:.3f} ms/call")
    print(f"bf16 dot:  {t16:.3f} ms  ({flops/t16*1e3/197e12*100:.1f}% bf16 peak)")
    print(f"int8 dot:  {t8:.3f} ms  ({flops/t8*1e3/394e12*100:.1f}% int8 peak)"
          f"  speedup {t16/t8:.2f}x")
    print(f"q(f32)+dot+dq:  {tq32:.3f} ms  ({t16/tq32:.2f}x vs bf16)")
    print(f"q(bf16)+dot+dq: {tq16:.3f} ms  ({t16/tq16:.2f}x vs bf16)")


if __name__ == "__main__":
    main()
