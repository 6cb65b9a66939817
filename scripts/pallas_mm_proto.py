#!/usr/bin/env python
"""Prototype: can a Pallas matmul beat XLA's dot on DiT shapes (v5e)?

XLA measured (int8_micro/mxu_sweep): bf16 [6304,3072,3072] 0.887 ms (68%
peak), int8 0.573 ms (53% int8 peak).  This prototypes a K-resident block
matmul (grid over M×N, full K in VMEM, f32/int32 accum) with an optional
fused per-row dynamic quantization prologue, and times it with the same
in-jit repeat-loop methodology.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# --- bf16 block matmul: grid (M/bm, N/bn), K resident -----------------------

def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def mm_bf16(x, w, bm, bn, order="mn"):
    M, K = x.shape
    N = w.shape[1]
    if order == "mn":   # x-resident: j (N) innermost
        grid = (M // bm, N // bn)
        xmap, wmap, omap = (lambda i, j: (i, 0), lambda i, j: (0, j),
                            lambda i, j: (i, j))
    else:               # w-resident: i (M) innermost
        grid = (N // bn, M // bm)
        xmap, wmap, omap = (lambda j, i: (i, 0), lambda j, i: (0, j),
                            lambda j, i: (i, j))
    return pl.pallas_call(
        _mm_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, K), xmap),
                  pl.BlockSpec((K, bn), wmap)],
        out_specs=pl.BlockSpec((bm, bn), omap),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x, w)


# --- int8 block matmul, pre-quantized x and w -------------------------------

def _mm8_kernel(x_ref, w_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)


def mm_int8(xq, wq, bm, bn):
    M, K = xq.shape
    N = wq.shape[1]
    return pl.pallas_call(
        _mm8_kernel,
        grid=(M // bm, N // bn),
        in_specs=[pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
                  pl.BlockSpec((K, bn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xq, wq)


# --- int8 with fused per-row x quantization --------------------------------

def _mmq_kernel(x_ref, w_ref, ws_ref, o_ref, xq_ref, sx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        sx = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
        xq_ref[:] = jnp.clip(jnp.round(xf * pl.reciprocal(sx, approx=False)),
                             -127, 127).astype(jnp.int8)
        sx_ref[:] = sx

    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx_ref[:] * ws_ref[:]
                ).astype(jnp.bfloat16)


def mm_int8_rowquant(x, wq, ws, bm, bn):
    """x bf16 [M,K]; wq int8 [K,N]; ws f32 [1,N] per-column scales."""
    M, K = x.shape
    N = wq.shape[1]
    return pl.pallas_call(
        _mmq_kernel,
        grid=(M // bm, N // bn),
        in_specs=[pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
                  pl.BlockSpec((K, bn), lambda i, j: (0, j)),
                  pl.BlockSpec((1, bn), lambda i, j: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, K), jnp.int8),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, wq, ws)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=6304)
    ap.add_argument("--k", type=int, default=3072)
    ap.add_argument("--n", type=int, default=3072)
    ap.add_argument("--bm", type=int, default=512)
    ap.add_argument("--bn", type=int, default=1024)
    ap.add_argument("--which", type=str, default="bf16,int8,int8q")
    ap.add_argument("--order", type=str, default="mn", choices=["mn", "nm"])
    args = ap.parse_args()
    M, K, N = args.m, args.k, args.n
    # pad M to bm multiple
    Mp = (M + args.bm - 1) // args.bm * args.bm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((Mp, K)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, (Mp, K)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    ws = jnp.asarray(rng.random((1, N)) + 0.5, jnp.float32)
    flops = 2.0 * Mp * K * N
    which = args.which.split(",")

    if "bf16" in which:
        @jax.jit
        def loop_bf16(x, w):
            def body(i, c):
                y = mm_bf16(c, w, args.bm, args.bn, args.order)
                return y[:, :K] * jnp.bfloat16(0.1) if N != K else y * jnp.bfloat16(0.1)
            return jax.lax.fori_loop(0, REPS, body, x)

        t = timed(loop_bf16, x, w)
        print(f"pallas bf16 {args.order} [{Mp}x{K}x{N}] bm={args.bm} bn={args.bn}: "
              f"{t:.3f} ms  {flops/t*1e3/197e12*100:.1f}% bf16 peak", flush=True)

    if "int8" in which:
        @jax.jit
        def loop_int8(xq, wq):
            def body(i, c):
                y = mm_int8(c, wq, args.bm, args.bn)
                return jnp.clip(jnp.round(y.astype(jnp.float32) * 100), -127,
                                127).astype(jnp.int8)
            return jax.lax.fori_loop(0, REPS, body, xq)

        t = timed(loop_int8, xq, wq)
        print(f"pallas int8 [{Mp}x{K}x{N}] bm={args.bm} bn={args.bn}: "
              f"{t:.3f} ms  {flops/t*1e3/394e12*100:.1f}% int8 peak", flush=True)

    if "int8q" in which:
        @jax.jit
        def loop_int8q(x, wq, ws):
            def body(i, c):
                y = mm_int8_rowquant(c, wq, ws, args.bm, args.bn)
                return y * jnp.bfloat16(0.1)
            return jax.lax.fori_loop(0, REPS, body, x)

        t = timed(loop_int8q, x, wq, ws)
        print(f"pallas int8+rowquant [{Mp}x{K}x{N}]: {t:.3f} ms  "
              f"{flops/t*1e3/394e12*100:.1f}% int8 peak  "
              f"(vs XLA bf16 0.887: {0.887/t:.2f}x)", flush=True)
        # correctness
        y = mm_int8_rowquant(x, wq, ws, args.bm, args.bn)
        xf = np.asarray(x, np.float32)
        amax = np.abs(xf).max(1, keepdims=True)
        sx = np.maximum(amax, 1e-12) / 127.0
        xqr = np.clip(np.round(xf / sx), -127, 127)
        ref = (xqr @ np.asarray(wq, np.float32)) * sx * np.asarray(ws)
        err = np.abs(np.asarray(y, np.float32) - ref).mean() / (np.abs(ref).mean() + 1e-9)
        print(f"  rel err vs numpy ref: {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
