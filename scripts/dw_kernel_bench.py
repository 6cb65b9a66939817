"""Micro-benchmark: Pallas int8 per-block-quant dW kernel vs the XLA bf16 dW
dot, at the flux-dev stage-1 shapes (T = B*L = 32*197 = 6304).

Methodology (memory: tpu-bench-method): in-jit fori_loop with a carry
dependence on one operand (no hoisting), nonlinear consumption of the full
output, final float() device-get.

Usage: GENHANCER_DW_BLOCK_T=1024 GENHANCER_DW_BLOCK_O=512 \
       GENHANCER_DW_BLOCK_I=512 python scripts/dw_kernel_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from genhancer_tpu.core.pallas import int8_dw as dwmod

REPS = 20
SHAPES = [(6304, 3072, 3072), (6304, 9216, 3072), (6304, 21504, 3072),
          (6304, 3072, 15360)]


def timed(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters / REPS * 1000.0


def main():
    print(f"tiles: T={dwmod.DEFAULT_BLOCK_T} O={dwmod.DEFAULT_BLOCK_O} "
          f"I={dwmod.DEFAULT_BLOCK_I}")
    rng = np.random.default_rng(0)
    for t, o, i in SHAPES:
        g = jnp.asarray(rng.standard_normal((t, o)) * 0.1, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((t, i)) * 0.1, jnp.bfloat16)
        flops = 2.0 * t * o * i

        @jax.jit
        def xla_dw(gg, xx):
            def body(_, c):
                g2 = gg * (1 + (c[0, 0] * 1e-8).astype(gg.dtype))
                dw = jax.lax.dot_general(
                    g2, xx, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # nonlinear full-output consumption: tanh prevents algebraic
                # factoring, the sum needs every element (no dead-code slice)
                return c + jnp.sum(jnp.tanh(dw * 1e-3)) / 64.0
            return jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((8, 8), jnp.float32))

        @jax.jit
        def pl_dw(gg, xx):
            def body(_, c):
                g2 = gg * (1 + (c[0, 0] * 1e-8).astype(gg.dtype))
                dw = dwmod.int8_dw(g2, xx, out_dtype=jnp.float32)
                return c + jnp.sum(jnp.tanh(dw * 1e-3)) / 64.0
            return jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((8, 8), jnp.float32))

        tx = timed(xla_dw, g, x)
        tp = timed(pl_dw, g, x)
        print(f"[{t:5d},{o:5d}]x[{t:5d},{i:5d}] -> "
              f"XLA bf16 {tx:7.3f} ms ({flops/tx*1e3/197e12*100:5.1f}% peak) | "
              f"Pallas int8 {tp:7.3f} ms ({flops/tp*1e3/394e12*100:5.1f}% int8 peak)"
              f" | ratio {tx/tp:5.2f}x")


if __name__ == "__main__":
    main()
