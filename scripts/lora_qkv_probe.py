"""Micro-probe: LoRA-wrapped q/k/v projections — separate vs merged base.

Stage-2 wraps every tower linear in LoRA, which defeats the merged-qkv fast
path (models/towers/encoder.py:_mergeable_qkv): three separate
[M, 1024, 1024] dots underfill the MXU at tower shapes.  Candidate: merge
the BASE matmul only ([h -> 3h]) and keep the three low-rank branches
separate (per-proj dropout draws preserved).  This probe times fwd and
fwd+bwd of both layouts at the CLIP-L stage-2 design point.

Run alone on the chip (one TPU job at a time).
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(f, *args, iters=50):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else None
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--l", type=int, default=257)
    ap.add_argument("--h", type=int, default=1024)
    ap.add_argument("--r", type=int, default=16)
    args = ap.parse_args()
    b, l, h, r = args.b, args.l, args.h, args.r

    key = jax.random.key(0)
    ks = jax.random.split(key, 16)
    x = jax.random.normal(ks[0], (b, l, h), jnp.bfloat16)
    ws = [jax.random.normal(ks[1 + i], (h, h), jnp.bfloat16) * 0.02
          for i in range(3)]
    las = [jax.random.normal(ks[4 + i], (r, h), jnp.bfloat16) * 0.02
           for i in range(3)]
    lbs = [jnp.zeros((h, r), jnp.bfloat16) + 0.01 for _ in range(3)]
    bias = [jnp.zeros((h,), jnp.bfloat16) for _ in range(3)]
    wcat = jnp.concatenate(ws, 0)
    bcat = jnp.concatenate(bias, 0)

    def dot(a, w):
        return jax.lax.dot_general(a, w, (((a.ndim - 1,), (1,)), ((), ())),
                                   preferred_element_type=a.dtype)

    def separate(x):
        outs = []
        for w, la, lb, bi in zip(ws, las, lbs, bias):
            y = dot(x, w) + dot(dot(x, la), lb) * 2.0 + bi
            outs.append(y)
        return tuple(outs)

    def merged(x):
        y = dot(x, wcat) + bcat
        q, k, v = jnp.split(y, 3, axis=-1)
        outs = []
        for base, la, lb in zip((q, k, v), las, lbs):
            outs.append(base + dot(dot(x, la), lb) * 2.0)
        return tuple(outs)

    def loss(f):
        def g(x):
            q, k, v = f(x)
            return jnp.sum((q * k * v).astype(jnp.float32))
        return g

    for name, f in (("separate", separate), ("merged", merged)):
        fj = jax.jit(f)
        ms_f = bench(fj, x)
        gj = jax.jit(jax.grad(loss(f)))
        ms_b = bench(gj, x)
        print(f"{name:9s} fwd {ms_f:7.3f} ms   grad(x) {ms_b:7.3f} ms")

    # also the no-LoRA reference points
    def sep_nolora(x):
        return tuple(dot(x, w) for w in ws)

    def mrg_nolora(x):
        return tuple(jnp.split(dot(x, wcat), 3, axis=-1))

    for name, f in (("sep-base", sep_nolora), ("mrg-base", mrg_nolora)):
        print(f"{name:9s} fwd {bench(jax.jit(f), x):7.3f} ms")


if __name__ == "__main__":
    main()
