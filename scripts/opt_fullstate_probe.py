#!/usr/bin/env python
"""Bisect the executable-level m8-vs-dense optimizer delta: one jit applying
the fused AdamW leaf kernels over the full flux-dev leaf population (the
per-shape sweep predicts ~+0.5 ms from kernel cost alone; the end-to-end
probe measures ~+15 ms — this isolates what the full executable adds)."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from genhancer_tpu.core.pallas import adamw as pa

POP = [
    (8, 9216, 3072), (7, 3072, 3072), (4, 12288, 3072), (4, 3072, 12288),
    (4, 18432, 3072), (4, 21504, 3072), (4, 3072, 15360), (2, 3072, 256),
    (1, 6144, 3072), (1, 64, 3072), (1, 3072, 4096), (1, 3072, 768),
]
KW = dict(b1=0.9, b2=0.999, eps=1e-8, wd=0.01)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=16, choices=[8, 16])
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--leaves", type=int, default=0,
                    help="limit to first N leaves (0 = all)")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # tiny host blocks tiled on-device: full-size host randoms + transfers
    # take >10 min over the axon relay
    base = jnp.asarray(rng.standard_normal((32, 128)), jnp.float32)
    vbase = jnp.asarray(10.0 ** rng.uniform(-10, -4, (32, 128)), jnp.float32)

    def mk(rows, cols):
        p = (jnp.tile(base, (rows // 32, cols // 128)) * 0.02)
        g = jnp.tile(base, (rows // 32, cols // 128)) * 1e-3
        m = jnp.tile(base, (rows // 32, cols // 128)) * 1e-3
        v = jnp.tile(vbase, (rows // 32, cols // 128))
        return p.astype(jnp.bfloat16), g.astype(jnp.bfloat16), m, v

    params, moms, grads = {}, {}, {}
    n = 0
    for count, rows, cols in POP:
        for i in range(count):
            if args.leaves and n >= args.leaves:
                break
            k = f"l{n}"
            n += 1
            p, g, m, v = mk(rows, cols)
            params[k], grads[k] = p, g
            if args.bits == 8:
                moms[k] = (pa.Moment8(*jax.jit(pa.m8_encode_m)(m)),
                           pa.Moment8(*jax.jit(pa.m8_encode_v)(v)))
            else:
                moms[k] = (m.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
            print(f"  init {k} {rows}x{cols}", flush=True)
    total = sum(p.size for p in params.values())
    print(f"{n} leaves, {total / 1e6:.0f}M params, bits={args.bits}, "
          f"quant={args.quant}", flush=True)

    sc = jnp.asarray([1.0, 1e-3, 1.1, 1.05], jnp.float32)

    @jax.jit
    def step(params, moms, grads):
        out_p, out_m = {}, {}
        for k in params:
            m, v = moms[k]
            if args.bits == 8:
                r = pa._update_leaf_pallas8(params[k], m, v, grads[k], sc,
                                            **KW, quant=args.quant)
            else:
                r = pa._update_leaf_pallas(params[k], m, v, grads[k], sc,
                                           **KW, quant=args.quant)
            out_p[k] = r[0]
            out_m[k] = (r[1], r[2])
        return out_p, out_m

    # donate state like the real step does
    step_d = jax.jit(step, donate_argnums=(0, 1))

    p, m = step_d(params, moms, grads)
    for _ in range(2):
        p, m = step_d(p, m, grads)
    jnp.sum(jax.tree_util.tree_leaves(p)[0].astype(jnp.float32)).item()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        p, m = step_d(p, m, grads)
    jnp.sum(jax.tree_util.tree_leaves(p)[0].astype(jnp.float32)).item()
    dt = (time.perf_counter() - t0) / args.iters * 1000.0
    # traffic: p in+out, m/v in+out, g in [, wq out]
    esz = 2
    msz = 2 * esz if args.bits == 16 else 2
    traffic = total * (2 * esz + 2 * msz + esz + (1 if args.quant else 0))
    print(f"{dt:.3f} ms   {traffic / dt / 1e6:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
