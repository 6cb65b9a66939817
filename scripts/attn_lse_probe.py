#!/usr/bin/env python
"""Does saving the forward's softmax row statistics (LSE) pay in the flash
backward?  Answered YES and shipped (core/pallas/flash_attention.py): the
shipped bwd kernels consume the forward's saved lse and recompute only
p = exp(s - lse) — two fewer [BQ, L] f32 row reductions and no divide vs
a full softmax recompute.

This probe keeps the PRE-LSE variants (full softmax recompute in dq/dkv,
no lse output in fwd) inline and times them against the shipped kernels at
the sliding-window design point (VERDICT r2 #4), so the measurement stays
reproducible.  Measured (v5e, B=2 L=2169 H=24 D=128): bwd 1.247 -> 1.063
ms/layer (-15%), fwd+bwd -6.8%.
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genhancer_tpu.core.pallas import flash_attention as fa


def _sync(out):
    # a scalar d2h readback — jax.block_until_ready does not synchronize
    # through the axon relay
    leaf = jax.tree_util.tree_leaves(out)[0]
    jnp.sum(leaf.astype(jnp.float32)).item()


def timeit(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


# --- pre-LSE kernel variants (what shipped before round 3) ------------------

def _fwd_old_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _dq_old_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, dq_ref, *, scale):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    dp = jax.lax.dot_general(do.astype(v.dtype), v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    d_i = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - d_i)
    dq = jax.lax.dot_general(ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_old_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale, block_q, n_q_blocks):
    k, v = k_ref[0], v_ref[0]
    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    def body(qi, _):
        sl = pl.ds(qi * block_q, block_q)
        q = q_ref[0, :, sl, :]
        o = o_ref[0, :, sl, :].astype(jnp.float32)
        do = do_ref[0, :, sl, :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        dp = jax.lax.dot_general(do.astype(v.dtype), v,
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        d_i = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = p * (dp - d_i)
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return ()

    jax.lax.fori_loop(0, n_q_blocks, body, ())
    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def run(b, l, h, d, block_q=fa.DEFAULT_BLOCK_Q):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.bfloat16)
    scale = 1.0 / (d ** 0.5)
    nq = pl.cdiv(l, block_q)
    hb = fa._flash_head_block(h, l, d, block_q)
    print(f"B={b} L={l} H={h} D={d} hb={hb} nq={nq}")

    qt, kt, vt, dot = (x.transpose(0, 2, 1, 3) for x in (q, k, v, do))

    # shipped fwd (emits lse)
    f_ship = jax.jit(lambda q, k, v: fa._fwd(q, k, v, block_q))
    o, lse = f_ship(q, k, v)
    t_fwd_ship = timeit(f_ship, q, k, v)

    bspec_q = pl.BlockSpec((1, hb, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0))
    bspec_kv = pl.BlockSpec((1, hb, l, d), lambda bi, hi, qi: (bi, hi, 0, 0))

    def f_old(qt, kt, vt):
        return pl.pallas_call(
            functools.partial(_fwd_old_kernel, scale=scale),
            grid=(b, h // hb, nq),
            in_specs=[bspec_q, bspec_kv, bspec_kv],
            out_specs=bspec_q,
            out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        )(qt, kt, vt)

    f_old_j = jax.jit(f_old)
    ot_old = f_old_j(qt, kt, vt)
    t_fwd_old = timeit(f_old_j, qt, kt, vt)
    np.testing.assert_allclose(np.asarray(ot_old, np.float32),
                               np.asarray(o.transpose(0, 2, 1, 3), np.float32),
                               atol=2e-2)
    print(f"fwd: old {t_fwd_old:.3f} ms   shipped(+lse) {t_fwd_ship:.3f} ms")

    # shipped bwd (consumes lse)
    f_bwd_ship = jax.jit(
        lambda q, k, v, o, lse, do: fa._bwd_impl(q, k, v, o, lse, do, block_q))
    ref = f_bwd_ship(q, k, v, o, lse, do)
    t_bwd_ship = timeit(f_bwd_ship, q, k, v, o, lse, do)

    # pre-LSE bwd
    ot = o.transpose(0, 2, 1, 3)
    l_pad = nq * block_q

    def bwd_old(qt, kt, vt, ot, dot):
        dq = pl.pallas_call(
            functools.partial(_dq_old_kernel, scale=scale),
            grid=(b, h // hb, nq),
            in_specs=[bspec_q, bspec_kv, bspec_kv, bspec_q, bspec_q],
            out_specs=bspec_q,
            out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        )(qt, kt, vt, ot, dot)
        if l_pad != l:
            pad = [(0, 0), (0, 0), (0, l_pad - l), (0, 0)]
            q_p, o_p, do_p = (jnp.pad(x, pad) for x in (qt, ot, dot))
        else:
            q_p, o_p, do_p = qt, ot, dot
        full_kv = pl.BlockSpec((1, hb, l, d), lambda bi, hi: (bi, hi, 0, 0))
        full_q = pl.BlockSpec((1, hb, l_pad, d), lambda bi, hi: (bi, hi, 0, 0))
        dk, dv = pl.pallas_call(
            functools.partial(_dkv_old_kernel, scale=scale, block_q=block_q,
                              n_q_blocks=nq),
            grid=(b, h // hb),
            in_specs=[full_q, full_kv, full_kv, full_q, full_q],
            out_specs=(full_kv, full_kv),
            out_shape=(jax.ShapeDtypeStruct(kt.shape, k.dtype),
                       jax.ShapeDtypeStruct(vt.shape, v.dtype)),
            scratch_shapes=[pltpu.VMEM((hb, l, d), jnp.float32),
                            pltpu.VMEM((hb, l, d), jnp.float32)],
        )(q_p, kt, vt, o_p, do_p)
        return dq, dk, dv

    bwd_old_j = jax.jit(bwd_old)
    got = bwd_old_j(qt, kt, vt, ot, dot)
    t_bwd_old = timeit(bwd_old_j, qt, kt, vt, ot, dot)
    for g, r in zip(got, [x.transpose(0, 2, 1, 3) for x in ref]):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32), atol=3e-2)
    print(f"bwd: old {t_bwd_old:.3f} ms   shipped(lse) {t_bwd_ship:.3f} ms   "
          f"fwd+bwd {t_fwd_old + t_bwd_old:.3f} -> "
          f"{t_fwd_ship + t_bwd_ship:.3f} ms "
          f"({(1 - (t_fwd_ship + t_bwd_ship) / (t_fwd_old + t_bwd_old)) * 100:+.1f}%)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=str, default="2,2169,24,128",
                    help="B,L,H,D")
    args = ap.parse_args()
    b, l, h, d = map(int, args.shape.split(","))
    run(b, l, h, d)
