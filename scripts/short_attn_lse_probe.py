#!/usr/bin/env python
"""Does LSE-saving pay in the SHORT-attention backward too?

The fused RoPE+attention kernel (core/pallas/short_attention.py) recomputes
softmax over the [h_blk, L, L] f32 logits tile in its one-pass backward.
Saving the forward's row statistics (as flash_attention now does) would cut
the recompute to a single exp — but at short L the tile is small and the
backward is MXU-heavy (5 dot_generals), so the VPU savings may not be
visible.  This probe times the shipped kernels against LSE variants at the
image design points (B=32, L=197 @224px / L=442 @336px, H=24, D=128).
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from genhancer_tpu.core.pallas import short_attention as sa

LSE_LANES = 8


def _sync(out):
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


# --- LSE variants ------------------------------------------------------------

def _fwd_lse_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, lse_ref,
                    *, scale):
    cos, sin = cos_ref[0], sin_ref[0]
    rq = sa._apply_rope_full(q_ref[0], cos, sin)
    rk = sa._apply_rope_full(k_ref[0], cos, sin)
    v = v_ref[0]
    s = jax.lax.dot_general(rq, rk, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    den = jnp.sum(e, axis=-1, keepdims=True)
    p = e * (1.0 / den)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)
    lse = mx + jnp.log(den)
    lse_ref[0] = jnp.broadcast_to(lse, lse.shape[:-1] + (LSE_LANES,))


def _bwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, cos_ref, sin_ref,
                    lse_ref, dq_ref, dk_ref, dv_ref, *, scale):
    cos, sin = cos_ref[0], sin_ref[0]
    rq = sa._apply_rope_full(q_ref[0], cos, sin)
    rk = sa._apply_rope_full(k_ref[0], cos, sin)
    v = v_ref[0]
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][..., :1]
    s = jax.lax.dot_general(rq, rk, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)
    dob = do.astype(v.dtype)
    dp = jax.lax.dot_general(dob, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    d_i = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = (p * (dp - d_i)).astype(rq.dtype)
    d_rq = jax.lax.dot_general(ds, rk, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32) * scale
    d_rk = jax.lax.dot_general(ds, rq, (((1,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32) * scale
    dv = jax.lax.dot_general(p.astype(dob.dtype), dob,
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = sa._apply_rope_full(d_rq.astype(q_ref.dtype), cos, -sin)
    dk_ref[0] = sa._apply_rope_full(d_rk.astype(k_ref.dtype), cos, -sin)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def run(b, l, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.bfloat16)
    cos = jnp.asarray(rng.uniform(-1, 1, (b, l, d // 2)), jnp.float32)
    sin = jnp.asarray(rng.uniform(-1, 1, (b, l, d // 2)), jnp.float32)
    cos_full, sin_full = sa._expand_tables(cos, sin)
    scale = 1.0 / (d ** 0.5)
    h_blk = sa._head_block(h, l, d)
    print(f"B={b} L={l} H={h} D={d} h_blk={h_blk}")

    # shipped
    f_ship = jax.jit(lambda q, k, v: sa._run_fwd(q, k, v, cos_full, sin_full))
    o = f_ship(q, k, v)
    t_fwd = timeit(f_ship, q, k, v)
    b_ship = jax.jit(lambda q, k, v, o, do: sa._run_bwd(
        q, k, v, o, do, cos_full, sin_full))
    ref = b_ship(q, k, v, o, do)
    t_bwd = timeit(b_ship, q, k, v, o, do)

    # LSE variants
    qt, kt, vt, ot, dot = (x.transpose(0, 2, 1, 3) for x in (q, k, v, o, do))
    spec_x, spec_t = sa._specs(b, l, h, d, h_blk)
    lspec = pl.BlockSpec((1, h_blk, l, LSE_LANES), lambda bi, hi: (bi, hi, 0, 0))

    def f_lse(qt, kt, vt):
        return pl.pallas_call(
            functools.partial(_fwd_lse_kernel, scale=scale),
            grid=(b, h // h_blk),
            in_specs=[spec_x] * 3 + [spec_t] * 2,
            out_specs=(spec_x, lspec),
            out_shape=(jax.ShapeDtypeStruct(qt.shape, q.dtype),
                       jax.ShapeDtypeStruct((b, h, l, LSE_LANES), jnp.float32)),
        )(qt, kt, vt, cos_full, sin_full)

    f_lse_j = jax.jit(f_lse)
    ot_l, lse = f_lse_j(qt, kt, vt)
    t_fwd_lse = timeit(f_lse_j, qt, kt, vt)
    np.testing.assert_allclose(np.asarray(ot_l, np.float32),
                               np.asarray(o.transpose(0, 2, 1, 3), np.float32),
                               atol=2e-2)

    def b_lse(qt, kt, vt, ot, dot, lse):
        return pl.pallas_call(
            functools.partial(_bwd_lse_kernel, scale=scale),
            grid=(b, h // h_blk),
            in_specs=[spec_x] * 5 + [spec_t] * 2 + [lspec],
            out_specs=(spec_x, spec_x, spec_x),
            out_shape=(jax.ShapeDtypeStruct(qt.shape, q.dtype),
                       jax.ShapeDtypeStruct(kt.shape, k.dtype),
                       jax.ShapeDtypeStruct(vt.shape, v.dtype)),
        )(qt, kt, vt, ot, dot, cos_full, sin_full, lse)

    b_lse_j = jax.jit(b_lse)
    got = b_lse_j(qt, kt, vt, ot, dot, lse)
    t_bwd_lse = timeit(b_lse_j, qt, kt, vt, ot, dot, lse)
    for g, r in zip(got, [x.transpose(0, 2, 1, 3) for x in ref]):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32), atol=3e-2)

    print(f"fwd: ship {t_fwd:.3f} ms  lse {t_fwd_lse:.3f} ms")
    print(f"bwd: ship {t_bwd:.3f} ms  lse {t_bwd_lse:.3f} ms   "
          f"fwd+bwd {t_fwd + t_bwd:.3f} -> {t_fwd_lse + t_bwd_lse:.3f} ms "
          f"({(1 - (t_fwd_lse + t_bwd_lse) / (t_fwd + t_bwd)) * 100:+.1f}%)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=str, default="32,197,24,128")
    args = ap.parse_args()
    b, l, h, d = map(int, args.shape.split(","))
    run(b, l, h, d)
