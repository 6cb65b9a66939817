"""Fused RoPE + attention Pallas kernel for short sequences (DiT hot path).

Motivation (measured on v5e, flux-dev image mode, B=32, L=197): attention +
RoPE cost 33 ms of an 89 ms DiT forward while their matmul FLOPs are <1% of
the model — the XLA path pays layout transposes, f32 logits materialization,
and the interleaved-pair RoPE shuffle as separate HBM round trips, and the
per-(batch, head) flash kernel (flash_attention.py) pays grid overhead on
768 tiny programs.  This kernel runs ONE program per batch element with
head-batched dot_generals entirely in VMEM ([H, L, L] f32 logits for
L<=~512 fit easily), with RoPE applied in-register:

    rope(x) = x * cos_full + rot(x) * sin_full,
    rot(x)[..., 2i] = -x[..., 2i+1],  rot(x)[..., 2i+1] = x[..., 2i]

Backward (custom VJP) exploits that RoPE is a rotation: with rq = R(q),
standard attention gradients give d_rq/d_rk, and dq = R^{-1}(d_rq) is the
same rotation with negated sin.  One program per batch element computes
dq, dk, dv in a single pass.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import spmd

_INTERPRET = os.environ.get("GENHANCER_PALLAS_INTERPRET", "0") == "1"


def _expand_tables(cos, sin):
    """[B, L, D/2] -> ([B, L, D], [B, L, D]) interleave-repeated, f32."""
    cos_full = jnp.repeat(cos.astype(jnp.float32), 2, axis=-1)
    sin_full = jnp.repeat(sin.astype(jnp.float32), 2, axis=-1)
    return cos_full, sin_full


def _rot_pairs(x):
    """rot(x): (-x_odd, x_even) interleaved; x [..., D].

    Mosaic-friendly formulation: the minor dim is the lane dim, where a
    [.., D] -> [.., D/2, 2] reshape cannot lower; instead combine two lane
    rotations with a parity mask (pure VPU ops):
        even lanes take -x[lane+1]  (roll by -1, negated)
        odd  lanes take  x[lane-1]  (roll by +1)
    """
    from jax.experimental.pallas import tpu as pltpu
    d = x.shape[-1]
    left = pltpu.roll(x, d - 1, x.ndim - 1)   # y[j] = x[j+1] (shift -1 mod d)
    right = pltpu.roll(x, 1, x.ndim - 1)      # y[j] = x[j-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane % 2 == 0, -left, right)


def _apply_rope_full(x, cos_full, sin_full):
    """x [H, L, D]; tables [L, D] broadcast over heads; f32 rotation."""
    xf = x.astype(jnp.float32)
    out = xf * cos_full[None] + _rot_pairs(xf) * sin_full[None]
    return out.astype(x.dtype)


def _attn_body(rq, rk, v, o_ref, scale):
    # head-batched logits [H, L, L], f32
    s = jax.lax.dot_general(rq, rk, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *, scale):
    cos = cos_ref[0]        # [L, D]
    sin = sin_ref[0]
    rq = _apply_rope_full(q_ref[0], cos, sin)
    rk = _apply_rope_full(k_ref[0], cos, sin)
    _attn_body(rq, rk, v_ref[0], o_ref, scale)


def _fwd_kernel_norope(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Tower variant: no rotation — skips two full VPU passes + f32 rope
    temps per q/k tile (sdpa_auto used to pass identity tables instead)."""
    _attn_body(q_ref[0], k_ref[0], v_ref[0], o_ref, scale)


def _bwd_body(rq, rk, v, o_ref, do_ref, scale):
    """Shared backward math on (already-rotated) q/k; returns d_rq, d_rk, dv."""
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(rq, rk, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
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
    return d_rq, d_rk, dv


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, cos_ref, sin_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    cos = cos_ref[0]
    sin = sin_ref[0]
    rq = _apply_rope_full(q_ref[0], cos, sin)
    rk = _apply_rope_full(k_ref[0], cos, sin)
    d_rq, d_rk, dv = _bwd_body(rq, rk, v_ref[0], o_ref, do_ref, scale)
    # inverse rotation: same tables with negated sin
    dq_ref[0] = _apply_rope_full(d_rq.astype(q_ref.dtype), cos, -sin)
    dk_ref[0] = _apply_rope_full(d_rk.astype(k_ref.dtype), cos, -sin)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_kernel_norope(q_ref, k_ref, v_ref, o_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, *, scale):
    d_rq, d_rk, dv = _bwd_body(q_ref[0], k_ref[0], v_ref[0], o_ref, do_ref,
                               scale)
    dq_ref[0] = d_rq.astype(dq_ref.dtype)
    dk_ref[0] = d_rk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _to_bhld(x):
    return x.transpose(0, 2, 1, 3)


def _head_block(h: int, l: int = 256, d: int = 128) -> int:
    """Largest divisor of h whose per-program VMEM estimate fits the budget.

    Estimate: 4 q/k/v/o blocks double-buffered (bf16) + f32 logits+probs
    [h_blk, L, L] + f32 rope temporaries + tables.  Budget 10 MB leaves
    headroom under the 16 MB scoped limit (measured: h_blk=24 at L=197
    needed 16.8 MB; 8 fits)."""
    budget = 10 * 1024 * 1024
    for cand in sorted({g for g in range(1, h + 1) if h % g == 0}, reverse=True):
        if cand > 8:
            continue
        est = (2 * 4 * cand * l * d * 2          # qkvo, double-buffered, bf16
               + 2 * cand * l * l * 4            # logits + probs f32
               + 2 * cand * l * d * 4            # rope f32 temps
               + 2 * l * d * 4)                  # tables
        if est <= budget:
            return cand
    return 1


def _specs(b, l, h, d, h_blk):
    spec_x = pl.BlockSpec((1, h_blk, l, d), lambda bi, hi: (bi, hi, 0, 0))
    spec_t = pl.BlockSpec((1, l, d), lambda bi, hi: (bi, 0, 0))
    return spec_x, spec_t


def _run_fwd(q, k, v, cos_full=None, sin_full=None):
    b, l, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    h_blk = _head_block(h, l, d)
    qt, kt, vt = _to_bhld(q), _to_bhld(k), _to_bhld(v)
    spec_x, spec_t = _specs(b, l, h, d, h_blk)
    if cos_full is None:
        kernel = functools.partial(_fwd_kernel_norope, scale=scale)
        ins, in_specs = (qt, kt, vt), [spec_x] * 3
    else:
        kernel = functools.partial(_fwd_kernel, scale=scale)
        ins, in_specs = (qt, kt, vt, cos_full, sin_full), [spec_x] * 3 + [spec_t] * 2
    out = pl.pallas_call(
        kernel,
        grid=(b, h // h_blk),
        in_specs=in_specs,
        out_specs=spec_x,
        out_shape=spmd.out_struct(qt.shape, q.dtype, *ins),
        interpret=_INTERPRET,
    )(*ins)
    return _to_bhld(out)


# SPMD-safe entry points (see core/pallas/spmd.py): B and H partition freely
# (grid (B, H/hb)); L/D and the rope tables replicate.  Wrapped lazily so the
# spmd module import stays off the non-mesh path.

@functools.lru_cache(maxsize=None)
def _sp(which: str):
    from . import spmd

    # custom_partitioning resolves operands against the wrapped function's
    # signature — hand it exact-arity closures, not the default-arg originals
    def rope_fwd(q, k, v, cos_full, sin_full):
        return _run_fwd(q, k, v, cos_full, sin_full)

    def rope_bwd(q, k, v, o, do, cos_full, sin_full):
        return _run_bwd(q, k, v, o, do, cos_full, sin_full)

    def norope_fwd(q, k, v):
        return _run_fwd(q, k, v)

    def norope_bwd(q, k, v, o, do):
        return _run_bwd(q, k, v, o, do)

    return {
        "rope_fwd": lambda: spmd.wrap(
            rope_fwd, (spmd.BHLD,) * 3 + (spmd.BLD,) * 2, spmd.BHLD,
            spmd.ROPE_FWD_RULE, spmd.ROPE_FWD_REPL),
        "rope_bwd": lambda: spmd.wrap(
            rope_bwd, (spmd.BHLD,) * 5 + (spmd.BLD,) * 2, (spmd.BHLD,) * 3,
            spmd.ROPE_BWD_RULE, spmd.ROPE_BWD_REPL),
        "fwd": lambda: spmd.wrap(
            norope_fwd, (spmd.BHLD,) * 3, spmd.BHLD,
            spmd.FWD_RULE, spmd.FWD_REPL),
        "bwd": lambda: spmd.wrap(
            norope_bwd, (spmd.BHLD,) * 5, (spmd.BHLD,) * 3,
            spmd.BWD_RULE, spmd.BWD_REPL),
    }[which]()


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_rope_attention(q, k, v, cos, sin):
    """RoPE + exact softmax attention, one Pallas program per batch element.

    q, k, v: [B, L, H, D]; cos, sin: [B, L, D/2].  Returns [B, L, H, D].
    Best for L <= ~512 (the [H, L, L] f32 logits must fit VMEM).
    """
    cos_full, sin_full = _expand_tables(cos, sin)
    return _sp("rope_fwd")(q, k, v, cos_full, sin_full)


def _vjp_fwd(q, k, v, cos, sin):
    cos_full, sin_full = _expand_tables(cos, sin)
    o = _sp("rope_fwd")(q, k, v, cos_full, sin_full)
    return o, (q, k, v, o, cos_full, sin_full)


def _run_bwd(q, k, v, o, do, cos_full=None, sin_full=None):
    b, l, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    qt, kt, vt, ot, dot = (x.transpose(0, 2, 1, 3) for x in (q, k, v, o, do))
    h_blk = _head_block(h, l, d)
    spec_x, spec_t = _specs(b, l, h, d, h_blk)
    if cos_full is None:
        kernel = functools.partial(_bwd_kernel_norope, scale=scale)
        ins, in_specs = (qt, kt, vt, ot, dot), [spec_x] * 5
    else:
        kernel = functools.partial(_bwd_kernel, scale=scale)
        ins = (qt, kt, vt, ot, dot, cos_full, sin_full)
        in_specs = [spec_x] * 5 + [spec_t] * 2
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h // h_blk),
        in_specs=in_specs,
        out_specs=(spec_x, spec_x, spec_x),
        out_shape=(spmd.out_struct(qt.shape, q.dtype, *ins),
                   spmd.out_struct(kt.shape, k.dtype, *ins),
                   spmd.out_struct(vt.shape, v.dtype, *ins)),
        interpret=_INTERPRET,
    )(*ins)
    return _to_bhld(dq), _to_bhld(dk), _to_bhld(dv)


def _vjp_bwd(res, do):
    q, k, v, o, cos_full, sin_full = res
    dq, dk, dv = _sp("rope_bwd")(q, k, v, o, do, cos_full, sin_full)
    return (dq, dk, dv, None, None)


fused_rope_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# no-rope variant (tower encoders): same kernels minus the rotation work
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fused_attention(q, k, v):
    """Exact softmax attention, head-batched, one program per (batch,
    head-block) — the tower-encoder path (no RoPE).  q,k,v: [B, L, H, D]."""
    return _sp("fwd")(q, k, v)


def _vjp_fwd_norope(q, k, v):
    o = _sp("fwd")(q, k, v)
    return o, (q, k, v, o)


def _vjp_bwd_norope(res, do):
    q, k, v, o = res
    return _sp("bwd")(q, k, v, o, do)


fused_attention.defvjp(_vjp_fwd_norope, _vjp_bwd_norope)
