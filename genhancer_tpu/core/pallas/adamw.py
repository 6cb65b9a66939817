"""Pallas fused AdamW update — one HBM-optimal pass per parameter leaf.

Replaces the reference's ``torch.optim.AdamW`` + ``clip_grad_norm_`` step
(``/root/reference/Continuous/train_SigLIP_stage1.py:147-153,272``) with a
TPU-native in-place kernel: reads g/p/m/v once and writes p/m/v through
``input_output_aliases`` — the 14 bytes/param traffic floor plus one
2-byte/param grad read for the global norm.

Measured on v5e at ~1B bf16 params: **34.7 ms/step — parity with the optax
chain's 33.5 ms** (the chain's per-stage XLA fusions already run at the
measured 475 GB/s bandwidth floor, so there was nothing left to save).
Kept behind ``fused_optimizer: pallas`` as the substrate for future
optimizer-fused passes (e.g. emitting the int8-quantized weight copy during
the update); the shipped default is the chain.

Semantics match the optax chain exactly: g' = g * min(1, c/||g||_global),
bias-corrected Adam moments, decoupled weight decay
``p -= lr * (m_hat / (sqrt(v_hat) + eps) + wd * p)``.  Arithmetic is f32;
p/m/v load and store in their storage dtype (bf16 for the DiT, f32 for the
projectors).  Leaves smaller than one tile run the same math in plain XLA.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("GENHANCER_PALLAS_INTERPRET", "0") == "1"

def _block_rows(cols, p, m, g):
    """Rows per grid step, sized so 7 live buffers x double-buffering stay
    well under the ~16 MB VMEM scoped limit (f32 leaves hit it at 512)."""
    bytes_per_row = cols * (p.dtype.itemsize * 2 + m.dtype.itemsize * 4
                            + g.dtype.itemsize)
    budget = 8 * 1024 * 1024
    blk = max(budget // (2 * bytes_per_row), 8)
    return min(1 << (int(blk).bit_length() - 1), 512)


# ---------------------------------------------------------------------------
# 8-bit moment code (moment_bits=8): log-domain int8 with one f32 scale per
# parameter row — the TPU analog of 8-bit Adam (Dettmers et al., "8-bit
# Optimizers via Block-wise Quantization", arXiv:2110.02861).  Linear int8 is
# unusable here (its absolute step amax/127 zeroes the small second moments
# Adam divides by); the moments need CONSTANT RELATIVE error across a wide
# dynamic range: q = round(K*log2(x/s)) covers s*2^-31.75..s at K=4 with
# <=2^(1/8)-1 = 9.05% worst-case relative error, with the Dettmers codebook
# replaced by the VPU's hardware exp2/log2 (a 256-entry per-element table
# lookup is the one thing the TPU vector unit cannot do cheaply).
#   v (>= 0):  q in [-126, 0], sentinel -127 = exact 0
#   m (signed): q = sign(m) * mag, mag in [1, 127], sentinel 0 = exact 0
# Scales are the per-row amax so the top of the range is always occupied;
# the one scalar divide is hoisted to a per-row reciprocal.
#
# MEASURED VERDICT on v5e (scripts/opt_kernel_bench.py, opt_fullstate_probe.py,
# full 1.31B-param flux-dev trainable state, exclusive chip): the decode/
# update/encode is VPU-BOUND, not bandwidth-bound — 43.9 ms vs dense bf16
# moments' 28.7 ms @ 638 GB/s.  Two alternative encodings measured WORSE:
# an f32 bit-manipulation log code (exponent-field construction + mantissa
# cubic; Mosaic int32 shift/bitcast/select chains cost more than the
# hardware-approximated transcendentals), and fp8 e4m3 row-scaled casts
# (55.5 ms — v5e has no native fp8, Mosaic emulates the conversion in
# software; on fp8-native TPUs this variant should win).  So on v5e
# moment_bits=8 is a MEMORY knob, not a speed knob: moment state drops from
# 4 to 2+eps bytes/param (~2.5 GB on flux-dev) for ~+15 ms/step.
# ---------------------------------------------------------------------------

MOMENT8_K = 4.0           # code resolution: round(K * log2(x / scale))
_M8_TINY = 1e-38          # guards log2(0); anything below decodes to ~0


def m8_encode_v(v):
    """Non-negative f32 [blk, cols] -> (int8 code, f32 [blk, 1] scale)."""
    s = jnp.max(v, axis=1, keepdims=True)
    ratio = jnp.maximum(v, _M8_TINY) * (1.0 / jnp.maximum(s, _M8_TINY))
    q = jnp.clip(jnp.round(MOMENT8_K * jnp.log2(ratio)), -126.0, 0.0)
    q = jnp.where(v > 0.0, q, -127.0)
    return q.astype(jnp.int8), s.astype(jnp.float32)


def m8_decode_v(q, s):
    qf = q.astype(jnp.float32)
    v = s * jnp.exp2(qf * (1.0 / MOMENT8_K))
    return jnp.where(qf <= -127.0, 0.0, v)


def m8_encode_m(m):
    """Signed f32 [blk, cols] -> (int8 code, f32 [blk, 1] scale)."""
    a = jnp.abs(m)
    s = jnp.max(a, axis=1, keepdims=True)
    ratio = jnp.maximum(a, _M8_TINY) * (1.0 / jnp.maximum(s, _M8_TINY))
    mag = jnp.clip(jnp.round(MOMENT8_K * jnp.log2(ratio)) + 127.0, 1.0, 127.0)
    q = jnp.where(m == 0.0, 0.0, jnp.sign(m) * mag)
    return q.astype(jnp.int8), s.astype(jnp.float32)


def m8_decode_m(q, s):
    qf = q.astype(jnp.float32)
    mag = s * jnp.exp2((jnp.abs(qf) - 127.0) * (1.0 / MOMENT8_K))
    return jnp.where(qf == 0.0, 0.0, jnp.sign(qf) * mag)


def _adamw8_math(sc_ref, p_ref, mq_ref, ms_ref, vq_ref, vs_ref, g_ref,
                 b1, b2, eps, wd):
    """Shared decode -> AdamW -> encode; returns (p_store, m8, v8)."""
    scale, lr, inv_bc1, inv_bc2 = (sc_ref[0], sc_ref[1], sc_ref[2], sc_ref[3])
    g = g_ref[:].astype(jnp.float32) * scale
    m = b1 * m8_decode_m(mq_ref[:], ms_ref[:]) + (1.0 - b1) * g
    v = b2 * m8_decode_v(vq_ref[:], vs_ref[:]) + (1.0 - b2) * g * g
    p = p_ref[:].astype(jnp.float32)
    p = p - lr * (m * inv_bc1 / (jnp.sqrt(v * inv_bc2) + eps) + wd * p)
    return p, m8_encode_m(m), m8_encode_v(v)


def _adamw8_kernel(sc_ref, p_ref, mq_ref, ms_ref, vq_ref, vs_ref, g_ref,
                   po_ref, mqo_ref, mso_ref, vqo_ref, vso_ref,
                   *, b1, b2, eps, wd):
    p, (mq, ms), (vq, vs) = _adamw8_math(sc_ref, p_ref, mq_ref, ms_ref,
                                         vq_ref, vs_ref, g_ref, b1, b2, eps, wd)
    po_ref[:] = p.astype(po_ref.dtype)
    mqo_ref[:], mso_ref[:] = mq, ms
    vqo_ref[:], vso_ref[:] = vq, vs


def _adamw8_quant_kernel(sc_ref, p_ref, mq_ref, ms_ref, vq_ref, vs_ref, g_ref,
                         po_ref, mqo_ref, mso_ref, vqo_ref, vso_ref,
                         wq_ref, ws_ref, *, b1, b2, eps, wd):
    """8-bit moments + fused int8 weight-cache emission (_adamw_quant_kernel)."""
    p, (mq, ms), (vq, vs) = _adamw8_math(sc_ref, p_ref, mq_ref, ms_ref,
                                         vq_ref, vs_ref, g_ref, b1, b2, eps, wd)
    p_store = p.astype(po_ref.dtype)
    po_ref[:] = p_store
    mqo_ref[:], mso_ref[:] = mq, ms
    vqo_ref[:], vso_ref[:] = vq, vs
    pf = p_store.astype(jnp.float32)
    amax = jnp.max(jnp.abs(pf), axis=1, keepdims=True)
    ws = jnp.maximum(amax, 1e-12) / 127.0
    wq_ref[:] = jnp.clip(jnp.round(pf / ws), -127, 127).astype(jnp.int8)
    ws_ref[:] = ws.astype(jnp.float32)


def _adamw_kernel(sc_ref, p_ref, m_ref, v_ref, g_ref,
                  po_ref, mo_ref, vo_ref, *, b1, b2, eps, wd):
    """sc_ref (SMEM): [scale, lr, 1/bc1, 1/bc2]."""
    scale, lr, inv_bc1, inv_bc2 = (sc_ref[0], sc_ref[1], sc_ref[2], sc_ref[3])
    g = g_ref[:].astype(jnp.float32) * scale
    m = b1 * m_ref[:].astype(jnp.float32) + (1.0 - b1) * g
    v = b2 * v_ref[:].astype(jnp.float32) + (1.0 - b2) * g * g
    p = p_ref[:].astype(jnp.float32)
    mhat = m * inv_bc1
    vhat = v * inv_bc2
    p = p - lr * (mhat / (jnp.sqrt(vhat) + eps) + wd * p)
    po_ref[:] = p.astype(po_ref.dtype)
    mo_ref[:] = m.astype(mo_ref.dtype)
    vo_ref[:] = v.astype(vo_ref.dtype)


def _adamw_quant_kernel(sc_ref, p_ref, m_ref, v_ref, g_ref,
                        po_ref, mo_ref, vo_ref, wq_ref, ws_ref,
                        *, b1, b2, eps, wd):
    """AdamW update + int8 weight emission in one pass: the new W tile is
    still in registers, so quantizing here costs only the 1-byte/param wq
    store — the forward's re-quantization pass over W (read + amax + write)
    disappears (core.quant.switchback_linear_cached).

    Quantizes the STORED (dtype-rounded) master so the cache bit-matches
    ``quantize_weight(state.trainable[path])``."""
    scale, lr, inv_bc1, inv_bc2 = (sc_ref[0], sc_ref[1], sc_ref[2], sc_ref[3])
    g = g_ref[:].astype(jnp.float32) * scale
    m = b1 * m_ref[:].astype(jnp.float32) + (1.0 - b1) * g
    v = b2 * v_ref[:].astype(jnp.float32) + (1.0 - b2) * g * g
    p = p_ref[:].astype(jnp.float32)
    p = p - lr * (m * inv_bc1 / (jnp.sqrt(v * inv_bc2) + eps) + wd * p)
    p_store = p.astype(po_ref.dtype)
    po_ref[:] = p_store
    mo_ref[:] = m.astype(mo_ref.dtype)
    vo_ref[:] = v.astype(vo_ref.dtype)
    pf = p_store.astype(jnp.float32)
    amax = jnp.max(jnp.abs(pf), axis=1, keepdims=True)      # per out-channel
    ws = jnp.maximum(amax, 1e-12) / 127.0
    wq_ref[:] = jnp.clip(jnp.round(pf / ws), -127, 127).astype(jnp.int8)
    ws_ref[:] = ws.astype(jnp.float32)                      # [blk, 1]


def _update_leaf_pallas(p, m, v, g, scalars, b1, b2, eps, wd,
                        quant: bool = False):
    """Leaves keep their NATIVE 2-D shape — a reshape to a canonical lane
    count would be a physical relayout on TPU (tiled storage), costing extra
    full read+write passes and breaking in-place aliasing (measured: 91 ms
    vs 33.5 ms optax at ~1B params with the reshape; native-shape blocks
    must only block the row axis).

    ``quant=True`` additionally emits (wq int8 [rows, cols], ws f32 [rows])
    — returns a 5-tuple."""
    rows, cols = p.shape
    blk = min(_block_rows(cols, p, m, g), rows)
    vmem_limit = None
    if quant:
        blk = max(blk, 32)        # int8 output tiles need >= (32, 128)
        # the forced 32-row block can exceed the 16 MB default scoped limit
        # at wide leaves (e.g. [3072, 15360] bf16: ~20 MB live) — raise it;
        # physical VMEM is 128 MB
        vmem_limit = 64 * 1024 * 1024
    grid = (pl.cdiv(rows, blk),)
    bs = pl.BlockSpec((blk, cols), lambda i: (i, 0))
    if quant:
        kernel = functools.partial(_adamw_quant_kernel, b1=b1, b2=b2,
                                   eps=eps, wd=wd)
        out_specs = (bs, bs, bs, bs, pl.BlockSpec((blk, 1), lambda i: (i, 0)))
        out_shape = (jax.ShapeDtypeStruct(p.shape, p.dtype),
                     jax.ShapeDtypeStruct(m.shape, m.dtype),
                     jax.ShapeDtypeStruct(v.shape, v.dtype),
                     jax.ShapeDtypeStruct(p.shape, jnp.int8),
                     jax.ShapeDtypeStruct((rows, 1), jnp.float32))
    else:
        kernel = functools.partial(_adamw_kernel, b1=b1, b2=b2, eps=eps, wd=wd)
        out_specs = (bs, bs, bs)
        out_shape = (jax.ShapeDtypeStruct(p.shape, p.dtype),
                     jax.ShapeDtypeStruct(m.shape, m.dtype),
                     jax.ShapeDtypeStruct(v.shape, v.dtype))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  bs, bs, bs, bs],
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
                         if vmem_limit else None),
        interpret=_INTERPRET,
    )(scalars, p, m, v, g)


class Moment8(tuple):
    """Pytree container for an 8-bit moment leaf: (q int8 [rows, cols],
    scale f32 [rows, 1]).  A plain tuple subclass so jax flattens it
    positionally (checkpoint/sharding code that walks leaves keeps working);
    isinstance checks distinguish it from the (mu, nu, upd) work tuples."""

    __slots__ = ()

    def __new__(cls, q, s):
        return tuple.__new__(cls, (q, s))

    @property
    def q(self):
        return self[0]

    @property
    def s(self):
        return self[1]


jax.tree_util.register_pytree_node(
    Moment8, lambda t: ((t[0], t[1]), None),
    lambda aux, ch: Moment8(*ch))


def moment8_zeros_v(p) -> Moment8:
    """Zero-initialized second-moment leaf (v's exact-zero sentinel is -127)."""
    return Moment8(jnp.full(p.shape, -127, jnp.int8),
                   jnp.zeros((p.shape[0], 1), jnp.float32))


def moment8_zeros_m(p) -> Moment8:
    """Zero-initialized first-moment leaf (m's exact-zero sentinel is 0)."""
    return Moment8(jnp.zeros(p.shape, jnp.int8),
                   jnp.zeros((p.shape[0], 1), jnp.float32))


def moment8_ok(p) -> bool:
    """Leaves eligible for 8-bit moments = the Pallas-eligible set, further
    requiring 32-divisible rows (8-bit output tiles are (32, 128))."""
    return (getattr(p, "ndim", 0) == 2 and p.shape[1] % 128 == 0
            and p.shape[0] % 32 == 0 and p.size >= 64 * 1024)


def _update_leaf_pallas8(p, m8, v8, g, scalars, b1, b2, eps, wd,
                         quant: bool = False):
    """8-bit-moment AdamW leaf update.  Returns (p', Moment8 m, Moment8 v
    [, wq, ws])."""
    rows, cols = p.shape
    # live bytes/row: p in+out (2x), mq/vq in+out (2x1 each), g, f32 temps
    bytes_per_row = cols * (p.dtype.itemsize * 2 + 4 + g.dtype.itemsize + 16)
    blk = max((16 * 1024 * 1024) // (2 * bytes_per_row), 32)
    blk = min(1 << (int(blk).bit_length() - 1), 512, rows)
    blk = max(blk, 32)
    grid = (pl.cdiv(rows, blk),)
    bs = pl.BlockSpec((blk, cols), lambda i: (i, 0))
    ss = pl.BlockSpec((blk, 1), lambda i: (i, 0))
    out_shape = [jax.ShapeDtypeStruct(p.shape, p.dtype),
                 jax.ShapeDtypeStruct(p.shape, jnp.int8),
                 jax.ShapeDtypeStruct((rows, 1), jnp.float32),
                 jax.ShapeDtypeStruct(p.shape, jnp.int8),
                 jax.ShapeDtypeStruct((rows, 1), jnp.float32)]
    out_specs = [bs, bs, ss, bs, ss]
    if quant:
        kernel = functools.partial(_adamw8_quant_kernel, b1=b1, b2=b2,
                                   eps=eps, wd=wd)
        out_specs += [bs, ss]
        out_shape += [jax.ShapeDtypeStruct(p.shape, jnp.int8),
                      jax.ShapeDtypeStruct((rows, 1), jnp.float32)]
    else:
        kernel = functools.partial(_adamw8_kernel, b1=b1, b2=b2,
                                   eps=eps, wd=wd)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  bs, bs, ss, bs, ss, bs],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(scalars, p, m8.q, m8.s, v8.q, v8.s, g)
    res = (out[0], Moment8(out[1], out[2]), Moment8(out[3], out[4]))
    return res + tuple(out[5:])


def _update_leaf_xla(p, m, v, g, scalars, b1, b2, eps, wd):
    scale, lr, inv_bc1, inv_bc2 = (scalars[0], scalars[1], scalars[2], scalars[3])
    gf = g.astype(jnp.float32) * scale
    mf = b1 * m.astype(jnp.float32) + (1.0 - b1) * gf
    vf = b2 * v.astype(jnp.float32) + (1.0 - b2) * gf * gf
    pf = p.astype(jnp.float32)
    pf = pf - lr * ((mf * inv_bc1) / (jnp.sqrt(vf * inv_bc2) + eps) + wd * pf)
    return pf.astype(p.dtype), mf.astype(m.dtype), vf.astype(v.dtype)


def fused_adamw_apply(params, mu, nu, grads, count, schedule,
                      b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
                      max_grad_norm=1.0, quant_paths=()):
    """Tree-level apply: returns (new_params, new_mu, new_nu, quant).

    ``count`` is the post-increment step (1-based, like optax/torch).
    ``quant_paths``: flat param-dict keys whose int8 copy + per-row scales
    are emitted fused (params must be a flat path dict then); ``quant`` is
    {path: (wq, ws)} or None when no paths were given.
    """
    import optax

    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6)).astype(jnp.float32)
    # schedule at the pre-increment count (= optax scale_by_schedule);
    # bias correction at the 1-based post-increment count.
    lr = jnp.asarray(schedule(count - 1), jnp.float32)
    cf = count.astype(jnp.float32)
    inv_bc1 = 1.0 / (1.0 - b1 ** cf)
    inv_bc2 = 1.0 / (1.0 - b2 ** cf)
    scalars = jnp.stack([scale, lr, inv_bc1, inv_bc2])

    def pallas_ok(p):
        return (p.ndim == 2 and p.shape[1] % 128 == 0 and p.shape[0] % 8 == 0
                and p.size >= 64 * 1024)

    def leaf(p, m, v, g, quant=False):
        if pallas_ok(p):
            return _update_leaf_pallas(p, m, v, g, scalars,
                                       b1, b2, eps, weight_decay, quant=quant)
        out = _update_leaf_xla(p, m, v, g, scalars, b1, b2, eps, weight_decay)
        if quant:
            from ..quant import quantize_weight
            wq, ws = quantize_weight(out[0], axis=0)
            return out + (wq, ws[:, 0])
        return out

    qset = set(quant_paths)
    has_m8 = (isinstance(mu, dict)
              and any(isinstance(x, Moment8) for x in mu.values()))
    if qset or has_m8:
        if not isinstance(params, dict):
            raise ValueError(
                "quant_paths / 8-bit moments require flat path-dict params")
        new_p, new_m, new_v, quant = {}, {}, {}, {}
        for k in params:
            q = k in qset and params[k].shape[0] % 32 == 0
            if isinstance(mu[k], Moment8):
                out = _update_leaf_pallas8(params[k], mu[k], nu[k], grads[k],
                                           scalars, b1, b2, eps, weight_decay,
                                           quant=q)
            else:
                out = leaf(params[k], mu[k], nu[k], grads[k], quant=q)
            new_p[k], new_m[k], new_v[k] = out[:3]
            if q:
                ws = out[4]
                quant[k] = (out[3], ws[:, 0] if ws.ndim == 2 else ws)
            elif k in qset:   # rows not 32-divisible: quantize outside
                from ..quant import quantize_weight
                wq, ws = quantize_weight(new_p[k], axis=0)
                quant[k] = (wq, ws[:, 0])
        return new_p, new_m, new_v, quant if qset else None

    out = jax.tree_util.tree_map(leaf, params, mu, nu, grads)
    is_triple = lambda x: isinstance(x, tuple) and len(x) == 3
    unzip = lambda i: jax.tree_util.tree_map(lambda t: t[i], out,
                                             is_leaf=is_triple)
    return unzip(0), unzip(1), unzip(2), None
