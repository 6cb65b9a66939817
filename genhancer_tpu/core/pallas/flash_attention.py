"""Pallas TPU fused attention (forward + custom VJP backward).

Replaces the reference's cuDNN flash attention
(``torch.nn.functional.scaled_dot_product_attention``,
``/root/reference/Continuous/src/flux/math.py:9``) for the DiT joint-stream
attention.  Design point: GenHancer sequences are short (<= ~2.4k tokens —
SURVEY.md §5.7), so full K/V for one (batch, head) fit comfortably in VMEM
(2.3k x 128 bf16 = 0.6 MB each).  Kernels therefore block only the query
axis — no online-softmax running state, exact softmax per q-block row:

  * forward: grid (B, H, nQ); one [BQ, L] f32 score tile, softmax, PV.
             Also emits the per-row softmax statistics lse = max + log(sum)
             (broadcast over an 8-lane minor dim so the array tiles), saved
             as a VJP residual.
  * dq:      same grid; recomputes only p = exp(s - lse) from the saved
             statistics — no row max/sum reductions or divide in the
             backward; then dp = dO V^T, ds = p(dp - D_i).
  * dk/dv:   grid (B, H); fori over q-blocks accumulating into [L, D] f32
             VMEM scratch (1.2 MB each), same exp(s - lse) recompute.

Saving lse cuts the backward's softmax recompute from five [BQ, L] f32 VPU
passes to one exp: measured in-jit at the sliding-window design point
(B=2, L=2169, H=24, D=128, 16 chained layers) backward 1.247 -> 1.063
ms/layer (-15%), fwd+bwd -6.8% (scripts/attn_lse_probe.py).

Never materializes [L, L] in HBM — activation memory is O(B·H·L·D), which is
what lets video sliding-window batches train without remat.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import spmd


DEFAULT_BLOCK_Q = 256

# interpret mode for CPU-based testing (set before import)
_INTERPRET = os.environ.get("GENHANCER_PALLAS_INTERPRET", "0") == "1"


# lse is stored [B, H, L_pad, LSE_LANES] f32, the row statistic broadcast
# over a minor lane dim (Pallas blocks must tile in their last two dims; 8
# is the smallest sublane-legal width).  L_pad = nQ * block_q.
LSE_LANES = 8


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    q = q_ref[0]                                # [h_blk, BQ, D]
    k = k_ref[0]                                # [h_blk, L, D]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    # q rows beyond seq_len are dropped on store; k positions are exact
    # because K/V are unblocked along L.
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    den = jnp.sum(e, axis=-1, keepdims=True)
    p = e * (1.0 / den)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)
    lse = mx + jnp.log(den)                     # [h_blk, BQ, 1]
    lse_ref[0] = jnp.broadcast_to(lse, lse.shape[:-1] + (LSE_LANES,))


def _to_bhld(x):
    return x.transpose(0, 2, 1, 3)


# Pipelining budget for picking the head-block (leaves room for double
# buffering); the hard ceiling for "does this shape fit at all" is the
# physical ~16 MB/core VMEM minus margin.
_VMEM_BUDGET = 9 * 1024 * 1024
_VMEM_CEILING = 14 * 1024 * 1024


def _fwd_estimate(hb: int, l: int, d: int, block_q: int) -> int:
    return (2 * 2 * hb * l * d * 2          # K/V, double-buffered, bf16
            + 2 * 2 * hb * block_q * d * 2  # q/o blocks
            + 2 * hb * block_q * l * 4      # logits + probs f32
            + 2 * hb * block_q * 8 * 4)     # lse out block


def _dkv_estimate(hb: int, l: int, d: int, block_q: int) -> int:
    l_pad = pl.cdiv(l, block_q) * block_q
    return (2 * 3 * hb * l_pad * d * 2      # q/o/do resident, double-buffered
            + 2 * 2 * hb * l * d * 2        # k/v
            + 2 * hb * l * d * 4            # f32 accumulator scratch
            + 2 * hb * block_q * l * 4      # p/ds tiles
            + 2 * hb * l_pad * 8 * 4)       # lse resident


def flash_supported(l: int, h: int, d: int,
                    block_q: int = DEFAULT_BLOCK_Q) -> bool:
    """Whether the kernels' VMEM residency fits at this shape (even with
    head-block 1).  The binding constraint is the dk/dv kernel, which keeps
    full-length q/o/do + k/v + f32 accumulators resident — it fits to roughly
    L ~ 2.5k at D=128 (the GenHancer design point is <= ~2.4k joint tokens,
    SURVEY.md §5.7; L=2304 measured OK on v5e).  Beyond it callers must use a
    blocked fallback (core.attention.sdpa_xla_qchunk)."""
    return (_fwd_estimate(1, l, d, block_q) <= _VMEM_CEILING
            and _dkv_estimate(1, l, d, block_q) <= _VMEM_CEILING)


def _flash_head_block(h: int, l: int, d: int, block_q: int) -> int:
    """Heads per program under the pipelining VMEM estimate (fwd/dq tiles;
    the dkv kernel shares the choice and its fit is guarded by
    ``flash_supported``)."""
    best = 1
    for cand in (8, 6, 4, 3, 2, 1):
        if h % cand:
            continue
        if _fwd_estimate(cand, l, d, block_q) <= _VMEM_BUDGET:
            return cand
    return best


def _fwd(q, k, v, block_q):
    """q/k/v arrive [B, L, H, D]; kernels run in [B, H, L, D] (TPU lowering
    needs the blocked seq dim in the last-two block positions).  Returns
    (o [B, L, H, D], lse [B, H, L_pad, LSE_LANES] f32)."""
    b, l, h, d = q.shape
    nq = pl.cdiv(l, block_q)
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_fwd_kernel, scale=scale)
    qt, kt, vt = _to_bhld(q), _to_bhld(k), _to_bhld(v)
    hb = _flash_head_block(h, l, d, block_q)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, h // hb, nq),
        in_specs=[
            pl.BlockSpec((1, hb, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, hb, l, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, hb, l, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, hb, block_q, d),
                                lambda bi, hi, qi: (bi, hi, qi, 0)),
                   pl.BlockSpec((1, hb, block_q, LSE_LANES),
                                lambda bi, hi, qi: (bi, hi, qi, 0))),
        out_shape=(spmd.out_struct(qt.shape, q.dtype, qt, kt, vt),
                   spmd.out_struct((b, h, nq * block_q, LSE_LANES),
                                   jnp.float32, qt, kt, vt)),
        interpret=_INTERPRET,
    )(qt, kt, vt)
    return _to_bhld(out), lse


def _dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref, *, scale):
    q = q_ref[0]                                # [h_blk, BQ, D]
    k = k_ref[0]                                # [h_blk, L, D]
    v = v_ref[0]
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][..., :1]                   # [h_blk, BQ, 1]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do.astype(v.dtype), v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    d_i = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - d_i)
    dq = jax.lax.dot_general(ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale, block_q, n_q_blocks):
    """Head-batched: refs [1, h_blk, L(_pad), D].  q/o/do arrive zero-padded
    to a block_q multiple and lse zero-filled there (see _bwd_impl): a
    padded row has s = 0, p = exp(0 - 0) = 1 (finite), do = 0, so dp = 0,
    d_i = 0 -> ds = 0 and dv-contribution p^T @ 0 = 0 — padded rows
    contribute exactly nothing, no masking needed."""
    k = k_ref[0]                                # [hb, L, D]
    v = v_ref[0]
    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    def body(qi, _):
        sl = pl.ds(qi * block_q, block_q)
        q = q_ref[0, :, sl, :]                  # [hb, BQ, D]
        o = o_ref[0, :, sl, :].astype(jnp.float32)
        do = do_ref[0, :, sl, :].astype(jnp.float32)
        lse = lse_ref[0, :, sl, :1]             # [hb, BQ, 1]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)                    # [hb, BQ, L]
        dp = jax.lax.dot_general(do.astype(v.dtype), v, (((2,), (2,)), ((0,), (0,))),
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


def _bwd_impl(q, k, v, o, lse, do, block_q):
    b, l, h, d = q.shape
    nq = pl.cdiv(l, block_q)
    scale = 1.0 / (d ** 0.5)
    qt, kt, vt, ot, dot = (x.transpose(0, 2, 1, 3) for x in (q, k, v, o, do))
    l_pad = nq * block_q

    # lse rows beyond L hold the forward kernel's compute over out-of-bounds
    # block padding (undefined).  The dq kernel only ever uses them for rows
    # it drops on store, but the dkv kernel ACCUMULATES across rows — zero
    # them so padded rows stay exactly inert (exp(0 - 0) = 1, see
    # _dkv_kernel).  dq reads per-block slices of the same sanitized array.
    if l_pad != l:
        lse = lse.at[:, :, l:, :].set(0.0)

    hb = _flash_head_block(h, l, d, block_q)
    lse_spec = pl.BlockSpec((1, hb, block_q, LSE_LANES),
                            lambda bi, hi, qi: (bi, hi, qi, 0))
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        grid=(b, h // hb, nq),
        in_specs=[
            pl.BlockSpec((1, hb, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, hb, l, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, hb, l, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, hb, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, hb, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            lse_spec,
        ],
        out_specs=pl.BlockSpec((1, hb, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=spmd.out_struct(qt.shape, q.dtype, qt, kt, vt, ot, dot, lse),
        interpret=_INTERPRET,
    )(qt, kt, vt, ot, dot, lse)

    # zero-pad the q axis so in-kernel pl.ds never clamps (see _dkv_kernel)
    if l_pad != l:
        pad = [(0, 0), (0, 0), (0, l_pad - l), (0, 0)]
        q_p, o_p, do_p = (jnp.pad(x, pad) for x in (qt, ot, dot))
    else:
        q_p, o_p, do_p = qt, ot, dot

    full_kv = pl.BlockSpec((1, hb, l, d), lambda bi, hi: (bi, hi, 0, 0))
    full_q = pl.BlockSpec((1, hb, l_pad, d), lambda bi, hi: (bi, hi, 0, 0))
    full_lse = pl.BlockSpec((1, hb, l_pad, LSE_LANES),
                            lambda bi, hi: (bi, hi, 0, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block_q,
                          n_q_blocks=nq),
        grid=(b, h // hb),
        in_specs=[full_q, full_kv, full_kv, full_q, full_q, full_lse],
        out_specs=(full_kv, full_kv),
        out_shape=(spmd.out_struct(kt.shape, k.dtype, q_p, kt, vt, lse),
                   spmd.out_struct(vt.shape, v.dtype, q_p, kt, vt, lse)),
        scratch_shapes=[pltpu.VMEM((hb, l, d), jnp.float32),
                        pltpu.VMEM((hb, l, d), jnp.float32)],
        interpret=_INTERPRET,
    )(q_p, kt, vt, o_p, do_p, lse)
    return (dq.transpose(0, 2, 1, 3), dk.transpose(0, 2, 1, 3),
            dv.transpose(0, 2, 1, 3))


# ---------------------------------------------------------------------------
# SPMD-safe entry points: custom_partitioning declares B/H embarrassingly
# parallel (grid is (B, H/hb, nQ)) so mesh-partitioned callers run the kernel
# on local shards instead of all-gathering (core/pallas/spmd.py).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _fwd_sp(block_q):
    from . import spmd

    def fwd(q, k, v):
        return _fwd(q, k, v, block_q)

    return spmd.wrap(fwd, (spmd.BHLD,) * 3, (spmd.BHLD, spmd.LSE),
                     spmd.FWD_LSE_RULE, spmd.FWD_LSE_REPL)


@functools.lru_cache(maxsize=None)
def _bwd_sp(block_q):
    from . import spmd

    def bwd(q, k, v, o, lse, do):
        return _bwd_impl(q, k, v, o, lse, do, block_q)

    return spmd.wrap(bwd, (spmd.BHLD,) * 4 + (spmd.LSE, spmd.BHLD),
                     (spmd.BHLD,) * 3,
                     spmd.BWD_LSE_RULE, spmd.BWD_LSE_REPL)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, block_q: int = DEFAULT_BLOCK_Q):
    """q, k, v: [B, L, H, D] -> [B, L, H, D] (exact softmax attention)."""
    return _fwd_sp(block_q)(q, k, v)[0]


def _flash_fwd(q, k, v, block_q):
    o, lse = _fwd_sp(block_q)(q, k, v)
    return o, (q, k, v, o, lse)


def _flash_bwd(block_q, res, do):
    q, k, v, o, lse = res
    return _bwd_sp(block_q)(q, k, v, o, lse, do)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
