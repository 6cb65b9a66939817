"""Pallas fused per-row activation quantization (amax + scale + cast in one
HBM pass).

``core.quant.quantize_activation_rows`` is the hottest non-matmul op of the
int8 training stack: every SwitchBack linear quantizes its activation (fwd)
and its column-scaled gradient (bwd) — ~48 sites per flux-dev step.  XLA
lowers it as TWO passes over x (a row-amax reduction fusion, then a
scale+round+clip fusion that re-reads x), because the row max must complete
before any element can be scaled.  In Pallas the x tile simply stays in VMEM
between the two phases — one HBM read instead of two (plus the int8 store),
saving ~40 MB of traffic per [6304, 3072] site (~5-7 ms/step across the
stack, measured on v5e).

The optional ``cs`` operand fuses the backward's per-column dequant-scale
multiply (``gs = g * ws``, core.quant._switchback_bwd) into the same pass.

Math is bit-identical to the XLA path: f32 amax -> max(amax,1e-12)/127 ->
round-half-even -> clip -> int8.

Grid: (nT,) over row blocks, fully parallel; the lane-axis (C) max reduction
is a native VPU reduction.  Row blocks are multiples of 32 (int8 output
sublane tiling); C must tile to 128 lanes (checked by ``supported``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET = os.environ.get("GENHANCER_PALLAS_INTERPRET", "0") == "1"


def _kernel(x_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q_ref[...] = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    s_ref[...] = s


def _kernel_cs(x_ref, cs_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32) * cs_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q_ref[...] = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    s_ref[...] = s


def _block_rows(c: int) -> int:
    """Row-block targeting ~3 MB of f32 working set; multiples of 32 for the
    int8 output tile."""
    blk = (3 * 1024 * 1024) // (c * 4)
    return max(32, min(512, (blk // 32) * 32))


def rowquant(x2: jax.Array, cs=None):
    """x2: [T, C] -> (q int8 [T, C], s f32 [T]).  ``cs``: optional [C] f32
    per-column scale folded in before quantization (bwd ``g * ws``)."""
    t, c = x2.shape
    blk = min(_block_rows(c), max(32, t))
    bs = pl.BlockSpec((blk, c), lambda i: (i, 0))
    ss = pl.BlockSpec((blk, 1), lambda i: (i, 0))
    out_shape = (jax.ShapeDtypeStruct((t, c), jnp.int8),
                 jax.ShapeDtypeStruct((t, 1), jnp.float32))
    if cs is not None:
        q, s = pl.pallas_call(
            _kernel_cs,
            grid=(pl.cdiv(t, blk),),
            in_specs=[bs, pl.BlockSpec((1, c), lambda i: (0, 0))],
            out_specs=(bs, ss),
            out_shape=out_shape,
            interpret=_INTERPRET,
        )(x2, cs.reshape(1, c))
    else:
        q, s = pl.pallas_call(
            _kernel,
            grid=(pl.cdiv(t, blk),),
            in_specs=[bs],
            out_specs=(bs, ss),
            out_shape=out_shape,
            interpret=_INTERPRET,
        )(x2)
    return q, s[:, 0]


# -- SPMD-safe entry (rows = batch*tokens shard over the data axis) ---------

@functools.lru_cache(maxsize=None)
def _sp(with_cs: bool):
    from . import spmd

    # positional-only closures: custom_partitioning cannot resolve
    # default/keyword-bound parameters as operands
    if with_cs:
        return spmd.wrap(lambda x, cs: rowquant(x, cs),
                         (spmd.TC, spmd.C), (spmd.TC, spmd.T),
                         spmd.ROWQ_CS_RULE, spmd.ROWQ_REPL)
    return spmd.wrap(lambda x: rowquant(x), (spmd.TC,), (spmd.TC, spmd.T),
                     spmd.ROWQ_RULE, spmd.ROWQ_REPL)


def rowquant_spmd(x2: jax.Array, cs=None):
    if cs is not None:
        return _sp(True)(x2, cs)
    return _sp(False)(x2)


def supported(t: int, c: int) -> bool:
    return c % 128 == 0 and t >= 32


def available() -> bool:
    # OPT-IN (GENHANCER_ROWQUANT=1): measured on v5e, XLA's own fusion of the
    # two-pass quant already runs at parity (C=3072: 0.385 vs 0.384 ms) or
    # better (C=12288: 0.679 vs 1.128 ms — Mosaic under-pipelines wide rows),
    # and the full step REGRESSED 207.0 -> 218.0 ms with the kernel engaged.
    # Kept as a tested negative result (mirrors int8_dw.py's status).
    if os.environ.get("GENHANCER_ROWQUANT", "0") != "1":
        return False
    if _INTERPRET:
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
