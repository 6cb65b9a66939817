"""Pallas int8 weight-gradient (dW) kernel with fused per-block-column quant.

dW[o, i] = sum_t g[t, o] * x[t, i] — the token-axis contraction that is ~1/3
of the DiT step's matmul FLOPs.  The XLA int8 variant of this dot
(``core.quant.switchback_linear_full``) measured NEUTRAL on v5e: its
per-column quantization of g and x runs as separate HBM passes (amax read +
quant read + int8 write per operand) that eat the 1.49x int8-dot win
(STATUS.md round-2).  This kernel eliminates those passes: g/x tiles are
loaded bf16 into VMEM once, quantized in-register per (t-block, column) —
strictly FINER granularity than the XLA variant's full-T per-column scales,
so quant error is bounded by the same analysis (Jetfire-style INT8 data
flow, arXiv:2403.12422) — and fed to the MXU as int8 with an f32 [Ob, Ib]
accumulator across t-blocks.

Scale factoring is exact per t-block: within block t, scales sg[o] and
sx[i] are constant along the contraction rows, so
``partial = (gq^T @ xq) * sg[o] (outer) sx[i]`` reconstructs the bf16 block
product up to rounding.  Zero-padding the ragged last t-block is exact
(q(0) = 0 contributes nothing).

Grid: (nO, nI, nT), t innermost for accumulation; tiles default
(Tb, Ob, Ib) = (512, 256, 256): ~1.3 MB live VMEM incl. double buffering.

STATUS: EXPERIMENTAL, measured SLOWER than the XLA bf16 dW on v5e — kept as
a documented negative result and for future Mosaic toolchain improvements.
Measured (scripts/dw_kernel_bench.py, exclusive chip): XLA bf16 dW runs at
66-87% of bf16 peak on the flux-dev shapes; this kernel reaches 15% of int8
peak at 256-tiles (HBM-bound on tile reloads + VPU-bound on in-tile quant)
and 24-30% at 512-tiles (GENHANCER_DW_BLOCK_O/I=512) — 0.63-0.73x XLA;
1024-tiles exceed the 16 MB scoped VMEM.  With the int8 dW-pattern dot
ceiling itself at 50.6% of int8 peak (BASELINE.md), the best case is ~1.19x
over XLA bf16 — the Mosaic matmul emitter gap eats all of it.  Full-step
measurement: step_pre 315.7 ms with this kernel vs 207.0 ms with bf16 dW.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("GENHANCER_PALLAS_INTERPRET", "0") == "1"

DEFAULT_BLOCK_T = int(os.environ.get("GENHANCER_DW_BLOCK_T", "512"))
DEFAULT_BLOCK_O = int(os.environ.get("GENHANCER_DW_BLOCK_O", "256"))
DEFAULT_BLOCK_I = int(os.environ.get("GENHANCER_DW_BLOCK_I", "256"))


def _dw_kernel(g_ref, x_ref, dw_ref, acc_ref, *, n_t, t_rows, block_t):
    ti = pl.program_id(2)

    @pl.when(ti == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    g = g_ref[...].astype(jnp.float32)          # [Tb, Ob]
    x = x_ref[...].astype(jnp.float32)          # [Tb, Ib]
    # mask the ragged last t-block (zero rows contribute nothing)
    row = ti * block_t + jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    g = jnp.where(row < t_rows, g, 0.0)
    row_x = ti * block_t + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    x = jnp.where(row_x < t_rows, x, 0.0)

    # per-(t-block, column) symmetric int8 quant, entirely in VMEM
    sg = jnp.maximum(jnp.max(jnp.abs(g), axis=0, keepdims=True), 1e-12) / 127.0
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=0, keepdims=True), 1e-12) / 127.0
    gq = jnp.clip(jnp.round(g / sg), -127, 127).astype(jnp.int8)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(gq, xq, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc_ref[...] += acc.astype(jnp.float32) * sg.T * sx   # [Ob, Ib]

    @pl.when(ti == n_t - 1)
    def _store():
        dw_ref[...] = acc_ref[...].astype(dw_ref.dtype)


def int8_dw(g2: jax.Array, x2: jax.Array, out_dtype=jnp.float32,
            block_t: int = DEFAULT_BLOCK_T, block_o: int = DEFAULT_BLOCK_O,
            block_i: int = DEFAULT_BLOCK_I) -> jax.Array:
    """g2: [T, O], x2: [T, I] (bf16/f32) -> dW [O, I] in ``out_dtype``."""
    t, o = g2.shape
    t2, i = x2.shape
    assert t == t2, (g2.shape, x2.shape)
    n_t = pl.cdiv(t, block_t)
    kernel = functools.partial(_dw_kernel, n_t=n_t, t_rows=t, block_t=block_t)
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(o, block_o), pl.cdiv(i, block_i), n_t),
        in_specs=[
            pl.BlockSpec((block_t, block_o), lambda oi, ii, ti: (ti, oi)),
            pl.BlockSpec((block_t, block_i), lambda oi, ii, ti: (ti, ii)),
        ],
        out_specs=pl.BlockSpec((block_o, block_i), lambda oi, ii, ti: (oi, ii)),
        out_shape=jax.ShapeDtypeStruct((o, i), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_o, block_i), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(g2, x2)


def dw_supported(t: int, o: int, i: int) -> bool:
    """Lane-dim constraints: O and I must tile to 128 lanes."""
    return o % 128 == 0 and i % 128 == 0 and t >= 8
