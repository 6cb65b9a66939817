"""Int8 quantization for FROZEN compute paths (stage-1 tower + VAE encoder).

Why: the v5e MXU runs int8 at 2x bf16 throughput (394 vs 197 TOPS), and
BASELINE.md's ceiling analysis shows the bf16 step floor sits below the 2x
target — the frozen conditioning paths are the safe place to spend int8:
in stage 1 the projectors and DiT *train against* whatever the frozen tower
emits, so a slightly-quantized tower is just a slightly different frozen
teacher (and the VAE latent is noised by the flow objective immediately).

Scheme (weight-static, activation-dynamic — no calibration data needed):
  * weights: symmetric per-output-channel int8,
    ``w_q = round(clip(w / s_w))``, ``s_w[o] = max|w[o, :]| / 127``,
    quantized ONCE at state creation (halves weight HBM reads too);
  * activations: symmetric dynamic quantization — per-token (last-dim row)
    for linears, per-tensor for convs;
  * accumulation in int32 on the MXU, dequantized as ``(s_x ⊗ s_w)``.

Application is param-tree surgery: ``quantize_linear_tree`` /
``quantize_conv_tree`` replace ``weight`` with ``weight_q``+``w_scale`` on
eligible nodes; ``core.nn.linear`` / ``core.nn.conv2d`` dispatch on the node
shape.  Trainable (LoRA-wrapped) nodes and embedding tables are never
touched; stage-2 runs the tower in bf16 (it is inside autodiff there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array, axis: int = 0):
    """Per-output-channel symmetric int8: ``axis`` is the OUTPUT-channel axis
    that keeps its own scale (0 for [out, in] linears — the default — and 3
    for HWIO convs); all other axes are reduced for the amax.
    Returns (int8 weights, f32 scales with the reduced axes kept at 1)."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes,
                   keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def quantize_activation_rows(x: jax.Array, col_scale=None):
    """Per-row (last dim) symmetric dynamic quant: (int8, f32 [..., 1]).

    ``col_scale``: optional [C] f32 multiplier folded in before quantization
    (the backward's ``g * ws`` dequant-scale).

    On TPU this dispatches to the single-HBM-pass Pallas kernel
    (core.pallas.rowquant): XLA needs two passes over x because the row amax
    must complete before scaling, while the Pallas tile stays in VMEM between
    the phases — the int8 stack's hottest non-matmul op (~48 sites/step).
    Math is bit-identical on both paths."""
    c = x.shape[-1]
    if x.ndim >= 2:
        from .pallas import rowquant as rq
        t = x.size // c
        if rq.supported(t, c) and rq.available():
            cs = (None if col_scale is None
                  else col_scale.astype(jnp.float32).reshape(c))
            q, s = rq.rowquant_spmd(x.reshape(t, c), cs)
            return (q.reshape(x.shape), s.reshape(x.shape[:-1] + (1,)))
    xf = x.astype(jnp.float32)
    if col_scale is not None:
        xf = xf * col_scale.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_activation_tensor(x: jax.Array):
    """Per-tensor symmetric dynamic quant (convs)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


# ---------------------------------------------------------------------------
# Shared backward building blocks.  Every int8 VJP in this file composes
# these three — ONE copy of each scale-factoring derivation, so a numerics
# fix applies to all variants at once (cached/uncached x dW-flavor).
# ---------------------------------------------------------------------------

def _int8_fwd_base(x: jax.Array, wq: jax.Array, ws: jax.Array) -> jax.Array:
    """y = x @ dequant(wq, ws)^T on the int8 MXU: per-token x rows x
    per-out-channel W rows, int32 accumulate, dequant (s_x ⊗ s_w).
    ``ws``: 1-D [out] or [out, 1] keepdims — normalized here."""
    xq, sx = quantize_activation_rows(x)
    acc = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * ws.reshape(-1)
    return y.astype(x.dtype)


def _int8_dx(g: jax.Array, wq: jax.Array, ws: jax.Array, out_dtype):
    """dx = g @ W on the int8 MXU via exact scale folding.

    W[o,i] = wq[o,i]·ws[o] with ws constant along the contraction, so
    dx = dequant((g·ws)_q @ wq) — the weight stays int8 end to end (no
    dequantized bf16 copy).  Quantizing the *scaled* g per token keeps the
    dynamic-quant error at the same relative level as quantizing g
    directly.  ``ws``: 1-D [out] (optimizer-cache layout) or the [out, 1]
    keepdims column from quantize_weight — normalized here."""
    gq, sg = quantize_activation_rows(g, col_scale=ws.reshape(-1))
    acc = jax.lax.dot_general(gq, wq, (((g.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sg).astype(out_dtype)


def _bf16_dw(g: jax.Array, x: jax.Array, out_dtype):
    """dW[o,i] = sum_t g[t,o] x[t,i] over flattened tokens, f32 accumulate —
    the precision-critical SwitchBack weight gradient (arXiv:2304.13013)."""
    g2 = g.reshape(-1, g.shape[-1])
    x2 = x.reshape(-1, x.shape[-1])
    return jax.lax.dot_general(g2, x2, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(out_dtype)


def _int8_dw_cols(g: jax.Array, x: jax.Array, out_dtype):
    """Full-int8 dW with exact per-output x per-input scale factoring:
    quantize g and x per COLUMN (both scale vectors constant along the
    token contraction), dW = sg[o] * sx[i] * (gq^T @ xq)."""
    g2 = g.reshape(-1, g.shape[-1])
    x2 = x.reshape(-1, x.shape[-1])
    gq2, sgc = _quantize_cols(g2)           # [T, out], scale [1, out]
    xq2, sxc = _quantize_cols(x2)           # [T, in],  scale [1, in]
    acc_w = jax.lax.dot_general(gq2, xq2, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    return (acc_w.astype(jnp.float32) * sgc.T * sxc).astype(out_dtype)


@jax.custom_vjp
def _int8_matmul(x: jax.Array, wq: jax.Array, ws: jax.Array) -> jax.Array:
    """Forward on the int8 MXU; backward is the straight-through estimator
    dx = g @ dequant(w), itself run on the int8 MXU via scale folding (the
    _switchback_bwd pattern: W[o,i] = wq[o,i]·ws[o], ws constant along the
    contraction, so dx = (g·ws)_q @ wq).  ``round`` has zero gradient a.e.,
    so without the STE, gradients flowing *through* a quantized layer
    (stage-2 QLoRA stacks, int8 DiT forward) would vanish."""
    return _int8_fwd_base(x, wq, ws)


def _int8_matmul_fwd(x, wq, ws):
    return _int8_matmul(x, wq, ws), (wq, ws)


def _int8_matmul_bwd(res, g):
    import numpy as np
    wq, ws = res
    return (_int8_dx(g, wq, ws, g.dtype),
            np.zeros(wq.shape, jax.dtypes.float0),             # int8 primal
            jnp.zeros_like(ws))

_int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


def linear_int8_base(p, x: jax.Array) -> jax.Array:
    """Base matmul only (no bias/LoRA — core.nn.linear adds those):
    y = dequant(x_q @ w_q^T); node: {weight_q [o,i], w_scale [o,1], ...}."""
    return _int8_matmul(x, p["weight_q"], p["w_scale"])


def conv2d_int8(p, x: jax.Array, stride: int = 1, padding="SAME") -> jax.Array:
    """NHWC conv with int8 MXU accumulation; node: {weight_q HWIO, w_scale
    [1,1,1,O], bias?}.  Zero-padding is exact for symmetric quant (q(0)=0)."""
    xq, sx = quantize_activation_tensor(x)
    acc = jax.lax.conv_general_dilated(
        xq, p["weight_q"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * p["w_scale"][0, 0, 0])
    y = y.astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# SwitchBack linear — int8 training for the DiT (trainable weights).
#
# Scheme follows Wortsman et al., "Stable and low-precision training for
# large-scale vision-language models" (arXiv:2304.13013): of a linear's three
# matmuls, the forward (x @ W^T) and the input gradient (g @ W) run on the
# int8 MXU with dynamically quantized activations/gradients; the weight
# gradient (g^T @ x) stays in bf16 — it is the precision-critical one (it
# feeds the optimizer) and quantizing it is what historically destabilized
# int8 training.  Scales factor exactly:
#   fwd: per-token x rows  x  per-out-channel W rows,
#   dx:  per-token g rows  x  per-in-channel  W cols.
# W is quantized fresh from the bf16 master each step (it is training) —
# once, in the forward; the backward reuses the same int8 W via scale
# folding (see _switchback_bwd).  Measured on v5e at [6304,3072,3072]:
# quant+dot+dequant runs at 1.41x a bf16 dot (pure int8 dot: 1.55x).
# ---------------------------------------------------------------------------

@jax.custom_vjp
def switchback_linear(x: jax.Array, w: jax.Array) -> jax.Array:
    """y = x @ w^T with int8 forward; w: [out, in] bf16/f32 master weights."""
    wq, ws = quantize_weight(w, axis=0)
    return _int8_fwd_base(x, wq, ws)


def _switchback_fwd(x, w):
    # Residuals carry the ALREADY-quantized weight: the backward dx matmul
    # reuses it by folding the per-output scales into g (see _switchback_bwd)
    # — eliminating the whole axis-1 re-quantization pass over W (~2 HBM
    # passes per step at 1.3B params).  int8 wq is also half the residual
    # bytes of carrying bf16 w.
    wq, ws = quantize_weight(w, axis=0)
    return _int8_fwd_base(x, wq, ws), (x, wq, ws, jnp.zeros((), w.dtype))


def _switchback_bwd(res, g):
    x, wq, ws, w_proto = res
    return (_int8_dx(g, wq, ws, x.dtype),
            _bf16_dw(g, x, w_proto.dtype))


switchback_linear.defvjp(_switchback_fwd, _switchback_bwd)


# ---------------------------------------------------------------------------
# Cached-weight SwitchBack — optimizer-fused weight quantization.
#
# ``switchback_linear`` re-quantizes W from the bf16 master inside every
# forward: a full HBM read of W (+ the amax reduction) per step per layer.
# But the optimizer already has the NEW W in registers while writing it —
# the Pallas AdamW kernel (core/pallas/adamw.py) can emit the int8 copy and
# per-row scales as extra outputs for free (one extra 1-byte/param store),
# and the next forward just loads them.  Semantics are bit-identical to
# switchback_linear: the cache always holds quantize_weight(current W).
# The scale vector here is 1-D [out] (the kernel emits rows).
# ---------------------------------------------------------------------------

@jax.custom_vjp
def switchback_linear_cached(x: jax.Array, w: jax.Array,
                             wq: jax.Array, ws: jax.Array) -> jax.Array:
    """y = x @ dequant(wq, ws)^T on the int8 MXU; w (the bf16 master) is
    passed only so autodiff has a leaf to attach dW to.  wq: int8 [out, in];
    ws: f32 [out]."""
    return _int8_fwd_base(x, wq, ws)


def _switchback_cached_fwd(x, w, wq, ws):
    return _int8_fwd_base(x, wq, ws), (x, wq, ws, jnp.zeros((), w.dtype))


def _switchback_cached_bwd(res, g):
    import numpy as np
    x, wq, ws, w_proto = res
    return (_int8_dx(g, wq, ws, x.dtype),
            _bf16_dw(g, x, w_proto.dtype),
            np.zeros(wq.shape, jax.dtypes.float0),   # int8 primal: no grad
            jnp.zeros_like(ws))


switchback_linear_cached.defvjp(_switchback_cached_fwd, _switchback_cached_bwd)


# ---------------------------------------------------------------------------
# Pallas-dW variants: same int8 fwd/dx as above, dW through the per-block-
# quant kernel (core.pallas.int8_dw) — selected at forward-trace time by
# core.nn.linear when int8_training_ctx(dw_int8=True).
# ---------------------------------------------------------------------------

def _pallas_dw_ok(t: int, o: int, i: int) -> bool:
    from .pallas.int8_dw import dw_supported
    if not dw_supported(t, o, i):
        return False
    import os
    if os.environ.get("GENHANCER_PALLAS_INTERPRET", "0") == "1":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _dw(g, x, out_dtype):
    """dW = g^T @ x over flattened tokens, int8 Pallas when supported."""
    g2 = g.reshape(-1, g.shape[-1])
    x2 = x.reshape(-1, x.shape[-1])
    if _pallas_dw_ok(g2.shape[0], g2.shape[1], x2.shape[1]):
        from .pallas.int8_dw import int8_dw
        return int8_dw(g2, x2, out_dtype=out_dtype)
    return jax.lax.dot_general(g2, x2, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).astype(out_dtype)


@jax.custom_vjp
def switchback_linear_dw(x: jax.Array, w: jax.Array) -> jax.Array:
    """switchback_linear with the Pallas int8 per-block dW."""
    return switchback_linear(x, w)


def _switchback_dw_bwd(res, g):
    x, wq, ws, w_proto = res
    return _int8_dx(g, wq, ws, x.dtype), _dw(g, x, w_proto.dtype)


switchback_linear_dw.defvjp(_switchback_fwd, _switchback_dw_bwd)


@jax.custom_vjp
def switchback_linear_cached_dw(x, w, wq, ws):
    """switchback_linear_cached with the Pallas int8 per-block dW."""
    return switchback_linear_cached(x, w, wq, ws)


def _switchback_cached_dw_bwd(res, g):
    import numpy as np
    x, wq, ws, w_proto = res
    return (_int8_dx(g, wq, ws, x.dtype), _dw(g, x, w_proto.dtype),
            np.zeros(wq.shape, jax.dtypes.float0),
            jnp.zeros_like(ws))


switchback_linear_cached_dw.defvjp(_switchback_cached_fwd,
                                   _switchback_cached_dw_bwd)


@jax.custom_vjp
def switchback_linear_full_cached(x, w, wq, ws):
    """Full-int8 SwitchBack on the optimizer-maintained cache: int8 fwd + dx
    from (wq, ws), dW on the int8 MXU with per-channel (column) scales — the
    in-forward W re-quantization pass AND the bf16 dW are both gone.  On the
    precomputed stage-1 step this combination measured fastest (STATUS.md r3:
    uncached int8_full already beat cached bf16-dW int8)."""
    return switchback_linear_cached(x, w, wq, ws)


def _switchback_full_cached_bwd(res, g):
    import numpy as np
    x, wq, ws, w_proto = res
    return (_int8_dx(g, wq, ws, x.dtype),
            _int8_dw_cols(g, x, w_proto.dtype),
            np.zeros(wq.shape, jax.dtypes.float0),
            jnp.zeros_like(ws))


switchback_linear_full_cached.defvjp(_switchback_cached_fwd,
                                     _switchback_full_cached_bwd)


# The single source of truth for "which linears run SwitchBack": both the
# forward dispatch (core.nn.int8_training_ctx defaults its min_dim to this)
# and the optimizer-fused cache's layer set (switchback_cache_paths below)
# read it, so the cached copies and the traced int8 path can never silently
# cover different layers.
SWITCHBACK_MIN_DIM = 512


def switchback_cache_paths(flat_params, prefix: str = "dit.",
                           min_dim: int = None) -> tuple:
    """Flat ``.weight`` paths that the int8 DiT forward routes through
    SwitchBack — the leaves whose quantized copies the optimizer maintains.
    ``min_dim`` must equal the int8_training_ctx threshold the forward runs
    with; both default to SWITCHBACK_MIN_DIM."""
    if min_dim is None:
        min_dim = SWITCHBACK_MIN_DIM
    out = []
    for path, leaf in flat_params.items():
        if (path.startswith(prefix) and path.endswith(".weight")
                and getattr(leaf, "ndim", 0) == 2
                and min(leaf.shape) >= min_dim):
            out.append(path)
    return tuple(sorted(out))


def quantize_cache(flat_params, paths) -> dict:
    """{path: (wq int8 [o,i], ws f32 [o])} for the given .weight paths."""
    cache = {}
    for p in paths:
        wq, ws = quantize_weight(flat_params[p], axis=0)
        cache[p] = (wq, ws[:, 0])
    return cache


# ---------------------------------------------------------------------------
# Full-int8 variant — dW on the int8 MXU too (Jetfire-style INT8 data flow).
#
# dW[o,i] = sum_t g[t,o] x[t,i]: quantize g per OUTPUT channel o (axis 0 of
# g^T — columns of g) and x per INPUT channel i (columns of x); both scale
# vectors are constant along the contraction axis t, so the factoring
# dW = sg[o] * sx[i] * (gq^T @ xq) is exact.  Column-wise (per-channel)
# scales are what make int8 dW viable: gradient magnitudes vary far more
# across channels than within one channel's token column.  This is the
# experimental fast path behind ``dit_quant: int8_full`` — measured ~0.7x
# the bf16-dW step time; the shipped default stays SwitchBack (bf16 dW,
# arXiv:2304.13013) whose convergence story is established.
# ---------------------------------------------------------------------------

def _quantize_cols(x2: jax.Array):
    """Per-column symmetric quant of a [T, C] matrix -> (int8, f32 [1, C])."""
    amax = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x2.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


@jax.custom_vjp
def switchback_linear_full(x: jax.Array, w: jax.Array) -> jax.Array:
    return switchback_linear(x, w)


def _switchback_full_fwd(x, w):
    y, res = _switchback_fwd(x, w)
    return y, res


def _switchback_full_bwd(res, g):
    x, wq, ws, w_proto = res
    return (_int8_dx(g, wq, ws, x.dtype),
            _int8_dw_cols(g, x, w_proto.dtype))


switchback_linear_full.defvjp(_switchback_full_fwd, _switchback_full_bwd)


def _eligible_linear(path: str, node: dict) -> bool:
    w = node.get("weight")
    if w is None or getattr(w, "ndim", 0) != 2 or "lora_A" in node:
        return False
    return not any(s in path for s in ("embedding", "embeddings", "logit_scale",
                                       "position_embedding"))


def quantize_linear_tree(params, min_features: int = 64):
    """Replace every eligible linear's weight with int8 factors (returns a
    new tree).  ``min_features`` skips tiny layers where quant noise isn't
    worth it."""
    def rec(node, path=""):
        if isinstance(node, dict):
            out = dict(node)
            if _eligible_linear(path, node) and min(node["weight"].shape) >= min_features:
                q, s = quantize_weight(out.pop("weight"), axis=0)
                out["weight_q"], out["w_scale"] = q, s
            for k, v in list(out.items()):
                if k in ("weight", "weight_q", "w_scale", "bias"):
                    continue
                out[k] = rec(v, f"{path}.{k}" if path else k)
            return out
        if isinstance(node, (list, tuple)):
            return [rec(v, f"{path}.{i}" if path else str(i))
                    for i, v in enumerate(node)]
        return node

    return rec(params)


def quantize_lora_base(params, min_features: int = 64):
    """QLoRA-style stage-2 quantization: add int8 factors ALONGSIDE the kept
    bf16 weight for every eligible linear — including LoRA-wrapped nodes.

    core.nn.linear prefers ``weight_q`` for the base matmul (int8 MXU fwd +
    int8 dx through the frozen base) and adds the LoRA branch in the
    activation dtype; the original ``weight`` stays in the tree untouched
    because stage-2 must merge LoRA into it and export the tower in HF
    format (train.lora.merge reads ``weight``, drops the factors).  HBM
    cost: +0.5 byte/param over bf16 for the int8 copy (CLIP-L: ~0.4 GB).

    Export semantics (standard QLoRA): training adapts LoRA against the
    *quantized* base, the export merges into the *bf16* base — the exported
    tower differs from the trained-effective one by the base quantization
    error (per-channel int8, ~0.2% relative).  Opt-in via tower_quant: int8
    on a stage-2 config."""
    def rec(node, path=""):
        if isinstance(node, dict):
            out = dict(node)
            w = node.get("weight")
            if (w is not None and getattr(w, "ndim", 0) == 2
                    and min(w.shape) >= min_features
                    and not any(s in path for s in
                                ("embedding", "embeddings", "logit_scale",
                                 "position_embedding"))):
                q, s = quantize_weight(w, axis=0)
                out["weight_q"], out["w_scale"] = q, s
            for k, v in list(out.items()):
                if k in ("weight", "weight_q", "w_scale", "bias",
                         "lora_A", "lora_B", "lora_scale"):
                    continue
                out[k] = rec(v, f"{path}.{k}" if path else k)
            return out
        if isinstance(node, (list, tuple)):
            return [rec(v, f"{path}.{i}" if path else str(i))
                    for i, v in enumerate(node)]
        return node

    return rec(params)


def refresh_static_quant_flat(flat_params: dict) -> dict:
    """Re-derive every static ``*.weight_q``/``*.w_scale`` pair from its kept
    ``*.weight`` master in a FLAT params dict.  Needed after a checkpoint
    load replaces master weights that were quantized at init (stage-2 loads
    stage-1 DiT .bins after init_modules ran quantize_lora_base)."""
    out = dict(flat_params)
    for path in flat_params:
        if path.endswith(".weight_q"):
            wpath = path[:-2]                       # ".weight_q" -> ".weight"
            w = flat_params.get(wpath)
            if w is not None:
                axis = 0 if getattr(w, "ndim", 0) == 2 else 3   # linear | conv
                q, s = quantize_weight(w, axis=axis)
                out[path] = q
                out[path[:-9] + ".w_scale"] = s
    return out


# Measured on v5e (r5, scripts/vae_conv_mxu_probe.py at B=64): below 256
# channels the int8 conv emitter is SLOWER than bf16 — the f8 encoder's
# 224px level (128 ch) runs 80.9 TF/s int8 vs 97.8 bf16, because the
# per-tensor activation quant pass is not paid back by the small-K int8
# conv.  >=256-ch convs win cleanly (512 ch: 182 int8 vs 120 bf16).
# Mixed encoder measures 1.167 ms/img vs 1.220 int8-everywhere / 1.377
# bf16 (cache_build_probe int8mix), so 256 is the product default;
# tests pass smaller thresholds to exercise the int8 path on debug models.
INT8_CONV_MIN_CH = 256


def quantize_conv_tree(params, min_channels: int = INT8_CONV_MIN_CH):
    """Replace eligible conv weights (4-D HWIO) with int8 factors.

    ``min_channels``: both in- and out-channels must reach it (see
    INT8_CONV_MIN_CH for the measured default)."""
    def rec(node, path=""):
        if isinstance(node, dict):
            out = dict(node)
            w = node.get("weight")
            if (w is not None and getattr(w, "ndim", 0) == 4
                    and w.shape[2] >= min_channels and w.shape[3] >= min_channels):
                q, s = quantize_weight(out.pop("weight"), axis=3)
                out["weight_q"], out["w_scale"] = q, s
            for k, v in list(out.items()):
                if k in ("weight", "weight_q", "w_scale", "bias"):
                    continue
                out[k] = rec(v, f"{path}.{k}" if path else k)
            return out
        if isinstance(node, (list, tuple)):
            return [rec(v, f"{path}.{i}" if path else str(i))
                    for i, v in enumerate(node)]
        return node

    return rec(params)
