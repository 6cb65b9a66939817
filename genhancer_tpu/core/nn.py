"""Functional neural-net primitives over explicit parameter pytrees.

Every layer is an (init, apply) pair.  Parameters live in plain dicts whose key
structure mirrors a torch ``state_dict`` (``{"weight": ..., "bias": ...}``,
linear weights stored ``[out, in]``) so checkpoint import/export against the
reference layout (e.g. ``checkpoint-dit-{step}.bin``; see
``/root/reference/Continuous/train_SigLIP_stage1.py:284-300``) is a pure
key-rename with no transposes.

Compute policy: matmuls run in the dtype of the activations (bf16 on the hot
path, hitting the MXU); normalization statistics are always accumulated in
float32 (matching the reference RMSNorm/LayerNorm fp32-compute behavior,
``src/flux/modules/layers.py:63-72``).
"""

from __future__ import annotations

import contextlib
import math
import threading
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# LoRA dropout context (peft parity: nn.Dropout(p) on the A-branch input,
# reference stage-2 configs set lora_dropout: 0.1 —
# /root/reference/Continuous/train_SigLIP_stage2_all.py:134-143).
#
# The context is consulted at *trace* time by ``linear``: each LoRA-wrapped
# call folds a fresh per-call counter into the step key, so masks are
# decorrelated across layers but fully deterministic given the step RNG.
# Outside the context (eval, merge, stage-1) the branch is a no-op.
# ---------------------------------------------------------------------------

_LORA_DROPOUT_CTX = threading.local()

# ---------------------------------------------------------------------------
# int8-training context (SwitchBack, core.quant.switchback_linear): while
# active, every large-enough ``linear`` base matmul traced in the block runs
# int8 fwd + int8 dx + bf16 dW.  Used for the DiT when TaskSpec.dit_quant ==
# "int8" — the v5e runs int8 at 2x bf16 MACs and the DiT is ~87% linear
# matmul FLOPs.  Trace-time only (like lora_dropout_ctx).
# ---------------------------------------------------------------------------

_INT8_TRAIN_CTX = threading.local()


@contextlib.contextmanager
def int8_training_ctx(min_dim: int = None, full: bool = False,
                      dw_int8: bool = False):
    """Route linears with min(out, in) >= min_dim through switchback int8.

    ``min_dim`` defaults to quant.SWITCHBACK_MIN_DIM — the SAME constant
    that selects the optimizer-maintained cache's layer set
    (quant.switchback_cache_paths), so the cached copies and the forward
    dispatch can never silently cover different layers.

    ``full=True`` selects the experimental full-int8 variant (dW also on the
    int8 MXU via XLA, per-channel scales — quant.switchback_linear_full).
    ``dw_int8=True`` runs dW through the Pallas per-block-quant kernel
    (core.pallas.int8_dw) instead — quantization fused into the tile loads,
    no extra HBM passes."""
    if min_dim is None:
        from .quant import SWITCHBACK_MIN_DIM
        min_dim = SWITCHBACK_MIN_DIM
    prev = (getattr(_INT8_TRAIN_CTX, "min_dim", None),
            getattr(_INT8_TRAIN_CTX, "full", False),
            getattr(_INT8_TRAIN_CTX, "dw_int8", False))
    _INT8_TRAIN_CTX.min_dim = int(min_dim)
    _INT8_TRAIN_CTX.full = bool(full)
    _INT8_TRAIN_CTX.dw_int8 = bool(dw_int8)
    try:
        yield
    finally:
        (_INT8_TRAIN_CTX.min_dim, _INT8_TRAIN_CTX.full,
         _INT8_TRAIN_CTX.dw_int8) = prev


@contextlib.contextmanager
def lora_dropout_ctx(key: jax.Array, rate: float):
    """Enable LoRA dropout for all ``linear`` calls traced inside the block."""
    prev = getattr(_LORA_DROPOUT_CTX, "state", None)
    _LORA_DROPOUT_CTX.state = {"key": key, "rate": float(rate), "calls": 0}
    try:
        yield
    finally:
        _LORA_DROPOUT_CTX.state = prev


def _lora_dropout(x: jax.Array) -> jax.Array:
    ctx = getattr(_LORA_DROPOUT_CTX, "state", None)
    if ctx is None or ctx["rate"] <= 0.0:
        return x
    ctx["calls"] += 1
    k = jax.random.fold_in(ctx["key"], ctx["calls"])
    keep_p = 1.0 - ctx["rate"]
    keep = jax.random.bernoulli(k, keep_p, x.shape)
    return jnp.where(keep, x / jnp.asarray(keep_p, x.dtype), jnp.zeros((), x.dtype))


# ---------------------------------------------------------------------------
# Initializers (match torch.nn.Linear defaults: kaiming-uniform weight,
# uniform bias in +-1/sqrt(fan_in); keeps random-init DiT training dynamics
# comparable to the reference, which never loads pretrained DiT weights
# (src/flux/util.py:218-223).
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound_w = math.sqrt(1.0 / in_dim) * math.sqrt(3.0)  # kaiming_uniform(a=sqrt(5))
    p = {"weight": jax.random.uniform(kw, (out_dim, in_dim), dtype, -bound_w, bound_w)}
    if bias:
        bound_b = math.sqrt(1.0 / in_dim)
        p["bias"] = jax.random.uniform(kb, (out_dim,), dtype, -bound_b, bound_b)
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    """x: [..., in] @ weight[out, in]^T + bias.

    If the node carries LoRA factors ("lora_A" [r, in], "lora_B" [out, r],
    "lora_scale" = alpha/r), the low-rank branch is added in parallel —
    peft-equivalent y = Wx + s·B(Ax) (see train.lora).  Nodes quantized by
    core.quant (``weight_q``) run the base matmul on the int8 MXU path; the
    LoRA branch (if any) stays in the activation dtype — QLoRA-style
    composition for a frozen int8 base.
    """
    if "weight_q" in p:
        from .quant import linear_int8_base
        y = linear_int8_base(p, x)
    else:
        w = p["weight"].astype(x.dtype)
        sb_min = getattr(_INT8_TRAIN_CTX, "min_dim", None)
        if sb_min is not None and min(w.shape) >= sb_min:
            dw8 = getattr(_INT8_TRAIN_CTX, "dw_int8", False)
            if "weight_sb_q" in p:
                # optimizer-fused quant cache (core.quant): the int8 copy was
                # emitted by the previous optimizer step — skip the per-step
                # re-quantization HBM pass over W
                from .quant import (switchback_linear_cached,
                                    switchback_linear_cached_dw,
                                    switchback_linear_full_cached)
                sb = (switchback_linear_full_cached
                      if getattr(_INT8_TRAIN_CTX, "full", False)
                      else (switchback_linear_cached_dw if dw8
                            else switchback_linear_cached))
                y = sb(x, w, p["weight_sb_q"], p["weight_sb_scale"])
            else:
                from .quant import (switchback_linear, switchback_linear_dw,
                                    switchback_linear_full)
                sb = (switchback_linear_full
                      if getattr(_INT8_TRAIN_CTX, "full", False)
                      else (switchback_linear_dw if dw8 else switchback_linear))
                y = sb(x, w)
        else:
            y = jax.lax.dot_general(x, w, (((x.ndim - 1,), (1,)), ((), ())),
                                    preferred_element_type=x.dtype)
    if "lora_A" in p:
        a = p["lora_A"].astype(x.dtype)
        b = p["lora_B"].astype(x.dtype)
        xd = _lora_dropout(x)
        down = jax.lax.dot_general(xd, a, (((x.ndim - 1,), (1,)), ((), ())))
        up = jax.lax.dot_general(down, b, (((x.ndim - 1,), (1,)), ((), ())))
        y = y + up * p["lora_scale"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def layernorm_init(dim: int, affine: bool = True, dtype=jnp.float32) -> Params:
    if not affine:
        return {}
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm with float32 statistics; affine iff params present.

    Only the *reductions* run in f32; the normalization applies in the input
    dtype.  Keeping the full f32 intermediate costs a separate full-tensor
    fusion on TPU (measured: the DiT's qk-RMSNorms alone were 14.4 ms of a
    75 ms forward before this restructure); the bf16-path difference is one
    extra rounding.  fp32 inputs (towers at eval) are bit-identical.
    """
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mu.astype(x.dtype)) * inv.astype(x.dtype)
    if "weight" in p:
        y = y * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return y


def rmsnorm_init(dim: int, dtype=jnp.float32) -> Params:
    # torch key is "scale" in the reference RMSNorm (layers.py:66)
    return {"scale": jnp.ones((dim,), dtype)}


def rmsnorm(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm: f32 statistics, normalization in the input dtype
    (layers.py:68-72 semantics; see layernorm for why the full-f32
    intermediate form is avoided — it cost 14.4 ms/step in the DiT)."""
    ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(ms + eps).astype(x.dtype)
    return (x * inv) * p["scale"].astype(x.dtype)


def groupnorm_init(channels: int, dtype=jnp.float32) -> Params:
    return {"weight": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)}


def groupnorm(p: Params, x: jax.Array, num_groups: int = 32, eps: float = 1e-6) -> jax.Array:
    """GroupNorm over NHWC input; float32 statistics.

    Groups clamp to the channel count so tiny test configs (c < 32) work;
    production channel counts (>=128) always use the requested 32 groups.
    """
    n, h, w, c = x.shape
    num_groups = min(num_groups, c)
    xf = x.astype(jnp.float32).reshape(n, h, w, num_groups, c // num_groups)
    mu = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2, 4), keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
    y = y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv2d_init(key: jax.Array, in_ch: int, out_ch: int, kernel: int,
                dtype=jnp.float32) -> Params:
    """Conv weights stored HWIO (TPU-native); the torch-IO layer transposes OIHW."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    p = {"weight": jax.random.uniform(kw, (kernel, kernel, in_ch, out_ch), dtype, -bound, bound)}
    bound_b = math.sqrt(1.0 / fan_in)
    p["bias"] = jax.random.uniform(kb, (out_ch,), dtype, -bound_b, bound_b)
    return p


def conv2d(p: Params, x: jax.Array, stride: int = 1,
           padding="SAME") -> jax.Array:
    """NHWC conv; `padding` is an XLA padding spec or explicit list.
    int8-quantized nodes (core.quant) dispatch to the int8 MXU path."""
    if "weight_q" in p:
        from .quant import conv2d_int8
        return conv2d_int8(p, x, stride=stride, padding=padding)
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — OpenAI CLIP's activation."""
    return x * jax.nn.sigmoid(1.702 * x)


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


ACTIVATIONS = {
    "gelu_tanh": gelu_tanh,
    "gelu_pytorch_tanh": gelu_tanh,
    "gelu": gelu_exact,
    "gelu_new": gelu_tanh,
    "quick_gelu": quick_gelu,
    "silu": silu,
}


# ---------------------------------------------------------------------------
# Composite layers shared by the DiT (reference: src/flux/modules/layers.py)
# ---------------------------------------------------------------------------

def mlp_embedder_init(key: jax.Array, in_dim: int, hidden: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {"in_layer": linear_init(k1, in_dim, hidden),
            "out_layer": linear_init(k2, hidden, hidden)}


def mlp_embedder(p: Params, x: jax.Array) -> jax.Array:
    return linear(p["out_layer"], jax.nn.silu(linear(p["in_layer"], x)))


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10_000.0,
                       time_factor: float = 1000.0) -> jax.Array:
    """Sinusoidal embedding, [cos | sin] order (layers.py:28-49)."""
    t = (time_factor * t).astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def modulation_init(key: jax.Array, dim: int, double: bool) -> Params:
    mult = 6 if double else 3
    return {"lin": linear_init(key, dim, mult * dim)}


def modulation(p: Params, vec: jax.Array, double: bool):
    """vec [B, D] -> list of (shift, scale, gate) triples, each [B, 1, D]."""
    out = linear(p["lin"], jax.nn.silu(vec))[:, None, :]
    chunks = jnp.split(out, 6 if double else 3, axis=-1)
    mods = [tuple(chunks[i:i + 3]) for i in range(0, len(chunks), 3)]
    return mods


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def tree_cast(params, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
