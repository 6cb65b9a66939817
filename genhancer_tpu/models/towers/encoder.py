"""Shared pre-LN ViT/text transformer encoder for CLIP-family towers.

Matches the HF ``CLIPEncoderLayer`` / ``SiglipEncoderLayer`` computation
exactly (pre-LN, MHA with q/k/v/out biases, fc1/act/fc2, fp32 softmax):
`transformers/models/clip/modeling_clip.py` ``eager_attention_forward``.
Param-tree keys mirror the HF state_dict (``layers.{i}.self_attn.q_proj`` ...)
so weight conversion is a rename-free reshape (see genhancer_tpu.weights).

The towers run in float32 by default — the reference forces fp32 CLIP
(``/root/reference/Continuous/clip_models/build_CLIP.py:9``) and MMVP parity
within 0.5% leaves no room for activation drift; pass ``dtype=jnp.bfloat16``
to trade parity for speed in stage-2 training.
"""

from __future__ import annotations

import contextlib
import contextvars
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...core import nn

# Trace-time tower-remat scope (the int8_training_ctx / ring_scope pattern):
# stage-2 differentiates THROUGH the tower, and for multi-frame video at
# 336px its per-layer residuals dominate activation HBM (planner
# "tower-under-autodiff" term; video middle @336 B=8 OOMs one chip in any
# dtype without this).  Inside the scope every encoder layer runs under
# ``jax.checkpoint``: only the layer-boundary residual survives to the
# backward, the rest is recomputed.  Opened by the task loss_fn
# (tasks/image.py / tasks/video.py) when ``spec.tower_remat`` — never at
# inference, where nothing is saved in the first place.
_TOWER_REMAT: contextvars.ContextVar = contextvars.ContextVar(
    "tower_remat", default=False)


@contextlib.contextmanager
def tower_remat_scope(enable: bool = True):
    tok = _TOWER_REMAT.set(bool(enable))
    try:
        yield
    finally:
        _TOWER_REMAT.reset(tok)


@dataclass(frozen=True)
class EncoderConfig:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


def init_encoder_layer(key, cfg: EncoderConfig):
    ks = jax.random.split(key, 6)
    h, i = cfg.hidden_size, cfg.intermediate_size
    return {
        "layer_norm1": nn.layernorm_init(h),
        "self_attn": {
            "q_proj": nn.linear_init(ks[0], h, h),
            "k_proj": nn.linear_init(ks[1], h, h),
            "v_proj": nn.linear_init(ks[2], h, h),
            "out_proj": nn.linear_init(ks[3], h, h),
        },
        "layer_norm2": nn.layernorm_init(h),
        "mlp": {"fc1": nn.linear_init(ks[4], h, i), "fc2": nn.linear_init(ks[5], i, h)},
    }


def init_encoder(key, cfg: EncoderConfig):
    ks = jax.random.split(key, cfg.num_layers)
    return {"layers": [init_encoder_layer(k, cfg) for k in ks]}


def _mergeable_qkv(p) -> bool:
    """Self-attention q/k/v can run as ONE [h -> 3h] matmul when the three
    nodes are plain (or int8-static) linears with no LoRA wrapping.  At
    tower shapes (K = 1024) three separate [M, 1024, 1024] dots badly
    underfill the MXU — one [M, 1024, 3072] dot measured ~1.5x faster on
    v5e.  LoRA-wrapped (stage-2) projections keep the separate path."""
    keys = ("q_proj", "k_proj", "v_proj")
    if any("lora_A" in p[k] for k in keys):
        return False
    kind = "weight" if "weight" in p["q_proj"] else "weight_q"
    return all(kind in p[k] for k in keys)


def _merged_qkv(p, x):
    keys = ("q_proj", "k_proj", "v_proj")
    merged = {}
    if "weight" in p["q_proj"]:
        merged["weight"] = jnp.concatenate([p[k]["weight"] for k in keys], 0)
    else:
        merged["weight_q"] = jnp.concatenate([p[k]["weight_q"] for k in keys], 0)
        merged["w_scale"] = jnp.concatenate([p[k]["w_scale"] for k in keys], 0)
    if "bias" in p["q_proj"]:
        merged["bias"] = jnp.concatenate([p[k]["bias"] for k in keys], 0)
    return jnp.split(nn.linear(merged, x), 3, axis=-1)


def mha(p, x_q, x_kv, num_heads: int, mask: Optional[jax.Array] = None) -> jax.Array:
    """Multi-head attention with separate q/k/v/out projections.

    x_q: [B, Lq, H]; x_kv: [B, Lk, H]; mask: additive [B, 1, Lq, Lk] or
    broadcastable (0 where attended, -inf where masked).  fp32 softmax.
    """
    b, lq, h = x_q.shape
    lk = x_kv.shape[1]
    d = h // num_heads
    if x_q is x_kv and _mergeable_qkv(p):
        q, k, v = _merged_qkv(p, x_q)
        q = q.reshape(b, lq, num_heads, d)
        k = k.reshape(b, lk, num_heads, d)
        v = v.reshape(b, lk, num_heads, d)
    else:
        q = nn.linear(p["q_proj"], x_q).reshape(b, lq, num_heads, d)
        k = nn.linear(p["k_proj"], x_kv).reshape(b, lk, num_heads, d)
        v = nn.linear(p["v_proj"], x_kv).reshape(b, lk, num_heads, d)
    if mask is None and lq == lk:
        from ...core.attention import sdpa_auto
        out = sdpa_auto(q, k, v)
        return nn.linear(p["out_proj"], out.reshape(b, lq, h))
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(x_q.dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x_q.dtype)
    return nn.linear(p["out_proj"], out.reshape(b, lq, h))


def encoder_layer(p, x, cfg: EncoderConfig, mask=None):
    act = nn.ACTIVATIONS[cfg.hidden_act]
    res = x
    x = nn.layernorm(p["layer_norm1"], x, eps=cfg.layer_norm_eps)
    x = res + mha(p["self_attn"], x, x, cfg.num_heads, mask)
    res = x
    x = nn.layernorm(p["layer_norm2"], x, eps=cfg.layer_norm_eps)
    x = res + nn.linear(p["mlp"]["fc2"], act(nn.linear(p["mlp"]["fc1"], x)))
    return x


def encoder_forward(p, x, cfg: EncoderConfig, mask=None):
    layer = encoder_layer
    if _TOWER_REMAT.get():
        layer = jax.checkpoint(encoder_layer, static_argnums=(2,))
    for lp in p["layers"]:
        x = layer(lp, x, cfg, mask)
    return x


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """[1, 1, L, L] additive causal mask (CLIP text)."""
    m = jnp.triu(jnp.full((length, length), jnp.finfo(jnp.float32).min), k=1)
    return m[None, None].astype(dtype)


def padding_mask(attention_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, L] 1/0 -> additive [B, 1, 1, L]."""
    inv = (1.0 - attention_mask.astype(jnp.float32)) * jnp.finfo(jnp.float32).min
    return inv[:, None, None, :].astype(dtype)
