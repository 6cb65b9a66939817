"""T5 encoder (v1.1 / XXL family) — completes the text-conditioned ``prepare``
path (reference ``HFEmbedder`` with ``T5EncoderModel``,
``/root/reference/Continuous/src/flux/modules/conditioner.py:6-43``; the
trainers never call it, but the generative core keeps the capability).

Architecture notes (HF ``modeling_t5.py`` parity, verified by
tests/test_t5.py against a random-weights T5EncoderModel):
  * RMS LayerNorm (no mean subtraction, no bias), pre-norm blocks;
  * self-attention WITHOUT 1/sqrt(d) scaling; q/k/v/o have no biases;
  * relative position bias: bucketed (bidirectional, 32 buckets, max
    distance 128), embedded per head, computed from layer 0's table and
    shared by all layers;
  * v1.1 FFN is gated: ``wo(gelu(wi_0(x)) * wi_1(x))`` (``gated-gelu``);
    legacy T5 uses ``wo(relu(wi(x)))`` — both supported via ``gated``;
  * encoder inputs are NOT scaled by sqrt(d_model).

Weights load from a local HF dir via ``load_t5`` (zero-egress: directory
must exist; matches the reference's local-path loading).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...core import nn


@dataclass(frozen=True)
class T5Config:
    d_model: int = 4096          # t5-v1_1-xxl
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    vocab_size: int = 32128
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    gated: bool = True           # v1.1 gated-gelu; False = legacy relu FFN

    @staticmethod
    def from_hf(cfg: dict) -> "T5Config":
        return T5Config(
            d_model=cfg["d_model"], d_kv=cfg.get("d_kv", 64),
            d_ff=cfg["d_ff"], num_layers=cfg["num_layers"],
            num_heads=cfg["num_heads"], vocab_size=cfg["vocab_size"],
            relative_attention_num_buckets=cfg.get(
                "relative_attention_num_buckets", 32),
            relative_attention_max_distance=cfg.get(
                "relative_attention_max_distance", 128),
            layer_norm_epsilon=cfg.get("layer_norm_epsilon", 1e-6),
            gated="gated" in cfg.get("feed_forward_proj", "gated-gelu"))


def _t5_layernorm(p, x, eps):
    """T5's RMS norm: no mean subtraction, scale in the weight dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * p["weight"].astype(x.dtype)


def relative_position_buckets(q_len: int, k_len: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """Bidirectional T5 bucket ids [q_len, k_len] (modeling_t5.py
    ``_relative_position_bucket``)."""
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (np.log(np.maximum(rel, 1) / max_exact)
                         / np.log(max_distance / max_exact)
                         * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return out + np.where(is_small, rel, large)


def init_t5(key: jax.Array, cfg: T5Config) -> dict:
    ks = iter(jax.random.split(key, 3 + cfg.num_layers * 8))
    inner = cfg.num_heads * cfg.d_kv

    def lin(kk, i, o):
        return {"weight": jax.random.normal(kk, (o, i)) * (i ** -0.5)}

    blocks = []
    for li in range(cfg.num_layers):
        attn = {"q": lin(next(ks), cfg.d_model, inner),
                "k": lin(next(ks), cfg.d_model, inner),
                "v": lin(next(ks), cfg.d_model, inner),
                "o": lin(next(ks), inner, cfg.d_model)}
        if li == 0:
            attn["relative_attention_bias"] = {
                "weight": jax.random.normal(
                    next(ks), (cfg.relative_attention_num_buckets,
                               cfg.num_heads)) * 0.1}
        if cfg.gated:
            ff = {"wi_0": lin(next(ks), cfg.d_model, cfg.d_ff),
                  "wi_1": lin(next(ks), cfg.d_model, cfg.d_ff),
                  "wo": lin(next(ks), cfg.d_ff, cfg.d_model)}
        else:
            ff = {"wi": lin(next(ks), cfg.d_model, cfg.d_ff),
                  "wo": lin(next(ks), cfg.d_ff, cfg.d_model)}
        blocks.append({
            "layer": [
                {"SelfAttention": attn,
                 "layer_norm": {"weight": jnp.ones((cfg.d_model,))}},
                {"DenseReluDense": ff,
                 "layer_norm": {"weight": jnp.ones((cfg.d_model,))}},
            ]})
    return {
        "shared": {"weight": jax.random.normal(next(ks),
                                               (cfg.vocab_size, cfg.d_model))},
        "encoder": {
            "block": blocks,
            "final_layer_norm": {"weight": jnp.ones((cfg.d_model,))},
        },
    }


def encoder_forward(params: dict, input_ids: jax.Array, cfg: T5Config,
                    attention_mask=None, dtype=jnp.float32) -> jax.Array:
    """input_ids [B, L] -> last_hidden_state [B, L, d_model]."""
    b, l = input_ids.shape
    x = params["shared"]["weight"][input_ids].astype(dtype)

    buckets = jnp.asarray(relative_position_buckets(
        l, l, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance))
    bias_table = params["encoder"]["block"][0]["layer"][0][
        "SelfAttention"]["relative_attention_bias"]["weight"]
    pos_bias = bias_table[buckets].transpose(2, 0, 1)[None]   # [1, H, L, L]
    pos_bias = pos_bias.astype(jnp.float32)
    if attention_mask is not None:
        pad = (1.0 - attention_mask.astype(jnp.float32))
        pos_bias = pos_bias + (pad * jnp.finfo(jnp.float32).min)[:, None, None, :]

    eps = cfg.layer_norm_epsilon
    for block in params["encoder"]["block"]:
        attn_p = block["layer"][0]["SelfAttention"]
        h = _t5_layernorm(block["layer"][0]["layer_norm"], x, eps)
        q = nn.linear(attn_p["q"], h).reshape(b, l, cfg.num_heads, cfg.d_kv)
        k = nn.linear(attn_p["k"], h).reshape(b, l, cfg.num_heads, cfg.d_kv)
        v = nn.linear(attn_p["v"], h).reshape(b, l, cfg.num_heads, cfg.d_kv)
        # NO 1/sqrt(d) scaling (T5 semantics)
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                            preferred_element_type=jnp.float32) + pos_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhlm,bmhd->blhd", probs, v,
                         preferred_element_type=jnp.float32).astype(dtype)
        x = x + nn.linear(attn_p["o"], out.reshape(b, l, -1))

        ff_p = block["layer"][1]["DenseReluDense"]
        h = _t5_layernorm(block["layer"][1]["layer_norm"], x, eps)
        if cfg.gated:
            h = (nn.gelu_tanh(nn.linear(ff_p["wi_0"], h))
                 * nn.linear(ff_p["wi_1"], h))
        else:
            h = jax.nn.relu(nn.linear(ff_p["wi"], h))
        x = x + nn.linear(ff_p["wo"], h)

    return _t5_layernorm(params["encoder"]["final_layer_norm"], x, eps)


def load_t5(model_dir: str):
    """Load a local HF T5 encoder dir -> (params, T5Config).

    Accepts T5EncoderModel/T5Model state dicts (decoder keys are dropped).
    """
    from ...weights.torch_io import load_torch_state_dict
    from ...weights.hf_convert import module_from_torch
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = T5Config.from_hf(json.load(f))
    sd = {}
    for name in ("pytorch_model.bin", "model.safetensors"):
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            if name.endswith(".bin"):
                sd = load_torch_state_dict(path)
            else:
                from safetensors import numpy as st_np
                sd = st_np.load_file(path)
            break
    if not sd:
        raise FileNotFoundError(f"no weights found in {model_dir}")
    sd = {k: v for k, v in sd.items() if not k.startswith("decoder.")}
    params = module_from_torch(sd)
    return params, cfg
