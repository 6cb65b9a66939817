"""SigLIP so400m tower family in JAX (HF ``SiglipModel`` equivalent).

Reference usage: ``/root/reference/Continuous/clip_models/CLIP_bank.py:43-73``
(siglip-so400m-patch14-224 / -384; the 1152-d ``pooler_output`` from the
attention-pooling (MAP) head feeds the projectors) and
``evaluation/evaluate_mmvp_SigLIP_*.py`` (full text+vision scoring with
softmax over ``logits_per_text``).

Parity-critical details (verified against transformers 4.57
``modeling_siglip.py``):
  * vision: patch conv **with** bias, no CLS token, position embedding added
    to all patches, ``last_hidden_state`` **is** post-layernormed (unlike
    CLIP), pooled via MAP head (probe + torch MultiheadAttention + LN + MLP);
  * text: no causal mask, pooled = ``head(last_hidden_state[:, -1])``;
  * ``logits_per_text = logit_scale.exp() * norm(t) @ norm(i).T + logit_bias``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...core import nn
from .encoder import EncoderConfig, encoder_forward, init_encoder, padding_mask, mha


@dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"

    @property
    def encoder(self) -> EncoderConfig:
        return EncoderConfig(self.hidden_size, self.intermediate_size,
                             self.num_layers, self.num_heads,
                             self.layer_norm_eps, self.hidden_act)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


@dataclass(frozen=True)
class SiglipTextConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    vocab_size: int = 32000
    max_position_embeddings: int = 64
    projection_size: int = 1152
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"

    @property
    def encoder(self) -> EncoderConfig:
        return EncoderConfig(self.hidden_size, self.intermediate_size,
                             self.num_layers, self.num_heads,
                             self.layer_norm_eps, self.hidden_act)


@dataclass(frozen=True)
class SiglipConfig:
    vision: SiglipVisionConfig = SiglipVisionConfig()
    text: SiglipTextConfig = SiglipTextConfig()

    def to_hf(self) -> dict:
        """HF SiglipConfig-compatible dict (synthesized config.json for
        stage-2 exports without a base model dir)."""
        return {
            "architectures": ["SiglipModel"], "model_type": "siglip",
            "vision_config": {
                "model_type": "siglip_vision_model",
                "hidden_size": self.vision.hidden_size,
                "intermediate_size": self.vision.intermediate_size,
                "num_hidden_layers": self.vision.num_layers,
                "num_attention_heads": self.vision.num_heads,
                "image_size": self.vision.image_size,
                "patch_size": self.vision.patch_size,
                "layer_norm_eps": self.vision.layer_norm_eps,
                "hidden_act": self.vision.hidden_act,
            },
            "text_config": {
                "model_type": "siglip_text_model",
                "hidden_size": self.text.hidden_size,
                "intermediate_size": self.text.intermediate_size,
                "num_hidden_layers": self.text.num_layers,
                "num_attention_heads": self.text.num_heads,
                "vocab_size": self.text.vocab_size,
                "max_position_embeddings": self.text.max_position_embeddings,
                "projection_size": self.text.projection_size,
                "layer_norm_eps": self.text.layer_norm_eps,
                "hidden_act": self.text.hidden_act,
            },
        }

    @staticmethod
    def from_hf(cfg: dict) -> "SiglipConfig":
        v, t = cfg["vision_config"], cfg["text_config"]
        return SiglipConfig(
            vision=SiglipVisionConfig(
                hidden_size=v["hidden_size"],
                intermediate_size=v["intermediate_size"],
                num_layers=v["num_hidden_layers"],
                num_heads=v["num_attention_heads"],
                image_size=v["image_size"],
                patch_size=v["patch_size"],
                layer_norm_eps=v.get("layer_norm_eps", 1e-6),
                hidden_act=v.get("hidden_act", "gelu_pytorch_tanh"),
            ),
            text=SiglipTextConfig(
                hidden_size=t["hidden_size"],
                intermediate_size=t["intermediate_size"],
                num_layers=t["num_hidden_layers"],
                num_heads=t["num_attention_heads"],
                vocab_size=t["vocab_size"],
                max_position_embeddings=t.get("max_position_embeddings", 64),
                projection_size=t.get("projection_size", t["hidden_size"]),
                layer_norm_eps=t.get("layer_norm_eps", 1e-6),
                hidden_act=t.get("hidden_act", "gelu_pytorch_tanh"),
            ),
        )


SIGLIP_VARIANTS = {
    "siglip-so400m-patch14-224": SiglipConfig(),
    "siglip-so400m-patch14-384": SiglipConfig(vision=SiglipVisionConfig(image_size=384)),
}


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_vision(key, cfg: SiglipVisionConfig):
    ks = jax.random.split(key, 6)
    g = cfg.grid
    h = cfg.hidden_size
    return {
        "embeddings": {
            "patch_embedding": nn.conv2d_init(ks[0], 3, h, cfg.patch_size),
            "position_embedding": {"weight": jax.random.normal(ks[1], (g * g, h)) * 0.02},
        },
        "encoder": init_encoder(ks[2], cfg.encoder),
        "post_layernorm": nn.layernorm_init(h),
        "head": {
            "probe": jax.random.normal(ks[3], (1, 1, h)),
            "attention": {
                "in_proj_weight": jax.random.normal(ks[4], (3 * h, h)) * 0.02,
                "in_proj_bias": jnp.zeros((3 * h,)),
                "out_proj": nn.linear_init(ks[5], h, h),
            },
            "layernorm": nn.layernorm_init(h),
            "mlp": {"fc1": nn.linear_init(jax.random.fold_in(key, 10), h, cfg.intermediate_size),
                    "fc2": nn.linear_init(jax.random.fold_in(key, 11), cfg.intermediate_size, h)},
        },
    }


def init_text(key, cfg: SiglipTextConfig):
    ks = jax.random.split(key, 4)
    h = cfg.hidden_size
    return {
        "embeddings": {
            "token_embedding": {"weight": jax.random.normal(ks[0], (cfg.vocab_size, h)) * 0.02},
            "position_embedding": {"weight": jax.random.normal(ks[1], (cfg.max_position_embeddings, h)) * 0.02},
        },
        "encoder": init_encoder(ks[2], cfg.encoder),
        "final_layer_norm": nn.layernorm_init(h),
        "head": nn.linear_init(ks[3], h, cfg.projection_size),
    }


def init_siglip(key, cfg: SiglipConfig):
    k1, k2 = jax.random.split(key)
    return {
        "vision_model": init_vision(k1, cfg.vision),
        "text_model": init_text(k2, cfg.text),
        "logit_scale": jnp.asarray(1.0),
        "logit_bias": jnp.asarray(0.0),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _map_head(p, x: jax.Array, cfg: SiglipVisionConfig) -> jax.Array:
    """SiglipMultiheadAttentionPoolingHead: probe attends over patch tokens."""
    b = x.shape[0]
    h = cfg.hidden_size
    probe = jnp.broadcast_to(p["probe"].astype(x.dtype), (b, 1, h))
    # torch MultiheadAttention packs q/k/v row-wise in in_proj_weight [3h, h]
    wq, wk, wv = jnp.split(p["attention"]["in_proj_weight"], 3, axis=0)
    bq, bk, bv = jnp.split(p["attention"]["in_proj_bias"], 3, axis=0)
    attn_p = {
        "q_proj": {"weight": wq, "bias": bq},
        "k_proj": {"weight": wk, "bias": bk},
        "v_proj": {"weight": wv, "bias": bv},
        "out_proj": p["attention"]["out_proj"],
    }
    out = mha(attn_p, probe, x, cfg.num_heads)
    res = out
    out = nn.layernorm(p["layernorm"], out, eps=cfg.layer_norm_eps)
    act = nn.ACTIVATIONS[cfg.hidden_act]
    out = res + nn.linear(p["mlp"]["fc2"], act(nn.linear(p["mlp"]["fc1"], out)))
    return out[:, 0]


def vision_forward(p, pixel_values: jax.Array, cfg: SiglipVisionConfig):
    """NHWC pixels -> (last_hidden_state [post-LN], pooler_output)."""
    pe = p["embeddings"]["patch_embedding"]
    x = jax.lax.conv_general_dilated(
        pixel_values, pe["weight"].astype(pixel_values.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + pe["bias"].astype(x.dtype)
    b, gh, gw, c = x.shape
    x = x.reshape(b, gh * gw, c)
    x = x + p["embeddings"]["position_embedding"]["weight"].astype(x.dtype)[None, : x.shape[1]]
    x = encoder_forward(p["encoder"], x, cfg.encoder)
    x = nn.layernorm(p["post_layernorm"], x, eps=cfg.layer_norm_eps)
    pooled = _map_head(p["head"], x, cfg)
    return x, pooled


def text_forward(p, input_ids: jax.Array, cfg: SiglipTextConfig,
                 attention_mask=None):
    b, l = input_ids.shape
    x = (p["embeddings"]["token_embedding"]["weight"][input_ids]
         + p["embeddings"]["position_embedding"]["weight"][None, :l])
    mask = padding_mask(attention_mask, x.dtype) if attention_mask is not None else None
    x = encoder_forward(p["encoder"], x, cfg.encoder, mask)
    x = nn.layernorm(p["final_layer_norm"], x, eps=cfg.layer_norm_eps)
    pooled = nn.linear(p["head"], x[:, -1])
    return x, pooled


def get_image_features(params, pixel_values, cfg: SiglipConfig):
    _, pooled = vision_forward(params["vision_model"], pixel_values, cfg.vision)
    return pooled


def get_text_features(params, input_ids, cfg: SiglipConfig, attention_mask=None):
    _, pooled = text_forward(params["text_model"], input_ids, cfg.text, attention_mask)
    return pooled


def siglip_logits(params, input_ids, pixel_values, cfg: SiglipConfig,
                  attention_mask=None):
    img = get_image_features(params, pixel_values, cfg)
    txt = get_text_features(params, input_ids, cfg, attention_mask)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    logits_per_text = (jnp.exp(params["logit_scale"]) * txt @ img.T
                       + params["logit_bias"])
    return logits_per_text, logits_per_text.T
