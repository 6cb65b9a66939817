"""OpenAI-CLIP / MetaCLIP model family in JAX (HF ``CLIPModel`` equivalent).

Covers every CLIP-architecture tower the reference uses
(``/root/reference/Continuous/clip_models/CLIP_bank.py:8-40,76-122``):
openai/clip-vit-large-patch14 (224), clip-vit-large-patch14-336,
metaclip-l14-fullcc2.5b, metaclip-h14-fullcc2.5b — all are HF ``CLIPModel``
checkpoints differing only in config, so one implementation parameterized by
``CLIPConfig.from_hf`` serves all four.

Parity-critical details (verified against transformers 4.57
``modeling_clip.py``):
  * vision ``last_hidden_state`` is returned **without** post_layernorm;
    ``pooler_output = post_layernorm(last_hidden_state[:, 0])`` — video-mode
    conditioning consumes the un-normalized patch tokens
    (``train_OpenAICLIP_video_stage1.py:376-383``);
  * text pooling takes the argmax position when ``eos_token_id == 2``
    (legacy configs) else the first true-EOS position;
  * ``logits_per_text = logit_scale.exp() * norm(text) @ norm(image).T``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...core import nn
from .encoder import (EncoderConfig, causal_mask, encoder_forward, init_encoder,
                      padding_mask)


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @property
    def encoder(self) -> EncoderConfig:
        return EncoderConfig(self.hidden_size, self.intermediate_size,
                             self.num_layers, self.num_heads,
                             self.layer_norm_eps, self.hidden_act)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


@dataclass(frozen=True)
class CLIPTextConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    vocab_size: int = 49408
    max_position_embeddings: int = 77
    eos_token_id: int = 49407
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @property
    def encoder(self) -> EncoderConfig:
        return EncoderConfig(self.hidden_size, self.intermediate_size,
                             self.num_layers, self.num_heads,
                             self.layer_norm_eps, self.hidden_act)


@dataclass(frozen=True)
class CLIPConfig:
    vision: CLIPVisionConfig = CLIPVisionConfig()
    text: CLIPTextConfig = CLIPTextConfig()
    projection_dim: int = 768
    logit_scale_init: float = 2.6592

    def to_hf(self) -> dict:
        """HF CLIPConfig-compatible dict (for synthesized config.json in
        stage-2 exports when no base model dir is available)."""
        return {
            "architectures": ["CLIPModel"], "model_type": "clip",
            "projection_dim": self.projection_dim,
            "logit_scale_init_value": self.logit_scale_init,
            "vision_config": {
                "model_type": "clip_vision_model",
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
                "model_type": "clip_text_model",
                "hidden_size": self.text.hidden_size,
                "intermediate_size": self.text.intermediate_size,
                "num_hidden_layers": self.text.num_layers,
                "num_attention_heads": self.text.num_heads,
                "vocab_size": self.text.vocab_size,
                "max_position_embeddings": self.text.max_position_embeddings,
                "eos_token_id": self.text.eos_token_id,
                "layer_norm_eps": self.text.layer_norm_eps,
                "hidden_act": self.text.hidden_act,
            },
        }

    @staticmethod
    def from_hf(cfg: dict) -> "CLIPConfig":
        v, t = cfg["vision_config"], cfg["text_config"]
        return CLIPConfig(
            vision=CLIPVisionConfig(
                hidden_size=v["hidden_size"],
                intermediate_size=v["intermediate_size"],
                num_layers=v["num_hidden_layers"],
                num_heads=v["num_attention_heads"],
                image_size=v["image_size"],
                patch_size=v["patch_size"],
                layer_norm_eps=v.get("layer_norm_eps", 1e-5),
                hidden_act=v.get("hidden_act", "quick_gelu"),
            ),
            text=CLIPTextConfig(
                hidden_size=t["hidden_size"],
                intermediate_size=t["intermediate_size"],
                num_layers=t["num_hidden_layers"],
                num_heads=t["num_attention_heads"],
                vocab_size=t["vocab_size"],
                max_position_embeddings=t.get("max_position_embeddings", 77),
                eos_token_id=t.get("eos_token_id", 2),
                layer_norm_eps=t.get("layer_norm_eps", 1e-5),
                hidden_act=t.get("hidden_act", "quick_gelu"),
            ),
            projection_dim=cfg.get("projection_dim", 512),
            logit_scale_init=cfg.get("logit_scale_init_value", 2.6592),
        )


# Known reference variants (weights still come from local HF dirs).
CLIP_VARIANTS = {
    "clip-vit-large-patch14": CLIPConfig(),
    "clip-vit-large-patch14-336": CLIPConfig(vision=CLIPVisionConfig(image_size=336)),
    "metaclip-l14-fullcc2.5b": CLIPConfig(),
    "metaclip-h14-fullcc2.5b": CLIPConfig(
        vision=CLIPVisionConfig(hidden_size=1280, intermediate_size=5120,
                                num_layers=32, num_heads=16),
        text=CLIPTextConfig(hidden_size=1024, intermediate_size=4096,
                            num_layers=24, num_heads=16),
        projection_dim=1024),
}


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_vision(key, cfg: CLIPVisionConfig):
    ks = jax.random.split(key, 4)
    g = cfg.grid
    return {
        "embeddings": {
            "class_embedding": jax.random.normal(ks[0], (cfg.hidden_size,)),
            "patch_embedding": {
                "weight": nn.conv2d_init(ks[1], 3, cfg.hidden_size, cfg.patch_size)["weight"]},
            "position_embedding": {
                "weight": jax.random.normal(ks[2], (g * g + 1, cfg.hidden_size)) * 0.02},
        },
        "pre_layrnorm": nn.layernorm_init(cfg.hidden_size),
        "encoder": init_encoder(ks[3], cfg.encoder),
        "post_layernorm": nn.layernorm_init(cfg.hidden_size),
    }


def init_text(key, cfg: CLIPTextConfig):
    ks = jax.random.split(key, 3)
    return {
        "embeddings": {
            "token_embedding": {
                "weight": jax.random.normal(ks[0], (cfg.vocab_size, cfg.hidden_size)) * 0.02},
            "position_embedding": {
                "weight": jax.random.normal(ks[1], (cfg.max_position_embeddings,
                                                    cfg.hidden_size)) * 0.02},
        },
        "encoder": init_encoder(ks[2], cfg.encoder),
        "final_layer_norm": nn.layernorm_init(cfg.hidden_size),
    }


def init_clip(key, cfg: CLIPConfig):
    ks = jax.random.split(key, 4)
    return {
        "vision_model": init_vision(ks[0], cfg.vision),
        "text_model": init_text(ks[1], cfg.text),
        "visual_projection": {
            "weight": jax.random.normal(ks[2], (cfg.projection_dim, cfg.vision.hidden_size)) * 0.02},
        "text_projection": {
            "weight": jax.random.normal(ks[3], (cfg.projection_dim, cfg.text.hidden_size)) * 0.02},
        "logit_scale": jnp.asarray(cfg.logit_scale_init),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def vision_embed(p, pixel_values: jax.Array, cfg: CLIPVisionConfig) -> jax.Array:
    """pixel_values NHWC [B, H, W, 3] -> [B, 1+g*g, hidden] with CLS prepended."""
    x = jax.lax.conv_general_dilated(
        pixel_values, p["patch_embedding"]["weight"].astype(pixel_values.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, gh, gw, c = x.shape
    x = x.reshape(b, gh * gw, c)
    cls = jnp.broadcast_to(p["class_embedding"].astype(x.dtype), (b, 1, c))
    x = jnp.concatenate([cls, x], axis=1)
    return x + p["position_embedding"]["weight"].astype(x.dtype)[None, : x.shape[1]]


def vision_forward(p, pixel_values: jax.Array, cfg: CLIPVisionConfig):
    """Returns (last_hidden_state [pre-post-LN], pooler_output)."""
    x = vision_embed(p["embeddings"], pixel_values, cfg)
    x = nn.layernorm(p["pre_layrnorm"], x, eps=cfg.layer_norm_eps)
    x = encoder_forward(p["encoder"], x, cfg.encoder)
    pooled = nn.layernorm(p["post_layernorm"], x[:, 0], eps=cfg.layer_norm_eps)
    return x, pooled


def text_forward(p, input_ids: jax.Array, cfg: CLIPTextConfig,
                 attention_mask=None):
    """Returns (last_hidden_state, pooled_output) — pooled at the EOS position."""
    b, l = input_ids.shape
    x = (p["embeddings"]["token_embedding"]["weight"][input_ids]
         + p["embeddings"]["position_embedding"]["weight"][None, :l])
    mask = causal_mask(l, x.dtype)
    if attention_mask is not None:
        mask = mask + padding_mask(attention_mask, x.dtype)
    x = encoder_forward(p["encoder"], x, cfg.encoder, mask)
    x = nn.layernorm(p["final_layer_norm"], x, eps=cfg.layer_norm_eps)
    if cfg.eos_token_id == 2:  # legacy configs: EOS is the max token id
        eos_pos = jnp.argmax(input_ids, axis=-1)
    else:
        is_eos = (input_ids == cfg.eos_token_id).astype(jnp.int32)
        eos_pos = jnp.argmax(is_eos, axis=-1)
    pooled = x[jnp.arange(b), eos_pos]
    return x, pooled


def get_image_features(params, pixel_values, cfg: CLIPConfig):
    _, pooled = vision_forward(params["vision_model"], pixel_values, cfg.vision)
    return nn.linear(params["visual_projection"], pooled)


def get_text_features(params, input_ids, cfg: CLIPConfig, attention_mask=None):
    _, pooled = text_forward(params["text_model"], input_ids, cfg.text, attention_mask)
    return nn.linear(params["text_projection"], pooled)


def clip_logits(params, input_ids, pixel_values, cfg: CLIPConfig,
                attention_mask=None):
    """(logits_per_text [T, I], logits_per_image [I, T]) — modeling_clip.py."""
    img = get_image_features(params, pixel_values, cfg)
    txt = get_text_features(params, input_ids, cfg, attention_mask)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    logits_per_text = jnp.exp(params["logit_scale"]) * txt @ img.T
    return logits_per_text, logits_per_text.T
