"""Tower -> DiT conditioning bridges (image + video modes).

Image mode (``/root/reference/Continuous/clip_models/sampling.py:9-42``):
the tower's projected class token becomes a 1-token txt sequence via
``project_t5`` and the ``y`` vector via ``project_clip``; img_ids are the
(0, row, col) grid over packed latent tokens; txt_ids are zeros.

Video modes (``train_OpenAICLIP_video_stage1.py:373-438`` and variants):
patch tokens of 1-3 conditioning frames pass through the VisualPromptAdapter
into the 4096-d txt space with spatio-temporal RoPE ids (t = frame index);
the target frame's img_ids carry the next time index; ``y`` is the mean of
the frames' projected class tokens.

Normalization policy (fixes reference quirk Q1, SURVEY.md §2.8): raw [0,1]
pixels arrive from the input pipeline and are normalized exactly once, here,
on device — CLIP statistics for tower inputs, 0.5/0.5 for VAE inputs.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..core.rope import spatial_ids
from ..models.towers import clip as clip_m
from ..models.towers import siglip as siglip_m
from ..models.towers.projectors import projector, visual_adapter

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)
VAE_MEAN = (0.5, 0.5, 0.5)
VAE_STD = (0.5, 0.5, 0.5)


def normalize(px: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    """px [B, H, W, 3] in [0,1] -> normalized (one time only)."""
    mean = jnp.asarray(mean, px.dtype)
    std = jnp.asarray(std, px.dtype)
    return (px - mean) / std


def tower_stats(kind: str):
    return (SIGLIP_MEAN, SIGLIP_STD) if kind == "siglip" else (OPENAI_CLIP_MEAN, OPENAI_CLIP_STD)


def tower_features(kind: str, params, px: jax.Array, cfg):
    """Run a tower's vision side -> (class_token, patch_tokens).

    class_token: post-projection for CLIP/MetaCLIP (visual_projection @
    pooler, CLIP_bank.py:34-35); MAP-head pooled for SigLIP (:68).
    patch_tokens: CLS-stripped pre-post-LN hidden states for CLIP
    (video conditioning, train_OpenAICLIP_video_stage1.py:376-383); all
    post-LN tokens for SigLIP (it has no CLS).
    """
    if kind == "siglip":
        last, pooled = siglip_m.vision_forward(params["model"]["vision_model"], px, cfg.vision)
        return pooled, last
    last, pooled = clip_m.vision_forward(params["model"]["vision_model"], px, cfg.vision)
    from ..core import nn
    cls_tok = nn.linear(params["model"]["visual_projection"], pooled)
    return cls_tok, last[:, 1:]


def image_conditioning(tower_kind: str, params, pixels01: jax.Array, tower_cfg,
                       latent_hw, compute_dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """Image-mode conditioning dict for the DiT (prepare_clip equivalent).

    pixels01: [B, H, W, 3] in [0,1]; latent_hw: (h, w) of the *latent* (f8)
    before packing.  Returns txt [B,1,4096], txt_ids, vec, img_ids.
    """
    mean, std = tower_stats(tower_kind)
    px = normalize(pixels01, mean, std).astype(compute_dtype)
    cls_tok, _ = tower_features(tower_kind, params, px, tower_cfg)
    return image_conditioning_from_cls(params, cls_tok, latent_hw,
                                       compute_dtype=compute_dtype)


def image_conditioning_from_cls(params, cls_tok: jax.Array, latent_hw,
                                compute_dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """Projector half of image_conditioning, from a (possibly cached) tower
    class token — the precomputed-conditioning path (data.precompute) feeds
    this directly, skipping the frozen tower."""
    cls_tok = cls_tok.astype(compute_dtype)
    vec = projector(params["project_clip"], cls_tok)
    txt = projector(params["project_t5"], cls_tok[:, None, :])
    b = cls_tok.shape[0]
    h, w = latent_hw
    img_ids = jnp.broadcast_to(spatial_ids(h // 2, w // 2, t=0.0)[None], (b, (h // 2) * (w // 2), 3))
    txt_ids = jnp.zeros((b, 1, 3), jnp.float32)
    return {"txt": txt, "txt_ids": txt_ids, "vec": vec, "img_ids": img_ids}


def video_conditioning(params, cond_frames_patches: Sequence[jax.Array],
                       vecs: Sequence[jax.Array], latent_hw, patch_grid: int,
                       target_time: float, frame_times: Sequence[float],
                       compute_dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """Video-mode conditioning: adapter over concatenated patch tokens with
    temporal RoPE ids; img_ids carry target_time.

    cond_frames_patches: list of [B, L_p, D_t] patch tokens (one per frame);
    vecs: list of [B, proj_dim] projected class tokens (averaged into y).
    """
    ctx = jnp.concatenate(list(cond_frames_patches), axis=1).astype(compute_dtype)
    txt = visual_adapter(params["visual_adapter"], ctx)
    b = ctx.shape[0]
    ids = jnp.concatenate(
        [spatial_ids(patch_grid, patch_grid, t=t) for t in frame_times], axis=0)
    txt_ids = jnp.broadcast_to(ids[None], (b,) + ids.shape)
    h, w = latent_hw
    img_ids = jnp.broadcast_to(
        spatial_ids(h // 2, w // 2, t=target_time)[None], (b, (h // 2) * (w // 2), 3))
    vec = sum(vecs) / len(vecs)
    return {"txt": txt, "txt_ids": txt_ids, "vec": vec.astype(compute_dtype),
            "img_ids": img_ids}
