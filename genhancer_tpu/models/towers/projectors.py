"""Trainable conditioning heads bridging towers to the DiT.

  * ``project_clip`` / ``project_t5``: LayerNorm -> Linear -> GELU(exact) ->
    Linear, mapping the tower's class token into the DiT's ``y`` vector space
    (clip_dim, usually 768) and txt space (t5_dim=4096)
    (``/root/reference/Continuous/clip_models/CLIP_bank.py:17-28``).  Param
    keys use the torch ``nn.Sequential`` indices ("0","1","3") so the
    ``checkpoint-project-clip-{step}.bin`` layout round-trips exactly.
  * ``VisualPromptAdapter`` (video modes): Linear(d, 2d) -> SiLU ->
    Linear(2d, 4096) -> LayerNorm over patch tokens
    (``train_OpenAICLIP_video_stage1.py:85-97``); keys "proj.0/2/3".
"""

from __future__ import annotations

import jax

from ...core import nn


def init_projector(key, in_dim: int, out_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "0": nn.layernorm_init(in_dim),
        "1": nn.linear_init(k1, in_dim, out_dim),
        "3": nn.linear_init(k2, out_dim, out_dim),
    }


def projector(p, x: jax.Array) -> jax.Array:
    # torch LayerNorm default eps is 1e-5
    x = nn.layernorm(p["0"], x, eps=1e-5)
    x = nn.gelu_exact(nn.linear(p["1"], x))
    return nn.linear(p["3"], x)


def init_visual_adapter(key, in_dim: int = 1024, out_dim: int = 4096):
    k1, k2 = jax.random.split(key)
    return {"proj": {
        "0": nn.linear_init(k1, in_dim, in_dim * 2),
        "2": nn.linear_init(k2, in_dim * 2, out_dim),
        "3": nn.layernorm_init(out_dim),
    }}


def visual_adapter(p, x: jax.Array) -> jax.Array:
    h = jax.nn.silu(nn.linear(p["proj"]["0"], x))
    h = nn.linear(p["proj"]["2"], h)
    return nn.layernorm(p["proj"]["3"], h, eps=1e-5)
