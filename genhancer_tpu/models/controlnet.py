"""ControlNet for the FLUX-style DiT (conditioning-residual side network).

The reference fork consumes per-double-block controlnet residuals in its DiT
(``/root/reference/Continuous/src/flux/model.py:145,165-166,198-200``) and
ships a ``denoise_controlnet`` sampler (``src/flux/sampling.py:152-232``) but
contains NO controlnet model — the sampler's ``controlnet`` argument is typed
``None``.  This module supplies the missing network so the sampler is actually
drivable, following the standard ControlNet recipe adapted to this DiT:

  * a trunk of ``depth`` double-stream blocks identical in shape to the DiT's
    (so they can be seeded from a trained DiT via
    :func:`init_controlnet_from_dit`, the classic trainable-copy init);
  * the conditioning image enters as packed VAE-latent tokens through a
    ZERO-initialized projection (``cond_in``), and each block's hidden state
    exits through a ZERO-initialized per-block projection
    (``controlnet_blocks``) — at init the residuals are exactly zero, so
    plugging an untrained controlnet into a trained DiT is a no-op (the
    zero-conv property of arXiv:2302.05543).

TPU-native: one functional forward under jit; joint [txt; img] attention
reuses ``core.attention`` (Pallas flash dispatch) and the fused cos/sin RoPE.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import nn
from ..core.rope import multi_axis_rope
from .dit import DiTConfig, _double_block, _init_double_block


def _zero_linear(in_dim: int, out_dim: int) -> dict:
    return {"weight": jnp.zeros((out_dim, in_dim)),
            "bias": jnp.zeros((out_dim,))}


def init_controlnet(key: jax.Array, cfg: DiTConfig, depth: int = 2) -> dict:
    """Fresh controlnet params: ``depth`` double blocks + zero-init IO.

    The embedding prologue (img_in/time_in/vector_in/txt_in/guidance_in)
    mirrors the DiT's so the trunk sees the same token/conditioning geometry
    (model.py:137-164).
    """
    # exactly 5 + depth keys, consumed consecutively (ks[4] feeds the
    # optional guidance embedder; it stays unused for schnell-style configs)
    ks = list(jax.random.split(key, 5 + depth))
    h = cfg.hidden_size
    params = {
        "img_in": nn.linear_init(ks[0], cfg.in_channels, h),
        "time_in": nn.mlp_embedder_init(ks[1], 256, h),
        "vector_in": nn.mlp_embedder_init(ks[2], cfg.vec_in_dim, h),
        "txt_in": nn.linear_init(ks[3], cfg.context_in_dim, h),
        "cond_in": _zero_linear(cfg.in_channels, h),
        "double_blocks": [_init_double_block(ks[5 + i], cfg)
                          for i in range(depth)],
        "controlnet_blocks": [_zero_linear(h, h) for _ in range(depth)],
    }
    if cfg.guidance_embed:
        params["guidance_in"] = nn.mlp_embedder_init(ks[4], 256, h)
    return params


def init_controlnet_from_dit(key: jax.Array, dit_params: dict,
                             cfg: DiTConfig, depth: int = 2) -> dict:
    """Trainable-copy init: seed the trunk + embedders from a (trained) DiT.

    Copies the DiT's embedding prologue and its first ``depth`` double blocks
    (cycling if the controlnet is deeper); the zero-init IO projections keep
    the composition a no-op until trained.
    """
    params = init_controlnet(key, cfg, depth=depth)
    for name in ("img_in", "time_in", "vector_in", "txt_in", "guidance_in"):
        if name in dit_params:
            params[name] = jax.tree_util.tree_map(jnp.array, dit_params[name])
    n = len(dit_params["double_blocks"])
    params["double_blocks"] = [
        jax.tree_util.tree_map(jnp.array, dit_params["double_blocks"][i % n])
        for i in range(depth)
    ]
    return params


def controlnet_forward(params: dict, cfg: DiTConfig, *,
                       img: jax.Array, img_ids: jax.Array,
                       txt: jax.Array, txt_ids: jax.Array,
                       timesteps: jax.Array, y: jax.Array,
                       controlnet_cond: jax.Array,
                       guidance: Optional[jax.Array] = None,
                       ) -> Tuple[jax.Array, ...]:
    """Residuals for the DiT's double blocks.

    ``img``: [B, L_img, 64] packed noisy-latent tokens (the denoise state);
    ``controlnet_cond``: [B, L_img, 64] packed VAE-latent tokens of the
    conditioning image; remaining args as in ``dit_forward``.  Returns a
    tuple of [B, L_img, hidden] residuals, one per controlnet block — the
    DiT consumes them cyclically (model.py:198-200).
    """
    if controlnet_cond.shape != img.shape:
        raise ValueError(
            f"controlnet_cond {controlnet_cond.shape} must match packed img "
            f"tokens {img.shape}")
    compute_dtype = img.dtype
    img = nn.linear(params["img_in"], img)
    img = img + nn.linear(params["cond_in"],
                          controlnet_cond.astype(compute_dtype))
    vec = nn.mlp_embedder(params["time_in"],
                          nn.timestep_embedding(timesteps, 256).astype(compute_dtype))
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("guidance required for guidance-embedded (dev) model")
        vec = vec + nn.mlp_embedder(params["guidance_in"],
                                    nn.timestep_embedding(guidance, 256).astype(compute_dtype))
    vec = vec + nn.mlp_embedder(params["vector_in"], y.astype(compute_dtype))
    txt = nn.linear(params["txt_in"], txt)

    ids = jnp.concatenate([txt_ids, img_ids], axis=1)
    cos, sin = multi_axis_rope(ids, cfg.axes_dim, cfg.theta)

    residuals = []
    for p, out_p in zip(params["double_blocks"], params["controlnet_blocks"]):
        img, txt = _double_block(p, img, txt, vec, cos, sin, cfg.num_heads)
        residuals.append(nn.linear(out_p, img))
    return tuple(residuals)
