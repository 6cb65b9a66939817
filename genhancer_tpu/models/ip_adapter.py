"""IP-Adapter conditioning for the DiT (functional equivalent of the
reference's IP processors).

Reference: ``ImageProjModel`` (``src/flux/modules/layers.py:574-595``) maps a
CLIP image embedding into N extra context tokens; ``IPDoubleStreamBlock-
Processor`` (:221-301) adds zero-init k/v projections per double block and
cross-attends the img-stream queries against the projected tokens, scaled by
``ip_scale``; ``IPSingleStreamBlockProcessor`` (:391-455) does the same for
single blocks.  (These are unused by the GenHancer trainers but are part of
the generative core's API surface.)

Functional design: ``init_ip_params`` builds a parallel param tree
(``ip_double.{i}``, ``ip_single.{i}``, ``image_proj_model``); ``dit_forward``
accepts ``image_proj``/``ip_params``/``ip_scale`` and adds the IP attention
residual after each block's own attention.  Zero-init k (and v for double
blocks per the reference) makes injection a no-op at initialization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import nn
from ..core.attention import sdpa


def init_image_proj_model(key, clip_embeddings_dim: int = 1024,
                          cross_attention_dim: int = 4096,
                          num_tokens: int = 4):
    k1 = jax.random.fold_in(key, 0)
    return {
        "proj": nn.linear_init(k1, clip_embeddings_dim,
                               num_tokens * cross_attention_dim),
        "norm": nn.layernorm_init(cross_attention_dim),
        "num_tokens": num_tokens,
        "cross_attention_dim": cross_attention_dim,
    }


def image_proj_model(p, image_embeds: jax.Array) -> jax.Array:
    """[B, clip_dim] -> [B, num_tokens, cross_attention_dim] (layers.py:588-594)."""
    n, d = int(p["num_tokens"]), int(p["cross_attention_dim"])
    tokens = nn.linear(p["proj"], image_embeds).reshape(-1, n, d)
    return nn.layernorm(p["norm"], tokens, eps=1e-5)


def _zero_linear(in_dim, out_dim, bias=True):
    p = {"weight": jnp.zeros((out_dim, in_dim))}
    if bias:
        p["bias"] = jnp.zeros((out_dim,))
    return p


def init_ip_params(key, cfg, context_dim: int = 4096,
                   clip_embeddings_dim: int = 1024, num_tokens: int = 4):
    """cfg: DiTConfig.  k/v projections are zero-init (layers.py:239-243)."""
    h = cfg.hidden_size
    return {
        "image_proj_model": init_image_proj_model(
            key, clip_embeddings_dim, context_dim, num_tokens),
        "ip_double": [{"k_proj": _zero_linear(context_dim, h),
                       "v_proj": _zero_linear(context_dim, h)}
                      for _ in range(cfg.depth)],
        "ip_single": [{"k_proj": _zero_linear(context_dim, h, bias=False),
                       "v_proj": _zero_linear(context_dim, h, bias=False)}
                      for _ in range(cfg.depth_single_blocks)],
    }


def ip_attention(block_ip, q: jax.Array, image_proj: jax.Array,
                 num_heads: int) -> jax.Array:
    """Cross-attend queries [B, L, H, D] against projected IP tokens
    [B, N, ctx]; returns [B, L, H*D] (layers.py:280-299)."""
    b, n, _ = image_proj.shape
    h = q.shape[2]
    d = q.shape[3]
    ip_k = nn.linear(block_ip["k_proj"], image_proj).reshape(b, n, h, d)
    ip_v = nn.linear(block_ip["v_proj"], image_proj).reshape(b, n, h, d)
    out = sdpa(q, ip_k, ip_v)
    return out.reshape(b, q.shape[1], h * d)
