"""Text-conditioned DiT input preparation (``prepare`` equivalent).

The reference's ``prepare`` (``src/flux/sampling.py:32-63``) and ``HFEmbedder``
(``modules/conditioner.py``) build DiT inputs from T5 sequence embeddings +
CLIP-text pooled vectors.  GenHancer's trainers never use this path (the
vision projections replace text embeddings), but the generative core keeps the
capability: this module provides the same input-dict construction from any
embedder callables, with a CLIP-text provider built from our JAX tower.

T5: ``t5_sequence_provider`` + ``models.towers.t5`` provide the [B, L, 4096]
sequence embeddings (T5-XXL width matches the DiT's context_in_dim); weights
load from a local HF dir via ``t5.load_t5`` (HF-parity tested,
tests/test_t5.py).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..core.rope import spatial_ids
from ..models import dit as dit_m
from ..models.towers import clip as clip_m


def clip_text_pooled_provider(params, cfg: clip_m.CLIPConfig) -> Callable:
    """texts' token ids [B, L] -> pooled projected embedding [B, proj_dim]
    (HFEmbedder with is_clip=True semantics: pooler output)."""
    def fn(input_ids: jax.Array) -> jax.Array:
        return clip_m.get_text_features(params, input_ids, cfg)
    return fn


def t5_sequence_provider(params, cfg) -> Callable:
    """token ids [B, L] -> sequence embedding [B, L, d_model] (HFEmbedder with
    T5EncoderModel semantics: last_hidden_state, conditioner.py:30-43)."""
    from ..models.towers import t5 as t5_m

    def fn(input_ids: jax.Array, attention_mask=None) -> jax.Array:
        return t5_m.encoder_forward(params, input_ids, cfg,
                                    attention_mask=attention_mask)
    return fn


def prepare(txt_embed: jax.Array, vec_embed: jax.Array,
            latent: jax.Array) -> Dict[str, jax.Array]:
    """Build the DiT input dict from precomputed embeddings.

    txt_embed: [B, L_txt, 4096] sequence conditioning (T5-style);
    vec_embed: [B, vec_dim] pooled conditioning (CLIP-text style);
    latent: [B, H, W, C] NHWC VAE latent (unpacked).
    Mirrors sampling.py:32-63: packs the latent, builds the (0, row, col)
    img_ids grid and zero txt_ids.
    """
    b, h, w, c = latent.shape
    img = dit_m.pack_latent(latent)
    img_ids = jnp.broadcast_to(spatial_ids(h // 2, w // 2)[None],
                               (b, (h // 2) * (w // 2), 3))
    txt_ids = jnp.zeros((b, txt_embed.shape[1], 3), jnp.float32)
    return {"img": img, "img_ids": img_ids, "txt": txt_embed,
            "txt_ids": txt_ids, "vec": vec_embed}
