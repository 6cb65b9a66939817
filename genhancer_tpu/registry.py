"""Model registry + builders wiring configs to concrete specs and weights.

Replaces the reference loaders (``src/flux/util.py:124-246``,
``clip_models/build_CLIP.py``): DiT configs come from models.dit.DIT_CONFIGS
(flux-dev/flux-schnell, random init by design — util.py:130), the VAE loads
``ae.safetensors`` from the ``AE`` env var or ``ae_path`` config, towers load
from local HF model dirs (``clip_config.model_dir``) or random-init for smoke
runs.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax

from .models import dit as dit_m
from .models import vae as vae_m
from .models.towers import clip as clip_m
from .models.towers import siglip as siglip_m
from .weights import hf_convert
from .weights.torch_io import load_hf_config, load_hf_dir_state_dict

log = logging.getLogger(__name__)


def build_dit_config(model_name: str) -> dit_m.DiTConfig:
    return dit_m.DIT_CONFIGS[model_name]


def build_vae(model_name: str = "flux-dev", ae_path: Optional[str] = None,
              key: Optional[jax.Array] = None):
    """(params, cfg) — weights from $AE / ae_path, else random init (smoke)."""
    cfg = vae_m.VAE_CONFIGS[model_name]
    path = ae_path or os.environ.get("AE")
    if path and os.path.exists(path):
        return hf_convert.load_vae_params(path), cfg
    if path:
        log.warning("AE checkpoint %s not found — random-init VAE", path)
    return vae_m.init_vae(key if key is not None else jax.random.key(0), cfg), cfg


def tower_family_and_config(tower: str, clip_image_size: int,
                            clip_type: Optional[str] = None) -> Tuple[str, object]:
    """(kind, config) for a reference tower selection.

    tower: openai_clip | siglip | metaclip (clip_type large|huge).
    """
    if tower == "siglip":
        name = f"siglip-so400m-patch14-{clip_image_size}"
        return "siglip", siglip_m.SIGLIP_VARIANTS[name]
    if tower == "metaclip":
        name = f"metaclip-{'l14' if (clip_type or 'large') == 'large' else 'h14'}-fullcc2.5b"
        return "clip", clip_m.CLIP_VARIANTS[name]
    name = ("clip-vit-large-patch14" if clip_image_size == 224
            else "clip-vit-large-patch14-336")
    return "clip", clip_m.CLIP_VARIANTS[name]


def load_tower(kind: str, cfg, model_dir: Optional[str] = None,
               key: Optional[jax.Array] = None):
    """(params, cfg) — from a local HF dir (config.json overrides cfg) or
    random init."""
    if model_dir and os.path.isdir(model_dir):
        hf_cfg = load_hf_config(model_dir)
        cfg = (siglip_m.SiglipConfig.from_hf(hf_cfg) if kind == "siglip"
               else clip_m.CLIPConfig.from_hf(hf_cfg))
        sd = load_hf_dir_state_dict(model_dir)
        # stage-2 eval fallback parity: strip 'model.' prefixes if present
        if any(k.startswith("model.") for k in sd):
            sd = {k[6:] if k.startswith("model.") else k: v for k, v in sd.items()}
        return hf_convert.tower_from_torch(sd), cfg
    if model_dir:
        log.warning("tower dir %s not found — random init", model_dir)
    init = siglip_m.init_siglip if kind == "siglip" else clip_m.init_clip
    return init(key if key is not None else jax.random.key(0), cfg), cfg
