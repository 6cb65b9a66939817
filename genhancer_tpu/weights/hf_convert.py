"""Converters between torch/HF state dicts and genhancer_tpu param pytrees.

Tower (CLIP/SigLIP) pytrees mirror HF key structure 1:1, so conversion is just
(un)flattening plus OIHW<->HWIO transposes on conv weights.  The DiT pytree
groups the two streams (``double_blocks.{i}.img.attn...``) and maps to the
reference's flat torch names (``double_blocks.{i}.img_attn...``,
``src/flux/model.py:50-77``) via an explicit rename.  The VAE maps the
``ae.safetensors`` keys (``src/flux/modules/autoencoder.py``) with conv
transposes only.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from .torch_io import flatten_pytree, unflatten_state_dict


def _is_conv_key(k: str) -> bool:
    """Keys whose torch value is an OIHW conv weight."""
    if not k.endswith(".weight"):
        return False
    stem = k[: -len(".weight")]
    conv_markers = ("conv", "patch_embedding", "downsample", "upsample",
                    "nin_shortcut", ".q", ".k", ".v", ".proj_out")
    return any(stem.endswith(m) or ("conv" in stem.rsplit(".", 1)[-1])
               for m in conv_markers)


def _to_jax_leaf(k: str, v: np.ndarray, conv_keys) -> np.ndarray:
    if v.ndim == 4 and conv_keys(k):
        return np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
    return v


def _to_torch_leaf(k: str, v: np.ndarray, conv_keys) -> np.ndarray:
    if v.ndim == 4 and conv_keys(k):
        return np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
    return v


def _convert(sd: Dict[str, np.ndarray], direction: str, conv_keys) -> Dict[str, np.ndarray]:
    fn = _to_jax_leaf if direction == "to_jax" else _to_torch_leaf
    return {k: fn(k, np.asarray(v), conv_keys) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# CLIP / SigLIP towers — pytree keys == HF keys
# ---------------------------------------------------------------------------

_TOWER_CONV = ("patch_embedding.weight",)


def _tower_conv_key(k: str) -> bool:
    return k.endswith("patch_embedding.weight")


def tower_from_torch(sd: Dict[str, np.ndarray], as_jax: bool = True):
    """HF CLIPModel/SiglipModel state_dict -> param pytree.

    Drops non-parameter buffers (position_ids) and text_model.embeddings
    position_ids.  Works for partial dicts (e.g. vision-only).
    """
    sd = {k: v for k, v in sd.items() if not k.endswith("position_ids")}
    sd = _convert(sd, "to_jax", _tower_conv_key)
    tree = unflatten_state_dict(sd)
    if as_jax:
        import jax
        tree = jax.tree_util.tree_map(jnp.asarray, tree)
    return tree


def tower_to_torch(params) -> Dict[str, np.ndarray]:
    sd = flatten_pytree(params)
    return _convert(sd, "to_torch", _tower_conv_key)


# ---------------------------------------------------------------------------
# VAE — ae.safetensors keys (all convs)
# ---------------------------------------------------------------------------

def _vae_conv_key(k: str) -> bool:
    leaf = k.rsplit(".", 2)
    return k.endswith(".weight") and any(
        s in k for s in ("conv", "nin_shortcut", ".q.", ".k.", ".v.", "proj_out"))


def vae_from_torch(sd: Dict[str, np.ndarray], as_jax: bool = True):
    sd = _convert(sd, "to_jax", _vae_conv_key)
    tree = unflatten_state_dict(sd)
    if as_jax:
        import jax
        tree = jax.tree_util.tree_map(jnp.asarray, tree)
    return tree


def vae_to_torch(params) -> Dict[str, np.ndarray]:
    sd = flatten_pytree(params)
    return _convert(sd, "to_torch", _vae_conv_key)


def load_vae_params(ae_path: str):
    """Load the FLUX.1-dev ``ae.safetensors`` (env ``AE`` in the reference,
    src/flux/util.py:145,227-246)."""
    from .torch_io import load_safetensors
    return vae_from_torch(load_safetensors(ae_path))


# ---------------------------------------------------------------------------
# DiT — grouped pytree <-> flat reference names
# ---------------------------------------------------------------------------

def _dit_rename_to_torch(key: str) -> str:
    """double_blocks.{i}.img.attn.qkv -> double_blocks.{i}.img_attn.qkv etc."""
    parts = key.split(".")
    if parts[0] == "double_blocks":
        stream = parts[2]           # img | txt
        sub = parts[3]              # mod | attn | mlp
        rest = parts[4:]
        return ".".join(parts[:2] + [f"{stream}_{sub}"] + rest)
    return key


def _dit_rename_from_torch(key: str) -> str:
    parts = key.split(".")
    if parts[0] == "double_blocks":
        name = parts[2]             # img_mod / img_attn / img_mlp / txt_*
        if "_" in name:
            stream, sub = name.split("_", 1)
            return ".".join(parts[:2] + [stream, sub] + parts[3:])
    return key


def dit_to_torch(params) -> Dict[str, np.ndarray]:
    sd = flatten_pytree(params)
    return {_dit_rename_to_torch(k): np.asarray(v) for k, v in sd.items()}


def dit_from_torch(sd: Dict[str, np.ndarray], as_jax: bool = True):
    sd = {_dit_rename_from_torch(k): v for k, v in sd.items()}
    tree = unflatten_state_dict(sd)
    if as_jax:
        import jax
        tree = jax.tree_util.tree_map(jnp.asarray, tree)
    return tree


# ---------------------------------------------------------------------------
# Projectors / adapters — sequential-index keys are already torch names
# ---------------------------------------------------------------------------

def module_to_torch(params) -> Dict[str, np.ndarray]:
    return flatten_pytree(params)


def module_from_torch(sd: Dict[str, np.ndarray], as_jax: bool = True):
    tree = unflatten_state_dict({k: np.asarray(v) for k, v in sd.items()})
    if as_jax:
        import jax
        tree = jax.tree_util.tree_map(jnp.asarray, tree)
    return tree
