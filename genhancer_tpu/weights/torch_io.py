"""Torch-format checkpoint IO and pytree <-> flat-state-dict conversion.

The reference persists everything as ``torch.save(state_dict())`` ``.bin``
files (``train_SigLIP_stage1.py:284-300``) and HF ``save_pretrained`` dirs
with ``pytorch_model.bin`` (``train_SigLIP_stage2_all.py:305-311``).  We keep
those layouts byte-compatible.  torch (CPU build) is present in the image and
is used **only** here, for serialization — never on the compute path.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np


# ---------------------------------------------------------------------------
# flatten / unflatten
# ---------------------------------------------------------------------------

def flatten_pytree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict/list pytree -> flat {'a.b.0.c': ndarray} state dict."""
    out: Dict[str, np.ndarray] = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{path}.{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{path}.{i}" if path else str(i))
        else:
            out[path] = np.asarray(node)

    rec(tree, prefix)
    return out


def unflatten_state_dict(sd: Dict[str, np.ndarray]) -> Any:
    """Flat {'a.b.0.c': x} -> nested dicts; all-digit-key dicts become lists."""
    root: Dict[str, Any] = {}
    for key, val in sd.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            idx = sorted(node, key=int)
            if [int(i) for i in idx] == list(range(len(idx))):
                return [node[i] for i in idx]
        return node

    return listify(root)


# ---------------------------------------------------------------------------
# torch .bin
# ---------------------------------------------------------------------------

def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write a ``torch.save``-compatible ``.bin`` readable by ``torch.load``
    and HF ``from_pretrained``."""
    import torch

    def to_tensor(v: np.ndarray):
        v = np.ascontiguousarray(np.asarray(v))
        if v.dtype.name == "bfloat16":  # ml_dtypes.bfloat16 -> torch.bfloat16
            return torch.from_numpy(v.view(np.uint16).copy()).view(torch.bfloat16)
        return torch.from_numpy(v.copy())

    tsd = {k: to_tensor(v) for k, v in sd.items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(tsd, path)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            v = v.to(torch.float32).numpy() if v.dtype == torch.bfloat16 else v.numpy()
        out[k] = np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# safetensors
# ---------------------------------------------------------------------------

def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    out = {}
    with safe_open(path, framework="numpy") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def save_safetensors(sd: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


# ---------------------------------------------------------------------------
# HF model dirs
# ---------------------------------------------------------------------------

def load_hf_dir_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read weights from an HF model dir: pytorch_model.bin or
    model.safetensors (sharded variants included)."""
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(bin_path):
        return load_torch_state_dict(bin_path)
    if os.path.exists(st_path):
        return load_safetensors(st_path)
    idx = None
    for name in ("model.safetensors.index.json", "pytorch_model.bin.index.json"):
        p = os.path.join(model_dir, name)
        if os.path.exists(p):
            idx = p
            break
    if idx is None:
        raise FileNotFoundError(f"no weights found in {model_dir}")
    with open(idx) as f:
        weight_map = json.load(f)["weight_map"]
    out = {}
    for shard in sorted(set(weight_map.values())):
        sp = os.path.join(model_dir, shard)
        out.update(load_safetensors(sp) if shard.endswith(".safetensors")
                   else load_torch_state_dict(sp))
    return out


def load_hf_config(model_dir: str) -> dict:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)
