"""LoRA injection / merge for tower fine-tuning (stage 2).

peft-equivalent semantics (``train_SigLIP_stage2_all.py:134-143``):
  * ``target_modules``: explicit list (SigLIP: ['k_proj','v_proj','q_proj',
    'out_proj','fc1','fc2']) or ``'all-linear'`` (OpenAICLIP/MetaCLIP video &
    image stage-2) — all-linear wraps every 2-D-weight linear except the
    output projections excluded by peft convention (visual/text_projection
    heads are linear too and ARE wrapped by peft's all-linear on CLIPModel).
  * init: A ~ kaiming-uniform(a=sqrt(5)), B = 0, scale = alpha/r;
  * ``bias='lora_only'``: only biases of wrapped modules are trainable;
  * merge: W' = W + scale * B @ A, factors dropped
    (``merge_and_unload`` before HF export, :305-311).

LoRA dropout (0.1 in the reference stage-2 configs) is applied peft-style —
``nn.Dropout(p)`` on the A-branch input only, active only while a
``core.nn.lora_dropout_ctx`` is open (the stage-2 loss functions open one
keyed off the step RNG, so steps stay deterministic given the key).

Factors live *inside* the param tree at the wrapped linear's node
("lora_A"/"lora_B"/"lora_scale"), applied in ``core.nn.linear``; injection,
merge, and trainability filters are pure tree transforms here.
"""

from __future__ import annotations

import math
import zlib
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


SIGLIP_TARGETS = ("k_proj", "v_proj", "q_proj", "out_proj", "fc1", "fc2")


def _iter_linears(tree, path=""):
    """Yield (path, node) for every linear-like node ({'weight': 2-D}, ...)."""
    if isinstance(tree, dict):
        w = tree.get("weight")
        if w is not None and getattr(w, "ndim", 0) == 2 and not isinstance(w, dict):
            yield path, tree
        for k, v in tree.items():
            if k == "weight":
                continue
            yield from _iter_linears(v, f"{path}.{k}" if path else str(k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _iter_linears(v, f"{path}.{i}" if path else str(i))


def _matches(path: str, targets) -> bool:
    if targets == "all-linear":
        # exclude embedding tables (they have 2-D 'weight' but are not linears)
        return not any(s in path for s in ("embedding", "embeddings", "logit_scale"))
    leaf = path.rsplit(".", 1)[-1]
    return leaf in targets


def inject(params, key: jax.Array, r: int = 16, alpha: float = 16.0,
           targets="all-linear") -> Tuple[dict, List[str]]:
    """Return (new_params, wrapped_paths).  Non-destructive (copies dicts)."""
    wrapped: List[str] = []

    def rec(node, path, key):
        if isinstance(node, dict):
            out = dict(node)
            w = node.get("weight")
            if (w is not None and getattr(w, "ndim", 0) == 2
                    and _matches(path, targets)):
                out_dim, in_dim = w.shape
                bound = math.sqrt(3.0 / in_dim)  # kaiming_uniform(a=sqrt(5))
                ka = jax.random.fold_in(key, zlib.crc32(path.encode()) % (2 ** 31))
                out["lora_A"] = jax.random.uniform(ka, (r, in_dim), w.dtype, -bound, bound)
                out["lora_B"] = jnp.zeros((out_dim, r), w.dtype)
                out["lora_scale"] = jnp.asarray(alpha / r, w.dtype)
                wrapped.append(path)
            for k, v in node.items():
                if k in ("weight", "bias", "lora_A", "lora_B", "lora_scale"):
                    continue
                out[k] = rec(v, f"{path}.{k}" if path else str(k), key)
            return out
        if isinstance(node, (list, tuple)):
            return [rec(v, f"{path}.{i}" if path else str(i), key)
                    for i, v in enumerate(node)]
        return node

    return rec(params, "", key), wrapped


def merge(params):
    """Fold LoRA factors into base weights and drop them (merge_and_unload)."""
    def rec(node):
        if isinstance(node, dict):
            out = {}
            if "lora_A" in node:
                w = node["weight"]
                delta = (node["lora_B"].astype(jnp.float32)
                         @ node["lora_A"].astype(jnp.float32)) * node["lora_scale"]
                out["weight"] = (w.astype(jnp.float32) + delta).astype(w.dtype)
                if "bias" in node:
                    out["bias"] = node["bias"]
                for k, v in node.items():
                    # weight_q/w_scale: derived QLoRA int8 compute factors
                    # (core.quant.quantize_lora_base) — never exported
                    if k in ("weight", "bias", "lora_A", "lora_B",
                             "lora_scale", "weight_q", "w_scale"):
                        continue
                    out[k] = rec(v)
                return out
            return {k: rec(v) for k, v in node.items()
                    if k not in ("weight_q", "w_scale")}
        if isinstance(node, (list, tuple)):
            return [rec(v) for v in node]
        return node

    return rec(params)


def lora_trainable_paths(params) -> List[str]:
    """All flat leaf paths that should train under bias='lora_only'."""
    out = []

    def rec(node, path):
        if isinstance(node, dict):
            has_lora = "lora_A" in node
            for k, v in node.items():
                p = f"{path}.{k}" if path else str(k)
                if k in ("lora_A", "lora_B"):
                    out.append(p)
                elif k == "bias" and has_lora:
                    out.append(p)
                else:
                    rec(v, p)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{path}.{i}" if path else str(i))

    rec(params, "")
    return out
