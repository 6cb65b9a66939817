"""Tensor parallelism for the DiT — Megatron-style sharding as placements.

The reference has no model parallelism (its DiT is ~1.3B params); this module
makes the framework scale past single-chip memory the TPU-native way: the
partitioning is expressed purely as ``NamedSharding``s on the parameter
pytree and XLA's SPMD partitioner derives the activation shardings and
inserts the ICI collectives — the model code (``models/dit.py``) is
untouched.

Pattern (per transformer block, hidden h, heads H, mlp m = 4h):
  * column-parallel producers — qkv [3h, h], mlp-in [m, h], and the single
    blocks' fused ``linear1`` [3h+m, h] — shard their OUTPUT dim over the
    ``model`` axis; the head dim of the attention reshape inherits the
    sharding (H % tp == 0 enforced), so attention runs on local heads;
  * row-parallel consumers — attn ``proj`` [h, h], mlp-out [h, m], fused
    ``linear2`` [h, h+m] — shard their INPUT dim; XLA emits one
    all-reduce per consumer (the Megatron f/g pattern) over ICI.
  * everything else (norm scales, modulations, embedders, final layer,
    frozen tower/VAE) stays replicated; biases of column producers shard
    with their outputs.

The single blocks pack qkv and mlp into one ``linear1`` whose 3h|m split
boundary need not align with shard boundaries — XLA handles the slice with
a reshard; correctness is exact (validated by the dp-vs-dp×tp loss-parity
test), and the packing keeps the reference checkpoint layout.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS, replicated

# flat-path regex -> (weight PartitionSpec, bias PartitionSpec)
_COL = (P(MODEL_AXIS, None), P(MODEL_AXIS))      # shard output dim
_ROW = (P(None, MODEL_AXIS), P())                # shard input dim
_TP_RULES = [
    (re.compile(r"double_blocks\.\d+\.(img|txt)\.attn\.qkv\."), _COL),
    (re.compile(r"double_blocks\.\d+\.(img|txt)\.attn\.proj\."), _ROW),
    (re.compile(r"double_blocks\.\d+\.(img|txt)\.mlp\.0\."), _COL),
    (re.compile(r"double_blocks\.\d+\.(img|txt)\.mlp\.2\."), _ROW),
    (re.compile(r"single_blocks\.\d+\.linear1\."), _COL),
    (re.compile(r"single_blocks\.\d+\.linear2\."), _ROW),
]


def dit_param_spec(path: str, leaf) -> P:
    """PartitionSpec for one flat DiT param path (P() = replicated).

    Static-int8 factor leaves (serving: core.quant.quantize_linear_tree
    replaces ``weight`` with ``weight_q`` [o,i] + ``w_scale`` [o,1]) shard
    like the weight they stand for: ``weight_q`` takes the weight spec;
    the per-output-row ``w_scale`` shards with the output dim (replicated
    for row-parallel consumers, whose sharded dim is the input)."""
    for pat, (w_spec, b_spec) in _TP_RULES:
        if pat.search(path):
            nd = getattr(leaf, "ndim", 0)
            if path.endswith(".weight") and nd == 2:
                return w_spec
            if path.endswith(".weight_q") and nd == 2:
                return w_spec
            if path.endswith(".w_scale") and nd == 2:
                return P(tuple(w_spec)[0], None)
            if path.endswith(".bias") and nd == 1:
                return b_spec
            break
    return P()


def shard_dit_params(flat_params: dict, mesh: Mesh, prefix: str = "dit."):
    """Place a FLAT params dict (train.state layout): DiT leaves get TP
    shardings, everything else replicated.

    Returns (placed_params, placements) where ``placements`` maps flat path
    -> NamedSharding — used to give the optimizer moments the SAME layout
    (a moment leaf resharded every step would silently serialize the update
    behind collectives)."""
    rep = replicated(mesh)
    out, placements = {}, {}
    for path, leaf in flat_params.items():
        if path.startswith(prefix):
            sh = NamedSharding(mesh, dit_param_spec(path[len(prefix):], leaf))
        else:
            sh = rep
        out[path] = jax.device_put(leaf, sh)
        placements[path] = sh
    return out, placements


def shard_like_params(tree, placements: dict, mesh: Mesh):
    """Place a pytree whose dict keys mirror the flat param paths (optax
    moment trees) with each leaf's matching param sharding."""
    rep = replicated(mesh)

    def place(path, leaf):
        key = None
        for p in reversed(path):
            if isinstance(p, jax.tree_util.DictKey):
                key = p.key
                break
        sh = placements.get(key, rep)
        try:
            return jax.device_put(leaf, sh)
        except ValueError:   # rank mismatch (e.g. optax count scalars)
            return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map_with_path(place, tree)


def validate_tp(dit_cfg, tp: int) -> None:
    if tp <= 1:
        return
    if dit_cfg.num_heads % tp:
        raise ValueError(
            f"num_heads={dit_cfg.num_heads} not divisible by "
            f"model_parallel={tp} (attention heads shard over the model axis)")
    if dit_cfg.hidden_size % tp or dit_cfg.mlp_hidden % tp:
        raise ValueError(
            f"hidden dims ({dit_cfg.hidden_size}, {dit_cfg.mlp_hidden}) must "
            f"divide model_parallel={tp}")
