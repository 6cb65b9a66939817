"""FSDP / ZeRO-3-style parameter sharding as placements.

The reference scales with DDP only — every GPU holds the full model, its
gradients, and the full Adam state (SURVEY.md §5.8; Accelerate's
zero_stage-0).  This module removes the last replicated residency: with
``fsdp: true`` every parameter leaf (trainable AND frozen) is sharded over
the ``data`` mesh axis, so per-chip weight residency drops to ``1/dp`` —
the TPU-native equivalent of torch FSDP / DeepSpeed ZeRO-3, expressed as
``NamedSharding`` placements with ZERO model-code changes:

  * XLA's SPMD partitioner inserts the all-gather right before each
    weight's use and frees the gathered copy after (under remat the gather
    re-runs in the backward — the classic FSDP reshard-after-forward), and
    emits a reduce-scatter for the weight gradient instead of DP's
    all-reduce;
  * the optimizer update runs on each chip's own shard — moments are placed
    with the SAME sharding as their param (``tp.shard_like_params``), so
    ZeRO-3 subsumes ZeRO-1: ``shard_optimizer_state`` becomes a no-op on
    leaves this module already sharded (mesh.shard_over_data skips
    already-sharded leaves);
  * composition with tensor parallelism is dimension-wise: the FSDP axis
    takes the largest dimension the TP spec leaves free (a column-parallel
    [3h, h] weight P("model", None) becomes P("model", "data") — the
    standard 2-D TP x FSDP layout).

Sharding choice: per-leaf, the LARGEST free dimension divisible by the
data-axis size; leaves smaller than ``min_size`` elements stay replicated
(norm scales, modulations, small biases — sharding them buys ~nothing and
costs a collective each).  This keeps layouts checkpoint-compatible: the
torch backend gathers sharded leaves before serializing
(async_ckpt.gather_sharded) and orbax restores shard-to-shard.

Cost model (why this is a residency knob, not a default): stage-1 trains
only the 1.3B-param DiT — replicated params + moments are ~7.8 GB bf16/f32
on a 16 GB v5e, fine at dp=1..8 but binding for video modes at higher
resolutions or bigger DiTs.  FSDP trades that residency for one all-gather
per weight per (re)use; on an ICI-connected pod slice the gathers overlap
with compute poorly at small per-chip batch, so enable it when memory —
not step time — is the constraint (docs/SCALING.md).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, data_axis_size, replicated

# leaves below this many elements stay replicated (a 64-wide bias shard
# saves ~nothing and adds an all-gather dispatch per step)
MIN_SHARD_SIZE = 2 ** 16


def fsdp_spec(leaf, n: int, base: P = P(), min_size: int = MIN_SHARD_SIZE) -> P:
    """PartitionSpec sharding ``leaf``'s largest free dim over the data axis.

    ``base`` is an existing (TP) spec whose axes are preserved; dims it
    already shards are not candidates.  Returns ``base`` unchanged when no
    dim divides ``n`` or the leaf is below ``min_size``."""
    nd = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    spec = list(base) + [None] * (nd - len(tuple(base)))

    def norm(s):     # P(None, None) -> P(): trim trailing replicated dims
        while s and s[-1] is None:
            s = s[:-1]
        return P(*s)

    if nd == 0 or int(leaf.size) < min_size:
        return norm(spec)
    cands = [d for d in range(nd)
             if spec[d] is None and shape[d] % n == 0 and shape[d] >= n]
    if not cands:
        return norm(spec)
    d = max(cands, key=lambda d: shape[d])
    spec[d] = DATA_AXIS
    return norm(spec)


def shard_params_fsdp(
    flat_params: Dict[str, jax.Array], mesh: Mesh,
    tp_placements: Optional[Dict[str, NamedSharding]] = None,
    min_size: int = MIN_SHARD_SIZE,
) -> Tuple[Dict[str, jax.Array], Dict[str, NamedSharding]]:
    """Place a FLAT params dict (train.state layout) with FSDP shardings.

    ``tp_placements`` (from tp.shard_dit_params) are composed with, not
    overwritten: the FSDP axis picks a dimension the TP spec leaves free.
    Returns (placed_params, placements) — feed ``placements`` to
    ``tp.shard_like_params`` so the moments land in the same layout."""
    n = data_axis_size(mesh)
    out, placements = {}, {}
    for path, leaf in flat_params.items():
        base = P()
        if tp_placements is not None and path in tp_placements:
            base = tp_placements[path].spec
        sh = NamedSharding(mesh, fsdp_spec(leaf, n, base, min_size=min_size))
        out[path] = jax.device_put(leaf, sh)
        placements[path] = sh
    return out, placements


def validate_fsdp(cfg) -> None:
    """Reject compositions FSDP does not support.

    * pipeline parallelism stacks per-stage params into P(pipe) slabs
      (parallel/pp.py) — a second param sharding would fight the stacking;
    * the fused Pallas optimizer's pallas_call is not wrapped in
      custom_partitioning, so GSPMD would gather the full param into one
      update program — exactly the residency FSDP exists to avoid.  The
      default optax chain is pure elementwise XLA and partitions for free.
    """
    if int(cfg.get("pipeline_parallel", 1) or 1) > 1:
        raise ValueError("fsdp does not compose with pipeline_parallel "
                         "(stage stacking owns the param placement)")
    if int(cfg.get("sequence_parallel", 1) or 1) > 1:
        # the ring path returns before the attention activation anchor
        # applies, so the GSPMD reshape-tiling hazard the anchor guards
        # against is unhandled under SP — reject rather than run an
        # unvalidated layout (SP already gives O(L/n) activation memory;
        # pair it with ZeRO-1 for optimizer residency instead)
        raise ValueError("fsdp does not compose with sequence_parallel "
                         "(the attention anchor does not cover the ring "
                         "path); use shard_optimizer_state with SP")
    if cfg.get("fused_optimizer") == "pallas":
        raise ValueError(
            "fsdp requires the default optax optimizer: the fused Pallas "
            "AdamW would force an all-gather of each sharded param at the "
            "update (no custom_partitioning on the kernel); drop "
            "fused_optimizer or fsdp")
