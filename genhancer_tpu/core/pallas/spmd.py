"""SPMD partitioning for the Pallas attention kernels.

A ``pallas_call`` lowers to an XLA custom call that GSPMD/Shardy cannot see
into: without annotation, partitioned callers (mesh DP/TP — parallel/mesh.py,
parallel/tp.py) get the operands all-gathered to every device and each device
computes the FULL batch (measured on an 8-device CPU mesh: 12 all-gathers in
the compiled HLO for one flash call).  The reference never hits this because
its cuDNN SDPA runs under torch DDP, where parallelism lives outside the
graph (``/root/reference/Continuous/src/flux/math.py:9``).

All our kernels are embarrassingly parallel over batch and heads — the grids
are (B, H/hb, ...) and no program reads across B or H — so the fix is
``jax.experimental.custom_partitioning``: declare B/H as pass-through
shardable factors and sequence/feature dims as replicated, and lower to the
same kernel on the per-device local shapes.  Under tensor parallelism the
qkv projections are column-parallel (parallel/tp.py), so the H axis arrives
sharded over the ``model`` axis and attention runs on local heads with zero
collectives — the Megatron pattern.

Both partitioner APIs are provided: an einsum-like ``sharding_rule`` (used
when Shardy, the default in this JAX, is active) and
``infer_sharding_from_operands``/``propagate_user_sharding`` (GSPMD
fallback).

``GENHANCER_SPMD_ATTN``: "auto" (default) wraps only when the process sees
more than one device — the wrapping is pure overhead single-device, and a
``CustomSPMDPartitioning`` custom call carries a process-local Python
callback pointer in its backend_config, which a REMOTE compile service
(e.g. the axon relay this container uses for its single TPU chip) cannot
invoke — measured: the wrapped train step never finished a 30-min remote
compile while the unwrapped one compiled in ~2 min.  "1" forces wrapping,
"0" disables it (kernels then force replication under SPMD — debugging
escape hatch only).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def out_struct(shape, dtype, *like):
    """ShapeDtypeStruct for a ``pallas_call`` out_shape, inheriting the union
    of the varying mesh axes (vma) of the ``like`` operands — required for
    the kernel to trace inside a shard_map body with check_vma (e.g. the
    pipeline stages of parallel/pp.py); a no-op in automatic (GSPMD)
    context where operands carry no vma."""
    vma = frozenset().union(
        *(getattr(jax.typeof(x), "vma", None) or () for x in like))
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


@functools.lru_cache(maxsize=1)
def enabled() -> bool:
    v = os.environ.get("GENHANCER_SPMD_ATTN", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    try:
        return len(jax.devices()) > 1
    except Exception:  # pragma: no cover
        return False

# argument/result kinds: which dims of the local array may stay sharded
BHLD = "bhld"   # rank-4 [B, L, H, D] — B (dim 0) and H (dim 2) shardable
LSE = "lse"     # rank-4 [B, H, L_pad, LANES] softmax stats — B (0) and H (1)
BLD = "bld"     # rank-3 tables [B, L, D] — B only
TC = "tc"       # rank-2 [T, C] row-major activations — T (dim 0) only
T = "t"         # rank-1 [T] per-row values — T only
C = "c"         # rank-1 [C] per-column values — fully replicated

# kind -> (rank, batch_dim, head_dim)
_KIND = {BHLD: (4, 0, 2), LSE: (4, 0, 1), BLD: (3, 0, None), TC: (2, 0, None),
         T: (1, 0, None), C: (1, None, None)}


def _none_spec(rank: int) -> P:
    return P(*([None] * rank))


def _spec_of(sharding) -> P:
    if isinstance(sharding, NamedSharding):
        return sharding.spec
    return P()


def _norm(spec: P, rank: int) -> tuple:
    """PartitionSpec -> tuple of length ``rank`` (None-padded)."""
    t = tuple(spec)
    return t + (None,) * (rank - len(t))


def _qkv_consistent(b_axis, h_axis, kind: str) -> P:
    """Spec for an argument/result given the op-wide (batch, head) axes."""
    rank, bd, hd = _KIND[kind]
    spec = [None] * rank
    if bd is not None:
        spec[bd] = b_axis
    if hd is not None:
        spec[hd] = h_axis
    return P(*spec)


def wrap(fn, arg_kinds: Sequence[str], out_kinds, rule: str,
         replication_factors: Sequence[str]):
    """Wrap a batch/head-parallel kernel entry point in custom_partitioning.

    ``fn(*arrays)`` must produce an array (out_kinds: str) or tuple of arrays
    (out_kinds: sequence) and be valid on any local B/H slice of its inputs.
    """
    if not enabled():
        return fn

    f = custom_partitioning(fn)
    multi = not isinstance(out_kinds, str)
    out_kinds_t = tuple(out_kinds) if multi else (out_kinds,)

    def _op_axes(arg_shapes):
        """(batch_axis, head_axis) consensus: first sharded suggestion wins."""
        b_axis = h_axis = None
        for s, kind in zip(arg_shapes, arg_kinds):
            rank, bd, hd = _KIND[kind]
            t = _norm(_spec_of(s.sharding), rank)
            if bd is not None and b_axis is None and t[bd] is not None:
                b_axis = t[bd]
            if hd is not None and h_axis is None and t[hd] is not None:
                h_axis = t[hd]
        return b_axis, h_axis

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        b_axis, h_axis = _op_axes(arg_shapes)
        outs = tuple(NamedSharding(mesh, _qkv_consistent(b_axis, h_axis, k))
                     for k in out_kinds_t)
        return outs if multi else outs[0]

    def propagate_user_sharding(mesh, user_shape):
        return user_shape.sharding

    def partition(mesh, arg_shapes, result_shape):
        b_axis, h_axis = _op_axes(arg_shapes)
        arg_shardings = tuple(
            NamedSharding(mesh, _qkv_consistent(b_axis, h_axis, k))
            for k in arg_kinds)
        outs = tuple(NamedSharding(mesh, _qkv_consistent(b_axis, h_axis, k))
                     for k in out_kinds_t)
        result_shardings = outs if multi else outs[0]

        def lower_fn(*args):
            return fn(*args)

        return mesh, lower_fn, result_shardings, arg_shardings

    # Shardy requires special-factor lists sorted by factor index (= order of
    # first appearance in the rule string)
    order = []
    for tok in rule.replace(",", " ").replace("->", " ").split():
        if tok not in order:
            order.append(tok)
    repl = tuple(sorted(replication_factors, key=order.index))

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        propagate_user_sharding=propagate_user_sharding,
        sharding_rule=rule,
        need_replication_factors=repl,
    )

    def dispatch(*args):
        # Inside a shard_map body (manual context, e.g. the pipeline stages
        # of parallel/pp.py) the arrays are already device-local:
        # custom_partitioning has nothing to partition there (and its
        # tracing rejects manual avals), so call the kernel directly —
        # per-device on local shapes, exactly what the partitioner's
        # lower_fn would have emitted.
        if getattr(jax.sharding.get_abstract_mesh(), "manual_axes", ()):
            return fn(*args)
        return f(*args)

    return dispatch


# canonical rules (q-rows l, kv-rows s, head_dim d, table cols e,
# padded lse rows p, lse lanes z)
FWD_RULE = "b l h d, b s h d, b s h d -> b l h d"
FWD_REPL = ("l", "s", "d")
FWD_LSE_RULE = "b l h d, b s h d, b s h d -> b l h d, b h p z"
FWD_LSE_REPL = ("l", "s", "d", "p", "z")
BWD_RULE = ("b l h d, b s h d, b s h d, b l h d, b l h d "
            "-> b l h d, b s h d, b s h d")
BWD_REPL = ("l", "s", "d")
BWD_LSE_RULE = ("b l h d, b s h d, b s h d, b l h d, b h p z, b l h d "
                "-> b l h d, b s h d, b s h d")
BWD_LSE_REPL = ("l", "s", "d", "p", "z")
ROPE_FWD_RULE = "b l h d, b s h d, b s h d, b l e, b l e -> b l h d"
ROPE_FWD_REPL = ("l", "s", "d", "e")
ROPE_BWD_RULE = ("b l h d, b s h d, b s h d, b l h d, b l h d, b l e, b l e "
                 "-> b l h d, b s h d, b s h d")
ROPE_BWD_REPL = ("l", "s", "d", "e")
# row-quant (core/pallas/rowquant.py): rows t shard over the data axis,
# columns c replicated (the amax reduction runs over c)
ROWQ_RULE = "t c -> t c, t"
ROWQ_CS_RULE = "t c, c -> t c, t"
ROWQ_REPL = ("c",)
