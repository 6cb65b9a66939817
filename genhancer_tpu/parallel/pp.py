"""Pipeline parallelism for the DiT — a GPipe schedule over a ``pipe`` mesh
axis, expressed as a shard_map + ppermute microbatch loop.

Motivation.  The framework already scales over batch (mesh DP +
ZeRO-1, parallel/mesh.py), hidden/heads (Megatron TP, parallel/tp.py) and
sequence (ring attention SP, parallel/ring.py).  Pipeline parallelism is the
fourth axis: the DiT's *depth* shards over devices, which pays when (a) the
matmuls are already too small to split further with TP (TP halves every
matmul's N; PP keeps them full-sized and instead gives each device fewer of
them), or (b) the mesh spans more chips than heads/batch can use.  The
reference has no model parallelism of any kind (its NCCL layer is DP-only —
SURVEY.md §2.9/§5.8); this is a beyond-parity scaling feature.

(XLA note: the stack-inside-jit concatenate may log an "[SPMD] Involuntary
full rematerialization" warning — GSPMD materializes the stacked copy before
slicing it per-stage.  The source leaves are replicated params, so this is
one extra weight-read of HBM traffic per step, not a collective; the Shardy
partitioner is expected to remove it.)

Design (TPU/XLA-native, no graph surgery):

  * The per-block parameter pytrees are STACKED along a leading depth axis
    (they are homogeneous by construction — models/dit.py init) and that
    axis is sharded over ``pipe``: each device holds ``depth / n_stages``
    blocks.  The stack happens inside jit from the replicated per-block
    leaves, so GSPMD emits local slices (no collectives) and the stacked
    copy is transient; the persistent TrainState layout (flat per-block
    paths, checkpoints, optimizer moments) is untouched.  PP here therefore
    partitions *compute and activations* over depth, not weight residency —
    for weight/optimizer residency use ZeRO-1 (``shard_optimizer_state``),
    which composes with PP on the data axis.
  * Microbatching is LOCAL: each device splits its data-shard rows into M
    microbatches ([B_loc] -> [M, B_loc/M] inside the shard_map body), so no
    cross-device resharding happens at the phase boundaries.  Global
    microbatch m is a stripe across data shards — semantically free, the
    loss is a row-wise mean and rows are reassembled in the same order.
  * A ``lax.scan`` over ``M + n_stages - 1`` ticks runs the classic GPipe
    schedule: at tick t, stage i computes microbatch ``t - i`` (when in
    range) and ``ppermute``s its activation to stage i+1.  Stage 0 injects
    microbatch t from its local input slice; stage n-1's outputs are
    emitted as scan ys and the caller selects the diagonal.
  * The DiT has two homogeneous segments — double-stream blocks over
    (img, txt), then single-stream blocks over the fused sequence
    (models/dit.py dit_forward) — so the pipeline runs as TWO chained
    phases with a barrier at the concat.  Each phase's bubble is
    (S-1)/(M+S-1); embedders, RoPE tables and the final layer are per-token
    or per-sample ops that stay outside (GSPMD shards them over data).
  * Autodiff: plain jax.grad through scan + ppermute gives the reverse
    pipeline schedule automatically (ppermute transposes to the inverted
    permutation — the backward bubble mirrors the forward).  Per-block
    jax.checkpoint (the dit_forward remat flags) bounds the stash to the
    scan carries.

Composition: pipe x data (+ ZeRO-1) is supported and parity-tested on the
virtual CPU mesh (tests/test_pp.py); pipe x model/seq is rejected at mesh
construction — TP shards the very weight dims the stage stacking slices,
and SP's ring would nest a second shard_map inside the stage body.

Numerics note: inactive pipeline slots (warmup/drain ticks) compute the
stage on a zeros activation and the result is discarded via jnp.where —
every block is zeros-safe (layernorm has an eps; no division by activations
appears anywhere in models/dit.py), so no NaNs can leak through the select's
cotangent.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, PIPE_AXIS


def tree_stack(blocks: Sequence):
    """List of homogeneous block pytrees -> one pytree of [depth, ...] leaves."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def validate_pp(dit_cfg, pp: int, n_micro: int, local_batch: int) -> None:
    if pp <= 1:
        return
    if dit_cfg.depth % pp or dit_cfg.depth_single_blocks % pp:
        raise ValueError(
            f"pipeline_parallel={pp} must divide both depth={dit_cfg.depth} "
            f"and depth_single_blocks={dit_cfg.depth_single_blocks}")
    if n_micro < 1:
        raise ValueError(f"pipeline_microbatches={n_micro} must be >= 1")
    if local_batch % n_micro:
        raise ValueError(
            f"per-data-shard batch {local_batch} not divisible by "
            f"pipeline_microbatches={n_micro}")


def _phase(stage_fn: Callable, n_stages: int, n_micro: int,
           local_params, inputs: tuple, consts: tuple, axis_name: str):
    """One GPipe phase, inside shard_map.

    local_params: pytree of [depth/n_stages, ...] leaves (this device's
    chunk).  inputs/consts: tuples of local [B_loc, ...] arrays (this data
    shard's rows, pipe-replicated).  Returns a tuple of [B_loc, ...]
    outputs with the same structure as ``inputs``.
    """
    def mb(x):
        return x.reshape(n_micro, x.shape[0] // n_micro, *x.shape[1:])

    inputs = jax.tree.map(mb, inputs)
    consts = jax.tree.map(mb, consts)

    i = jax.lax.axis_index(axis_name)
    ticks = n_micro + n_stages - 1

    def pick(tree, j):
        jc = jnp.clip(j, 0, n_micro - 1)
        return jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, jc, 0, keepdims=False),
            tree)

    def tick(cur, t):
        j = t - i                                   # this stage's microbatch
        inj = pick(inputs, t)                       # stage 0's injection
        cur = jax.tree.map(
            lambda a, b: jnp.where(i == 0, a, b), inj, cur)
        out = stage_fn(local_params, cur, pick(consts, j))
        active = (j >= 0) & (j < n_micro)
        out = jax.tree.map(lambda o, c: jnp.where(active, o, c), out, cur)
        nxt = jax.tree.map(
            lambda x: jax.lax.ppermute(
                x, axis_name,
                [(s, (s + 1) % n_stages) for s in range(n_stages)]), out)
        return nxt, out

    cur0 = jax.tree.map(lambda x: jnp.zeros_like(x[0]), inputs)
    _, ys = jax.lax.scan(tick, cur0, jnp.arange(ticks))
    # ys: [ticks, mb, ...] per device — microbatch j's final activation is
    # stage n-1's output at tick (n_stages - 1 + j).  Select the diagonal
    # locally (zeros on every other stage) and psum it back to all stages:
    # the phase barrier that feeds phase 2 / the final layer.
    rows = jnp.arange(n_micro) + (n_stages - 1)

    def collect(y):
        mine = jnp.where(i == n_stages - 1, y[rows], jnp.zeros_like(y[rows]))
        out = jax.lax.psum(mine, axis_name)
        return out.reshape(out.shape[0] * out.shape[1], *out.shape[2:])

    return jax.tree.map(collect, ys)


def pipeline_dit_forward(params: dict, cfg, *, mesh: Mesh,
                         n_micro: int,
                         img: jax.Array, img_ids: jax.Array,
                         txt: jax.Array, txt_ids: jax.Array,
                         timesteps: jax.Array, y: jax.Array,
                         guidance=None, remat: bool = False,
                         remat_policy=None,
                         image_proj=None, ip_params=None, ip_scale: float = 1.0,
                         axis_name: str = PIPE_AXIS,
                         batch_axis: str = DATA_AXIS) -> jax.Array:
    """dit_forward (models/dit.py) with the block stack pipelined over the
    mesh's ``pipe`` axis.  Semantically identical (parity-tested,
    tests/test_pp.py); IP-adapter conditioning is not supported under PP
    (per-block heterogeneous params would break the homogeneous stage
    stack)."""
    from ..core import nn
    from ..core.rope import multi_axis_rope
    from ..models import dit as dit_m

    if image_proj is not None or ip_params is not None:
        raise NotImplementedError(
            "IP-adapter conditioning is not supported under pipeline "
            "parallelism (per-block IP params break the homogeneous stack)")
    if axis_name not in mesh.shape:
        raise ValueError(
            f"mesh has no '{axis_name}' axis — build it with "
            "make_mesh(pipeline_parallel=N)")
    n_stages = mesh.shape[axis_name]
    b = img.shape[0]
    local_b = b // mesh.shape[batch_axis]
    validate_pp(cfg, n_stages, n_micro, local_b)
    compute_dtype = img.dtype

    # ---- prologue (replicated over pipe; batch dp-sharded via GSPMD) ----
    img_h = nn.linear(params["img_in"], img)
    vec = nn.mlp_embedder(params["time_in"],
                          nn.timestep_embedding(timesteps, 256).astype(compute_dtype))
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("guidance required for guidance-embedded (dev) model")
        vec = vec + nn.mlp_embedder(params["guidance_in"],
                                    nn.timestep_embedding(guidance, 256).astype(compute_dtype))
    vec = vec + nn.mlp_embedder(params["vector_in"], y.astype(compute_dtype))
    txt_h = nn.linear(params["txt_in"], txt)
    ids = jnp.concatenate([txt_ids, img_ids], axis=1)
    cos, sin = multi_axis_rope(ids, cfg.axes_dim, cfg.theta)
    txt_len = txt_h.shape[1]

    dblock, sblock = dit_m._double_block, dit_m._single_block
    if remat:
        mk = dit_m.REMAT_POLICIES[remat_policy or "full"]
        policy = mk() if mk else None
        dblock = jax.checkpoint(dblock, static_argnums=(6,), policy=policy)
        sblock = jax.checkpoint(sblock, static_argnums=(5, 6, 7), policy=policy)

    # ---- stack the homogeneous block params along depth ----
    dstack = tree_stack(params["double_blocks"])
    sstack = tree_stack(params["single_blocks"])
    kd = cfg.depth // n_stages
    ks = cfg.depth_single_blocks // n_stages

    def double_stage(local_p, carry, c):
        im, tx = carry
        v, co, si = c
        for l in range(kd):
            p = jax.tree.map(lambda x: x[l], local_p)
            im, tx = dblock(p, im, tx, v, co, si, cfg.num_heads, None)
        return im, tx

    def single_stage(local_p, carry, c):
        (x,) = carry
        v, co, si = c
        for l in range(ks):
            p = jax.tree.map(lambda x_: x_[l], local_p)
            x = sblock(p, x, v, co, si, cfg.num_heads, cfg.hidden_size,
                       cfg.mlp_hidden, None)
        return (x,)

    act_spec = P(batch_axis)              # [B, ...]: rows shard over data
    # stage-stacked params: depth shards over pipe; other dims replicated
    pspec = jax.tree.map(lambda _: P(axis_name), dstack)
    sspec = jax.tree.map(lambda _: P(axis_name), sstack)

    def run_phase(stage_fn, stacked, stacked_spec, inputs, n_in):
        # check_vma=False: the stage body runs Pallas attention kernels,
        # whose interpret-mode jaxpr eval cannot mix vma'd and invariant
        # operands (and there is no sound way to locally strip vma).  The
        # transpose still psums cotangents of pipe-unmentioned operands;
        # grad parity is pinned by tests/test_pp.py.
        f = jax.shard_map(
            functools.partial(_phase, stage_fn, n_stages, n_micro,
                              axis_name=axis_name),
            mesh=mesh,
            in_specs=(stacked_spec, (act_spec,) * n_in, (act_spec,) * 3),
            out_specs=(act_spec,) * n_in,
            check_vma=False)
        return f(stacked, inputs, (vec, cos, sin))

    img_h, txt_h = run_phase(double_stage, dstack, pspec, (img_h, txt_h), 2)
    x = jnp.concatenate([txt_h, img_h], axis=1)        # [B, L, h]
    (x,) = run_phase(single_stage, sstack, sspec, (x,), 1)
    img_out = x[:, txt_len:]

    # LastLayer — identical to dit_forward's tail (models/dit.py)
    fl = params["final_layer"]
    smod = nn.linear(fl["adaLN_modulation"]["1"], jax.nn.silu(vec))
    shift, scale = jnp.split(smod, 2, axis=-1)
    img_out = (1 + scale[:, None, :]) * nn.layernorm({}, img_out) + shift[:, None, :]
    return nn.linear(fl["linear"], img_out)
