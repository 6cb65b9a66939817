"""Device mesh and sharding helpers — the TPU-native replacement for the
reference's Accelerate/DDP/NCCL layer (SURVEY.md §5.8).

Data parallelism is a mesh axis ``"data"``: batches are sharded on it, params
are replicated, and XLA inserts the gradient all-reduce (psum) over ICI during
jit compilation — no wrapper module, no env-var tuning, no timeouts.  A
``"model"`` axis is reserved for future tensor parallelism (the reference has
none; models are <=1B params) so meshes are created 2-D with model=1 by
default and all helpers consume PartitionSpecs, keeping the step functions
TP-extensible without rewrites.

Multi-host: call ``maybe_initialize_distributed()`` first; all jit arrays are
global, per-host input feeding goes through ``host_local_batch_slice``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"
PIPE_AXIS = "pipe"


def maybe_initialize_distributed() -> None:
    """jax.distributed.initialize when launched multi-host.

    Explicit env contract (set by the launcher, replacing the reference's
    NCCL/torch-distributed env tuning — SURVEY.md §5.8): either the standard
    auto-detected cluster envs, or GENHANCER_COORDINATOR / GENHANCER_NUM_PROCS
    / GENHANCER_PROC_ID for manual launches.

    Env checks come FIRST: jax.distributed.initialize must run before
    anything (including jax.process_count()) initializes the XLA backends,
    or it raises.  Single-host launches never touch jax here."""
    coord = os.environ.get("GENHANCER_COORDINATOR")
    if not coord and not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    if jax.distributed.is_initialized():
        return  # e.g. a test harness already joined the cluster
    from jax._src import xla_bridge
    if getattr(xla_bridge, "backends_are_initialized", lambda: False)():
        raise RuntimeError(
            "multi-host env (GENHANCER_COORDINATOR/JAX_COORDINATOR_ADDRESS) "
            "is set but the XLA backend was already initialized single-host; "
            "call maybe_initialize_distributed() before any other JAX use")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["GENHANCER_NUM_PROCS"]),
            process_id=int(os.environ["GENHANCER_PROC_ID"]))
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(num_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None,
              sequence_parallel: int = 1,
              pipeline_parallel: int = 1) -> Mesh:
    """(data, model) mesh; with ``sequence_parallel`` > 1 a third ``seq``
    axis is added for ring-attention context parallelism (parallel/ring.py),
    and with ``pipeline_parallel`` > 1 a ``pipe`` axis for the GPipe depth
    pipeline (parallel/pp.py).  Two axes stay the default so existing 2-D
    sharding layouts (and their saved-checkpoint specs) are unchanged unless
    SP/PP is requested."""
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    devices = devices[:n]
    if pipeline_parallel > 1 and (model_parallel > 1 or sequence_parallel > 1):
        # TP shards the very weight dims the PP stage stacking slices, and
        # SP's ring would nest a second shard_map inside the stage body —
        # see parallel/pp.py "Composition".
        raise ValueError(
            "pipeline_parallel composes with data parallelism only "
            f"(got model_parallel={model_parallel}, "
            f"sequence_parallel={sequence_parallel})")
    if n % (model_parallel * sequence_parallel * pipeline_parallel):
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel} x sequence_parallel={sequence_parallel}"
                         f" x pipeline_parallel={pipeline_parallel}")
    if pipeline_parallel > 1:
        arr = mesh_utils.create_device_mesh(
            (n // pipeline_parallel, pipeline_parallel), devices=devices)
        return Mesh(arr, (DATA_AXIS, PIPE_AXIS))
    if sequence_parallel > 1:
        arr = mesh_utils.create_device_mesh(
            (n // model_parallel // sequence_parallel, model_parallel,
             sequence_parallel), devices=devices)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))
    arr = mesh_utils.create_device_mesh((n // model_parallel, model_parallel),
                                        devices=devices)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis for any-rank arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """Place a host batch onto the mesh, sharded over the data axis at
    ``axis`` (axis 1 for accumulation-stacked [accum, B, ...] batches).

    Multi-host: each process passes its *process-local* rows (its loader
    reads a disjoint shard split — the webdataset ``split_by_node``
    equivalent) and the rows are assembled into one global array via
    ``jax.make_array_from_process_local_data`` — no cross-host copy; each
    host's rows land on its own devices.  Single-host this reduces to a
    sharded device_put.  The local batch dim must divide the host's local
    share of the data axis."""
    spec = P(*([None] * axis + [DATA_AXIS]))
    sh = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_over_data(tree, mesh: Mesh):
    """ZeRO-1-style placement: shard each leaf's leading axis over the data
    axis when it divides evenly, else replicate.

    Used for the optimizer moments: replicating Adam state across DP chips
    wastes ``(n-1)/n`` of its HBM (~5 GB at 1.3B bf16 params on 8 chips).
    With moments sharded and params/grads replicated, XLA's SPMD partitioner
    inserts the dynamic-slice (grad -> shard) and all-gather (new param
    shard -> replica) around the elementwise update automatically — this is
    exactly the ZeRO-1 communication pattern, expressed as shardings instead
    of hand-written collectives (SURVEY.md §2.9: mesh+pjit replaces
    DeepSpeed; the reference's zero_stage-0 config kept state replicated).
    """
    n = data_axis_size(mesh)
    rep = replicated(mesh)
    shd = NamedSharding(mesh, P(DATA_AXIS))

    def place(x):
        sh = getattr(x, "sharding", None)
        if (isinstance(sh, NamedSharding)
                and any(a is not None for a in sh.spec)):
            return x   # already model-parallel sharded (tp.py) — keep
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, shd)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, tree)


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def host_local_batch_slice(global_batch: int) -> slice:
    """Which rows of the global batch this host feeds (webdataset
    split_by_node equivalent for the input pipeline)."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def pad_batch_to_devices(arrays: dict, n_devices: int) -> dict:
    """Pad every array leaf's batch dim to a multiple of the data-axis size,
    maintaining a boolean ``valid`` mask (existing masks are padded with
    False).  Used by the trainer instead of shrinking the mesh when
    train_batch_size % devices != 0 (masked loss handles the pad rows)."""
    bs = next(v.shape[0] for v in arrays.values())
    if bs % n_devices == 0:
        return arrays
    out = {}
    mask = None
    for k, v in arrays.items():
        out[k], mask = pad_to_multiple(np.asarray(v), n_devices)
    if "valid" not in out:       # np.pad fills an existing bool mask with False
        out["valid"] = mask
    return out


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad a host batch so its leading dim divides the data axis; returns
    (padded, valid_mask)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, np.ones((n,), np.bool_)
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    mask = np.concatenate([np.ones((n,), np.bool_), np.zeros((pad,), np.bool_)])
    return np.pad(x, widths), mask
