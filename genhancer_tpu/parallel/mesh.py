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


def maybe_initialize_distributed() -> None:
    """jax.distributed.initialize when launched multi-host (JAX_COORDINATOR set)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()


def make_mesh(num_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    devices = devices[:n]
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = mesh_utils.create_device_mesh((n // model_parallel, model_parallel),
                                        devices=devices)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis for any-rank arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """Place a host numpy batch onto the mesh, sharded over the data axis at
    ``axis`` (axis 1 for accumulation-stacked [accum, B, ...] batches).  The
    sharded dim must divide the data-axis size."""
    spec = P(*([None] * axis + [DATA_AXIS]))
    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


def host_local_batch_slice(global_batch: int) -> slice:
    """Which rows of the global batch this host feeds (webdataset
    split_by_node equivalent for the input pipeline)."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


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
