"""ZeRO-1 optimizer-state sharding (parallel.mesh.shard_over_data): Adam
moments sharded over the 8-device DP axis must train bit-identically to the
replicated layout (XLA SPMD inserts the slice/all-gather around the
elementwise update), actually BE sharded on device, and survive the
host-snapshot path used by checkpointing."""
import numpy as np
import jax
import pytest
import jax.numpy as jnp

from genhancer_tpu.parallel import mesh as mesh_m
from genhancer_tpu.tasks import image as image_task
from genhancer_tpu.train import optim
from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
from genhancer_tpu.train.state import TrainState

from test_train_step import make_image_spec

pytestmark = pytest.mark.slow


def _make(shard: bool):
    spec = make_image_spec("stage1")
    optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
    state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
    mesh = mesh_m.make_mesh()
    state = mesh_m.replicate(state, mesh)
    if shard:
        state = state.replace(
            opt_state=mesh_m.shard_over_data(state.opt_state, mesh))
    step = image_task.make_train_step(spec, optimizer)
    return spec, state, step, mesh


def _run(shard: bool, steps=3):
    _, state, step, mesh = _make(shard)
    batch = mesh_m.shard_batch(
        {"image": jnp.asarray(np.random.default_rng(3).random(
            (8, 32, 32, 3), np.float32))}, mesh)
    losses = []
    for i in range(steps):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    return losses, state


class TestZero1:
    def test_loss_matches_replicated(self):
        l_rep, _ = _run(shard=False)
        l_shd, _ = _run(shard=True)
        np.testing.assert_allclose(l_shd, l_rep, rtol=1e-6)

    def test_moments_actually_sharded_and_stay_sharded(self):
        _, state = _run(shard=True, steps=2)
        n = 8
        sharded = 0
        for leaf in jax.tree_util.tree_leaves(state.opt_state):
            if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] % n == 0:
                spec = leaf.sharding.spec
                assert spec and spec[0] == mesh_m.DATA_AXIS, (leaf.shape, spec)
                # each device holds 1/n of the leaf
                shard_shape = leaf.sharding.shard_shape(leaf.shape)
                assert shard_shape[0] == leaf.shape[0] // n
                sharded += 1
        assert sharded > 10  # the DiT moment leaves

    def test_host_snapshot_gathers_sharded_state(self):
        from genhancer_tpu.train.async_ckpt import host_snapshot
        _, state = _run(shard=True, steps=1)
        snap = host_snapshot(state.opt_state)
        for a, b in zip(jax.tree_util.tree_leaves(snap),
                        jax.tree_util.tree_leaves(state.opt_state)):
            assert isinstance(a, np.ndarray)
            assert a.shape == b.shape
        # and values match the replicated run's state
        _, state_rep = _run(shard=False, steps=1)
        for a, b in zip(jax.tree_util.tree_leaves(snap),
                        jax.tree_util.tree_leaves(state_rep.opt_state)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32), rtol=1e-6,
                                       atol=1e-7)
