"""FSDP / ZeRO-3 parameter sharding (parallel.fsdp): params sharded over the
8-device DP axis must train identically to the replicated layout (XLA SPMD
inserts per-use all-gathers + grad reduce-scatter), actually BE sharded,
STAY sharded through donated step outputs, and compose with DiT TP
(dimension-wise: TP takes the model axis, FSDP the largest free dim).

The reference scales DDP-only (SURVEY.md §5.8, Accelerate zero_stage-0) —
this is a beyond-parity residency knob for models past one chip's HBM."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from genhancer_tpu.parallel import fsdp as fsdp_m
from genhancer_tpu.parallel import mesh as mesh_m
from genhancer_tpu.parallel import tp as tp_m
from genhancer_tpu.tasks import image as image_task
from genhancer_tpu.train import optim
from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
from genhancer_tpu.train.state import flatten_params

from test_train_step import make_image_spec

pytestmark = pytest.mark.slow


def _make(mode: str):
    """mode: 'rep' | 'fsdp' | 'fsdp_tp'."""
    import dataclasses
    spec = make_image_spec("stage1")
    if mode.startswith("fsdp"):
        spec = dataclasses.replace(spec, fsdp=True)
    optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
    state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
    mesh = mesh_m.make_mesh(model_parallel=2 if mode == "fsdp_tp" else 1)
    state = mesh_m.replicate(state, mesh)
    tp_placements = None
    if mode == "fsdp_tp":
        trainable, tp_placements = tp_m.shard_dit_params(state.trainable, mesh)
        frozen, tp_frozen = tp_m.shard_dit_params(state.frozen, mesh)
        tp_placements = {**tp_placements, **tp_frozen}
        state = state.replace(
            trainable=trainable, frozen=frozen,
            opt_state=tp_m.shard_like_params(state.opt_state, tp_placements,
                                             mesh))
    if mode.startswith("fsdp"):
        trainable, placements = fsdp_m.shard_params_fsdp(
            state.trainable, mesh, tp_placements=tp_placements, min_size=0)
        frozen, _ = fsdp_m.shard_params_fsdp(
            state.frozen, mesh, tp_placements=tp_placements, min_size=0)
        state = state.replace(
            trainable=trainable, frozen=frozen,
            opt_state=tp_m.shard_like_params(state.opt_state, placements,
                                             mesh))
    step = image_task.make_train_step(
        spec, optimizer, mesh=mesh if mode.startswith("fsdp") else None)
    return state, step, mesh


def _run(mode: str, steps=3):
    state, step, mesh = _make(mode)
    batch = mesh_m.shard_batch(
        {"image": jnp.asarray(np.random.default_rng(3).random(
            (8, 32, 32, 3), np.float32))}, mesh)
    losses = []
    for i in range(steps):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    return losses, state


class TestFsdpSpec:
    def test_largest_free_dim_sharded(self):
        w = jnp.zeros((24, 8))
        assert fsdp_m.fsdp_spec(w, 8, min_size=0) == P(mesh_m.DATA_AXIS)
        w = jnp.zeros((6, 16))
        assert fsdp_m.fsdp_spec(w, 8, min_size=0) == P(None, mesh_m.DATA_AXIS)

    def test_tp_axis_preserved(self):
        w = jnp.zeros((24, 16))
        spec = fsdp_m.fsdp_spec(w, 8, base=P(mesh_m.MODEL_AXIS, None),
                                min_size=0)
        assert spec == P(mesh_m.MODEL_AXIS, mesh_m.DATA_AXIS)

    def test_small_or_indivisible_replicated(self):
        assert fsdp_m.fsdp_spec(jnp.zeros((7, 5)), 8, min_size=0) == P()
        assert fsdp_m.fsdp_spec(jnp.zeros((1024, 1024)), 8,
                                min_size=2 ** 21) == P()
        assert fsdp_m.fsdp_spec(jnp.float32(0.0), 8, min_size=0) == P()

    def test_validate_rejects_bad_compositions(self):
        with pytest.raises(ValueError, match="pipeline"):
            fsdp_m.validate_fsdp(Config({"pipeline_parallel": 2}))
        with pytest.raises(ValueError, match="optax"):
            fsdp_m.validate_fsdp(Config({"fused_optimizer": "pallas"}))
        with pytest.raises(ValueError, match="sequence_parallel"):
            fsdp_m.validate_fsdp(Config({"sequence_parallel": 2}))


class TestFsdpTraining:
    def test_loss_matches_replicated(self):
        l_rep, _ = _run("rep")
        l_shd, _ = _run("fsdp")
        np.testing.assert_allclose(l_shd, l_rep, rtol=2e-5)

    def test_params_sharded_and_stay_sharded(self):
        _, state = _run("fsdp", steps=2)
        sharded = 0
        for path, leaf in flatten_params(state.trainable).items():
            spec = leaf.sharding.spec
            if any(a == mesh_m.DATA_AXIS for a in spec):
                d = tuple(spec).index(mesh_m.DATA_AXIS)
                shard_shape = leaf.sharding.shard_shape(leaf.shape)
                assert shard_shape[d] == leaf.shape[d] // 8, (path, spec)
                sharded += 1
        assert sharded > 10   # the DiT weight leaves
        # frozen tower/VAE sharded too — stage-1's biggest residency
        froz = [l for l in flatten_params(state.frozen).values()
                if any(a == mesh_m.DATA_AXIS for a in l.sharding.spec)]
        assert len(froz) > 5

    def test_moments_shard_like_params(self):
        _, state = _run("fsdp", steps=1)
        params = flatten_params(state.trainable)
        for moment in jax.tree_util.tree_leaves(
                state.opt_state, is_leaf=lambda x: isinstance(x, dict)):
            if isinstance(moment, dict):
                for path, leaf in moment.items():
                    if path in params and leaf.shape == params[path].shape:
                        assert leaf.sharding == params[path].sharding, path

    def test_fsdp_tp_loss_matches(self):
        l_rep, _ = _run("rep")
        l_2d, state = _run("fsdp_tp")
        np.testing.assert_allclose(l_2d, l_rep, rtol=2e-5)
        # at least one leaf carries BOTH axes (the 2-D TP x FSDP layout)
        specs = [tuple(l.sharding.spec)
                 for l in flatten_params(state.trainable).values()]
        assert any(mesh_m.MODEL_AXIS in s and mesh_m.DATA_AXIS in s
                   for s in specs), specs[:8]

    def test_host_snapshot_gathers(self):
        from genhancer_tpu.train.async_ckpt import host_snapshot
        _, state = _run("fsdp", steps=1)
        _, state_rep = _run("rep", steps=1)
        snap = host_snapshot(state.trainable)
        for a, b in zip(jax.tree_util.tree_leaves(snap),
                        jax.tree_util.tree_leaves(state_rep.trainable)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32), rtol=2e-5,
                                       atol=1e-6)
