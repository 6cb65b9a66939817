"""DiT tensor parallelism (parallel.tp): a dp4 x tp2 mesh must train
loss-identically (up to fp reassociation) to pure dp8, with qkv/mlp weights
actually sharded over the model axis and the optimizer moments placed like
their params."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.parallel import mesh as mesh_m, tp as tp_m
from genhancer_tpu.tasks import image as image_task
from genhancer_tpu.train import optim
from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
from genhancer_tpu.train.state import TrainState

from test_train_step import make_image_spec

pytestmark = pytest.mark.slow


def _run(tp: int, steps=3):
    spec = make_image_spec("stage1")
    optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
    state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
    mesh = mesh_m.make_mesh(8, model_parallel=tp)
    state = mesh_m.replicate(state, mesh)
    if tp > 1:
        tp_m.validate_tp(spec.dit_cfg, tp)
        trainable, placements = tp_m.shard_dit_params(state.trainable, mesh)
        state = state.replace(trainable=trainable,
                              opt_state=tp_m.shard_like_params(
                                  state.opt_state, placements, mesh))
    step = image_task.make_train_step(spec, optimizer)
    batch = mesh_m.shard_batch(
        {"image": jnp.asarray(np.random.default_rng(3).random(
            (8, 32, 32, 3), np.float32))}, mesh)
    losses = []
    for i in range(steps):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    return losses, state


class TestDiTTensorParallel:
    def test_loss_matches_pure_dp(self):
        l_dp, _ = _run(tp=1)
        l_tp, _ = _run(tp=2)
        # collectives reassociate sums; parity to fp32 tolerance
        np.testing.assert_allclose(l_tp, l_dp, rtol=2e-5)

    def test_weights_sharded_on_model_axis(self):
        _, state = _run(tp=2, steps=1)
        qkv = state.trainable["dit.double_blocks.0.img.attn.qkv.weight"]
        assert qkv.sharding.spec[0] == mesh_m.MODEL_AXIS
        assert qkv.sharding.shard_shape(qkv.shape)[0] == qkv.shape[0] // 2
        proj = state.trainable["dit.double_blocks.0.img.attn.proj.weight"]
        assert proj.sharding.spec[1] == mesh_m.MODEL_AXIS
        # frozen tower stays replicated
        frozen_leaf = next(iter(state.frozen.values()))
        assert not any(a is not None for a in frozen_leaf.sharding.spec)

    def test_moments_follow_param_shardings(self):
        _, state = _run(tp=2, steps=1)

        def find(tree, key):
            hits = []
            def walk(p, l):
                for q in reversed(p):
                    if isinstance(q, jax.tree_util.DictKey) and q.key == key:
                        hits.append(l)
                        return
            jax.tree_util.tree_map_with_path(walk, tree)
            return hits
        mus = find(state.opt_state, "dit.double_blocks.0.img.attn.qkv.weight")
        assert mus, "no moment leaves found for qkv"
        for m in mus:
            assert m.sharding.spec and m.sharding.spec[0] == mesh_m.MODEL_AXIS

    def test_validate_tp_rejects_bad_heads(self):
        spec = make_image_spec("stage1")
        with pytest.raises(ValueError, match="num_heads"):
            tp_m.validate_tp(spec.dit_cfg, 3)
