"""Orbax sharded checkpoint backend (train/orbax_ckpt.py, VERDICT r2 #7).

Round-trips a ZeRO-1-sharded TrainState through save_sharded/restore_sharded
on the 8-device CPU mesh and asserts bit parity + sharding preservation —
the property the torch backend can't give at scale (it gathers to process 0).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.parallel import mesh as mesh_m
from genhancer_tpu.train import orbax_ckpt
from genhancer_tpu.train.state import TrainState


def _tiny_state(mesh, key=0):
    ks = jax.random.split(jax.random.key(key), 4)
    trainable = {
        "dit.a.weight": jax.random.normal(ks[0], (16, 8), jnp.float32),
        "dit.b.weight": jax.random.normal(ks[1], (8, 8), jnp.bfloat16),
    }
    mu = {k: jnp.zeros_like(v) for k, v in trainable.items()}
    nu = {k: jnp.ones_like(v) * 0.5 for k, v in trainable.items()}
    state = TrainState(trainable=trainable, frozen={},
                       opt_state=(jnp.zeros((), jnp.int32), mu, nu),
                       step=jnp.asarray(7, jnp.int32))
    state = mesh_m.replicate(state, mesh)
    # ZeRO-1: moments sharded over the data axis, params replicated
    return state.replace(
        opt_state=mesh_m.shard_over_data(state.opt_state, mesh))


class TestOrbaxRoundTrip:
    def test_sharded_save_restore_bit_parity(self, tmp_path):
        mesh = mesh_m.make_mesh(8)
        state = _tiny_state(mesh)
        orbax_ckpt.save_sharded(state, str(tmp_path), 7)
        assert orbax_ckpt.latest_step(str(tmp_path)) == 7

        # fresh state with different values; restore must overwrite them and
        # land every leaf on ITS sharding (moments stay ZeRO-1 sharded)
        other = _tiny_state(mesh, key=1)
        restored = orbax_ckpt.restore_sharded(other, str(tmp_path), 7)

        for k in state.trainable:
            np.testing.assert_array_equal(
                np.asarray(restored.trainable[k]).astype(np.float32),
                np.asarray(state.trainable[k]).astype(np.float32))
        for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                        jax.tree_util.tree_leaves(state.opt_state)):
            np.testing.assert_array_equal(
                np.asarray(a).astype(np.float32),
                np.asarray(b).astype(np.float32))
        assert int(restored.step) == 7

        # sharding preserved: restored moments carry the live state's
        # (ZeRO-1) sharding, not a gather-then-replicate
        _, mu, _ = restored.opt_state
        for k, v in mu.items():
            want = state.opt_state[1][k].sharding
            assert v.sharding.is_equivalent_to(want, v.ndim), k

    def test_prune_keeps_newest(self, tmp_path):
        mesh = mesh_m.make_mesh(8)
        state = _tiny_state(mesh)
        for s in (1, 2, 3):
            orbax_ckpt.save_sharded(state, str(tmp_path), s)
        dropped = orbax_ckpt.prune(str(tmp_path), 2)
        assert dropped == [1]
        assert orbax_ckpt.all_steps(str(tmp_path)) == [2, 3]

    def test_quant_cache_rebuilt_after_restore(self, tmp_path):
        mesh = mesh_m.make_mesh(8)
        state = _tiny_state(mesh)
        orbax_ckpt.save_sharded(state, str(tmp_path), 7)

        from genhancer_tpu.core.quant import quantize_weight
        other = _tiny_state(mesh, key=1)
        other = other.replace(
            quant={"dit.a.weight": (jnp.zeros((16, 8), jnp.int8),
                                    jnp.zeros((16,), jnp.float32))})
        restored = orbax_ckpt.restore_sharded(other, str(tmp_path), 7)
        wq, ws = restored.quant["dit.a.weight"]
        want_q, want_s = quantize_weight(restored.trainable["dit.a.weight"],
                                         axis=0)
        np.testing.assert_array_equal(np.asarray(wq), np.asarray(want_q))
        np.testing.assert_allclose(np.asarray(ws), np.asarray(want_s[:, 0]))
