"""Tower-remat scope: jax.checkpoint over tower encoder layers.

Stage-2 differentiates THROUGH the tower and its per-layer residuals
dominate activation HBM for multi-frame video @336 (measured: middle-mode
stage2_all B=8 OOMs one v5e chip in any dtype while B=4 fits — the DiT
remat gate alone cannot help because the tower saves ~10 live tensors per
encoder layer).  ``models/towers/encoder.tower_remat_scope`` rematerializes
each layer; these tests pin (a) the math is unchanged, and (b) the task
plumbing actually engages the scope.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.models.towers import encoder as enc
from genhancer_tpu.tasks import video as video_task
from genhancer_tpu.train import optim

from test_train_step import TINY_DIT, TINY_VAE, TINY_TOWER, opt_cfg


CFG = enc.EncoderConfig(hidden_size=16, intermediate_size=32,
                        num_layers=3, num_heads=2)


class TestEncoderRemat:
    def test_grads_bit_match(self):
        """Remat changes what's saved, never the math: loss and grads must
        match the no-remat encoder (same f32 ops, recomputed)."""
        p = enc.init_encoder(jax.random.key(0), CFG)
        x = jax.random.normal(jax.random.key(1), (2, 9, 16), jnp.float32)

        def loss(p):
            return jnp.mean(enc.encoder_forward(p, x, CFG) ** 2)

        l0, g0 = jax.jit(jax.value_and_grad(loss))(p)
        with enc.tower_remat_scope():
            l1, g1 = jax.jit(jax.value_and_grad(loss))(p)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                   jax.tree_util.tree_leaves_with_path(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6,
                                       err_msg=jax.tree_util.keystr(pa))

    def test_scope_off_is_default(self):
        assert enc._TOWER_REMAT.get() is False
        with enc.tower_remat_scope(False):
            assert enc._TOWER_REMAT.get() is False
        with enc.tower_remat_scope():
            assert enc._TOWER_REMAT.get() is True
        assert enc._TOWER_REMAT.get() is False


class TestTaskPlumbing:
    def _spec(self, tower_remat):
        return video_task.VideoTaskSpec(
            mode="middle", stage="stage2_all", tower_kind="clip",
            img_size=32, clip_image_size=32, dit_cfg=TINY_DIT,
            vae_cfg=TINY_VAE, tower_cfg=TINY_TOWER, clip_dim=24, t5_dim=32,
            adapter_in_dim=16, lora_r=2, compute_dtype=jnp.float32,
            tower_remat=tower_remat)

    @pytest.mark.slow
    def test_video_stage2_loss_and_grads_match(self):
        """The knob threads through make_loss_fn without changing results:
        tower LoRA grads (the path THROUGH the rematted layers) match."""
        optimizer = optim.make_optimizer(opt_cfg())
        state = video_task.create_task_state(
            jax.random.key(0), self._spec(False), optimizer)
        batch = {"cond": jnp.full((2, 2, 32, 32, 3), 0.5),
                 "target": jnp.full((2, 32, 32, 3), 0.5)}
        outs = []
        for tr in (False, True):
            loss_fn = video_task.make_loss_fn(self._spec(tr))
            outs.append(jax.jit(jax.value_and_grad(
                lambda t: loss_fn(t, state.frozen, batch, jax.random.key(1),
                                  state.quant)))(state.trainable))
        (l0, g0), (l1, g1) = outs
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        assert any("lora_A" in k for k in g0)
        for k in g0:
            np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                       rtol=2e-5, atol=1e-6, err_msg=k)
