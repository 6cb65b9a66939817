"""Reconstruction pipeline tests (the reference's visual smoke test, fixed)."""
import os

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # full e2e paths, minutes on 1 CPU core

from genhancer_tpu.eval import reconstruct as R
from genhancer_tpu.tasks import image as image_task

from test_train_step import TINY_DIT, TINY_VAE, TINY_TOWER, make_image_spec


class TestReconstruct:
    def test_shapes_and_range(self):
        spec = make_image_spec("stage1")
        modules = image_task.init_modules(jax.random.key(0), spec)
        img = np.random.default_rng(0).random((1, 32, 32, 3), dtype=np.float32)
        out = R.reconstruct(modules, spec, img, num_steps=2, seed=0)
        assert out.shape == (1, 32, 32, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_deterministic_given_seed(self):
        spec = make_image_spec("stage1")
        modules = image_task.init_modules(jax.random.key(0), spec)
        img = np.full((1, 32, 32, 3), 0.5, dtype=np.float32)
        a = R.reconstruct(modules, spec, img, num_steps=2, seed=7)
        b = R.reconstruct(modules, spec, img, num_steps=2, seed=7)
        np.testing.assert_array_equal(a, b)

    def test_from_checkpoints_roundtrip(self, tmp_path):
        """Write stage-1 ckpts then reconstruct through the CLI-level loader."""
        from PIL import Image
        from genhancer_tpu.train import optim, checkpoint as ckpt
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
        from genhancer_tpu.train.state import create_state

        spec = make_image_spec("stage1")
        modules = image_task.init_modules(jax.random.key(3), spec)
        optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        state = create_state(modules, image_task.trainable_predicate(spec, modules),
                             optimizer)
        outdir = str(tmp_path / "ckpts")
        ckpt.save_stage1(state, outdir, 5, kind="image")

        img_path = str(tmp_path / "in.jpg")
        Image.fromarray(np.full((40, 40, 3), 128, np.uint8)).save(img_path)
        out = R.reconstruct_from_checkpoints(
            spec, outdir, 5, img_path, str(tmp_path / "recon"), num_steps=2)
        assert os.path.exists(out)
        assert os.path.exists(str(tmp_path / "recon" / "input.jpg"))

    def test_controlnet_path(self):
        """ControlNet-guided sampling (sampling.py:152-232): zero-init net is
        a bit-exact no-op; a trained (perturbed) one steers the output."""
        import jax.numpy as jnp
        from genhancer_tpu.models import controlnet as cn_m

        spec = make_image_spec("stage1")
        modules = image_task.init_modules(jax.random.key(0), spec)
        cn_p = cn_m.init_controlnet_from_dit(jax.random.key(1),
                                             modules["dit"], spec.dit_cfg,
                                             depth=2)
        img = np.random.default_rng(0).random((1, 32, 32, 3), dtype=np.float32)
        plain = R.reconstruct(modules, spec, img, num_steps=2, seed=0)
        zero = R.reconstruct(modules, spec, img, num_steps=2, seed=0,
                             controlnet_params=cn_p)
        np.testing.assert_allclose(zero, plain, atol=1e-6)
        for blk in cn_p["controlnet_blocks"]:
            blk["weight"] = blk["weight"] + 0.05 * jnp.eye(
                spec.dit_cfg.hidden_size)
        steered = R.reconstruct(modules, spec, img, num_steps=2, seed=0,
                                controlnet_params=cn_p)
        assert float(np.abs(steered - plain).max()) > 1e-5
