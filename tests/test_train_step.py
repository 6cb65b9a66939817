"""End-to-end train-step tests: tiny models, real jit, 8-device CPU mesh DP.

Covers the SURVEY.md §4 rebuild mandate: fake-mesh DP semantics without TPUs,
overfit-one-batch sanity for the flow-matching objective, LoRA stage-2
trainability, and state partitioning.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.models import dit as dit_m
from genhancer_tpu.models import vae as vae_m
from genhancer_tpu.models.towers import clip as clip_m
from genhancer_tpu.parallel import mesh as mesh_m
from genhancer_tpu.tasks import image as image_task
from genhancer_tpu.tasks import video as video_task
from genhancer_tpu.train import optim
from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS


TINY_DIT = dit_m.DiTConfig(in_channels=16, vec_in_dim=24, context_in_dim=32,
                           hidden_size=64, num_heads=4, depth=1,
                           depth_single_blocks=1, axes_dim=(4, 6, 6))
TINY_VAE = vae_m.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                           z_channels=4)
TINY_TOWER = clip_m.CLIPConfig(
    vision=clip_m.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                   num_layers=1, num_heads=2, image_size=32,
                                   patch_size=16),
    text=clip_m.CLIPTextConfig(hidden_size=16, intermediate_size=32,
                               num_layers=1, num_heads=2, vocab_size=50,
                               max_position_embeddings=8),
    projection_dim=24)


def tiny_vae_cfg_latents():
    # 2 levels -> f2; img 32 -> latent 16x16, z=4 -> packed tokens 8*8=64, ch=16
    return TINY_VAE


def make_image_spec(stage="stage1"):
    return image_task.TaskSpec(
        stage=stage, tower_kind="clip", img_size=32, clip_image_size=32,
        dit_cfg=TINY_DIT, vae_cfg=TINY_VAE, tower_cfg=TINY_TOWER,
        clip_dim=24, t5_dim=32, lora_r=2, lora_targets=("q_proj", "v_proj"),
        compute_dtype=jnp.float32)


def opt_cfg(**kw):
    c = Config(dict(TRAIN_DEFAULTS))
    c.update(dict(learning_rate=1e-3, max_grad_norm=1.0), **kw)
    return c


class TestImageStage1:
    @pytest.mark.slow
    def test_step_runs_and_loss_decreases(self):
        spec = make_image_spec("stage1")
        optimizer = optim.make_optimizer(opt_cfg())
        state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
        step = image_task.make_train_step(spec, optimizer)
        batch = {"image": jnp.full((4, 32, 32, 3), 0.5)}
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.key(42))  # fixed key: overfit
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses

    def test_trainable_partition_stage1(self):
        spec = make_image_spec("stage1")
        optimizer = optim.make_optimizer(opt_cfg())
        state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
        assert any(k.startswith("dit.") for k in state.trainable)
        assert any("project_clip" in k for k in state.trainable)
        assert any("project_t5" in k for k in state.trainable)
        assert not any(k.startswith("vae.") for k in state.trainable)
        assert not any(k.startswith("clip.model.") for k in state.trainable)
        # frozen side holds the tower and VAE
        assert any(k.startswith("vae.") for k in state.frozen)

    @pytest.mark.slow
    def test_frozen_params_unchanged_after_step(self):
        spec = make_image_spec("stage1")
        optimizer = optim.make_optimizer(opt_cfg())
        state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
        frozen_before = {k: np.asarray(v) for k, v in state.frozen.items()}
        step = image_task.make_train_step(spec, optimizer)
        batch = {"image": jnp.full((2, 32, 32, 3), 0.5)}
        state, _ = step(state, batch, jax.random.key(0))
        for k, v in state.frozen.items():
            np.testing.assert_array_equal(np.asarray(v), frozen_before[k])


class TestImageStage2:
    @pytest.mark.slow
    def test_stage2_only_trains_lora_only(self):
        spec = make_image_spec("stage2_only")
        optimizer = optim.make_optimizer(opt_cfg())
        state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
        assert all(("lora_" in k or k.endswith(".bias")) for k in state.trainable)
        assert any("lora_A" in k for k in state.trainable)
        assert not any(k.startswith("dit.") for k in state.trainable)
        step = image_task.make_train_step(spec, optimizer)
        batch = {"image": jnp.full((2, 32, 32, 3), 0.5)}
        before = {k: np.asarray(v) for k, v in state.trainable.items() if "lora_B" in k}
        state, m = step(state, batch, jax.random.key(0))
        changed = [k for k, v in state.trainable.items()
                   if "lora_B" in k and not np.array_equal(np.asarray(v), before[k])]
        assert changed, "lora_B never updated — tower not in autodiff graph"

    @pytest.mark.slow
    def test_stage2_all_trains_dit_too(self):
        spec = make_image_spec("stage2_all")
        optimizer = optim.make_optimizer(opt_cfg())
        state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
        assert any(k.startswith("dit.") for k in state.trainable)
        assert any("lora_A" in k for k in state.trainable)


class TestVideoTasks:
    @pytest.mark.parametrize("mode", ["middle", "next", "next2", "sliding"])
    @pytest.mark.slow
    def test_video_step_runs(self, mode):
        spec = video_task.VideoTaskSpec(
            mode=mode, stage="stage1", tower_kind="clip", img_size=32,
            clip_image_size=32, dit_cfg=TINY_DIT, vae_cfg=TINY_VAE,
            tower_cfg=TINY_TOWER, clip_dim=24, t5_dim=32, adapter_in_dim=16,
            compute_dtype=jnp.float32)
        optimizer = optim.make_optimizer(opt_cfg())
        state = video_task.create_task_state(jax.random.key(0), spec, optimizer)
        step = video_task.make_train_step(spec, optimizer)
        n_cond = spec.n_cond
        batch = {"cond": jnp.full((2, n_cond, 32, 32, 3), 0.5),
                 "target": jnp.full((2, 32, 32, 3), 0.5),
                 "valid": jnp.array([True, mode != "sliding"])}
        state, metrics = step(state, batch, jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))
        # adapter must train
        assert any(k.startswith("visual_adapter.") for k in state.trainable)

    @pytest.mark.slow
    def test_video_stage2_lora(self):
        spec = video_task.VideoTaskSpec(
            mode="middle", stage="stage2_all", tower_kind="clip", img_size=32,
            clip_image_size=32, dit_cfg=TINY_DIT, vae_cfg=TINY_VAE,
            tower_cfg=TINY_TOWER, clip_dim=24, t5_dim=32, adapter_in_dim=16,
            lora_r=2, compute_dtype=jnp.float32)
        optimizer = optim.make_optimizer(opt_cfg())
        state = video_task.create_task_state(jax.random.key(0), spec, optimizer)
        assert any("lora_A" in k for k in state.trainable)
        step = video_task.make_train_step(spec, optimizer)
        batch = {"cond": jnp.full((2, 2, 32, 32, 3), 0.5),
                 "target": jnp.full((2, 32, 32, 3), 0.5)}
        state, m = step(state, batch, jax.random.key(0))
        assert np.isfinite(float(m["loss"]))


class TestMeshDP:
    def test_eight_device_mesh(self):
        mesh = mesh_m.make_mesh()
        assert mesh_m.data_axis_size(mesh) == 8

    @pytest.mark.slow
    def test_sharded_step_matches_single_device(self):
        """DP over the mesh must give identical losses to unsharded execution
        (same global batch, replicated params)."""
        spec = make_image_spec("stage1")
        optimizer = optim.make_optimizer(opt_cfg())
        state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
        step = image_task.make_train_step(spec, optimizer)

        rngs = np.random.default_rng(0)
        imgs = rngs.random((8, 32, 32, 3), dtype=np.float32)

        # path A: plain device arrays
        sA, mA = step(state, {"image": jnp.asarray(imgs)}, jax.random.key(1))

        # path B: batch sharded over the 8-device mesh
        state2 = image_task.create_task_state(jax.random.key(0), spec, optimizer)
        mesh = mesh_m.make_mesh()
        state2 = mesh_m.replicate(state2, mesh)
        batch = mesh_m.shard_batch({"image": imgs.copy()}, mesh)
        sB, mB = step(state2, batch, jax.random.key(1))

        np.testing.assert_allclose(float(mA["loss"]), float(mB["loss"]), rtol=2e-5)
        # updated params identical
        ka = sorted(sA.trainable)
        for k in ka[:5]:
            np.testing.assert_allclose(np.asarray(sA.trainable[k]),
                                       np.asarray(sB.trainable[k]), rtol=1e-4, atol=1e-5)

    def test_pad_to_multiple(self):
        x = np.ones((5, 2))
        padded, mask = mesh_m.pad_to_multiple(x, 8)
        assert padded.shape == (8, 2)
        assert mask.sum() == 5


class TestBatchPadding:
    """VERDICT r1 #7: non-divisible batches pad to the device count with a
    masked loss instead of shrinking the mesh."""

    def test_pad_batch_to_devices(self):
        from genhancer_tpu.parallel import mesh as M
        arrays = {"image": np.ones((6, 4, 4, 3), np.float32)}
        out = M.pad_batch_to_devices(arrays, 8)
        assert out["image"].shape[0] == 8
        assert out["valid"].tolist() == [True] * 6 + [False] * 2
        # divisible batches pass through untouched (no mask added)
        same = M.pad_batch_to_devices({"image": np.ones((8, 2))}, 8)
        assert "valid" not in same and same["image"].shape[0] == 8

    def test_pad_preserves_existing_mask(self):
        from genhancer_tpu.parallel import mesh as M
        arrays = {"cond": np.ones((6, 1, 4, 4, 3), np.float32),
                  "valid": np.array([True] * 5 + [False])}
        out = M.pad_batch_to_devices(arrays, 8)
        assert out["valid"].tolist() == [True] * 5 + [False] * 3

    def test_masked_image_loss_ignores_pad_rows(self):
        """Padded rows must not change the image-task loss."""
        import jax.numpy as jnp
        from genhancer_tpu.train import flow
        pred = jnp.asarray(np.random.default_rng(0).normal(size=(4, 6, 8)),
                           jnp.float32)
        tgt = jnp.asarray(np.random.default_rng(1).normal(size=(4, 6, 8)),
                          jnp.float32)
        full = flow.mse_loss(pred[:3], tgt[:3])
        masked = flow.mse_loss(pred, tgt, mask=jnp.array([True, True, True, False]))
        np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)
