"""Ring attention (parallel/ring.py): loss/grad parity vs the single-device
reference attention on the virtual CPU mesh, across mesh layouts and dtypes.
Semantics target: core.attention.sdpa_xla (exact unmasked softmax)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genhancer_tpu.core.attention import sdpa_xla
from genhancer_tpu.parallel import mesh as mesh_m
from genhancer_tpu.parallel import ring


def _qkv(rng, b, l, h, d, dtype):
    mk = lambda: jnp.asarray(rng.standard_normal((b, l, h, d)), dtype)
    return mk(), mk(), mk()


class TestRingForward:
    @pytest.mark.parametrize("sp,b", [(8, 2), (4, 4), (2, 2)])
    def test_matches_sdpa_f32(self, rng, sp, b):
        mesh = mesh_m.make_mesh(sp, sequence_parallel=sp,
                                devices=jax.devices()[:sp])
        q, k, v = _qkv(rng, b, 64 * sp, 4, 32, jnp.float32)
        got = ring.ring_attention(q, k, v, mesh, batch_axis=None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(sdpa_xla(q, k, v)),
                                   atol=1e-5, rtol=1e-5)

    def test_dp_x_sp(self, rng):
        mesh = mesh_m.make_mesh(8, sequence_parallel=4)
        assert mesh.shape == {"data": 2, "model": 1, "seq": 4}
        q, k, v = _qkv(rng, 4, 256, 4, 32, jnp.float32)
        got = ring.ring_attention(q, k, v, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(sdpa_xla(q, k, v)),
                                   atol=1e-5, rtol=1e-5)

    def test_bf16(self, rng):
        mesh = mesh_m.make_mesh(4, sequence_parallel=4,
                                devices=jax.devices()[:4])
        q, k, v = _qkv(rng, 2, 256, 4, 32, jnp.bfloat16)
        got = ring.ring_attention(q, k, v, mesh, batch_axis=None)
        ref = sdpa_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=3e-2)

    @pytest.mark.parametrize("l", [100, 197, 5])
    def test_indivisible_l_pads_and_matches(self, rng, l):
        """Image-task joint sequences are odd (1 cls + 196 img at 224px) —
        the ring pads the token dim and masks pad keys to -inf; real-row
        outputs must match unpadded sdpa exactly.  l=5 on sp8 exercises
        whole chunks of padding (incl. fully-masked chunks before the first
        real one reaches a device)."""
        mesh = mesh_m.make_mesh(8, sequence_parallel=8)
        q, k, v = _qkv(rng, 1, l, 2, 16, jnp.float32)
        got = ring.ring_attention(q, k, v, mesh, batch_axis=None)
        assert got.shape == q.shape
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(sdpa_xla(q, k, v)),
                                   atol=1e-5, rtol=1e-5)


class TestTaskSequenceParallel:
    """sequence_parallel on the video sliding task: full train-step loss
    parity vs the unsharded step (same init/batch/key)."""

    def _spec(self, sp):
        from genhancer_tpu.models import dit as dit_m, vae as vae_m
        from genhancer_tpu.models.towers import clip as clip_m
        from genhancer_tpu.tasks import video as video_task
        tiny_dit = dit_m.DiTConfig(in_channels=16, vec_in_dim=24,
                                   context_in_dim=32, hidden_size=64,
                                   num_heads=4, depth=2, depth_single_blocks=2,
                                   axes_dim=(4, 6, 6))
        tiny_vae = vae_m.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2),
                                   num_res_blocks=1, z_channels=4)
        tiny_tower = clip_m.CLIPConfig(
            vision=clip_m.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                           num_layers=1, num_heads=2,
                                           image_size=32, patch_size=16),
            text=clip_m.CLIPTextConfig(hidden_size=16, intermediate_size=32,
                                       num_layers=1, num_heads=2, vocab_size=50,
                                       max_position_embeddings=8),
            projection_dim=24)
        return video_task.VideoTaskSpec(
            mode="sliding", stage="stage1", tower_kind="clip", img_size=32,
            clip_image_size=32, dit_cfg=tiny_dit, vae_cfg=tiny_vae,
            tower_cfg=tiny_tower, clip_dim=24, t5_dim=32, adapter_in_dim=16,
            compute_dtype=jnp.float32, dit_param_dtype=jnp.float32,
            sequence_parallel=sp)

    @pytest.mark.slow  # compiles the tiny sliding train step twice (~6 min)
    def test_sp_step_matches_unsharded(self, rng):
        from genhancer_tpu.tasks import video as video_task
        from genhancer_tpu.train import optim
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

        optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        batch = {
            "cond": jnp.asarray(rng.random((2, 3, 32, 32, 3)), jnp.float32),
            "target": jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32),
            "valid": jnp.array([True, True]),
        }
        key = jax.random.key(3)

        spec0 = self._spec(1)
        st0 = video_task.create_task_state(jax.random.key(0), spec0, optimizer)
        _, m0 = video_task.make_train_step(spec0, optimizer)(st0, batch, key)

        spec2 = self._spec(2)
        mesh = mesh_m.make_mesh(4, sequence_parallel=2)
        st2 = video_task.create_task_state(jax.random.key(0), spec2, optimizer)
        _, m2 = video_task.make_train_step(spec2, optimizer, mesh=mesh)(
            st2, batch, key)

        np.testing.assert_allclose(float(m2["loss"]), float(m0["loss"]),
                                   rtol=2e-5)
        np.testing.assert_allclose(float(m2["grad_norm"]),
                                   float(m0["grad_norm"]), rtol=2e-4)

    @pytest.mark.slow
    def test_sp_image_task_matches_unsharded(self, rng):
        """Image stage-1 under sequence_parallel: the joint token stream is
        whatever the tower/VAE produce (odd at real resolutions — 1 cls +
        196 img at 224px), so this exercises the ring's pad+mask path inside
        the full train step."""
        from genhancer_tpu.models import dit as dit_m, vae as vae_m
        from genhancer_tpu.models.towers import clip as clip_m
        from genhancer_tpu.tasks import image as image_task
        from genhancer_tpu.train import optim
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

        tiny_dit = dit_m.DiTConfig(in_channels=16, vec_in_dim=24,
                                   context_in_dim=32, hidden_size=64,
                                   num_heads=4, depth=1, depth_single_blocks=1,
                                   axes_dim=(4, 6, 6))
        tiny_vae = vae_m.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2),
                                   num_res_blocks=1, z_channels=4)
        tiny_tower = clip_m.CLIPConfig(
            vision=clip_m.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                           num_layers=1, num_heads=2,
                                           image_size=32, patch_size=16),
            text=clip_m.CLIPTextConfig(hidden_size=16, intermediate_size=32,
                                       num_layers=1, num_heads=2, vocab_size=50,
                                       max_position_embeddings=8),
            projection_dim=24)

        def spec(sp):
            return image_task.TaskSpec(
                stage="stage1", tower_kind="clip", img_size=32,
                clip_image_size=32, dit_cfg=tiny_dit, vae_cfg=tiny_vae,
                tower_cfg=tiny_tower, clip_dim=24, t5_dim=32,
                compute_dtype=jnp.float32, dit_param_dtype=jnp.float32,
                vae_dtype=jnp.float32, sequence_parallel=sp)

        optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        batch = {"image": jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)}
        key = jax.random.key(7)

        st0 = image_task.create_task_state(jax.random.key(0), spec(1), optimizer)
        _, m0 = image_task.make_train_step(spec(1), optimizer)(st0, batch, key)

        mesh = mesh_m.make_mesh(4, sequence_parallel=2)
        st2 = image_task.create_task_state(jax.random.key(0), spec(2), optimizer)
        _, m2 = image_task.make_train_step(spec(2), optimizer, mesh=mesh)(
            st2, batch, key)
        # online-softmax chunk order != sdpa's single reduction: ~4e-5 f32
        # accumulation noise on this task (the video SP test sits below 2e-5
        # by luck of its operand scale, not by a tighter contract)
        np.testing.assert_allclose(float(m2["loss"]), float(m0["loss"]),
                                   rtol=2e-4)
        np.testing.assert_allclose(float(m2["grad_norm"]),
                                   float(m0["grad_norm"]), rtol=5e-4)

    def test_sp_without_mesh_fails_loudly(self):
        from genhancer_tpu.tasks import video as video_task
        from genhancer_tpu.train import optim
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
        optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        with pytest.raises(ValueError, match="needs the mesh"):
            video_task.make_train_step(self._spec(2), optimizer)


class TestRingGrads:
    def test_grads_match_sdpa(self, rng):
        mesh = mesh_m.make_mesh(8, sequence_parallel=4)
        q, k, v = _qkv(rng, 2, 256, 4, 32, jnp.float32)
        w = jnp.asarray(rng.standard_normal((2, 256, 4, 32)), jnp.float32)

        def loss_ring(q, k, v):
            return jnp.sum(ring.ring_attention(q, k, v, mesh) * w)

        def loss_ref(q, k, v):
            return jnp.sum(sdpa_xla(q, k, v) * w)

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_ring, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4, err_msg=name)

    def test_grads_match_sdpa_odd_l(self, rng):
        """Gradients through the padded ring: the pad/slice VJPs must route
        dq to real rows only and the masked pad keys must get zero dk/dv."""
        mesh = mesh_m.make_mesh(8, sequence_parallel=4)
        l = 197          # 224px image task: 1 cls + 196 img tokens
        q, k, v = _qkv(rng, 2, l, 4, 32, jnp.float32)
        w = jnp.asarray(rng.standard_normal((2, l, 4, 32)), jnp.float32)

        g_ring = jax.grad(lambda q, k, v: jnp.sum(
            ring.ring_attention(q, k, v, mesh) * w), argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(lambda q, k, v: jnp.sum(
            sdpa_xla(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_ring, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4, err_msg=name)

    def test_grads_under_jit_bf16(self, rng):
        mesh = mesh_m.make_mesh(4, sequence_parallel=2,
                                devices=jax.devices()[:4])
        q, k, v = _qkv(rng, 2, 128, 4, 32, jnp.bfloat16)

        @jax.jit
        def g_ring(q, k, v):
            return jax.grad(
                lambda q: jnp.sum(ring.ring_attention(q, k, v, mesh)
                                  .astype(jnp.float32)))(q)

        @jax.jit
        def g_ref(q, k, v):
            return jax.grad(
                lambda q: jnp.sum(sdpa_xla(q, k, v).astype(jnp.float32)))(q)

        np.testing.assert_allclose(np.asarray(g_ring(q, k, v), np.float32),
                                   np.asarray(g_ref(q, k, v), np.float32),
                                   atol=5e-2)
