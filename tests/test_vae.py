"""VAE tests: shapes, scaling semantics, downsample padding parity.

Tiny config (ch=8, 2 levels) keeps CPU runtime small; the f8 topology and
asymmetric downsample padding are exercised exactly as in the full model.
"""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from genhancer_tpu.models import vae as V


TINY = V.VAEConfig(resolution=32, in_channels=3, ch=8, out_ch=3,
                   ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                   scale_factor=0.3611, shift_factor=0.1159)


class TestVAE:
    def test_encoder_output_shape(self):
        params = V.init_encoder(jax.random.key(0), TINY)
        x = jnp.zeros((2, 32, 32, 3))
        moments = V.encoder_forward(params, TINY, x)
        # 2 levels -> f2 downsampling; 2*z channels
        assert moments.shape == (2, 16, 16, 8)

    @pytest.mark.slow
    def test_encode_decode_roundtrip_shapes(self):
        params = V.init_vae(jax.random.key(0), TINY)
        x = jnp.zeros((1, 32, 32, 3))
        z = V.vae_encode(params, TINY, x, sample=False)
        assert z.shape == (1, 16, 16, 4)
        out = V.vae_decode(params, TINY, z)
        assert out.shape == (1, 32, 32, 3)

    def test_scale_shift_applied(self):
        params = V.init_vae(jax.random.key(0), TINY)
        x = jnp.ones((1, 32, 32, 3)) * 0.3
        moments = V.encoder_forward(params["encoder"], TINY, x)
        mean = np.asarray(moments)[..., :4]
        z = np.asarray(V.vae_encode(params, TINY, x, sample=False))
        np.testing.assert_allclose(z, TINY.scale_factor * (mean - TINY.shift_factor),
                                   rtol=1e-5, atol=1e-6)

    def test_diagonal_gaussian_mean_mode(self):
        moments = jnp.concatenate([jnp.full((1, 2, 2, 4), 3.0),
                                   jnp.full((1, 2, 2, 4), -100.0)], axis=-1)
        z = V.diagonal_gaussian(jax.random.key(0), moments, sample=True)
        # logvar=-100 -> std ~ 0 -> sample == mean
        np.testing.assert_allclose(np.asarray(z), 3.0, rtol=1e-5)

    def test_downsample_asymmetric_pad_matches_torch(self, rng):
        """torch: pad (left0,right1,top0,bottom1) then VALID stride-2 conv
        (autoencoder.py:85-95)."""
        import torch
        import torch.nn.functional as tF
        c = 4
        x = rng.standard_normal((1, 7, 7, c), dtype=np.float32)
        w_hwio = rng.standard_normal((3, 3, c, c), dtype=np.float32)
        b = rng.standard_normal(c, dtype=np.float32)
        p = {"weight": jnp.asarray(w_hwio), "bias": jnp.asarray(b)}
        got = np.asarray(V._downsample({"conv": p}, jnp.asarray(x)))

        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        wt = torch.from_numpy(w_hwio.transpose(3, 2, 0, 1))  # OIHW
        xt = tF.pad(xt, (0, 1, 0, 1))
        want = tF.conv2d(xt, wt, torch.from_numpy(b), stride=2).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_upsample_nearest_matches_torch(self, rng):
        import torch
        import torch.nn.functional as tF
        c = 4
        x = rng.standard_normal((1, 3, 3, c), dtype=np.float32)
        w_hwio = rng.standard_normal((3, 3, c, c), dtype=np.float32)
        b = np.zeros(c, dtype=np.float32)
        p = {"weight": jnp.asarray(w_hwio), "bias": jnp.asarray(b)}
        got = np.asarray(V._upsample({"conv": p}, jnp.asarray(x)))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        xt = tF.interpolate(xt, scale_factor=2.0, mode="nearest")
        wt = torch.from_numpy(w_hwio.transpose(3, 2, 0, 1))
        want = tF.conv2d(xt, wt, torch.from_numpy(b), padding=1).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_grad_free_encode(self):
        """VAE is frozen in all trainers — encode must work under lax.stop_gradient."""
        params = V.init_vae(jax.random.key(0), TINY)
        x = jnp.ones((1, 32, 32, 3))

        def f(p):
            z = V.vae_encode(jax.lax.stop_gradient(p), TINY, x, sample=False)
            return jnp.sum(z)

        g = jax.grad(lambda p: f(p))(params)
        assert all(float(jnp.max(jnp.abs(l))) == 0.0 for l in jax.tree_util.tree_leaves(g))
