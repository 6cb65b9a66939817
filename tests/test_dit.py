"""DiT tests: shapes, determinism, packing round-trip, grads, remat equivalence.

Uses a tiny config (hidden 64) so tests run in seconds on CPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.models import dit as D


TINY = D.DiTConfig(in_channels=16, vec_in_dim=24, context_in_dim=32,
                   hidden_size=64, mlp_ratio=4.0, num_heads=4, depth=2,
                   depth_single_blocks=2, axes_dim=(4, 6, 6), theta=10_000,
                   qkv_bias=True, guidance_embed=True)


def make_inputs(cfg, B=2, L_img=8, L_txt=3, key=0):
    ks = jax.random.split(jax.random.key(key), 6)
    img = jax.random.normal(ks[0], (B, L_img, cfg.in_channels))
    txt = jax.random.normal(ks[1], (B, L_txt, cfg.context_in_dim))
    img_ids = jnp.tile(jnp.pad(jnp.arange(L_img, dtype=jnp.float32)[:, None],
                               ((0, 0), (1, 1)))[None], (B, 1, 1))
    txt_ids = jnp.zeros((B, L_txt, 3))
    t = jax.random.uniform(ks[2], (B,))
    y = jax.random.normal(ks[3], (B, cfg.vec_in_dim))
    g = jnp.full((B,), 4.0)
    return dict(img=img, img_ids=img_ids, txt=txt, txt_ids=txt_ids,
                timesteps=t, y=y, guidance=g)


class TestDiT:
    @pytest.mark.slow
    def test_output_shape_and_determinism(self):
        params = D.init_dit(jax.random.key(0), TINY)
        inp = make_inputs(TINY)
        out1 = D.dit_forward(params, TINY, **inp)
        out2 = D.dit_forward(params, TINY, **inp)
        assert out1.shape == (2, 8, TINY.in_channels)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_flux_dev_param_count(self):
        """flux-dev registry config should build the ~850M-param denoiser."""
        cfg = D.DIT_CONFIGS["flux-dev"]
        assert cfg.hidden_size == 3072 and cfg.depth == 2 and cfg.depth_single_blocks == 4
        assert cfg.head_dim == 128 and tuple(cfg.axes_dim) == (16, 56, 56)

    def test_schnell_no_guidance(self):
        cfg = D.DiTConfig(in_channels=16, vec_in_dim=24, context_in_dim=32,
                          hidden_size=64, num_heads=4, depth=1, depth_single_blocks=1,
                          axes_dim=(4, 6, 6), guidance_embed=False)
        params = D.init_dit(jax.random.key(0), cfg)
        assert "guidance_in" not in params
        inp = make_inputs(cfg)
        inp["guidance"] = None
        out = D.dit_forward(params, cfg, **inp)
        assert out.shape == (2, 8, 16)

    def test_guidance_required_for_dev(self):
        params = D.init_dit(jax.random.key(0), TINY)
        inp = make_inputs(TINY)
        inp["guidance"] = None
        with pytest.raises(ValueError):
            D.dit_forward(params, TINY, **inp)

    @pytest.mark.slow
    def test_remat_matches_no_remat(self):
        params = D.init_dit(jax.random.key(1), TINY)
        inp = make_inputs(TINY)
        out_a = D.dit_forward(params, TINY, **inp, remat=False)
        out_b = D.dit_forward(params, TINY, **inp, remat=True)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("policy", ["save_attn", "dots"])
    def test_remat_policy_grads_match_full(self, policy):
        """Remat policies change what's saved, never the math: loss and grads
        must match the all-or-nothing remat bit-for-bit (same f32 ops)."""
        params = D.init_dit(jax.random.key(4), TINY)
        inp = make_inputs(TINY)

        def loss_fn(p, pol):
            return jnp.mean(D.dit_forward(p, TINY, **inp, remat=True,
                                          remat_policy=pol) ** 2)

        l_full, g_full = jax.jit(
            jax.value_and_grad(loss_fn), static_argnums=1)(params, "full")
        l_p, g_p = jax.jit(
            jax.value_and_grad(loss_fn), static_argnums=1)(params, policy)
        np.testing.assert_allclose(float(l_full), float(l_p), rtol=1e-6)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_full),
                jax.tree_util.tree_leaves_with_path(g_p)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
                err_msg=jax.tree_util.keystr(pa))

    @pytest.mark.slow
    def test_gradients_flow_everywhere(self):
        params = D.init_dit(jax.random.key(2), TINY)
        inp = make_inputs(TINY)

        def loss_fn(p):
            return jnp.mean(D.dit_forward(p, TINY, **inp) ** 2)

        grads = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves_with_path(grads)
        zero = [jax.tree_util.keystr(path) for path, g in leaves
                if float(jnp.max(jnp.abs(g))) == 0.0]
        assert zero == [], f"zero grads at: {zero}"

    def test_txt_tokens_influence_img_output(self):
        params = D.init_dit(jax.random.key(3), TINY)
        inp = make_inputs(TINY)
        out_a = D.dit_forward(params, TINY, **inp)
        inp2 = dict(inp)
        inp2["txt"] = inp["txt"] + 1.0
        out_b = D.dit_forward(params, TINY, **inp2)
        assert float(jnp.max(jnp.abs(out_a - out_b))) > 1e-4

    def test_jit_compiles(self):
        params = D.init_dit(jax.random.key(0), TINY)
        inp = make_inputs(TINY)
        f = jax.jit(lambda p, i: D.dit_forward(p, TINY, **i))
        out = f(params, inp)
        assert out.shape == (2, 8, 16)


class TestPacking:
    def test_pack_unpack_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 6, 16), dtype=np.float32))
        tokens = D.pack_latent(x)
        assert tokens.shape == (2, 12, 64)
        back = D.unpack_latent(tokens, 8, 6)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_pack_channel_order_matches_torch_einops(self, rng):
        """'b c (h ph) (w pw) -> b (h w) (c ph pw)' with NCHW input."""
        x_nhwc = rng.standard_normal((1, 4, 4, 3), dtype=np.float32)
        x_nchw = x_nhwc.transpose(0, 3, 1, 2)
        b, c, H, W = x_nchw.shape
        ref = x_nchw.reshape(b, c, H // 2, 2, W // 2, 2)
        ref = ref.transpose(0, 2, 4, 1, 3, 5).reshape(b, (H // 2) * (W // 2), c * 4)
        got = np.asarray(D.pack_latent(jnp.asarray(x_nhwc)))
        np.testing.assert_array_equal(got, ref)
