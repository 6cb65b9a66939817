"""ControlNet tests: zero-init no-op property, trainable-copy init, DiT
residual consumption (cyclic indexing), denoise_controlnet sampler parity.

Reference behavior covered: ``src/flux/model.py:165-166,198-200`` (residual
add in the double blocks) and ``src/flux/sampling.py:152-232``
(denoise_controlnet); the network itself is a framework addition — the
reference ships the hooks but no model (its ``controlnet`` arg is ``None``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.models import dit as D
from genhancer_tpu.models import controlnet as C
from genhancer_tpu.train import flow

from test_dit import TINY, make_inputs


def make_cn_inputs(cfg, B=2, L_img=8, key=7):
    inp = make_inputs(cfg, B=B, L_img=L_img)
    cond = jax.random.normal(jax.random.key(key), (B, L_img, cfg.in_channels))
    return inp, cond


class TestControlNetForward:
    def test_zero_init_residuals_are_zero(self):
        params = C.init_controlnet(jax.random.key(0), TINY, depth=2)
        inp, cond = make_cn_inputs(TINY)
        res = C.controlnet_forward(params, TINY, controlnet_cond=cond, **inp)
        assert len(res) == 2
        for r in res:
            assert r.shape == (2, 8, TINY.hidden_size)
            np.testing.assert_array_equal(np.asarray(r), 0.0)

    def test_zero_init_is_noop_on_dit(self):
        dit_p = D.init_dit(jax.random.key(1), TINY)
        cn_p = C.init_controlnet(jax.random.key(0), TINY, depth=2)
        inp, cond = make_cn_inputs(TINY)
        res = C.controlnet_forward(cn_p, TINY, controlnet_cond=cond, **inp)
        base = D.dit_forward(dit_p, TINY, **inp)
        with_cn = D.dit_forward(dit_p, TINY, controlnet_residuals=res, **inp)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(with_cn))

    def test_trained_residuals_change_output(self):
        dit_p = D.init_dit(jax.random.key(1), TINY)
        cn_p = C.init_controlnet(jax.random.key(0), TINY, depth=2)
        # simulate training: perturb the zero-init IO projections
        cn_p["cond_in"]["weight"] = 0.1 * jnp.ones_like(cn_p["cond_in"]["weight"])
        for blk in cn_p["controlnet_blocks"]:
            blk["weight"] = blk["weight"] + 0.01 * jnp.eye(TINY.hidden_size)
        inp, cond = make_cn_inputs(TINY)
        res = C.controlnet_forward(cn_p, TINY, controlnet_cond=cond, **inp)
        assert float(jnp.max(jnp.abs(res[0]))) > 0
        base = D.dit_forward(dit_p, TINY, **inp)
        with_cn = D.dit_forward(dit_p, TINY, controlnet_residuals=res, **inp)
        assert float(jnp.max(jnp.abs(with_cn - base))) > 1e-6
        # conditioning image actually matters
        res2 = C.controlnet_forward(cn_p, TINY, controlnet_cond=cond + 1.0, **inp)
        assert float(jnp.max(jnp.abs(res2[0] - res[0]))) > 1e-6

    def test_cyclic_residual_indexing(self):
        """depth-2 DiT with a single-block controlnet: residual reused
        (model.py:200 indexes modulo controlnet depth)."""
        dit_p = D.init_dit(jax.random.key(1), TINY)
        inp, _ = make_cn_inputs(TINY)
        r = 0.05 * jax.random.normal(jax.random.key(3),
                                     (2, 8, TINY.hidden_size))
        out1 = D.dit_forward(dit_p, TINY, controlnet_residuals=(r,), **inp)
        out2 = D.dit_forward(dit_p, TINY, controlnet_residuals=(r, r), **inp)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-6, atol=1e-6)

    def test_init_from_dit_copies_trunk(self):
        dit_p = D.init_dit(jax.random.key(1), TINY)
        cn_p = C.init_controlnet_from_dit(jax.random.key(0), dit_p, TINY, depth=3)
        np.testing.assert_array_equal(
            np.asarray(cn_p["img_in"]["weight"]),
            np.asarray(dit_p["img_in"]["weight"]))
        # depth 3 > DiT depth 2: third block cycles back to DiT block 0
        np.testing.assert_array_equal(
            np.asarray(cn_p["double_blocks"][2]["img"]["attn"]["qkv"]["weight"]),
            np.asarray(dit_p["double_blocks"][0]["img"]["attn"]["qkv"]["weight"]))
        # zero IO preserved
        np.testing.assert_array_equal(
            np.asarray(cn_p["controlnet_blocks"][0]["weight"]), 0.0)

    def test_cond_shape_mismatch_raises(self):
        cn_p = C.init_controlnet(jax.random.key(0), TINY, depth=1)
        inp, cond = make_cn_inputs(TINY)
        with pytest.raises(ValueError, match="controlnet_cond"):
            C.controlnet_forward(cn_p, TINY, controlnet_cond=cond[:, :4], **inp)

    def test_grads_flow_to_controlnet(self):
        """End-to-end differentiability: d(loss)/d(controlnet params) is
        nonzero through the DiT once the zero-init projections move."""
        dit_p = D.init_dit(jax.random.key(1), TINY)
        cn_p = C.init_controlnet(jax.random.key(0), TINY, depth=1)
        cn_p["controlnet_blocks"][0]["weight"] = (
            0.01 * jnp.eye(TINY.hidden_size))
        inp, cond = make_cn_inputs(TINY)

        def loss(cn_params):
            res = C.controlnet_forward(cn_params, TINY, controlnet_cond=cond,
                                       **inp)
            out = D.dit_forward(dit_p, TINY, controlnet_residuals=res, **inp)
            return jnp.mean(jnp.square(out))

        g = jax.jit(jax.grad(loss))(cn_p)
        gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(x))
                                   for x in jax.tree_util.tree_leaves(g))))
        assert np.isfinite(gnorm) and gnorm > 0
        # the zero cond_in still receives gradient (it feeds the trunk)
        assert float(jnp.max(jnp.abs(g["cond_in"]["weight"]))) > 0


class TestControlNetTraining:
    @pytest.mark.slow
    def test_short_optimization_reduces_loss(self):
        """The component actually trains: frozen DiT, controlnet params under
        AdamW, flow-matching loss on a fixed (cond -> target) pair drops."""
        import optax

        dit_p = D.init_dit(jax.random.key(1), TINY)
        cn_p = C.init_controlnet_from_dit(jax.random.key(0), dit_p, TINY,
                                          depth=2)
        inp, cond = make_cn_inputs(TINY)
        target = jax.random.normal(jax.random.key(11), inp["img"].shape)
        opt = optax.adamw(1e-3)
        opt_state = opt.init(cn_p)

        def loss_fn(cn_params):
            res = C.controlnet_forward(cn_params, TINY, controlnet_cond=cond,
                                       **inp)
            out = D.dit_forward(dit_p, TINY, controlnet_residuals=res, **inp)
            return jnp.mean(jnp.square(out - target))

        @jax.jit
        def step(cn_params, opt_state):
            loss, g = jax.value_and_grad(loss_fn)(cn_params)
            updates, opt_state = opt.update(g, opt_state, cn_params)
            return optax.apply_updates(cn_params, updates), opt_state, loss

        losses = []
        for _ in range(12):
            cn_p, opt_state, loss = step(cn_p, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.98, losses
        assert all(np.isfinite(l) for l in losses)


class TestDenoiseControlNet:
    def _fns(self, dit_p, cn_p, inp, cond):
        def model_fn(img, t, g, res):
            return D.dit_forward(dit_p, TINY, img=img, img_ids=inp["img_ids"],
                                 txt=inp["txt"], txt_ids=inp["txt_ids"],
                                 timesteps=t, y=inp["y"], guidance=g,
                                 controlnet_residuals=res)

        def cn_fn(img, t, g):
            return C.controlnet_forward(cn_p, TINY, img=img,
                                        img_ids=inp["img_ids"],
                                        txt=inp["txt"], txt_ids=inp["txt_ids"],
                                        timesteps=t, y=inp["y"], guidance=g,
                                        controlnet_cond=cond)
        return model_fn, cn_fn

    def test_zero_init_matches_plain_euler(self):
        dit_p = D.init_dit(jax.random.key(1), TINY)
        cn_p = C.init_controlnet(jax.random.key(0), TINY, depth=2)
        inp, cond = make_cn_inputs(TINY)
        model_fn, cn_fn = self._fns(dit_p, cn_p, inp, cond)
        ts = flow.get_schedule(4, 8, shift=False)
        out_cn = flow.denoise_controlnet(model_fn, cn_fn, inp["img"], ts,
                                         guidance=4.0)
        out_plain = flow.denoise_euler(
            lambda img, t, g: model_fn(img, t, g, None), inp["img"], ts,
            guidance=4.0)
        np.testing.assert_allclose(np.asarray(out_cn), np.asarray(out_plain),
                                   rtol=1e-5, atol=1e-5)

    def test_cfg_branch_and_jit(self):
        dit_p = D.init_dit(jax.random.key(1), TINY)
        cn_p = C.init_controlnet(jax.random.key(0), TINY, depth=2)
        for blk in cn_p["controlnet_blocks"]:
            blk["weight"] = blk["weight"] + 0.01 * jnp.eye(TINY.hidden_size)
        inp, cond = make_cn_inputs(TINY)
        neg_txt = jnp.zeros_like(inp["txt"])
        model_fn, cn_fn = self._fns(dit_p, cn_p, inp, cond)

        def neg_model_fn(img, t, g, res):
            return D.dit_forward(dit_p, TINY, img=img, img_ids=inp["img_ids"],
                                 txt=neg_txt, txt_ids=inp["txt_ids"],
                                 timesteps=t, y=inp["y"], guidance=g,
                                 controlnet_residuals=res)
        ts = flow.get_schedule(3, 8, shift=False)

        @jax.jit
        def run(img):
            return flow.denoise_controlnet(
                model_fn, cn_fn, img, ts, guidance=4.0, true_gs=3.0,
                controlnet_gs=0.7, neg_model_fn=neg_model_fn,
                neg_controlnet_fn=cn_fn, timestep_to_start_cfg=1)

        out = run(inp["img"])
        assert out.shape == inp["img"].shape
        assert np.all(np.isfinite(np.asarray(out)))
        # CFG actually engaged: true_gs=1 with the same negative differs
        out_gs1 = flow.denoise_controlnet(
            model_fn, cn_fn, inp["img"], ts, guidance=4.0, true_gs=1.0,
            neg_model_fn=neg_model_fn, neg_controlnet_fn=cn_fn,
            timestep_to_start_cfg=1)
        assert float(jnp.max(jnp.abs(out - out_gs1))) > 1e-6
