"""Flow-matching objective + optimizer semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from genhancer_tpu.train import flow, optim
from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS


class TestFlow:
    def test_timesteps_logit_normal(self):
        t = flow.sample_timesteps(jax.random.key(0), 10_000, scale_factor=1.0)
        t = np.asarray(t)
        assert (t > 0).all() and (t < 1).all()
        # sigmoid(N(0,1)) has median 0.5
        assert abs(np.median(t) - 0.5) < 0.02

    def test_scale_factor_widens(self):
        t1 = np.asarray(flow.sample_timesteps(jax.random.key(0), 10_000, 0.5))
        t2 = np.asarray(flow.sample_timesteps(jax.random.key(0), 10_000, 2.0))
        assert t2.std() > t1.std()

    def test_interpolation_endpoints(self):
        x1 = jnp.ones((2, 3, 4))
        x0 = jnp.zeros((2, 3, 4))
        np.testing.assert_allclose(
            np.asarray(flow.interpolate(x1, x0, jnp.array([0.0, 1.0]))),
            np.stack([np.ones((3, 4)), np.zeros((3, 4))]))

    def test_masked_loss(self):
        pred = jnp.ones((2, 3, 4))
        tgt = jnp.zeros((2, 3, 4))
        full = flow.mse_loss(pred, tgt)
        half = flow.mse_loss(pred, tgt, mask=jnp.array([True, False]))
        np.testing.assert_allclose(float(full), 1.0)
        np.testing.assert_allclose(float(half), 1.0)
        # masked-out garbage must not leak
        pred2 = pred.at[1].set(100.0)
        np.testing.assert_allclose(
            float(flow.mse_loss(pred2, tgt, mask=jnp.array([True, False]))), 1.0)

    def test_schedule_shift_monotone(self):
        ts = flow.get_schedule(10, 256, shift=True)
        assert len(ts) == 11
        assert ts[0] == 1.0 and abs(ts[-1]) < 1e-9
        assert all(a > b for a, b in zip(ts[:-1], ts[1:]))

    def test_schedule_matches_reference_formula(self):
        """Cross-check vs sampling.py:66-94 math."""
        import math
        seq_len = 1024
        m = (1.15 - 0.5) / (4096 - 256)
        mu = 0.5 - m * 256 + m * seq_len
        ts_ref = np.linspace(1, 0, 5)
        with np.errstate(divide="ignore"):
            shifted = math.exp(mu) / (math.exp(mu) + (1 / ts_ref - 1) ** 1.0)
        got = flow.get_schedule(4, seq_len, shift=True)
        np.testing.assert_allclose(got[1:], shifted[1:], rtol=1e-6)

    def test_euler_denoise_linear_model(self):
        """With v(x,t) = c constant, Euler gives x_final = x + (t_N - t_0) * c."""
        c = 2.0
        img = jnp.zeros((1, 4, 8))
        out = flow.denoise_euler(lambda x, t, g: jnp.full_like(x, c),
                                 img, [1.0, 0.5, 0.0], guidance=4.0)
        np.testing.assert_allclose(np.asarray(out), -1.0 * c, rtol=1e-6)

    def test_noise_token_shape(self):
        z = flow.get_noise_tokens(jax.random.key(0), 2, 224, 224)
        assert z.shape == (2, 28, 28, 16)


class TestOptim:
    def _cfg(self, **kw):
        c = Config(dict(TRAIN_DEFAULTS))
        c.update(kw)
        return c

    def test_constant_schedule_flat(self):
        s = optim.make_lr_schedule("constant", 1e-4, warmup_steps=10)
        assert float(s(0)) == 1e-4 and float(s(1000)) == 1e-4

    def test_warmup_ramps(self):
        s = optim.make_lr_schedule("constant_with_warmup", 1e-4, warmup_steps=10)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(5)), 5e-5, rtol=1e-5)
        np.testing.assert_allclose(float(s(50)), 1e-4, rtol=1e-5)

    def test_clipping_applied(self):
        opt = optim.make_optimizer(self._cfg(max_grad_norm=1.0, learning_rate=1.0,
                                             adam_weight_decay=0.0))
        params = {"w": jnp.zeros(4)}
        st = opt.init(params)
        big = {"w": jnp.full(4, 100.0)}
        updates, _ = opt.update(big, st, params)
        # after clipping to norm 1, adam normalizes to ~lr magnitude
        assert float(jnp.max(jnp.abs(updates["w"]))) <= 1.0 + 1e-5

    def test_adamw_weight_decay_decoupled(self):
        opt = optim.make_optimizer(self._cfg(learning_rate=0.1, adam_weight_decay=0.5,
                                             max_grad_norm=1e9))
        params = {"w": jnp.ones(1)}
        st = opt.init(params)
        updates, _ = opt.update({"w": jnp.zeros(1)}, st, params)
        # zero grad -> update is pure weight decay: -lr * wd * w
        np.testing.assert_allclose(np.asarray(updates["w"]), -0.05, atol=1e-6)

    def test_epoch_math(self):
        # train_SigLIP_stage1.py:158 — ceil(3e6/16)/2
        assert optim.effective_steps_per_epoch(16, 2) == 187500 / 2


class TestFusedAdamW:
    """fused_adamw_clip must match optax.chain(clip_by_global_norm, adamw)
    step-for-step on fp32 params (same math, one HBM pass)."""

    def _setup(self, lr=1e-3, wd=0.01, clip=1.0):
        import optax
        from genhancer_tpu.train import optim as O
        sched = optax.constant_schedule(lr)
        fused = O.fused_adamw_clip(sched, weight_decay=wd, max_grad_norm=clip)
        chained = optax.chain(
            optax.clip_by_global_norm(clip),
            optax.adamw(learning_rate=sched, weight_decay=wd))
        params = {"a": jnp.asarray(np.random.default_rng(0).normal(
                      size=(16, 8)).astype(np.float32)),
                  "b": jnp.asarray(np.random.default_rng(1).normal(
                      size=(8,)).astype(np.float32))}
        return fused, chained, params

    def test_matches_optax_chain(self):
        import optax
        fused, chained, params = self._setup()
        pf, pc = dict(params), dict(params)
        sf, sc = fused.init(pf), chained.init(pc)
        rng = np.random.default_rng(2)
        for step in range(5):
            grads = {k: jnp.asarray(rng.normal(
                size=v.shape).astype(np.float32)) * (10.0 if step % 2 else 0.1)
                for k, v in params.items()}
            uf, sf = fused.update(grads, sf, pf)
            uc, sc = chained.update(grads, sc, pc)
            pf = optax.apply_updates(pf, uf)
            pc = optax.apply_updates(pc, uc)
        for k in params:
            np.testing.assert_allclose(np.asarray(pf[k]), np.asarray(pc[k]),
                                       rtol=2e-5, atol=2e-6)

    def test_clip_inactive_below_threshold(self):
        fused, chained, params = self._setup(clip=1e9)
        grads = {k: jnp.ones_like(v) * 0.01 for k, v in params.items()}
        sf = fused.init(params)
        uf, _ = fused.update(grads, sf, params)
        sc = chained.init(params)
        uc, _ = chained.update(grads, sc, params)
        for k in params:
            np.testing.assert_allclose(np.asarray(uf[k]), np.asarray(uc[k]),
                                       rtol=2e-6, atol=1e-7)

    def test_bf16_state_dtypes(self):
        """Moments and updates stay in the param dtype (bf16 DiT parity)."""
        import optax
        from genhancer_tpu.train import optim as O
        fused = O.fused_adamw_clip(optax.constant_schedule(1e-3))
        params = {"w": jnp.ones((4, 4), jnp.bfloat16)}
        st = fused.init(params)
        assert st.mu["w"].dtype == jnp.bfloat16
        upd, st2 = fused.update({"w": jnp.ones((4, 4), jnp.bfloat16)}, st, params)
        assert upd["w"].dtype == jnp.bfloat16
        assert st2.nu["w"].dtype == jnp.bfloat16
        assert int(st2.count) == 1

    def test_make_optimizer_fused_default_trains(self):
        from genhancer_tpu.train import optim as O
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
        import optax
        opt = O.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        params = {"w": jnp.ones((4,), jnp.float32)}
        st = opt.init(params)
        # quadratic bowl: loss = |p|^2 must shrink (default lr is 1e-4, so
        # expect ~50 * lr of signed movement, not convergence)
        start = float(jnp.sum(params["w"] ** 2))
        for _ in range(50):
            g = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
            upd, st = opt.update(g, st, params)
            params = optax.apply_updates(params, upd)
        end = float(jnp.sum(params["w"] ** 2))
        assert end < start - 2 * 40 * 1e-4  # moved decisively downhill
