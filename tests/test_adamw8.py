"""8-bit (log-coded) Adam moments in the fused Pallas AdamW.

Covers the moment code itself (range/relative-error/zero-sentinel contracts),
the kernel update vs an XLA-composed reference (interpret mode on CPU), the
optimizer-level semantics vs dense-moment AdamW on a toy problem, and the
state-structure integrations (checkpoint round-trip, init eligibility).
TPU analog of 8-bit Adam (arXiv:2110.02861); design notes in
core/pallas/adamw.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.core.pallas import adamw as pa
from genhancer_tpu.train import optim
from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS


class TestMomentCode:
    def test_v_roundtrip_relative_error(self, rng):
        # spans 7.5 orders of magnitude within a row — inside the code's
        # 2^-31.5 (~1e-9.5) relative range, where error is bounded by the
        # log-rounding step
        v = jnp.asarray(10.0 ** rng.uniform(-9.5, -2, (8, 256)), jnp.float32)
        q, s = pa.m8_encode_v(v)
        dec = pa.m8_decode_v(q, s)
        rel = np.abs(np.asarray(dec) / np.asarray(v) - 1.0)
        assert rel.max() <= 2 ** (1 / (2 * pa.MOMENT8_K)) - 1 + 1e-3  # 9.05%

    def test_v_below_range_clamps_up(self, rng):
        """Ratios below 2^-31.5 decode to the bottom of the range (an
        overestimate — Adam's sqrt(v) denominator gets larger, the update
        smaller: the safe direction for dead parameters)."""
        v = jnp.asarray([[1.0] + [1e-30] * 255], jnp.float32)
        dec = np.asarray(pa.m8_decode_v(*pa.m8_encode_v(v)))
        assert dec[0, 0] == 1.0
        assert (dec[0, 1:] >= 1e-30).all()
        np.testing.assert_allclose(dec[0, 1:], 2.0 ** (-126 / pa.MOMENT8_K),
                                   rtol=1e-5)

    def test_m_roundtrip_relative_error(self, rng):
        m = jnp.asarray(rng.standard_normal((8, 256))
                        * 10.0 ** rng.uniform(-6, 0, (8, 256)), jnp.float32)
        q, s = pa.m8_encode_m(m)
        dec = pa.m8_decode_m(q, s)
        rel = np.abs(np.asarray(dec) - np.asarray(m)) / np.abs(np.asarray(m))
        assert rel.max() <= 2 ** (1 / (2 * pa.MOMENT8_K)) - 1 + 1e-3

    def test_zero_sentinels_exact(self):
        z = jnp.zeros((4, 128), jnp.float32)
        qv, sv = pa.m8_encode_v(z)
        qm, sm = pa.m8_encode_m(z)
        assert (np.asarray(pa.m8_decode_v(qv, sv)) == 0).all()
        assert (np.asarray(pa.m8_decode_m(qm, sm)) == 0).all()
        # zero-init helpers decode to exact zero too
        p = jnp.ones((32, 128))
        assert (np.asarray(pa.m8_decode_m(*pa.moment8_zeros_m(p))) == 0).all()
        assert (np.asarray(pa.m8_decode_v(*pa.moment8_zeros_v(p))) == 0).all()

    def test_out_of_range_small_values_clamp_not_nan(self, rng):
        # ratio below 2^-31.75 clips to the bottom code, never NaN/inf
        v = jnp.asarray([[1.0, 1e-30, 0.0, 1e-15] + [1e-3] * 124], jnp.float32)
        dec = np.asarray(pa.m8_decode_v(*pa.m8_encode_v(v)))
        assert np.isfinite(dec).all() and dec.min() >= 0

    def test_sign_preserved(self, rng):
        m = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
        dec = np.asarray(pa.m8_decode_m(*pa.m8_encode_m(m)))
        np.testing.assert_array_equal(np.sign(dec), np.sign(np.asarray(m)))


def _reference_update8(p, m8, v8, g, scalars, b1, b2, eps, wd):
    """XLA composition of the exact kernel math (decode->AdamW->encode)."""
    scale, lr, inv_bc1, inv_bc2 = [scalars[i] for i in range(4)]
    gf = g.astype(jnp.float32) * scale
    m = b1 * pa.m8_decode_m(m8.q, m8.s) + (1 - b1) * gf
    v = b2 * pa.m8_decode_v(v8.q, v8.s) + (1 - b2) * gf * gf
    pf = p.astype(jnp.float32)
    pf = pf - lr * (m * inv_bc1 / (jnp.sqrt(v * inv_bc2) + eps) + wd * pf)
    return pf.astype(p.dtype), pa.m8_encode_m(m), pa.m8_encode_v(v)


class TestKernel:
    def _args(self, rng, rows=64, cols=1024, dtype=jnp.bfloat16):
        p = jnp.asarray(rng.standard_normal((rows, cols)) * 0.02, dtype)
        g = jnp.asarray(rng.standard_normal((rows, cols)) * 1e-3, dtype)
        m8 = pa.Moment8(*pa.m8_encode_m(
            jnp.asarray(rng.standard_normal((rows, cols)) * 1e-3, jnp.float32)))
        v8 = pa.Moment8(*pa.m8_encode_v(
            jnp.asarray(10.0 ** rng.uniform(-10, -4, (rows, cols)), jnp.float32)))
        scalars = jnp.asarray([1.0, 1e-3, 1.1, 1.05], jnp.float32)
        return p, m8, v8, g, scalars

    def test_kernel_matches_reference(self, rng):
        p, m8, v8, g, scalars = self._args(rng)
        kw = dict(b1=0.9, b2=0.999, eps=1e-8, wd=0.01)
        new_p, nm, nv = pa._update_leaf_pallas8(p, m8, v8, g, scalars, **kw)
        rp, (rmq, rms), (rvq, rvs) = _reference_update8(
            p, m8, v8, g, scalars, 0.9, 0.999, 1e-8, 0.01)
        np.testing.assert_allclose(np.asarray(new_p, np.float32),
                                   np.asarray(rp, np.float32), atol=1e-6)
        # the encode's log2 cubic can evaluate with different FMA contraction
        # in Mosaic vs fused XLA, flipping exact-.5 rounding ties — allow
        # off-by-one codes at a vanishing rate (same contract as the quant
        # emission below; one code step is a 9% relative perturbation on a
        # quantity whose representation error is already 9%)
        for got, want in ((nm.q, rmq), (nv.q, rvq)):
            diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
            assert diff.max() <= 1
            assert (diff > 0).mean() < 1e-3
        np.testing.assert_allclose(np.asarray(nm.s), np.asarray(rms), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(nv.s), np.asarray(rvs), rtol=1e-6)

    def test_kernel_quant_emission(self, rng):
        from genhancer_tpu.core.quant import quantize_weight
        p, m8, v8, g, scalars = self._args(rng)
        kw = dict(b1=0.9, b2=0.999, eps=1e-8, wd=0.01)
        new_p, _, _, wq, ws = pa._update_leaf_pallas8(p, m8, v8, g, scalars,
                                                      quant=True, **kw)
        rq, rs = quantize_weight(new_p, axis=0)
        # XLA may fuse the in-kernel divide as multiply-by-reciprocal, which
        # can flip exact-.5 rounding ties — allow off-by-one codes at a
        # vanishing rate (the fwd/bwd loss-parity tests in test_int8_training
        # bound the semantic effect)
        diff = np.abs(np.asarray(wq, np.int32) - np.asarray(rq, np.int32))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3
        np.testing.assert_allclose(np.asarray(ws), np.asarray(rs), rtol=1e-6)

    def test_first_step_from_zero_init_matches_dense(self, rng):
        """With zero moments, step 1 must match dense AdamW almost exactly:
        m = (1-b1) g and v = (1-b2) g^2 are encode(decode(...)) of fresh
        values, and the p update is computed BEFORE the encode."""
        rows, cols = 64, 1024
        p = jnp.asarray(rng.standard_normal((rows, cols)) * 0.02, jnp.float32)
        g = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float32)
        scalars = jnp.asarray([1.0, 1e-3, 10.0, 1000.0], jnp.float32)
        kw = dict(b1=0.9, b2=0.999, eps=1e-8, wd=0.0)
        new_p, _, _ = pa._update_leaf_pallas8(
            p, pa.moment8_zeros_m(p), pa.moment8_zeros_v(p), g, scalars, **kw)
        ref_p, _, _ = pa._update_leaf_xla(p, jnp.zeros_like(p),
                                          jnp.zeros_like(p), g, scalars,
                                          0.9, 0.999, 1e-8, 0.0)
        np.testing.assert_allclose(np.asarray(new_p), np.asarray(ref_p),
                                   atol=1e-7)


class TestOptimizer:
    def _run(self, moment_bits, steps=60):
        """Noisy least-squares: w [64, 1024] toward a fixed target."""
        rng = np.random.default_rng(7)
        target = jnp.asarray(rng.standard_normal((64, 1024)) * 0.05, jnp.float32)
        params = {"w": jnp.zeros((64, 1024), jnp.float32)}
        cfg = Config(dict(TRAIN_DEFAULTS, learning_rate=3e-3,
                          fused_optimizer="pallas"))
        opt = optim.make_optimizer(cfg, moment_bits=moment_bits)
        state = opt.init(params)

        @jax.jit
        def step(params, state, key):
            def loss(p):
                noise = 0.1 * jax.random.normal(key, p["w"].shape)
                return jnp.mean((p["w"] - target + noise) ** 2)
            l, g = jax.value_and_grad(loss)(params)
            updates, state2 = opt.update(g, state, params)
            return updates.params, state2, l

        for i in range(steps):
            params, state, l = step(params, state, jax.random.key(i))
        final = float(jnp.mean((params["w"] - target) ** 2))
        return final, state

    def test_converges_like_dense(self):
        f8, st8 = self._run(8)
        f16, _ = self._run(16)
        # 8-bit moments must track dense closely on this convex problem
        assert f8 < 2.0 * f16 + 1e-6, (f8, f16)
        # and the state really is 8-bit
        assert isinstance(st8.mu["w"], pa.Moment8)
        assert st8.mu["w"].q.dtype == jnp.int8

    def test_requires_pallas_backend(self):
        cfg = Config(dict(TRAIN_DEFAULTS, optimizer_moment_bits=8))
        with pytest.raises(ValueError, match="pallas"):
            optim.make_optimizer(cfg)

    def test_small_leaves_stay_dense(self):
        cfg = Config(dict(TRAIN_DEFAULTS, fused_optimizer="pallas"))
        opt = optim.make_optimizer(cfg, moment_bits=8)
        params = {"big": jnp.zeros((64, 1024)), "bias": jnp.zeros((64, 3))}
        st = opt.init(params)
        assert isinstance(st.mu["big"], pa.Moment8)
        assert not isinstance(st.mu["bias"], pa.Moment8)
        # one mixed-leaf update runs
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = opt.update(g, st, params)
        assert updates.params["bias"].shape == (64, 3)


class TestIntegration:
    def test_train_state_checkpoint_roundtrip(self, tmp_path):
        """Moment8 leaves survive the positional optimizer-state .bin."""
        from genhancer_tpu.train import checkpoint as ckpt
        from genhancer_tpu.train.state import TrainState
        cfg = Config(dict(TRAIN_DEFAULTS, fused_optimizer="pallas"))
        opt = optim.make_optimizer(cfg, moment_bits=8)
        params = {"w": jnp.asarray(np.random.default_rng(0)
                                   .standard_normal((64, 1024)), jnp.float32)}
        st = TrainState(trainable=params, frozen={}, opt_state=opt.init(params),
                        step=jnp.zeros((), jnp.int32))
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, opt_state = opt.update(g, st.opt_state, params)
        st = TrainState(trainable=updates.params, frozen={},
                        opt_state=opt_state, step=st.step + 1)
        path = str(tmp_path / "optimizer-state-1.bin")
        ckpt.save_optimizer_state(st, path)
        fresh = TrainState(trainable=params, frozen={},
                           opt_state=opt.init(params),
                           step=jnp.zeros((), jnp.int32))
        loaded = ckpt.load_optimizer_state(fresh, path)
        for got, want in zip(jax.tree_util.tree_leaves(loaded.opt_state),
                             jax.tree_util.tree_leaves(st.opt_state)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_zero1_sharding_places_moment8(self):
        from genhancer_tpu.parallel import mesh as mesh_m
        mesh = mesh_m.make_mesh()
        cfg = Config(dict(TRAIN_DEFAULTS, fused_optimizer="pallas"))
        opt = optim.make_optimizer(cfg, moment_bits=8)
        params = {"w": jnp.zeros((64, 1024), jnp.float32)}
        st = opt.init(params)
        sharded = mesh_m.shard_over_data(st, mesh)
        q = sharded.mu["w"].q
        assert q.sharding.spec[0] is not None  # leading axis sharded
