"""stack_microbatches normalization: ragged epoch-boundary groups must keep
the validity mask and never feed np.stack ragged shapes (code-review r2
finding: a padded partial final batch either crashed the stack or silently
dropped 'valid', training on zero pad rows unmasked)."""
import numpy as np
import pytest

from genhancer_tpu.train.step_utils import (make_accum_train_step,
                                            stack_microbatches)


def _b(n, valid=None):
    out = {"image": np.random.default_rng(n).random((n, 4, 4, 3)).astype(np.float32)}
    if valid is not None:
        out["valid"] = np.asarray(valid, bool)
    return out


class TestStackMicrobatches:
    def test_uniform_group_passthrough(self):
        s = stack_microbatches([_b(8), _b(8)])
        assert s["image"].shape == (2, 8, 4, 4, 3)
        assert "valid" not in s

    def test_partial_batch_with_mask_keeps_mask_everywhere(self):
        full = _b(8)
        partial = _b(8, valid=[True] * 5 + [False] * 3)  # padded by loader
        s = stack_microbatches([full, partial])
        assert s["valid"].shape == (2, 8)
        assert s["valid"][0].all()                      # synthesized all-True
        assert s["valid"][1].tolist() == [True] * 5 + [False] * 3

    def test_ragged_sizes_padded_with_false_mask(self):
        s = stack_microbatches([_b(8), _b(6)])
        assert s["image"].shape == (2, 8, 4, 4, 3)
        assert s["valid"][0].all()
        assert s["valid"][1].tolist() == [True] * 6 + [False] * 2
        # pad rows are zeros
        assert (s["image"][1, 6:] == 0).all()

    def test_missing_non_mask_key_raises(self):
        a = _b(4)
        b = dict(_b(4), cond=np.zeros((4, 2), np.float32))
        with pytest.raises(ValueError, match="missing keys"):
            stack_microbatches([b, a])


class TestAccumQuantThreading:
    """code-review r3 finding: the accumulation step called loss_fn without
    state.quant, so the optimizer-maintained int8 weight cache was silently
    never consumed under gradient_accumulation_steps >= 2 (numerics
    unchanged, but every forward paid the W re-quantization the cache
    exists to remove)."""

    def test_accum_step_passes_quant_to_loss(self):
        import jax
        import jax.numpy as jnp
        import optax
        from genhancer_tpu.train.state import TrainState, with_quant_cache

        tr = {"dit.blk.weight": jnp.ones((512, 512), jnp.bfloat16) * 0.01}
        opt = optax.sgd(1e-3)
        state = TrainState(trainable=tr, frozen={}, opt_state=opt.init(tr),
                           step=jnp.zeros((), jnp.int32))
        state = with_quant_cache(state)
        assert state.quant, "cache fixture must engage the quant path"

        seen = {}

        def loss_fn(tp, frozen, micro, key, quant=None):
            seen["quant_is_none"] = quant is None
            w = tp["dit.blk.weight"].astype(jnp.float32)
            return jnp.mean(w) * jnp.mean(micro["x"])

        step = make_accum_train_step(loss_fn, opt, 2)
        batch = {"x": np.ones((2, 4), np.float32)}
        new_state, _ = step(state, batch, jax.random.key(0))
        assert seen["quant_is_none"] is False
        # apply_gradients refreshed the cache for the next step
        assert new_state.quant is not None


class TestAccumDtype:
    """grad_accum_dtype=param: the accumulator lives in each param's own
    dtype (bf16 for bf16 params — torch-DDP-under-bf16 grad-bucket
    semantics, half the accumulator HBM). Must track the f32 accumulator
    within bf16 rounding on a real multi-micro-step update."""

    def _run(self, accum_dtype):
        import jax
        import jax.numpy as jnp
        import optax
        from genhancer_tpu.train.state import TrainState

        tr = {"w": (jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
                    / 7.0).astype(jnp.bfloat16)}
        opt = optax.sgd(1e-1)
        state = TrainState(trainable=tr, frozen={}, opt_state=opt.init(tr),
                           step=jnp.zeros((), jnp.int32))

        def loss_fn(tp, frozen, micro, key, quant=None):
            w = tp["w"].astype(jnp.float32)
            return jnp.mean((w @ micro["x"].T) ** 2)

        step = make_accum_train_step(loss_fn, opt, 4,
                                     accum_dtype=accum_dtype)
        x = np.stack([np.full((2, 4), 0.1 * (i + 1), np.float32)
                      for i in range(4)])
        new_state, m = step(state, {"x": x}, jax.random.key(0))
        return np.asarray(new_state.trainable["w"], np.float32), float(m["loss"])

    def test_param_dtype_accumulator_tracks_f32(self):
        w_f32, l_f32 = self._run(None)          # trainer's 'param' mapping
        import jax.numpy as jnp
        w_ref, l_ref = self._run(jnp.float32)   # default-safe accumulator
        assert np.isfinite(l_f32) and l_f32 == pytest.approx(l_ref, rel=1e-5)
        # one bf16 ulp (~2^-8 rel) per element of slack
        np.testing.assert_allclose(w_f32, w_ref, rtol=1.5 / 256, atol=1e-4)
        # and the update actually moved the params
        w0 = (np.arange(12, dtype=np.float32).reshape(3, 4) / 7.0)
        assert np.abs(w_f32 - w0.astype(np.float32)).max() > 1e-4


class TestUnrollScanParity:
    """make_accum_train_step lowers small accum as straight-line unroll
    (first micro's grads ARE the accumulator; 1/accum folded into the
    loss) and large accum as lax.scan — the two must produce the same
    update and metrics, including non-power-of-two accum."""

    def _run(self, unroll_below, accum):
        import jax
        import jax.numpy as jnp
        import optax
        from genhancer_tpu.train.state import TrainState

        tr = {"w": (jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
                    / 7.0)}
        opt = optax.sgd(1e-1)
        state = TrainState(trainable=tr, frozen={}, opt_state=opt.init(tr),
                           step=jnp.zeros((), jnp.int32))

        def loss_fn(tp, frozen, micro, key, quant=None):
            return jnp.mean((tp["w"] @ micro["x"].T) ** 2)

        step = make_accum_train_step(loss_fn, opt, accum,
                                     unroll_below=unroll_below)
        x = np.stack([np.full((2, 4), 0.1 * (i + 1), np.float32)
                      for i in range(accum)])
        new_state, m = step(state, {"x": x}, jax.random.key(0))
        return (np.asarray(new_state.trainable["w"], np.float32),
                float(m["loss"]), float(m["grad_norm"]))

    @pytest.mark.parametrize("accum", [2, 3])
    def test_unrolled_matches_scan(self, accum):
        w_u, l_u, gn_u = self._run(accum + 1, accum)  # unrolled
        w_s, l_s, gn_s = self._run(1, accum)          # forced scan
        assert l_u == pytest.approx(l_s, rel=1e-6)
        assert gn_u == pytest.approx(gn_s, rel=1e-6)
        np.testing.assert_allclose(w_u, w_s, rtol=1e-6)


class TestAccumFusedMoment8:
    """The bench stage-2 memory recipe: lax.scan accumulation over the fused
    Pallas AdamW with 8-bit moments (optimizer_moment_bits: 8) — the combo
    must update params once per optimizer step and keep Moment8 state."""

    def test_accum_over_pallas_moment8(self):
        import jax
        import jax.numpy as jnp
        from genhancer_tpu.core.pallas import adamw as pa
        from genhancer_tpu.train import optim
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
        from genhancer_tpu.train.state import TrainState

        cfg = Config(dict(TRAIN_DEFAULTS, learning_rate=1e-2,
                          fused_optimizer="pallas"))
        opt = optim.make_optimizer(cfg, fused="pallas", moment_bits=8)
        tr = {"w": jnp.zeros((64, 1024), jnp.float32)}
        state = TrainState(trainable=tr, frozen={}, opt_state=opt.init(tr),
                           step=jnp.zeros((), jnp.int32))
        m8_leaves = [x for x in jax.tree_util.tree_leaves(
            state.opt_state, is_leaf=lambda x: isinstance(x, pa.Moment8))
            if isinstance(x, pa.Moment8)]
        assert m8_leaves, "expected Moment8 state for the 64x1024 leaf"

        def loss_fn(tp, frozen, micro, key, quant=None):
            return jnp.mean((tp["w"] - micro["t"]) ** 2)

        step = make_accum_train_step(loss_fn, opt, 2, accum_dtype=None)
        t = np.full((2, 64, 1024), 0.5, np.float32)
        new_state, m = step(state, {"t": t}, jax.random.key(0))
        assert np.isfinite(float(m["loss"]))
        w = np.asarray(new_state.trainable["w"])
        assert np.abs(w).max() > 0  # moved toward the target
