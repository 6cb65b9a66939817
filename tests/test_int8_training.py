"""SwitchBack int8 linear (core.quant.switchback_linear) and the Pallas
fused AdamW (core.pallas.adamw / train.optim.pallas_adamw_clip).

SwitchBack (arXiv:2304.13013): forward + input-grad on the int8 MXU, weight
grad in bf16.  These tests pin (a) forward ~= bf16 within dynamic-quant
noise, (b) dW exactly matches the unquantized formula g^T x, (c) dx is the
quantized estimate with high cosine similarity to the true dx, and (d) the
Pallas optimizer reproduces the optax chain bit-for-bit within fp tolerance
across several steps, including the global-norm clip path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from genhancer_tpu.core import nn, quant
from genhancer_tpu.core.pallas import adamw as adamw_k

adamw_k._INTERPRET = True


class TestSwitchback:
    def _setup(self, m=33, k=256, n=192, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(n, k)) * 0.05, jnp.float32)
        return x, w

    def test_forward_close_to_exact(self):
        x, w = self._setup()
        y = quant.switchback_linear(x, w)
        ref = x @ w.T
        rel = np.abs(np.asarray(y - ref)) / (np.abs(np.asarray(ref)).mean() + 1e-6)
        assert rel.mean() < 0.02, rel.mean()

    def test_dw_exact_dx_close(self):
        x, w = self._setup(seed=1)
        g_out = jnp.asarray(np.random.default_rng(2).normal(
            size=(x.shape[0], w.shape[0])), jnp.float32)

        def f(x_, w_):
            return jnp.sum(quant.switchback_linear(x_, w_) * g_out)

        dx, dw = jax.grad(f, argnums=(0, 1))(x, w)
        # dW is the bf16/f32 path: exactly g^T x (no quantization)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(g_out.T @ x),
                                   rtol=1e-5, atol=1e-5)
        # dx is int8-quantized: check direction, not bits
        dx_true = np.asarray(g_out @ w)
        dxn = np.asarray(dx).ravel()
        cos = float(dxn @ dx_true.ravel()
                    / (np.linalg.norm(dxn) * np.linalg.norm(dx_true.ravel()) + 1e-12))
        assert cos > 0.999, cos
        rel = np.abs(dxn - dx_true.ravel()).mean() / (np.abs(dx_true).mean() + 1e-12)
        assert rel < 0.03, rel

    def test_ctx_routes_large_linears_only(self):
        rng = np.random.default_rng(3)
        big = {"weight": jnp.asarray(rng.normal(size=(512, 512)) * 0.05, jnp.float32)}
        small = {"weight": jnp.asarray(rng.normal(size=(64, 512)) * 0.05, jnp.float32)}
        x = jnp.asarray(rng.normal(size=(8, 512)), jnp.float32)
        exact_big = x @ big["weight"].T
        exact_small = x @ small["weight"].T
        with nn.int8_training_ctx(min_dim=512):
            y_big = nn.linear(big, x)
            y_small = nn.linear(small, x)
        # outside the ctx: exact again
        y_big_out = nn.linear(big, x)
        assert not np.allclose(np.asarray(y_big), np.asarray(exact_big), atol=1e-6)
        np.testing.assert_allclose(np.asarray(y_small), np.asarray(exact_small),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y_big_out), np.asarray(exact_big),
                                   rtol=1e-5, atol=1e-5)
        rel = np.abs(np.asarray(y_big - exact_big)).mean() / (
            np.abs(np.asarray(exact_big)).mean() + 1e-12)
        assert rel < 0.02, rel

    def test_dit_int8_step_trains_and_tracks_bf16(self):
        """Tiny-DiT stage-1 with dit_quant=int8: finite loss, identical to
        the unquantized loss on the same batch/key — every linear sits below
        the 512 SWITCHBACK_MIN_DIM gate, so the ctx must be perfectly inert.
        (Miniature 1+1-block graph: the same property held at flux-debug
        scale but cost 176 s of single-CPU compile for no extra coverage.)"""
        from genhancer_tpu.tasks import image as image_task
        from genhancer_tpu.models import dit as dit_m, vae as vae_m
        from genhancer_tpu.models.towers import clip as clip_m
        from genhancer_tpu.train import optim
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

        dit_cfg = dit_m.DiTConfig(in_channels=16, vec_in_dim=24,
                                  context_in_dim=32, hidden_size=64,
                                  num_heads=4, depth=1, depth_single_blocks=1,
                                  axes_dim=(4, 6, 6))
        vae_cfg = vae_m.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2),
                                  num_res_blocks=1, z_channels=4)
        tower_cfg = clip_m.CLIPConfig(
            vision=clip_m.CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                           num_layers=1, num_heads=2,
                                           image_size=28, patch_size=14),
            text=clip_m.CLIPTextConfig(hidden_size=32, intermediate_size=64,
                                       num_layers=1, num_heads=2, vocab_size=50,
                                       max_position_embeddings=8),
            projection_dim=24)

        opt = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        batch = {"image": jnp.asarray(
            np.random.default_rng(0).random((2, 32, 32, 3), np.float32))}

        losses = {}
        for q in ("none", "int8"):
            spec = image_task.TaskSpec(
                stage="stage1", tower_kind="clip", img_size=32,
                clip_image_size=28, dit_cfg=dit_cfg, vae_cfg=vae_cfg,
                tower_cfg=tower_cfg, clip_dim=24, t5_dim=32,
                compute_dtype=jnp.float32, dit_param_dtype=jnp.float32,
                dit_quant=q)
            state = image_task.create_task_state(jax.random.key(0), spec, opt)
            step = image_task.make_train_step(spec, opt)
            state, m = step(state, batch, jax.random.key(7))
            losses[q] = float(m["loss"])
            assert np.isfinite(losses[q])
        # all linears are < the 512 gate, so the int8 ctx is a no-op —
        # identical loss proves the plumbing is inert when no layer qualifies
        assert losses["int8"] == pytest.approx(losses["none"], rel=1e-6)


class TestPallasAdamW:
    def _tree(self, seed=0):
        rng = np.random.default_rng(seed)
        return {
            # pallas path: size % 1024 == 0, >= 8 tiles
            "w1": jnp.asarray(rng.normal(size=(32, 1024)) * 0.1, jnp.float32),
            # bf16 leaf on the pallas path
            "w2": jnp.asarray(rng.normal(size=(16, 2048)) * 0.1, jnp.bfloat16),
            # xla fallback path (odd size)
            "b": jnp.asarray(rng.normal(size=(37,)) * 0.1, jnp.float32),
        }

    def _grads(self, params, seed):
        rng = np.random.default_rng(seed)
        return jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), p.dtype), params)

    @pytest.mark.parametrize("gscale", [1.0, 50.0])  # no-clip and clip regimes
    def test_matches_optax_chain(self, gscale):
        from genhancer_tpu.train.optim import pallas_adamw_clip
        from genhancer_tpu.train.state import TrainState, apply_gradients

        schedule = optax.constant_schedule(1e-3)
        kw = dict(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
        ours = pallas_adamw_clip(schedule, max_grad_norm=1.0, **kw)
        ref = optax.chain(optax.clip_by_global_norm(1.0),
                          optax.adamw(learning_rate=schedule, **kw))

        p_ours = self._tree()
        p_ref = self._tree()
        st_ours = TrainState(trainable=p_ours, frozen={},
                             opt_state=ours.init(p_ours),
                             step=jnp.zeros((), jnp.int32))
        st_ref = TrainState(trainable=p_ref, frozen={},
                            opt_state=ref.init(p_ref),
                            step=jnp.zeros((), jnp.int32))

        for i in range(4):
            g = jax.tree_util.tree_map(
                lambda x: x * gscale, self._grads(p_ours, 100 + i))
            st_ours = apply_gradients(st_ours, g, ours)
            st_ref = apply_gradients(st_ref, g, ref)

        for k in p_ours:
            a = np.asarray(st_ours.trainable[k], np.float32)
            b = np.asarray(st_ref.trainable[k], np.float32)
            tol = 2e-2 if st_ours.trainable[k].dtype == jnp.bfloat16 else 2e-5
            np.testing.assert_allclose(a, b, rtol=tol, atol=tol,
                                       err_msg=f"leaf {k} gscale {gscale}")


class TestSwitchbackFull:
    """int8 dW variant: per-channel scale factoring is exact; dW tracks the
    true g^T x closely in direction and magnitude."""

    def _setup(self, m=64, k=256, n=192, seed=5):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(n, k)) * 0.05, jnp.float32)
        g = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
        return x, w, g

    def test_forward_matches_switchback(self):
        x, w, _ = self._setup()
        np.testing.assert_array_equal(
            np.asarray(quant.switchback_linear_full(x, w)),
            np.asarray(quant.switchback_linear(x, w)))

    def test_dw_int8_close_to_exact(self):
        x, w, g = self._setup()

        def f(x_, w_):
            return jnp.sum(quant.switchback_linear_full(x_, w_) * g)

        dx, dw = jax.grad(f, argnums=(0, 1))(x, w)
        dw_true = np.asarray(g.T @ x)
        dwn = np.asarray(dw)
        cos = float(dwn.ravel() @ dw_true.ravel()
                    / (np.linalg.norm(dwn) * np.linalg.norm(dw_true) + 1e-12))
        assert cos > 0.999, cos
        rel = np.abs(dwn - dw_true).mean() / (np.abs(dw_true).mean() + 1e-12)
        assert rel < 0.03, rel

    def test_dx_scale_folding_matches_direct_quant_error_level(self):
        """The bwd reuses the fwd's axis-0 quantized W by folding ws into g;
        the dx error must stay at dynamic-quant levels vs the true g @ W."""
        for sb in (quant.switchback_linear, quant.switchback_linear_full):
            x, w, g = self._setup(seed=7)

            def f(x_):
                return jnp.sum(sb(x_, w) * g)

            dx = jax.grad(f)(x)
            dx_true = np.asarray(g @ w)
            rel = (np.abs(np.asarray(dx) - dx_true).mean()
                   / (np.abs(dx_true).mean() + 1e-12))
            assert rel < 0.03, (sb.__name__, rel)

    def test_int8_full_loss_tracks_bf16_over_steps(self):
        """flux-debug DiT params lowered to 512-wide? flux-debug linears are
        256-wide so the ctx gate (512) never fires; instead drive the ctx
        directly over a small 2-layer MLP regression and check the loss
        curves of exact vs int8 vs int8_full stay close over 60 steps."""
        import optax
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.normal(size=(256, 512)), jnp.float32)
        w_true = rng.normal(size=(512, 512)) * 0.05
        ys = jnp.asarray(xs @ w_true.T + 0.01 * rng.normal(size=(256, 512)),
                         jnp.float32)

        def init():
            return {
                "l1": {"weight": jnp.asarray(rng.normal(size=(512, 512)) * 0.03,
                                             jnp.float32)},
                "l2": {"weight": jnp.asarray(rng.normal(size=(512, 512)) * 0.03,
                                             jnp.float32)},
            }

        def run(mode):
            params = init()
            opt = optax.adam(1e-3)
            ost = opt.init(params)

            def loss_fn(p):
                import contextlib
                ctx = (nn.int8_training_ctx(full=mode == "full")
                       if mode != "none" else contextlib.nullcontext())
                with ctx:
                    h = jax.nn.gelu(nn.linear(p["l1"], xs))
                    out = nn.linear(p["l2"], h)
                return jnp.mean((out - ys) ** 2)

            @jax.jit
            def step(p, o):
                l, g = jax.value_and_grad(loss_fn)(p)
                u, o = opt.update(g, o, p)
                return optax.apply_updates(p, u), o, l

            losses = []
            for _ in range(60):
                params, ost, l = step(params, ost)
                losses.append(float(l))
            return losses

        ref = run("none")
        for mode in ("int8", "full"):
            got = run(mode)
            # same order of magnitude, same downward trajectory
            assert got[-1] < ref[0] * 0.8, (mode, got[-1], ref[0])
            assert abs(got[-1] - ref[-1]) / ref[-1] < 0.15, (mode, got[-1], ref[-1])


class TestCachedSwitchback:
    """Optimizer-fused weight quantization (VERDICT r2 #1b): the cached path
    ``switchback_linear_cached(x, w, *quantize_weight(w))`` must be
    bit-identical to ``switchback_linear(x, w)`` in forward and gradients,
    and the Pallas AdamW kernel's emitted cache must equal
    ``quantize_weight`` of the stored master."""

    def test_cached_matches_fresh_fwd_and_grads(self):
        from genhancer_tpu.core import quant
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 96, 512)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(640, 512)) * 0.05, jnp.float32)
        wq, ws = quant.quantize_weight(w, axis=0)
        ws1 = ws[:, 0]

        y_fresh = quant.switchback_linear(x, w)
        y_cached = quant.switchback_linear_cached(x, w, wq, ws1)
        np.testing.assert_array_equal(np.asarray(y_fresh), np.asarray(y_cached))

        def loss_fresh(x, w):
            return jnp.sum(quant.switchback_linear(x, w) ** 2)

        def loss_cached(x, w):
            return jnp.sum(quant.switchback_linear_cached(x, w, wq, ws1) ** 2)

        gx1, gw1 = jax.grad(loss_fresh, argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(loss_cached, argnums=(0, 1))(x, w)
        np.testing.assert_array_equal(np.asarray(gx1), np.asarray(gx2))
        np.testing.assert_array_equal(np.asarray(gw1), np.asarray(gw2))

    def test_full_cached_matches_fresh_fwd_and_grads(self):
        """switchback_linear_full_cached == switchback_linear_full when the
        cache holds quantize_weight(w) — bit-exact fwd, dx and int8 dW."""
        from genhancer_tpu.core import quant
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 96, 512)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(640, 512)) * 0.05, jnp.float32)
        wq, ws = quant.quantize_weight(w, axis=0)
        ws1 = ws[:, 0]

        y_fresh = quant.switchback_linear_full(x, w)
        y_cached = quant.switchback_linear_full_cached(x, w, wq, ws1)
        np.testing.assert_array_equal(np.asarray(y_fresh), np.asarray(y_cached))

        def loss_fresh(x, w):
            return jnp.sum(quant.switchback_linear_full(x, w) ** 2)

        def loss_cached(x, w):
            return jnp.sum(
                quant.switchback_linear_full_cached(x, w, wq, ws1) ** 2)

        gx1, gw1 = jax.grad(loss_fresh, argnums=(0, 1))(x, w)
        gx2, gw2 = jax.grad(loss_cached, argnums=(0, 1))(x, w)
        np.testing.assert_array_equal(np.asarray(gx1), np.asarray(gx2))
        np.testing.assert_array_equal(np.asarray(gw1), np.asarray(gw2))

    def test_pallas_emitted_cache_matches_quantize_weight(self):
        from genhancer_tpu.core.pallas.adamw import fused_adamw_apply
        from genhancer_tpu.core import quant
        rng = np.random.default_rng(1)
        params = {"dit.x.weight": jnp.asarray(rng.normal(size=(64, 640)) * 0.1,
                                              jnp.bfloat16),
                  "dit.odd.weight": jnp.asarray(rng.normal(size=(40, 640)) * 0.1,
                                                jnp.float32)}
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), p.dtype), params)
        schedule = optax.constant_schedule(1e-3)
        new_p, _, _, qcache = fused_adamw_apply(
            params, mu, nu, grads, jnp.ones((), jnp.int32), schedule,
            quant_paths=tuple(params))
        assert set(qcache) == set(params)
        for k in params:
            wq_ref, ws_ref = quant.quantize_weight(new_p[k], axis=0)
            np.testing.assert_array_equal(np.asarray(qcache[k][0]),
                                          np.asarray(wq_ref))
            np.testing.assert_allclose(np.asarray(qcache[k][1]),
                                       np.asarray(ws_ref[:, 0]), rtol=1e-7)

    @pytest.mark.parametrize("dit_quant,stage", [
        # each parametrization is a separate ~60 s single-CPU XLA compile;
        # the default tier keeps the bench-default path (int8_full stage-1),
        # the other two run on --runslow (recorded each round in STATUS.md)
        pytest.param("int8", "stage1", marks=pytest.mark.slow),
        ("int8_full", "stage1"),
        # stage2_all trains the DiT too, so the optimizer-emitted cache
        # applies there (the measured -6% step, configs/tpu_fast_stage2_all)
        pytest.param("int8_full", "stage2_all", marks=pytest.mark.slow)])
    def test_step_with_cache_matches_fresh_quant_step(self, dit_quant, stage):
        """End-to-end: N steps with the state-threaded cache == N steps with
        in-forward quantization (the pre-cache implementation)."""
        from genhancer_tpu.models import dit as dit_m, vae as vae_m
        from genhancer_tpu.models.towers import clip as clip_m
        from genhancer_tpu.tasks import image as image_task
        from genhancer_tpu.train import optim
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
        from genhancer_tpu.train.state import create_state
        from genhancer_tpu.tasks.image import init_modules, trainable_predicate

        # hidden 512 linears qualify for switchback (min_dim gate)
        dit_cfg = dit_m.DiTConfig(in_channels=16, vec_in_dim=24,
                                  context_in_dim=32, hidden_size=512,
                                  num_heads=4, depth=1, depth_single_blocks=1,
                                  axes_dim=(32, 48, 48))
        vae_cfg = vae_m.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2),
                                  z_channels=4)   # packed 2x2 -> in_channels 16
        tower_cfg = clip_m.CLIPConfig(
            vision=clip_m.CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                           num_layers=1, num_heads=2,
                                           image_size=28, patch_size=14),
            text=clip_m.CLIPTextConfig(hidden_size=32, intermediate_size=64,
                                       num_layers=1, num_heads=2, vocab_size=50,
                                       max_position_embeddings=8),
            projection_dim=24)
        spec = image_task.TaskSpec(
            stage=stage, tower_kind="clip", img_size=32, clip_image_size=28,
            dit_cfg=dit_cfg, vae_cfg=vae_cfg, tower_cfg=tower_cfg,
            clip_dim=24, t5_dim=32, lora_r=2,
            lora_targets=("q_proj", "v_proj"), compute_dtype=jnp.float32,
            dit_param_dtype=jnp.float32, dit_quant=dit_quant,
            dit_quant_cache=True)
        opt = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        rng = np.random.default_rng(3)
        batch = {"image": jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)}
        step = image_task.make_train_step(spec, opt)

        # cached: create_task_state fills the cache (dit_quant == int8)
        st_c = image_task.create_task_state(jax.random.key(0), spec, opt)
        assert st_c.quant, f"cache expected for dit_quant={dit_quant}"
        # fresh: same modules, no cache -> in-forward quantization
        modules = init_modules(jax.random.key(0), spec)
        st_f = create_state(modules, trainable_predicate(spec, modules), opt)
        assert st_f.quant is None

        # The two paths are bit-equal in eager math (test above); inside jit
        # XLA strength-reduces the fresh path's w/scale division to a
        # reciprocal multiply, flipping borderline int8 rounding by one ulp.
        # Step 0 (same params) must match to quantization-noise tolerance;
        # later steps amplify the ulp chaotically, so only require tracking.
        losses_c, losses_f = [], []
        for i in range(3):
            k = jax.random.key(50 + i)
            st_c, m_c = step(st_c, batch, k)
            st_f, m_f = step(st_f, batch, k)
            losses_c.append(float(m_c["loss"]))
            losses_f.append(float(m_f["loss"]))
        assert losses_c[0] == pytest.approx(losses_f[0], rel=5e-4)
        for a, b in zip(losses_c, losses_f):
            assert np.isfinite(a) and np.isfinite(b)
            assert a == pytest.approx(b, rel=2e-2)
