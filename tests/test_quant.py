"""int8 quantization (core.quant): numerics, STE gradients, tree surgery,
and the stage-1 int8 step (frozen tower/VAE on the v5e's 2x int8 MXU path —
see BASELINE.md "bf16 physical ceiling")."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.core import nn, quant


class TestQuantNumerics:
    def test_weight_roundtrip_error(self):
        w = jnp.asarray(np.random.default_rng(0).normal(size=(64, 128)),
                        jnp.float32)
        q, s = quant.quantize_weight(w, axis=0)
        assert q.dtype == jnp.int8 and s.shape == (64, 1)
        deq = q.astype(jnp.float32) * s
        err = np.abs(np.asarray(deq - w))
        # symmetric per-channel: error bounded by scale/2 per element
        assert (err <= np.asarray(s) / 2 + 1e-7).all()

    def test_linear_int8_close_to_fp32(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(96, 128)).astype(np.float32)
        b = rng.normal(size=(96,)).astype(np.float32)
        x = rng.normal(size=(4, 17, 128)).astype(np.float32)
        ref = x @ w.T + b
        q, s = quant.quantize_weight(jnp.asarray(w), axis=0)
        p = {"weight_q": q, "w_scale": s, "bias": jnp.asarray(b)}
        got = np.asarray(nn.linear(p, jnp.asarray(x)))
        rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-6)
        assert rel.mean() < 0.02, rel.mean()   # ~1% dynamic-quant noise

    def test_conv_int8_close_to_fp32(self):
        rng = np.random.default_rng(2)
        w = rng.normal(size=(3, 3, 32, 48)).astype(np.float32) * 0.1
        x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
        ref = np.asarray(nn.conv2d({"weight": jnp.asarray(w)}, jnp.asarray(x)))
        q, s = quant.quantize_weight(jnp.asarray(w), axis=3)
        got = np.asarray(nn.conv2d({"weight_q": q, "w_scale": s}, jnp.asarray(x)))
        rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-6)
        assert rel.mean() < 0.03, rel.mean()

    def test_ste_gradient_matches_dequant_matmul(self):
        """d x through the int8 layer must track g @ dequant(W), not vanish.
        The dx matmul itself runs on the int8 MXU (g row-quantized with the
        weight scales folded in — _int8_matmul_bwd), so the tolerance is the
        int8 dynamic-quant level, not bf16."""
        rng = np.random.default_rng(3)
        w = rng.normal(size=(24, 16)).astype(np.float32)
        x = jnp.asarray(rng.normal(size=(5, 16)).astype(np.float32))
        q, s = quant.quantize_weight(jnp.asarray(w), axis=0)
        p = {"weight_q": q, "w_scale": s}
        deq = np.asarray(q.astype(jnp.float32) * s)

        g = jax.grad(lambda x_: jnp.sum(nn.linear(p, x_) ** 2))(x)
        y = np.asarray(nn.linear(p, x))
        want = 2 * y @ deq
        scale = np.abs(want).max()
        np.testing.assert_allclose(np.asarray(g), want, rtol=0.03,
                                   atol=0.03 * scale)
        assert np.abs(np.asarray(g)).max() > 0

    def test_lora_composes_with_int8_base(self):
        rng = np.random.default_rng(4)
        w = rng.normal(size=(24, 16)).astype(np.float32)
        q, s = quant.quantize_weight(jnp.asarray(w), axis=0)
        A = rng.normal(size=(4, 16)).astype(np.float32)
        B = rng.normal(size=(24, 4)).astype(np.float32)
        x = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
        p = {"weight_q": q, "w_scale": s, "lora_A": jnp.asarray(A),
             "lora_B": jnp.asarray(B), "lora_scale": jnp.asarray(1.0)}
        base = np.asarray(nn.linear({"weight_q": q, "w_scale": s}, x))
        got = np.asarray(nn.linear(p, x))
        want = base + (np.asarray(x) @ A.T) @ B.T
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestTreeSurgery:
    def test_quantize_linear_tree_skips_small_and_lora(self):
        tree = {
            "big": {"weight": jnp.ones((128, 128)), "bias": jnp.zeros((128,))},
            "small": {"weight": jnp.ones((8, 8))},
            "wrapped": {"weight": jnp.ones((128, 128)),
                        "lora_A": jnp.ones((2, 128)),
                        "lora_B": jnp.zeros((128, 2)),
                        "lora_scale": jnp.asarray(1.0)},
            "embeddings": {"token_embedding": {"weight": jnp.ones((100, 128))}},
        }
        out = quant.quantize_linear_tree(tree)
        assert "weight_q" in out["big"] and "weight" not in out["big"]
        assert "weight" in out["small"]
        assert "weight" in out["wrapped"]          # LoRA-wrapped untouched
        assert "weight" in out["embeddings"]["token_embedding"]

    def test_quantize_lora_base_keeps_weight(self):
        """QLoRA surgery: int8 factors added ALONGSIDE the kept bf16 weight,
        on wrapped and unwrapped linears alike (stage-2 must merge + export
        the originals)."""
        rng = np.random.default_rng(11)
        tree = {
            "plain": {"weight": jnp.asarray(
                rng.normal(size=(128, 128)).astype(np.float32))},
            "small": {"weight": jnp.ones((8, 8))},
            "wrapped": {"weight": jnp.asarray(
                            rng.normal(size=(128, 128)).astype(np.float32)),
                        "lora_A": jnp.ones((2, 128)),
                        "lora_B": jnp.zeros((128, 2)),
                        "lora_scale": jnp.asarray(1.0)},
            "embeddings": {"token_embedding": {"weight": jnp.ones((100, 128))}},
        }
        out = quant.quantize_lora_base(tree)
        for name in ("plain", "wrapped"):
            assert "weight_q" in out[name] and "weight" in out[name], name
            deq = np.asarray(out[name]["weight_q"].astype(jnp.float32)
                             * out[name]["w_scale"])
            np.testing.assert_allclose(deq, np.asarray(out[name]["weight"]),
                                       atol=np.abs(deq).max() / 100)
        assert "weight_q" not in out["small"]
        assert "weight_q" not in out["embeddings"]["token_embedding"]

    def test_merge_drops_quant_factors(self):
        """train.lora.merge on a QLoRA tree must produce the same export as
        on the unquantized tree — no weight_q/w_scale anywhere."""
        from genhancer_tpu.train import lora as lora_m
        rng = np.random.default_rng(12)
        node = {"weight": jnp.asarray(rng.normal(size=(128, 128))
                                      .astype(np.float32)),
                "bias": jnp.zeros((128,)),
                "lora_A": jnp.asarray(rng.normal(size=(2, 128))
                                      .astype(np.float32)),
                "lora_B": jnp.asarray(rng.normal(size=(128, 2))
                                      .astype(np.float32)),
                "lora_scale": jnp.asarray(0.5)}
        plain_node = {"weight": jnp.asarray(rng.normal(size=(128, 128))
                                            .astype(np.float32))}
        tree = {"wrapped": node, "plain": plain_node}
        merged_ref = lora_m.merge(tree)
        merged_q = lora_m.merge(quant.quantize_lora_base(tree))
        flat_q = jax.tree_util.tree_leaves_with_path(merged_q)
        assert not any("weight_q" in jax.tree_util.keystr(p) or
                       "w_scale" in jax.tree_util.keystr(p)
                       for p, _ in flat_q)
        for (pa, a), (pb, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(merged_ref),
                       key=lambda t: jax.tree_util.keystr(t[0])),
                sorted(flat_q, key=lambda t: jax.tree_util.keystr(t[0]))):
            assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_quantize_conv_tree(self):
        tree = {"conv1": {"weight": jnp.ones((3, 3, 64, 64)),
                          "bias": jnp.zeros((64,))},
                "conv_in": {"weight": jnp.ones((3, 3, 3, 64))}}  # 3 in-ch: skip
        out = quant.quantize_conv_tree(tree, min_channels=64)
        assert "weight_q" in out["conv1"]
        assert "weight" in out["conv_in"]

    def test_quantize_conv_tree_default_skips_low_channels(self):
        """Product default = INT8_CONV_MIN_CH (256): below it the int8 conv
        emitter measures slower than bf16 on v5e (vae_conv_mxu_probe r5)."""
        assert quant.INT8_CONV_MIN_CH == 256
        tree = {"c128": {"weight": jnp.ones((3, 3, 128, 128))},
                "c512": {"weight": jnp.ones((3, 3, 512, 512))}}
        out = quant.quantize_conv_tree(tree)
        assert "weight" in out["c128"] and "weight_q" not in out["c128"]
        assert "weight_q" in out["c512"]


class TestInt8Stage1Step:
    @pytest.mark.slow
    def test_int8_step_trains_and_tracks_bf16(self):
        """Stage-1 with int8 tower+VAE must train (finite loss, close to the
        unquantized loss on the same batch/key)."""
        from genhancer_tpu.tasks import image as image_task
        from genhancer_tpu.models import dit as dit_m, vae as vae_m
        from genhancer_tpu.models.towers import clip as clip_m
        from genhancer_tpu.train import optim
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

        tower_cfg = clip_m.CLIPConfig(
            vision=clip_m.CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                                           num_layers=2, num_heads=2,
                                           image_size=28, patch_size=14),
            text=clip_m.CLIPTextConfig(hidden_size=64, intermediate_size=128,
                                       num_layers=1, num_heads=2, vocab_size=50,
                                       max_position_embeddings=8),
            projection_dim=64)

        def make(quantized):
            return image_task.TaskSpec(
                stage="stage1", tower_kind="clip", img_size=32,
                clip_image_size=28, dit_cfg=dit_m.DIT_CONFIGS["flux-debug"],
                vae_cfg=vae_m.VAE_CONFIGS["flux-debug"], tower_cfg=tower_cfg,
                compute_dtype=jnp.float32, dit_param_dtype=jnp.float32,
                tower_quant="int8" if quantized else "none",
                vae_quant="int8" if quantized else "none",
                # flux-debug has ch=32: lower the int8-conv channel floor so
                # the int8 conv path is actually engaged in this step
                vae_quant_min_ch=16)

        opt = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        batch = {"image": jnp.asarray(
            np.random.default_rng(0).random((2, 32, 32, 3), np.float32))}

        losses = {}
        for quantized in (False, True):
            spec = make(quantized)
            state = image_task.create_task_state(jax.random.key(0), spec, opt)
            step = image_task.make_train_step(spec, opt)
            state, m = step(state, batch, jax.random.key(7))
            losses[quantized] = float(m["loss"])
            assert np.isfinite(losses[quantized])
        # same init/key/noise; only the frozen-path quant noise differs
        assert abs(losses[True] - losses[False]) / losses[False] < 0.08, losses


class TestQLoRAStage2:
    @pytest.mark.slow
    def test_stage2_qlora_step_trains_and_tracks_bf16(self):
        """Stage-2 with the int8 frozen base (tower_quant: int8): only LoRA
        params + wrapped biases train, the loss tracks the unquantized run,
        and the kept bf16 base weight is untouched by the step."""
        from genhancer_tpu.tasks import image as image_task
        from genhancer_tpu.models import dit as dit_m, vae as vae_m
        from genhancer_tpu.models.towers import clip as clip_m
        from genhancer_tpu.train import optim
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

        tower_cfg = clip_m.CLIPConfig(
            vision=clip_m.CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                                           num_layers=2, num_heads=2,
                                           image_size=28, patch_size=14),
            text=clip_m.CLIPTextConfig(hidden_size=64, intermediate_size=128,
                                       num_layers=1, num_heads=2, vocab_size=50,
                                       max_position_embeddings=8),
            projection_dim=64)

        def make(quantized):
            return image_task.TaskSpec(
                stage="stage2_only", tower_kind="clip", img_size=32,
                clip_image_size=28, dit_cfg=dit_m.DIT_CONFIGS["flux-debug"],
                vae_cfg=vae_m.VAE_CONFIGS["flux-debug"], tower_cfg=tower_cfg,
                compute_dtype=jnp.float32, dit_param_dtype=jnp.float32,
                lora_targets="all-linear",
                tower_quant="int8" if quantized else "none")

        opt = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        batch = {"image": jnp.asarray(
            np.random.default_rng(0).random((2, 32, 32, 3), np.float32))}

        losses = {}
        for quantized in (False, True):
            spec = make(quantized)
            state = image_task.create_task_state(jax.random.key(0), spec, opt)
            if quantized:
                assert any(p.endswith(".weight_q") for p in state.frozen)
                # every quantized node keeps its bf16 base for merge/export
                for p in state.frozen:
                    if p.endswith(".weight_q"):
                        assert p[:-2] in state.frozen, p   # .weight_q -> .weight
            assert all(".lora_" in p or p.endswith(".bias")
                       for p in state.trainable)
            base_before = {p: np.asarray(v) for p, v in state.frozen.items()
                           if p.endswith(".weight")}
            step = image_task.make_train_step(spec, opt)
            for i in range(2):
                state, m = step(state, batch, jax.random.key(i))
            losses[quantized] = float(m["loss"])
            assert np.isfinite(losses[quantized])
            for p, v in state.frozen.items():
                if p in base_before:
                    np.testing.assert_array_equal(np.asarray(v), base_before[p])
        assert abs(losses[True] - losses[False]) / losses[False] < 0.08, losses


    @pytest.mark.slow
    def test_stage2_only_frozen_dit_int8(self):
        """dit_quant on stage2_only = static int8 base (the DiT is frozen —
        no SwitchBack ctx, no dW): weight_q factors live in frozen state,
        the bf16 master is kept, and the loss tracks the exact run."""
        from genhancer_tpu.tasks import image as image_task
        from genhancer_tpu.models import dit as dit_m, vae as vae_m
        from genhancer_tpu.models.towers import clip as clip_m
        from genhancer_tpu.train import optim
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

        tower_cfg = clip_m.CLIPConfig(
            vision=clip_m.CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                                           num_layers=1, num_heads=2,
                                           image_size=28, patch_size=14),
            text=clip_m.CLIPTextConfig(hidden_size=64, intermediate_size=128,
                                       num_layers=1, num_heads=2, vocab_size=50,
                                       max_position_embeddings=8),
            projection_dim=64)

        def make(q):
            return image_task.TaskSpec(
                stage="stage2_only", tower_kind="clip", img_size=32,
                clip_image_size=28, dit_cfg=dit_m.DIT_CONFIGS["flux-debug"],
                vae_cfg=vae_m.VAE_CONFIGS["flux-debug"], tower_cfg=tower_cfg,
                compute_dtype=jnp.float32, dit_param_dtype=jnp.float32,
                dit_quant="int8" if q else "none")

        opt = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        batch = {"image": jnp.asarray(
            np.random.default_rng(0).random((2, 32, 32, 3), np.float32))}
        losses = {}
        for q in (False, True):
            spec = make(q)
            state = image_task.create_task_state(jax.random.key(0), spec, opt)
            dit_q_paths = [p for p in state.frozen
                           if p.startswith("dit.") and p.endswith(".weight_q")]
            assert bool(dit_q_paths) == q
            if q:
                for p in dit_q_paths:
                    assert p[:-2] in state.frozen     # master kept
            step = image_task.make_train_step(spec, opt)
            state, m = step(state, batch, jax.random.key(3))
            losses[q] = float(m["loss"])
            assert np.isfinite(losses[q])
        assert abs(losses[True] - losses[False]) / losses[False] < 0.08, losses

    def test_refresh_static_quant_flat(self):
        """After a checkpoint load replaces a kept master, the derived int8
        factors must be re-derivable to match a fresh quantization."""
        rng = np.random.default_rng(5)
        w0 = jnp.asarray(rng.normal(size=(96, 96)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(96, 96)).astype(np.float32) * 2.0)
        q0, s0 = quant.quantize_weight(w0, axis=0)
        flat = {"dit.blk.weight": w1,          # master replaced by a load
                "dit.blk.weight_q": q0,        # stale factors from init
                "dit.blk.w_scale": s0,
                "dit.other.weight": w0}        # unquantized: untouched
        out = quant.refresh_static_quant_flat(flat)
        q1, s1 = quant.quantize_weight(w1, axis=0)
        np.testing.assert_array_equal(np.asarray(out["dit.blk.weight_q"]),
                                      np.asarray(q1))
        np.testing.assert_array_equal(np.asarray(out["dit.blk.w_scale"]),
                                      np.asarray(s1))
        assert out["dit.other.weight"] is w0


class TestPallasInt8DW:
    """Per-block-quant dW kernel (core/pallas/int8_dw): exact scale factoring
    per t-block, finer granularity than the XLA per-column variant."""

    def test_close_to_exact_and_finer_than_global_cols(self, rng):
        import os
        from genhancer_tpu.core.pallas import int8_dw as m
        from genhancer_tpu.core import quant as Q
        T, O, I = 777, 384, 256
        # per-channel magnitude spread stresses the scale granularity
        g = jnp.asarray(rng.standard_normal((T, O))
                        * np.exp(rng.standard_normal((1, O))), jnp.float32)
        x = jnp.asarray(rng.standard_normal((T, I)), jnp.float32)
        ref = np.asarray(g.T @ x)
        dw = np.asarray(m.int8_dw(g, x, block_t=256, block_o=128, block_i=128))
        rel = np.linalg.norm(dw - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel
        cos = float(np.sum(dw * ref)
                    / (np.linalg.norm(dw) * np.linalg.norm(ref)))
        assert cos > 0.999, cos

    def test_ragged_t_padding_exact(self, rng):
        """T not a multiple of block_t: padded rows must contribute nothing
        (compare against the same kernel at an exactly-dividing block)."""
        from genhancer_tpu.core.pallas import int8_dw as m
        T, O, I = 300, 128, 128
        g = jnp.asarray(rng.standard_normal((T, O)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((T, I)), jnp.float32)
        ref = np.asarray(g.T @ x)
        dw = np.asarray(m.int8_dw(g, x, block_t=256, block_o=128, block_i=128))
        rel = np.linalg.norm(dw - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel

    def test_switchback_dw_grads(self, rng):
        """switchback_linear_dw: dx matches switchback_linear exactly; dw
        close to the bf16 dW."""
        import os
        os.environ["GENHANCER_PALLAS_INTERPRET"] = "1"
        from genhancer_tpu.core import quant as Q
        x = jnp.asarray(rng.standard_normal((2, 64, 512)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((640, 512)) * 0.05, jnp.float32)

        g_ref = jax.grad(lambda a, b: jnp.sum(Q.switchback_linear(a, b) ** 2),
                         argnums=(0, 1))(x, w)
        g_dw = jax.grad(lambda a, b: jnp.sum(Q.switchback_linear_dw(a, b) ** 2),
                        argnums=(0, 1))(x, w)
        np.testing.assert_array_equal(np.asarray(g_ref[0]), np.asarray(g_dw[0]))
        a, b = np.asarray(g_dw[1]), np.asarray(g_ref[1])
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        assert rel < 0.02, rel


class TestPallasRowQuant:
    """Single-pass row-quant kernel (core/pallas/rowquant): bit parity with
    the XLA reference math, fused col-scale, and SPMD partitioning."""

    def _ref(self, x, cs=None):
        xf = np.asarray(x, np.float32)
        if cs is not None:
            xf = xf * np.asarray(cs, np.float32)
        amax = np.max(np.abs(xf), axis=-1, keepdims=True)
        s = np.maximum(amax, 1e-12) / 127.0
        q = np.clip(np.round(xf / s), -127, 127)
        return q.astype(np.int8), s

    def _assert_quant_close(self, q, s, rq, rs):
        """XLA strength-reduces /127 to *(1/127) under jit -> scales can
        differ by 1 ulp, which may flip a handful of rounded int8 values by
        +-1 (the eager math is bit-equal; proven in quantize_weight tests)."""
        np.testing.assert_allclose(np.asarray(s), rs[:, 0], rtol=2e-7)
        d = np.abs(np.asarray(q).astype(np.int32) - rq.astype(np.int32))
        assert d.max() <= 1, d.max()
        assert (d != 0).mean() < 5e-3, (d != 0).mean()

    def test_parity_with_reference_math(self, rng):
        from genhancer_tpu.core.pallas import rowquant as m
        x = jnp.asarray(rng.standard_normal((160, 256)), jnp.float32)
        q, s = m.rowquant(x)
        rq, rs = self._ref(x)
        self._assert_quant_close(q, s, rq, rs)

    def test_col_scale_fused(self, rng):
        from genhancer_tpu.core.pallas import rowquant as m
        x = jnp.asarray(rng.standard_normal((96, 384)), jnp.bfloat16)
        cs = jnp.asarray(np.exp(rng.standard_normal(384)), jnp.float32)
        q, s = m.rowquant(x, cs)
        rq, rs = self._ref(x, cs)
        self._assert_quant_close(q, s, rq, rs)

    def test_ragged_rows(self, rng):
        from genhancer_tpu.core.pallas import rowquant as m
        # t=72 with block 32 -> ragged last block; every valid row exact
        x = jnp.asarray(rng.standard_normal((72, 128)), jnp.float32)
        q, s = m.rowquant(x)
        rq, rs = self._ref(x)
        self._assert_quant_close(q, s, rq, rs)

    def test_quantize_activation_rows_dispatch_parity(self, rng):
        """The public entry must give identical results whether the kernel
        dispatches (big 128-multiple shapes) or not (fallback)."""
        from genhancer_tpu.core import quant as Q
        x3 = jnp.asarray(rng.standard_normal((4, 40, 256)), jnp.bfloat16)
        q, s = Q.quantize_activation_rows(x3)
        assert q.shape == x3.shape and s.shape == (4, 40, 1)
        rq, rs = self._ref(np.asarray(x3.astype(jnp.float32)).reshape(160, 256))
        self._assert_quant_close(np.asarray(q).reshape(160, 256),
                                 np.asarray(s).reshape(160), rq, rs)

    def test_spmd_dp_sharded_rows(self, rng):
        """Under a dp-sharded mesh the wrapped kernel must partition over
        rows and match the single-device result."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from genhancer_tpu.core.pallas import rowquant as m
        from genhancer_tpu.parallel import mesh as mesh_m
        mesh = mesh_m.make_mesh(8)
        x = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
        want_q, want_s = m.rowquant(x)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))

        @jax.jit
        def f(a):
            return m.rowquant_spmd(a)

        q, s = f(xs)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(want_q))
        np.testing.assert_allclose(np.asarray(s), np.asarray(want_s))
