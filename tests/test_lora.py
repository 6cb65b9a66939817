"""LoRA injection / apply / merge semantics vs peft behavior."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from genhancer_tpu.core import nn
from genhancer_tpu.train import lora
from genhancer_tpu.models.towers import clip as jclip


def tiny_tower():
    cfg = jclip.CLIPConfig(
        vision=jclip.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                      num_layers=1, num_heads=2, image_size=28,
                                      patch_size=14),
        text=jclip.CLIPTextConfig(hidden_size=16, intermediate_size=32,
                                  num_layers=1, num_heads=2, vocab_size=50,
                                  max_position_embeddings=8),
        projection_dim=8)
    return jclip.init_clip(jax.random.key(0), cfg), cfg


class TestLora:
    def test_inject_zero_B_is_identity(self):
        params, cfg = tiny_tower()
        injected, wrapped = lora.inject(params, jax.random.key(1), r=4,
                                        targets=lora.SIGLIP_TARGETS)
        assert wrapped, "nothing wrapped"
        x = jnp.ones((1, 5, 16))
        p0 = params["vision_model"]["encoder"]["layers"][0]["self_attn"]["q_proj"]
        p1 = injected["vision_model"]["encoder"]["layers"][0]["self_attn"]["q_proj"]
        assert "lora_A" in p1
        np.testing.assert_allclose(np.asarray(nn.linear(p0, x)),
                                   np.asarray(nn.linear(p1, x)), rtol=1e-6)

    def test_targets_list_selects_only_named(self):
        params, _ = tiny_tower()
        _, wrapped = lora.inject(params, jax.random.key(1), targets=("q_proj",))
        assert wrapped and all(p.endswith("q_proj") for p in wrapped)

    def test_all_linear_excludes_embeddings(self):
        params, _ = tiny_tower()
        _, wrapped = lora.inject(params, jax.random.key(1), targets="all-linear")
        assert not any("embedding" in p for p in wrapped)
        assert any("fc1" in p for p in wrapped)
        assert any("visual_projection" in p for p in wrapped)

    def test_lora_branch_math(self):
        """y = Wx + (alpha/r) B A x."""
        rng = np.random.default_rng(0)
        W = rng.standard_normal((6, 4), dtype=np.float32)
        A = rng.standard_normal((2, 4), dtype=np.float32)
        B = rng.standard_normal((6, 2), dtype=np.float32)
        x = rng.standard_normal((3, 4), dtype=np.float32)
        p = {"weight": jnp.asarray(W), "lora_A": jnp.asarray(A),
             "lora_B": jnp.asarray(B), "lora_scale": jnp.asarray(2.0)}
        got = np.asarray(nn.linear(p, jnp.asarray(x)))
        want = x @ W.T + 2.0 * (x @ A.T) @ B.T
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_merge_matches_branch(self):
        params, cfg = tiny_tower()
        injected, _ = lora.inject(params, jax.random.key(1), r=4, alpha=16,
                                  targets="all-linear")
        # make B nonzero so merge is nontrivial
        def bump(node):
            if isinstance(node, dict):
                if "lora_B" in node:
                    node = dict(node)
                    node["lora_B"] = jnp.ones_like(node["lora_B"]) * 0.01
                return {k: bump(v) for k, v in node.items()}
            if isinstance(node, list):
                return [bump(v) for v in node]
            return node
        injected = bump(injected)
        merged = lora.merge(injected)

        # no lora keys remain
        import genhancer_tpu.train.state as S
        assert not any("lora" in k for k in S.flatten_params(merged))

        px = jnp.ones((1, 28, 28, 3)) * 0.5
        a = jclip.get_image_features(injected, px, cfg)
        b = jclip.get_image_features(merged, px, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_trainable_paths_bias_lora_only(self):
        params, _ = tiny_tower()
        injected, wrapped = lora.inject(params, jax.random.key(1), targets=("q_proj",))
        paths = lora.lora_trainable_paths(injected)
        assert any(p.endswith("q_proj.lora_A") for p in paths)
        assert any(p.endswith("q_proj.bias") for p in paths)
        assert not any(p.endswith("k_proj.bias") for p in paths)
        assert not any(p.endswith("weight") for p in paths)


class TestLoraDropout:
    """peft-parity LoRA dropout: applied to the A-branch input only, active
    only inside core.nn.lora_dropout_ctx (reference stage-2 configs set
    lora_dropout: 0.1, train_SigLIP_stage2_all.py:134-143)."""

    def _lora_node(self, key=1, r=4):
        W = np.zeros((6, 8), np.float32)          # isolate the LoRA branch
        A = np.random.default_rng(key).normal(size=(r, 8)).astype(np.float32)
        B = np.ones((6, r), np.float32)
        return {"weight": jnp.asarray(W), "lora_A": jnp.asarray(A),
                "lora_B": jnp.asarray(B), "lora_scale": jnp.asarray(1.0)}

    def test_noop_outside_context(self):
        p = self._lora_node()
        x = jnp.ones((2, 3, 8))
        np.testing.assert_array_equal(np.asarray(nn.linear(p, x)),
                                      np.asarray(nn.linear(p, x)))

    def test_dropout_changes_branch_and_is_deterministic(self):
        p = self._lora_node()
        x = jnp.ones((4, 16, 8))
        base = np.asarray(nn.linear(p, x))
        with nn.lora_dropout_ctx(jax.random.key(7), 0.5):
            d1 = np.asarray(nn.linear(p, x))
        with nn.lora_dropout_ctx(jax.random.key(7), 0.5):
            d2 = np.asarray(nn.linear(p, x))
        with nn.lora_dropout_ctx(jax.random.key(8), 0.5):
            d3 = np.asarray(nn.linear(p, x))
        assert not np.allclose(base, d1)          # dropout active
        np.testing.assert_array_equal(d1, d2)     # deterministic given key
        assert not np.allclose(d1, d3)            # key changes mask

    def test_rate_zero_is_identity(self):
        p = self._lora_node()
        x = jnp.ones((2, 3, 8))
        base = np.asarray(nn.linear(p, x))
        with nn.lora_dropout_ctx(jax.random.key(7), 0.0):
            got = np.asarray(nn.linear(p, x))
        np.testing.assert_array_equal(base, got)

    def test_expectation_preserved(self):
        # inverted dropout: E[dropout(x)] == x (up to sampling noise)
        p = self._lora_node(r=2)
        x = jnp.ones((64, 64, 8))
        base = np.asarray(nn.linear(p, x))
        with nn.lora_dropout_ctx(jax.random.key(0), 0.3):
            d = np.asarray(nn.linear(p, x))
        np.testing.assert_allclose(d.mean(), base.mean(), rtol=0.05)

    def test_per_call_masks_decorrelated(self):
        p = self._lora_node()
        x = jnp.ones((2, 128, 8))
        with nn.lora_dropout_ctx(jax.random.key(7), 0.5):
            a = np.asarray(nn.linear(p, x))
            b = np.asarray(nn.linear(p, x))   # second call folds a new counter
        assert not np.allclose(a, b)

    def test_base_path_untouched(self):
        # dropout must not touch W x, only the LoRA branch
        p = self._lora_node()
        p["weight"] = jnp.asarray(np.random.default_rng(0).normal(
            size=(6, 8)).astype(np.float32))
        p.pop("lora_A"); p.pop("lora_B"); p.pop("lora_scale")
        x = jnp.ones((2, 3, 8))
        base = np.asarray(nn.linear(p, x))
        with nn.lora_dropout_ctx(jax.random.key(7), 0.9):
            got = np.asarray(nn.linear(p, x))
        np.testing.assert_array_equal(base, got)

    @pytest.mark.slow
    def test_stage2_step_uses_dropout(self):
        """End to end: two identical stage-2 steps with different keys produce
        different grads iff lora_dropout > 0."""
        from genhancer_tpu.tasks import image as image_task
        from genhancer_tpu.models import dit as dit_m, vae as vae_m
        from genhancer_tpu.train import optim
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

        def spec(p):
            return image_task.TaskSpec(
                stage="stage2_only", tower_kind="clip", img_size=32,
                clip_image_size=28, dit_cfg=dit_m.DIT_CONFIGS["flux-debug"],
                vae_cfg=vae_m.VAE_CONFIGS["flux-debug"],
                tower_cfg=tiny_tower()[1], lora_r=2, lora_dropout=p,
                compute_dtype=jnp.float32, dit_param_dtype=jnp.float32)

        cfg = Config(dict(TRAIN_DEFAULTS))
        opt = optim.make_optimizer(cfg)
        batch = {"image": jnp.asarray(
            np.random.default_rng(0).random((2, 32, 32, 3), np.float32))}

        # same step key, different dropout rate: t/noise draws are identical,
        # so any grad difference is the dropout mask.  lora_B receives grads
        # through A @ dropout(x) even at init (lora_A's grads are zero while
        # B == 0, so B is the observable).
        def grads(rate, key):
            loss_fn = image_task.make_loss_fn(spec(rate))
            state = image_task.create_task_state(jax.random.key(0), spec(rate), opt)
            return jax.grad(lambda tp: loss_fn(tp, state.frozen, batch,
                                               key))(state.trainable)

        g_off = grads(0.0, jax.random.key(1))
        g_on = grads(0.5, jax.random.key(1))
        g_on2 = grads(0.5, jax.random.key(1))
        # vision-tower factor: image conditioning never runs the text tower,
        # so text LoRA grads are structurally zero (same as the reference)
        kb = [k for k in g_off
              if k.endswith("lora_B") and ".vision_model." in k][0]
        np.testing.assert_allclose(np.asarray(g_on[kb]), np.asarray(g_on2[kb]),
                                   atol=1e-6)  # same key -> same grads
        assert not np.allclose(np.asarray(g_off[kb]), np.asarray(g_on[kb]),
                               atol=1e-6)      # dropout changed the grads
