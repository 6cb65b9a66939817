"""LoRA injection / apply / merge semantics vs peft behavior."""
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
