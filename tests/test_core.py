"""Unit tests for core numerics: RoPE, norms, attention, embeddings.

Golden values are computed with independent numpy reference implementations of
the *reference semantics* (rotation matrices, fp32 RMS statistics, sinusoidal
embedding order) — see /root/reference/Continuous/src/flux/math.py and
modules/layers.py for the behavior being matched.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.core import nn, rope
from genhancer_tpu.core.attention import sdpa_xla, attention


def ref_rope_rotation(pos, dim, theta):
    """numpy port of the rotation-matrix construction (math.py:15-22)."""
    scale = np.arange(0, dim, 2, dtype=np.float64) / dim
    omega = 1.0 / theta ** scale
    out = np.einsum("...n,d->...nd", pos, omega)
    # [cos, -sin, sin, cos] -> 2x2
    mat = np.stack([np.cos(out), -np.sin(out), np.sin(out), np.cos(out)], axis=-1)
    return mat.reshape(*mat.shape[:-1], 2, 2).astype(np.float32)


def ref_apply_rope(x, mats):
    """x: [B, L, D]; mats: [B, L, D/2, 2, 2] (math.py:25-30)."""
    xp = x.reshape(*x.shape[:-1], -1, 1, 2)
    out = mats[..., 0] * xp[..., 0] + mats[..., 1] * xp[..., 1]
    return out.reshape(x.shape)


class TestRope:
    def test_matches_rotation_matrix_semantics(self, rng):
        B, L, D = 2, 7, 16
        pos = rng.integers(0, 100, (B, L)).astype(np.float32)
        x = rng.standard_normal((B, L, 1, D), dtype=np.float32)

        cos, sin = rope.rope_table(jnp.asarray(pos), D, 10_000)
        got = rope.apply_rope(jnp.asarray(x), cos, sin)

        mats = ref_rope_rotation(pos, D, 10_000)
        want = ref_apply_rope(x[:, :, 0, :], mats)
        # reference builds the table in float64 then casts to f32; ours is f32
        # end-to-end -> phase error ~pos*1e-6, tolerate 5e-4 at pos<=100.
        np.testing.assert_allclose(np.asarray(got)[:, :, 0, :], want, rtol=5e-4, atol=5e-4)

    def test_multi_axis_concat(self, rng):
        ids = rng.integers(0, 50, (1, 5, 3)).astype(np.float32)
        cos, sin = rope.multi_axis_rope(jnp.asarray(ids), (4, 6, 6), 10_000)
        assert cos.shape == (1, 5, 8)  # (4+6+6)/2
        c0, _ = rope.rope_table(jnp.asarray(ids[..., 0]), 4, 10_000)
        np.testing.assert_allclose(np.asarray(cos[..., :2]), np.asarray(c0), rtol=1e-6)

    def test_rope_norm_preserving(self, rng):
        x = rng.standard_normal((1, 4, 2, 8), dtype=np.float32)
        cos, sin = rope.rope_table(jnp.asarray([[1., 2., 3., 4.]]), 8, 10_000)
        y = rope.apply_rope(jnp.asarray(x), cos, sin)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                                   np.linalg.norm(x, axis=-1), rtol=1e-5)

    def test_spatial_ids(self):
        ids = np.asarray(rope.spatial_ids(2, 3, t=5))
        assert ids.shape == (6, 3)
        np.testing.assert_array_equal(ids[:, 0], 5)
        np.testing.assert_array_equal(ids[:, 1], [0, 0, 0, 1, 1, 1])
        np.testing.assert_array_equal(ids[:, 2], [0, 1, 2, 0, 1, 2])


class TestNorms:
    def test_rmsnorm_fp32_semantics(self, rng):
        x = rng.standard_normal((3, 5), dtype=np.float32) * 10
        p = {"scale": jnp.full((5,), 2.0)}
        got = np.asarray(nn.rmsnorm(p, jnp.asarray(x)))
        rrms = 1.0 / np.sqrt(np.mean(x ** 2, axis=-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(got, x * rrms * 2.0, rtol=1e-6)

    def test_layernorm_no_affine(self, rng):
        x = rng.standard_normal((2, 8), dtype=np.float32)
        got = np.asarray(nn.layernorm({}, jnp.asarray(x)))
        mu, var = x.mean(-1, keepdims=True), x.var(-1, keepdims=True)
        np.testing.assert_allclose(got, (x - mu) / np.sqrt(var + 1e-6), rtol=1e-5, atol=1e-6)

    def test_groupnorm(self, rng):
        x = rng.standard_normal((2, 4, 4, 8), dtype=np.float32)
        p = nn.groupnorm_init(8)
        got = np.asarray(nn.groupnorm(p, jnp.asarray(x), num_groups=2))
        xg = x.reshape(2, 4, 4, 2, 4)
        mu = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = xg.var(axis=(1, 2, 4), keepdims=True)
        want = ((xg - mu) / np.sqrt(var + 1e-6)).reshape(x.shape)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestEmbeddings:
    def test_timestep_embedding_cos_sin_order(self):
        t = jnp.asarray([0.0005])  # small arg: avoids f32-vs-f64 range-reduction noise
        emb = np.asarray(nn.timestep_embedding(t, 8))
        half = 4
        freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
        args = 0.5 * freqs  # time_factor=1000
        np.testing.assert_allclose(emb[0], np.concatenate([np.cos(args), np.sin(args)]),
                                   rtol=1e-5, atol=1e-6)

    def test_mlp_embedder_shapes(self):
        p = nn.mlp_embedder_init(jax.random.key(0), 256, 64)
        out = nn.mlp_embedder(p, jnp.ones((3, 256)))
        assert out.shape == (3, 64)


class TestAttention:
    def test_sdpa_matches_naive_softmax(self, rng):
        B, L, H, D = 2, 9, 3, 8
        q = rng.standard_normal((B, L, H, D), dtype=np.float32)
        k = rng.standard_normal((B, L, H, D), dtype=np.float32)
        v = rng.standard_normal((B, L, H, D), dtype=np.float32)
        got = np.asarray(sdpa_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        logits = np.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(D)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("bhlm,bmhd->blhd", p, v)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_attention_merges_heads(self, rng):
        B, L, H, D = 1, 6, 2, 8
        q = jnp.asarray(rng.standard_normal((B, L, H, D), dtype=np.float32))
        ids = jnp.zeros((B, L, 3))
        cos, sin = rope.multi_axis_rope(ids, (4, 2, 2), 10_000)
        # with zero ids cos=1, sin=0 -> rope is identity
        out = attention(q, q, q, cos, sin)
        assert out.shape == (B, L, H * D)
        want = sdpa_xla(q, q, q).reshape(B, L, H * D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-6)


class TestLinear:
    def test_linear_torch_layout(self, rng):
        w = rng.standard_normal((4, 3), dtype=np.float32)
        b = rng.standard_normal(4, dtype=np.float32)
        x = rng.standard_normal((2, 3), dtype=np.float32)
        got = np.asarray(nn.linear({"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                                   jnp.asarray(x)))
        np.testing.assert_allclose(got, x @ w.T + b, rtol=1e-5, atol=1e-6)

    def test_quick_gelu(self):
        x = jnp.asarray([0.0, 1.0, -1.0])
        got = np.asarray(nn.quick_gelu(x))
        want = np.asarray(x) * (1 / (1 + np.exp(-1.702 * np.asarray(x))))
        np.testing.assert_allclose(got, want, rtol=1e-6)
