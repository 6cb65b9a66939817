"""Ring attention (parallel/ring.py): loss/grad parity vs the single-device
reference attention on the virtual CPU mesh, across mesh layouts and dtypes.
Semantics target: core.attention.sdpa_xla (exact unmasked softmax)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genhancer_tpu.core.attention import sdpa_xla
from genhancer_tpu.parallel import mesh as mesh_m
from genhancer_tpu.parallel import ring


def _qkv(rng, b, l, h, d, dtype):
    mk = lambda: jnp.asarray(rng.standard_normal((b, l, h, d)), dtype)
    return mk(), mk(), mk()


class TestRingForward:
    @pytest.mark.parametrize("sp,b", [(8, 2), (4, 4), (2, 2)])
    def test_matches_sdpa_f32(self, rng, sp, b):
        mesh = mesh_m.make_mesh(sp, sequence_parallel=sp,
                                devices=jax.devices()[:sp])
        q, k, v = _qkv(rng, b, 64 * sp, 4, 32, jnp.float32)
        got = ring.ring_attention(q, k, v, mesh, batch_axis=None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(sdpa_xla(q, k, v)),
                                   atol=1e-5, rtol=1e-5)

    def test_dp_x_sp(self, rng):
        mesh = mesh_m.make_mesh(8, sequence_parallel=4)
        assert mesh.shape == {"data": 2, "model": 1, "seq": 4}
        q, k, v = _qkv(rng, 4, 256, 4, 32, jnp.float32)
        got = ring.ring_attention(q, k, v, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(sdpa_xla(q, k, v)),
                                   atol=1e-5, rtol=1e-5)

    def test_bf16(self, rng):
        mesh = mesh_m.make_mesh(4, sequence_parallel=4,
                                devices=jax.devices()[:4])
        q, k, v = _qkv(rng, 2, 256, 4, 32, jnp.bfloat16)
        got = ring.ring_attention(q, k, v, mesh, batch_axis=None)
        ref = sdpa_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=3e-2)

    def test_indivisible_l_rejected(self, rng):
        mesh = mesh_m.make_mesh(8, sequence_parallel=8)
        q, k, v = _qkv(rng, 1, 100, 2, 16, jnp.float32)
        with pytest.raises(ValueError, match="not divisible"):
            ring.ring_attention(q, k, v, mesh, batch_axis=None)


class TestRingGrads:
    def test_grads_match_sdpa(self, rng):
        mesh = mesh_m.make_mesh(8, sequence_parallel=4)
        q, k, v = _qkv(rng, 2, 256, 4, 32, jnp.float32)
        w = jnp.asarray(rng.standard_normal((2, 256, 4, 32)), jnp.float32)

        def loss_ring(q, k, v):
            return jnp.sum(ring.ring_attention(q, k, v, mesh) * w)

        def loss_ref(q, k, v):
            return jnp.sum(sdpa_xla(q, k, v) * w)

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_ring, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4, err_msg=name)

    def test_grads_under_jit_bf16(self, rng):
        mesh = mesh_m.make_mesh(4, sequence_parallel=2,
                                devices=jax.devices()[:4])
        q, k, v = _qkv(rng, 2, 128, 4, 32, jnp.bfloat16)

        @jax.jit
        def g_ring(q, k, v):
            return jax.grad(
                lambda q: jnp.sum(ring.ring_attention(q, k, v, mesh)
                                  .astype(jnp.float32)))(q)

        @jax.jit
        def g_ref(q, k, v):
            return jax.grad(
                lambda q: jnp.sum(sdpa_xla(q, k, v).astype(jnp.float32)))(q)

        np.testing.assert_allclose(np.asarray(g_ring(q, k, v), np.float32),
                                   np.asarray(g_ref(q, k, v), np.float32),
                                   atol=5e-2)
