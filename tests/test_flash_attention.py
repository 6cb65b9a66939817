"""Pallas flash attention: interpret-mode parity with the XLA reference
(forward + all three gradients), including a non-divisible sequence length."""
import os

os.environ.setdefault("GENHANCER_PALLAS_INTERPRET", "1")

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.core.pallas.flash_attention import flash_attention
from genhancer_tpu.core.attention import sdpa_xla


@pytest.mark.parametrize("L", [64, 197])
def test_forward_matches_xla(rng, L):
    B, H, D = 2, 3, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, H, D), dtype=np.float32))
               for _ in range(3))
    o = flash_attention(q, k, v, 64)
    np.testing.assert_allclose(np.asarray(o), np.asarray(sdpa_xla(q, k, v)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("L", [64, 197])
def test_grads_match_xla(rng, L):
    B, H, D = 1, 2, 16
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, H, D), dtype=np.float32))
               for _ in range(3))

    g_flash = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v, 64) ** 2),
                       argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(sdpa_xla(q, k, v) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=f"d{name}")


def test_dispatch_threshold_uses_xla_for_short(rng, monkeypatch):
    """core.attention.sdpa must route short sequences to the XLA path."""
    from genhancer_tpu.core import attention as A
    calls = {"pallas": 0}
    monkeypatch.setattr(A, "_pallas_available", lambda: True)
    monkeypatch.setattr(A, "_flash_fn", lambda: (_ for _ in ()).throw(RuntimeError))
    q = jnp.ones((1, 8, 2, 4))
    out = A.sdpa(q, q, q)  # L=8 < threshold -> XLA path, no pallas call
    assert out.shape == q.shape
