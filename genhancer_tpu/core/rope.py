"""Multi-axis rotary position embeddings (3-axis RoPE).

The reference builds per-position 2x2 rotation matrices in float64 and applies
them as a dense matmul over pairs (src/flux/math.py:15-30, modules/layers.py:11-25).
TPU-native formulation: keep cos/sin tables [..., L, D/2] in float32 and apply
the rotation as fused elementwise ops on the (even, odd) channel halves —
identical math (out_even = cos*x_even - sin*x_odd; out_odd = sin*x_even +
cos*x_odd), no 2x2 matmul, no float64 (positions are small integers so float32
phase accumulation is exact to ~1e-7 at theta=10k, L<=4096).

Axes convention (flux-dev): axes_dim=[16, 56, 56] over ids[..., (t, row, col)];
the concatenated per-axis tables cover head_dim/2 = 64 rotation pairs.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def rope_table(pos: jax.Array, dim: int, theta: float) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for one axis.

    pos: [..., L] float/int positions.  Returns (cos, sin) each [..., L, dim//2]
    in float32.
    """
    assert dim % 2 == 0
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta ** scale)
    out = pos.astype(jnp.float32)[..., None] * omega  # [..., L, dim/2]
    return jnp.cos(out), jnp.sin(out)


def multi_axis_rope(ids: jax.Array, axes_dim: Sequence[int], theta: float
                    ) -> Tuple[jax.Array, jax.Array]:
    """Concatenate per-axis tables: ids [..., L, n_axes] -> (cos, sin) [..., L, sum(axes_dim)//2]."""
    cos_parts, sin_parts = [], []
    for i, d in enumerate(axes_dim):
        c, s = rope_table(ids[..., i], d, theta)
        cos_parts.append(c)
        sin_parts.append(s)
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved channel pairs of x.

    x: [B, L, H, D] (or any shape ending in D with L second-to-last-but-one);
    cos/sin: [B, L, D/2] broadcast over heads.  Rotation runs in float32 and is
    cast back to x.dtype (parity with src/flux/math.py:25-30).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    if x.ndim == 4:  # [B, L, H, D] with [B, L, D/2] tables
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    else:
        c, s = cos, sin
    out_even = c * x_even - s * x_odd
    out_odd = s * x_even + c * x_odd
    # re-interleave
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


def spatial_ids(h: int, w: int, t: float = 0.0) -> jnp.ndarray:
    """[h*w, 3] ids (t, row, col) — the image-token grid
    (clip_models/sampling.py:30-33 with time axis from
    train_OpenAICLIP_video_stage1.py:128-151)."""
    rows = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    cols = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
    ts = jnp.full((h * w,), float(t), dtype=jnp.float32)
    return jnp.stack([ts, rows, cols], axis=-1)


def txt_zero_ids(length: int) -> jnp.ndarray:
    """[length, 3] all-zero ids for 1-token text conditioning (sampling.py:18)."""
    return jnp.zeros((length, 3), dtype=jnp.float32)
