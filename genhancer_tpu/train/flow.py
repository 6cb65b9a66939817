"""Rectified-flow objective and Euler sampling.

Training objective (identical in every reference trainer, e.g.
``train_SigLIP_stage1.py:242-263``)::

    t   ~ sigmoid(scale_factor * N(0,1))        # logit-normal timesteps
    x_0 ~ N(0,1)
    x_t = (1-t) x_1 + t x_0
    loss = MSE(DiT(x_t, cond, t), x_0 - x_1)    # velocity target

Inference: resolution-shifted sigmoid schedule + Euler integration
(``src/flux/sampling.py:66-150``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def sample_timesteps(key: jax.Array, batch: int, scale_factor: float = 1.0) -> jax.Array:
    """Logit-normal t in (0,1): sigmoid(scale * N(0,1))."""
    return jax.nn.sigmoid(jax.random.normal(key, (batch,)) * scale_factor)


def interpolate(x_1: jax.Array, x_0: jax.Array, t: jax.Array) -> jax.Array:
    """x_t = (1-t) x_1 + t x_0 over [B, L, C] tokens with t [B]."""
    t = t[:, None, None].astype(x_1.dtype)
    return (1.0 - t) * x_1 + t * x_0


def velocity_target(x_1: jax.Array, x_0: jax.Array) -> jax.Array:
    return x_0 - x_1


def mse_loss(pred: jax.Array, target: jax.Array,
             mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean-squared error in float32.  ``mask`` [B] gates padded windows
    (sliding-window mode's variable bs_eff under static jit shapes)."""
    err = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
    if mask is None:
        return jnp.mean(err)
    m = mask.astype(jnp.float32)[:, None, None]
    denom = jnp.maximum(jnp.sum(m) * err.shape[1] * err.shape[2], 1.0)
    return jnp.sum(err * m) / denom


# ---------------------------------------------------------------------------
# inference schedule + Euler denoise (sampling.py:66-150, no-negative CFG
# variant used by reconstruction, reconstruct_stage1.py:36-73)
# ---------------------------------------------------------------------------

def time_shift(mu: float, sigma: float, t: jnp.ndarray) -> jnp.ndarray:
    return math.exp(mu) / (math.exp(mu) + (1.0 / t - 1.0) ** sigma)


def get_schedule(num_steps: int, image_seq_len: int, base_shift: float = 0.5,
                 max_shift: float = 1.15, shift: bool = True):
    """Python-side (static) list of timesteps, 1 -> 0."""
    import numpy as np
    timesteps = np.linspace(1.0, 0.0, num_steps + 1)
    if shift:
        m = (max_shift - base_shift) / (4096 - 256)
        b = base_shift - m * 256
        mu = m * image_seq_len + b
        with np.errstate(divide="ignore"):
            timesteps = math.exp(mu) / (math.exp(mu) + (1.0 / timesteps - 1.0) ** 1.0)
        timesteps[0] = 1.0
    return [float(t) for t in timesteps]


def denoise_euler_cfg(model_fn, img: jax.Array, timesteps, *,
                      guidance: float = 4.0, true_gs: float = 1.0,
                      neg_model_fn=None, timestep_to_start_cfg: int = 0):
    """Euler sampler with classifier-free guidance (sampling.py:97-150).

    ``model_fn(img, t_vec, g_vec)`` is the positive-conditioning DiT call;
    ``neg_model_fn`` the negative one.  ``pred = neg + true_gs*(pos - neg)``
    from step ``timestep_to_start_cfg`` on; with ``neg_model_fn=None`` this
    reduces to plain Euler (the reconstruction pipeline's no-negative mode).
    """
    b = img.shape[0]
    guidance_vec = jnp.full((b,), guidance, dtype=img.dtype)
    for i, (t_curr, t_prev) in enumerate(zip(timesteps[:-1], timesteps[1:])):
        t_vec = jnp.full((b,), t_curr, dtype=img.dtype)
        pred = model_fn(img, t_vec, guidance_vec)
        if neg_model_fn is not None and i >= timestep_to_start_cfg:
            neg_pred = neg_model_fn(img, t_vec, guidance_vec)
            pred = neg_pred + true_gs * (pred - neg_pred)
        img = img + (t_prev - t_curr) * pred
    return img


def denoise_controlnet(model_fn, controlnet_fn, img: jax.Array, timesteps, *,
                       guidance: float = 4.0, true_gs: float = 1.0,
                       controlnet_gs: float = 0.7,
                       neg_model_fn=None, neg_controlnet_fn=None,
                       timestep_to_start_cfg: int = 0):
    """ControlNet-guided Euler sampler (sampling.py:152-232).

    ``controlnet_fn(img, t_vec, g_vec) -> tuple of residuals`` closes over the
    controlnet params + conditioning tokens (models.controlnet); residuals are
    scaled by ``controlnet_gs`` and fed to ``model_fn(img, t_vec, g_vec,
    residuals)``.  CFG from step ``timestep_to_start_cfg`` on, with the
    negative branch running its own controlnet pass under the negative text
    conditioning exactly as the reference does (sampling.py:205-213) — so
    ``neg_controlnet_fn`` is REQUIRED alongside ``neg_model_fn``; pass
    ``neg_controlnet_fn=controlnet_fn`` explicitly to reuse the positive
    conditioning (a deliberate deviation, not a silent default).
    """
    if neg_model_fn is not None and neg_controlnet_fn is None:
        raise ValueError(
            "neg_model_fn given without neg_controlnet_fn: the reference "
            "runs the controlnet under the NEGATIVE text conditioning in the "
            "CFG branch (sampling.py:205-213).  Pass neg_controlnet_fn "
            "(or neg_controlnet_fn=controlnet_fn to knowingly reuse the "
            "positive conditioning)")
    b = img.shape[0]
    guidance_vec = jnp.full((b,), guidance, dtype=img.dtype)
    for i, (t_curr, t_prev) in enumerate(zip(timesteps[:-1], timesteps[1:])):
        t_vec = jnp.full((b,), t_curr, dtype=img.dtype)
        res = tuple(controlnet_gs * r for r in controlnet_fn(img, t_vec, guidance_vec))
        pred = model_fn(img, t_vec, guidance_vec, res)
        if neg_model_fn is not None and i >= timestep_to_start_cfg:
            neg_res = tuple(controlnet_gs * r
                            for r in neg_controlnet_fn(img, t_vec, guidance_vec))
            neg_pred = neg_model_fn(img, t_vec, guidance_vec, neg_res)
            pred = neg_pred + true_gs * (pred - neg_pred)
        img = img + (t_prev - t_curr) * pred
    return img


def denoise_euler(model_fn, img: jax.Array, timesteps, guidance: float = 4.0):
    """Euler integration: img += (t_prev - t_curr) * v(img, t).

    ``model_fn(img, t_vec, guidance_vec) -> velocity`` closes over conditioning.
    ``timesteps`` is a static python list -> the loop unrolls under jit (each
    step is one DiT forward; num_steps is small, e.g. 20-28).
    """
    b = img.shape[0]
    guidance_vec = jnp.full((b,), guidance, dtype=img.dtype)
    for t_curr, t_prev in zip(timesteps[:-1], timesteps[1:]):
        t_vec = jnp.full((b,), t_curr, dtype=img.dtype)
        pred = model_fn(img, t_vec, guidance_vec)
        img = img + (t_prev - t_curr) * pred
    return img


def get_noise_tokens(key: jax.Array, batch: int, height: int, width: int,
                     channels: int = 16, dtype=jnp.float32) -> jax.Array:
    """Latent-space noise at the packed-token resolution.

    Mirrors get_noise (sampling.py:12-29): latent spatial dims are
    2*ceil(px/16) per side; returned NHWC [B, H_lat, W_lat, C]."""
    h_lat = 2 * math.ceil(height / 16)
    w_lat = 2 * math.ceil(width / 16)
    return jax.random.normal(key, (batch, h_lat, w_lat, channels), dtype)
