"""FLUX.1-dev autoencoder (f8, z=16) in NHWC JAX.

Behavioral parity with the reference AutoEncoder
(``/root/reference/Continuous/src/flux/modules/autoencoder.py``): ch=128,
ch_mult=[1,2,4,4], 2 ResnetBlocks per level, mid Res+Attn+Res, GroupNorm(32)
+ swish, Downsample via asymmetric (0,1,0,1) pad + stride-2 VALID conv,
Upsample via 2x nearest + conv, DiagonalGaussian sampling, latent
``scale_factor*(z - shift_factor)`` with 0.3611/0.1159
(``src/flux/util.py:146-156``).

TPU-native: NHWC layouts throughout (XLA's preferred conv layout), float32
compute (the reference keeps the frozen VAE in fp32 during training —
``train_SigLIP_stage1.py:243``), weights loadable from the official
``ae.safetensors`` via genhancer_tpu.weights.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core import nn


@dataclass(frozen=True)
class VAEConfig:
    resolution: int = 256
    in_channels: int = 3
    ch: int = 128
    out_ch: int = 3
    ch_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    scale_factor: float = 0.3611
    shift_factor: float = 0.1159


VAE_CONFIGS = {
    "flux-dev": VAEConfig(),
    "flux-schnell": VAEConfig(),
    # miniature VAE with the same f8/z16 IO contract, for smoke tests / CI
    "flux-debug": VAEConfig(ch=32),
}


def swish(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_resnet(key, cin, cout):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": nn.groupnorm_init(cin),
        "conv1": nn.conv2d_init(ks[0], cin, cout, 3),
        "norm2": nn.groupnorm_init(cout),
        "conv2": nn.conv2d_init(ks[1], cout, cout, 3),
    }
    if cin != cout:
        p["nin_shortcut"] = nn.conv2d_init(ks[2], cin, cout, 1)
    return p


def _init_attn(key, c):
    ks = jax.random.split(key, 4)
    return {
        "norm": nn.groupnorm_init(c),
        "q": nn.conv2d_init(ks[0], c, c, 1),
        "k": nn.conv2d_init(ks[1], c, c, 1),
        "v": nn.conv2d_init(ks[2], c, c, 1),
        "proj_out": nn.conv2d_init(ks[3], c, c, 1),
    }


def init_encoder(key, cfg: VAEConfig):
    n_levels = len(cfg.ch_mult)
    ks = iter(jax.random.split(key, 4 + n_levels * (cfg.num_res_blocks + 1) + 3))
    in_mult = (1,) + tuple(cfg.ch_mult)
    down = []
    for i in range(n_levels):
        cin, cout = cfg.ch * in_mult[i], cfg.ch * cfg.ch_mult[i]
        level = {"block": []}
        for _ in range(cfg.num_res_blocks):
            level["block"].append(_init_resnet(next(ks), cin, cout))
            cin = cout
        if i != n_levels - 1:
            level["downsample"] = {"conv": nn.conv2d_init(next(ks), cout, cout, 3)}
        else:
            next(ks)
        down.append(level)
    block_in = cfg.ch * cfg.ch_mult[-1]
    return {
        "conv_in": nn.conv2d_init(next(ks), cfg.in_channels, cfg.ch, 3),
        "down": down,
        "mid": {
            "block_1": _init_resnet(next(ks), block_in, block_in),
            "attn_1": _init_attn(next(ks), block_in),
            "block_2": _init_resnet(next(ks), block_in, block_in),
        },
        "norm_out": nn.groupnorm_init(block_in),
        "conv_out": nn.conv2d_init(next(ks), block_in, 2 * cfg.z_channels, 3),
    }


def init_decoder(key, cfg: VAEConfig):
    n_levels = len(cfg.ch_mult)
    ks = iter(jax.random.split(key, 4 + n_levels * (cfg.num_res_blocks + 2) + 3))
    block_in = cfg.ch * cfg.ch_mult[-1]
    up = []
    cin = block_in
    for i in reversed(range(n_levels)):
        cout = cfg.ch * cfg.ch_mult[i]
        level = {"block": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["block"].append(_init_resnet(next(ks), cin, cout))
            cin = cout
        if i != 0:
            level["upsample"] = {"conv": nn.conv2d_init(next(ks), cout, cout, 3)}
        up.insert(0, level)
    return {
        "conv_in": nn.conv2d_init(next(ks), cfg.z_channels, block_in, 3),
        "mid": {
            "block_1": _init_resnet(next(ks), block_in, block_in),
            "attn_1": _init_attn(next(ks), block_in),
            "block_2": _init_resnet(next(ks), block_in, block_in),
        },
        "up": up,
        "norm_out": nn.groupnorm_init(cin),
        "conv_out": nn.conv2d_init(next(ks), cin, cfg.out_ch, 3),
    }


def init_vae(key, cfg: VAEConfig):
    k1, k2 = jax.random.split(key)
    return {"encoder": init_encoder(k1, cfg), "decoder": init_decoder(k2, cfg)}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _resnet(p, x):
    h = nn.conv2d(p["conv1"], swish(nn.groupnorm(p["norm1"], x)))
    h = nn.conv2d(p["conv2"], swish(nn.groupnorm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = nn.conv2d(p["nin_shortcut"], x)
    return x + h


def _attn_block(p, x):
    """Single-head spatial self-attention over HxW tokens (autoencoder.py:25-52)."""
    h = nn.groupnorm(p["norm"], x)
    b, hh, ww, c = h.shape
    q = nn.conv2d(p["q"], h).reshape(b, hh * ww, 1, c)
    k = nn.conv2d(p["k"], h).reshape(b, hh * ww, 1, c)
    v = nn.conv2d(p["v"], h).reshape(b, hh * ww, 1, c)
    from ..core.attention import sdpa_xla
    out = sdpa_xla(q, k, v).reshape(b, hh, ww, c)
    return x + nn.conv2d(p["proj_out"], out)


def _downsample(p, x):
    # asymmetric pad (left 0, right 1, top 0, bottom 1), VALID stride-2
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return nn.conv2d(p["conv"], x, stride=2, padding="VALID")


def _upsample(p, x):
    b, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return nn.conv2d(p["conv"], x)


def encoder_forward(p, cfg: VAEConfig, x: jax.Array) -> jax.Array:
    """x: [B, H, W, 3] in [-1, 1] -> moments [B, H/8, W/8, 2*z]."""
    h = nn.conv2d(p["conv_in"], x)
    for i, level in enumerate(p["down"]):
        for bp in level["block"]:
            h = _resnet(bp, h)
        if "downsample" in level:
            h = _downsample(level["downsample"], h)
    h = _resnet(p["mid"]["block_1"], h)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet(p["mid"]["block_2"], h)
    return nn.conv2d(p["conv_out"], swish(nn.groupnorm(p["norm_out"], h)))


def decoder_forward(p, cfg: VAEConfig, z: jax.Array) -> jax.Array:
    h = nn.conv2d(p["conv_in"], z)
    h = _resnet(p["mid"]["block_1"], h)
    h = _attn_block(p["mid"]["attn_1"], h)
    h = _resnet(p["mid"]["block_2"], h)
    for i in reversed(range(len(p["up"]))):
        level = p["up"][i]
        for bp in level["block"]:
            h = _resnet(bp, h)
        if "upsample" in level:
            h = _upsample(level["upsample"], h)
    return nn.conv2d(p["conv_out"], swish(nn.groupnorm(p["norm_out"], h)))


def diagonal_gaussian(key, moments: jax.Array, sample: bool = True) -> jax.Array:
    """moments [..., 2z] channel-chunked into mean/logvar (autoencoder.py:262-274)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if not sample:
        return mean
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def vae_encode(params, cfg: VAEConfig, x: jax.Array, key=None,
               sample: bool = True, dtype=jnp.float32) -> jax.Array:
    """Full encode: moments -> (sampled) z -> scale*(z - shift).

    ``dtype`` is the conv compute dtype: float32 by default (reference parity
    — the frozen encoder runs fp32 in every trainer,
    train_SigLIP_stage1.py:243); bfloat16 roughly halves encode time on TPU
    with sub-1e-2 latent drift (the latents feed a noised interpolation, so
    the objective is robust to it).  Output is always float32.
    """
    moments = encoder_forward(params["encoder"], cfg, x.astype(dtype))
    moments = moments.astype(jnp.float32)
    if sample and key is None:
        raise ValueError("key required when sample=True")
    z = diagonal_gaussian(key, moments, sample=sample)
    return cfg.scale_factor * (z - cfg.shift_factor)


def vae_decode(params, cfg: VAEConfig, z: jax.Array) -> jax.Array:
    z = z.astype(jnp.float32) / cfg.scale_factor + cfg.shift_factor
    return decoder_forward(params["decoder"], cfg, z)
