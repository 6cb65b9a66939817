"""Stage-1 reconstruction pipeline — the visual smoke test.

Implements the *intended* behavior of the reference's bitrotted
``Continuous/reconstruction/reconstruct_stage1.py`` (SURVEY.md §2.6: broken
imports / signature drift): given an input image and stage-1 checkpoints,
condition the DiT on the tower's class token, run the shifted-schedule Euler
sampler from pure noise, decode with the VAE, save input/output JPEGs.

The whole denoise loop (num_steps DiT forwards) compiles into one jit.
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

from ..models import dit as dit_m
from ..models import vae as vae_m
from ..tasks.conditioning import image_conditioning
from ..train import flow


def reconstruct(params: dict, spec, image01: np.ndarray, *, num_steps: int = 20,
                guidance: float = 4.0, seed: int = 0,
                shift_schedule: bool = True,
                controlnet_params: dict = None,
                control_image01: np.ndarray = None,
                controlnet_gs: float = 0.7) -> np.ndarray:
    """params: {dit, vae, clip{model, project_clip, project_t5}} nested trees;
    spec: tasks.image.TaskSpec; image01: [B, H, W, 3] in [0,1].
    Returns reconstructed [B, H, W, 3] in [0,1].

    ``controlnet_params`` (models.controlnet tree) switches the sampler to
    ``denoise_controlnet`` (reference sampling.py:152-232).  Note: the
    reference reconstructor ACCEPTS a ``control_weight`` arg but never
    exercises it (reconstruct_stage1.py passes controlnet_image=None), so
    this drivable path is a framework addition, not a parity requirement.
    The control image (default: the input image itself) is VAE-encoded to
    packed tokens and drives per-double-block residuals."""
    b, h_px, w_px, _ = image01.shape
    lat_h, lat_w = spec.latent_hw
    seq_len = (lat_h // 2) * (lat_w // 2)
    timesteps = flow.get_schedule(num_steps, seq_len, shift=shift_schedule)
    if controlnet_params is not None and control_image01 is None:
        control_image01 = image01

    @jax.jit
    def run(params, controlnet_params, image01, control_image01, key):
        cond = image_conditioning(spec.tower_kind, params["clip"], image01,
                                  spec.tower_cfg, spec.latent_hw,
                                  compute_dtype=spec.compute_dtype)
        noise = jax.random.normal(key, (b, lat_h, lat_w, spec.vae_cfg.z_channels),
                                  jnp.float32)
        img = dit_m.pack_latent(noise).astype(spec.compute_dtype)

        def model_fn(x, t_vec, g_vec, res=None):
            return dit_m.dit_forward(
                params["dit"], spec.dit_cfg, img=x, img_ids=cond["img_ids"],
                txt=cond["txt"].astype(x.dtype), txt_ids=cond["txt_ids"],
                timesteps=t_vec, y=cond["vec"].astype(x.dtype), guidance=g_vec,
                controlnet_residuals=res)

        if controlnet_params is None:
            tokens = flow.denoise_euler(model_fn, img, timesteps, guidance)
        else:
            # deterministic (mean) latent of the control image, 0.5/0.5-norm
            ctl = vae_m.vae_encode(params["vae"], spec.vae_cfg,
                                   control_image01 * 2.0 - 1.0, sample=False)
            ctl_tokens = dit_m.pack_latent(ctl).astype(spec.compute_dtype)

            def cn_fn(x, t_vec, g_vec):
                from ..models import controlnet as cn_m
                return cn_m.controlnet_forward(
                    controlnet_params, spec.dit_cfg, img=x,
                    img_ids=cond["img_ids"], txt=cond["txt"].astype(x.dtype),
                    txt_ids=cond["txt_ids"], timesteps=t_vec,
                    y=cond["vec"].astype(x.dtype), guidance=g_vec,
                    controlnet_cond=ctl_tokens)

            tokens = flow.denoise_controlnet(model_fn, cn_fn, img, timesteps,
                                             guidance=guidance,
                                             controlnet_gs=controlnet_gs)
        lat = dit_m.unpack_latent(tokens.astype(jnp.float32), lat_h, lat_w)
        out = vae_m.vae_decode(params["vae"], spec.vae_cfg, lat)
        return jnp.clip(out * 0.5 + 0.5, 0.0, 1.0)   # inverse 0.5/0.5 normalize

    ctl_arr = (jnp.asarray(control_image01)
               if control_image01 is not None else jnp.zeros((0,)))
    return np.asarray(run(params, controlnet_params, jnp.asarray(image01),
                          ctl_arr, jax.random.key(seed)))


def reconstruct_from_checkpoints(spec, load_dir: str, load_step: int,
                                 image_path: str, output_dir: str,
                                 tower_params=None, vae_params=None,
                                 num_steps: int = 20, seed: int = 0) -> str:
    """CLI-level flow: load stage-1 .bins + tower/VAE weights, reconstruct
    one image, save input/output JPEGs (reconstruct_stage1.py:202-207)."""
    from PIL import Image
    from ..data.transforms import eval_image_transform
    from ..tasks.image import init_modules, trainable_predicate
    from ..train.checkpoint import load_stage1_components
    from ..train.state import create_state
    from ..train import optim
    from ..train.config import Config, TRAIN_DEFAULTS

    modules = init_modules(jax.random.key(seed), spec, tower_params, vae_params)
    optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
    state = create_state(modules, trainable_predicate(spec, modules), optimizer)
    state = load_stage1_components(state, load_dir, load_step, kind="image")
    params = state.params()

    img = eval_image_transform(open(image_path, "rb").read(), spec.img_size)
    out = reconstruct(params, spec, img[None], num_steps=num_steps, seed=seed)

    os.makedirs(output_dir, exist_ok=True)
    in_path = os.path.join(output_dir, "input.jpg")
    out_path = os.path.join(output_dir, "reconstruction.jpg")
    Image.fromarray((img * 255).astype(np.uint8)).save(in_path)
    Image.fromarray((out[0] * 255).astype(np.uint8)).save(out_path)
    return out_path
