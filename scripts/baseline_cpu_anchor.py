#!/usr/bin/env python
"""Measured stack-overhead anchor for the A100 baseline model (BASELINE.md).

Runs ONE identical stage-1 training step through BOTH stacks on the SAME
silicon (this host's CPU, fp32, identical shapes):

  * the reference eager-torch stack — importing the reference's own Flux DiT
    and AutoEncoder classes from /root/reference (read-only import, no code
    copied) plus HF CLIPModel, composed exactly like
    Continuous/train_SigLIP_stage1.py:242-275 (VAE encode under no_grad,
    CLIP forward + LN/Linear/GELU/Linear projectors, logit-normal t,
    interpolation, DiT fwd, MSE, backward, clip_grad_norm_, AdamW);
  * this framework's jit step (tasks.image.make_train_step) with fp32
    compute/params to match.

The measured ratio isolates *stack* efficiency (eager dispatch + unfused ops
vs one compiled XLA program) from hardware peaks, and anchors the eager-MFU
assumption in the A100 baseline model: a compiled/eager ratio of R on
identical silicon supports modeling eager A100 MFU at (our measured TPU MFU)
/ R, clamped into the published sensitivity corridor.

Usage: python scripts/baseline_cpu_anchor.py [--batch 1] [--steps 3]
"""

import argparse
import json
import sys
import time


def time_reference_torch(batch: int, steps: int, img: int = 224) -> float:
    sys.path.insert(0, "/root/reference/Continuous")
    import torch
    # src.flux.util imports optimum.quanto (not installed) — construct the
    # registry dataclasses directly with the flux-dev dims (util.py:124-191)
    from src.flux.model import Flux, FluxParams
    from src.flux.modules.autoencoder import AutoEncoder, AutoEncoderParams
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    torch.manual_seed(0)
    params = FluxParams(
        in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=3072,
        mlp_ratio=4.0, num_heads=24, depth=2, depth_single_blocks=4,
        axes_dim=[16, 56, 56], theta=10_000, qkv_bias=True, guidance_embed=True)
    ae_params = AutoEncoderParams(
        resolution=256, in_channels=3, ch=128, out_ch=3, ch_mult=[1, 2, 4, 4],
        num_res_blocks=2, z_channels=16, scale_factor=0.3611,
        shift_factor=0.1159)
    dit = Flux(params).float().train()
    ae = AutoEncoder(ae_params).float().eval()
    clip = CLIPVisionModelWithProjection(CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=224, patch_size=14,
        projection_dim=768, hidden_act="quick_gelu")).float().eval()
    for p in list(ae.parameters()) + list(clip.parameters()):
        p.requires_grad_(False)

    # projectors as in the reference OpenAICLIP wrapper (CLIP_bank.py:17-28)
    proj_clip = torch.nn.Sequential(
        torch.nn.LayerNorm(768), torch.nn.Linear(768, 768),
        torch.nn.GELU(), torch.nn.Linear(768, 768)).float()
    proj_t5 = torch.nn.Sequential(
        torch.nn.LayerNorm(768), torch.nn.Linear(768, 768),
        torch.nn.GELU(), torch.nn.Linear(768, 4096)).float()

    trainable = (list(dit.parameters()) + list(proj_clip.parameters())
                 + list(proj_t5.parameters()))
    opt = torch.optim.AdamW(trainable, lr=1e-4, betas=(0.9, 0.999),
                            weight_decay=0.01, eps=1e-8)

    h = w = img // 8
    img_ids = torch.zeros(h // 2, w // 2, 3)
    img_ids[..., 1] += torch.arange(h // 2)[:, None]
    img_ids[..., 2] += torch.arange(w // 2)[None, :]
    img_ids = img_ids.reshape(1, -1, 3).repeat(batch, 1, 1)
    txt_ids = torch.zeros(batch, 1, 3)

    def step(x):
        with torch.no_grad():
            lat = ae.encode(2 * x - 1)                       # fp32 frozen VAE
            emb = clip(pixel_values=x).image_embeds          # frozen CLIP
        vec = proj_clip(emb)
        txt = proj_t5(emb)[:, None, :]
        x1 = lat.reshape(batch, 16, h // 2, 2, w // 2, 2).permute(
            0, 2, 4, 1, 3, 5).reshape(batch, -1, 64)
        t = torch.sigmoid(torch.randn(batch))
        x0 = torch.randn_like(x1)
        xt = (1 - t[:, None, None]) * x1 + t[:, None, None] * x0
        pred = dit(img=xt, img_ids=img_ids, txt=txt, txt_ids=txt_ids,
                   timesteps=t, y=vec, guidance=torch.full((batch,), 4.0))
        loss = torch.nn.functional.mse_loss(pred, x0 - x1)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(trainable, 1.0)
        opt.step()
        opt.zero_grad()
        return float(loss)

    x = torch.rand(batch, 3, img, img)
    step(x)                                                  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step(x)
    return (time.perf_counter() - t0) / steps * 1000.0


def time_ours_jax_cpu(batch: int, steps: int, img: int = 224) -> float:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from genhancer_tpu.models import dit as dit_m, vae as vae_m
    from genhancer_tpu.models.towers import clip as clip_m
    from genhancer_tpu.tasks import image as image_task
    from genhancer_tpu.train import optim
    from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

    spec = image_task.TaskSpec(
        stage="stage1", tower_kind="clip", img_size=img, clip_image_size=224,
        dit_cfg=dit_m.DIT_CONFIGS["flux-dev"],
        vae_cfg=vae_m.VAE_CONFIGS["flux-dev"],
        tower_cfg=clip_m.CLIP_VARIANTS["clip-vit-large-patch14"],
        compute_dtype=jnp.float32, dit_param_dtype=jnp.float32,
        vae_dtype=jnp.float32)
    optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
    state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
    step = image_task.make_train_step(spec, optimizer)
    batch_data = {"image": jnp.asarray(np.random.default_rng(0).random(
        (batch, img, img, 3), np.float32))}
    state, m = step(state, batch_data, jax.random.key(0))    # warmup/compile
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, batch_data, jax.random.key(i))
    float(m["loss"])
    return (time.perf_counter() - t0) / steps * 1000.0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--stack", choices=["torch", "jax", "both"], default="both")
    args = ap.parse_args()
    out = {"batch": args.batch, "steps": args.steps, "platform": "cpu-1core"}
    if args.stack in ("torch", "both"):
        out["reference_torch_ms"] = round(
            time_reference_torch(args.batch, args.steps), 1)
        print("torch:", out["reference_torch_ms"], flush=True)
    if args.stack in ("jax", "both"):
        out["ours_jax_ms"] = round(time_ours_jax_cpu(args.batch, args.steps), 1)
        print("jax:", out["ours_jax_ms"], flush=True)
    if args.stack == "both":
        out["eager_over_compiled"] = round(
            out["reference_torch_ms"] / out["ours_jax_ms"], 3)
    print(json.dumps(out))
