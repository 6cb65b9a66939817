#!/usr/bin/env python
"""On-chip video-mode step timing (middle / next / next2 modes; stage-1
full-size models at 336px) with the quant stack on/off.

Reference schedule for these modes: batch 32/device at 336px
(test_OpenAICLIP_336_video_stage1.yaml).  Timing methodology follows
scripts/perf_probe.py (scalar device_get to drain the axon relay queue).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=336)
    ap.add_argument("--mode", type=str, default="middle")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--quant", type=str, default="none",
                    choices=["none", "int8"])
    ap.add_argument("--remat-policy", type=str, default="full",
                    choices=["full", "save_attn", "dots"])
    args = ap.parse_args()

    from genhancer_tpu.models import dit as dit_m, vae as vae_m
    from genhancer_tpu.models.towers import clip as clip_m
    from genhancer_tpu.tasks import video as video_task
    from genhancer_tpu.train import optim
    from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

    q = args.quant
    spec = video_task.VideoTaskSpec(
        mode=args.mode, stage="stage1", tower_kind="clip",
        img_size=args.img, clip_image_size=336,
        dit_cfg=dit_m.DIT_CONFIGS["flux-dev"],
        vae_cfg=vae_m.VAE_CONFIGS["flux-dev"],
        tower_cfg=clip_m.CLIP_VARIANTS["clip-vit-large-patch14-336"],
        compute_dtype=jnp.bfloat16, dit_param_dtype=jnp.bfloat16,
        vae_dtype=jnp.bfloat16, remat=True,   # trainer auto-remat for long L
        remat_policy=args.remat_policy,
        tower_quant=q, vae_quant=q, dit_quant=q)

    optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
    state = video_task.create_task_state(jax.random.key(0), spec, optimizer)
    step = video_task.make_train_step(spec, optimizer)

    n_cond = spec.n_cond
    rng = np.random.default_rng(0)
    batch = {
        "cond": jnp.asarray(rng.random(
            (args.batch, n_cond, args.img, args.img, 3), dtype=np.float32)),
        "target": jnp.asarray(rng.random(
            (args.batch, args.img, args.img, 3), dtype=np.float32)),
    }

    for i in range(2):
        state, m = step(state, batch, jax.random.key(i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, m = step(state, batch, jax.random.key(100 + i))
    float(m["loss"])
    ms = (time.perf_counter() - t0) / args.iters * 1000.0
    print(json.dumps({
        "mode": args.mode, "batch": args.batch, "img": args.img,
        "quant": q, "remat_policy": args.remat_policy,
        "step_ms": round(ms, 2),
        "samples_per_sec": round(args.batch / ms * 1000.0, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
