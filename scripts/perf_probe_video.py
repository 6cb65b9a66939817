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
                    choices=["none", "int8", "int8_full"])
    ap.add_argument("--remat-policy", type=str, default="full",
                    choices=["full", "save_attn", "dots", "none"],
                    help="'none' disables per-block remat entirely (flash "
                         "attention keeps activations O(L); fits at small B)")
    ap.add_argument("--precomputed", action="store_true",
                    help="feed cached conditioning (data.precompute batch "
                         "layout: moments + cond_patches/cond_vecs) — the "
                         "frozen VAE/tower are skipped in the step")
    ap.add_argument("--stage", type=str, default="stage1",
                    choices=["stage1", "stage2_all"],
                    help="stage2_all: tower inside autodiff with LoRA "
                         "(QLoRA int8 base when --quant != none); reference "
                         "video stage-2 schedule is batch 4 @336px")
    ap.add_argument("--tower-remat", action="store_true",
                    help="remat the tower encoder layers (stage-2 only "
                         "effect; the factory auto-gate equivalent)")
    args = ap.parse_args()
    if args.stage == "stage2_all" and args.precomputed:
        ap.error("--precomputed caches tower features — stage-1 only "
                 "(stage-2 trains the tower)")

    from genhancer_tpu.models import dit as dit_m, vae as vae_m
    from genhancer_tpu.models.towers import clip as clip_m
    from genhancer_tpu.tasks import video as video_task
    from genhancer_tpu.train import optim
    from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

    q = args.quant
    spec = video_task.VideoTaskSpec(
        mode=args.mode, stage=args.stage, tower_kind="clip",
        img_size=args.img, clip_image_size=336,
        dit_cfg=dit_m.DIT_CONFIGS["flux-dev"],
        vae_cfg=vae_m.VAE_CONFIGS["flux-dev"],
        tower_cfg=clip_m.CLIP_VARIANTS["clip-vit-large-patch14-336"],
        compute_dtype=jnp.bfloat16, dit_param_dtype=jnp.bfloat16,
        vae_dtype=jnp.bfloat16,
        remat=args.remat_policy != "none",   # trainer auto-remat for long L
        remat_policy=(args.remat_policy if args.remat_policy != "none"
                      else "full"),
        tower_quant=("int8" if q != "none" else "none"),
        vae_quant=("int8" if q != "none" else "none"), dit_quant=q,
        dit_quant_cache=q in ("int8", "int8_full", "int8_dw"),
        tower_remat=args.tower_remat)

    q8 = q in ("int8", "int8_full", "int8_dw")
    optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)),
                                     fused="pallas" if q8 else None,
                                     emit_quant=q8)
    state = video_task.create_task_state(jax.random.key(0), spec, optimizer)
    step = video_task.make_train_step(spec, optimizer)

    n_cond = spec.n_cond
    rng = np.random.default_rng(0)
    if args.precomputed:
        h, w = spec.latent_hw
        zc = 2 * spec.vae_cfg.z_channels
        vcfg = spec.tower_cfg.vision
        lp = (vcfg.image_size // vcfg.patch_size) ** 2
        batch = {
            "moments": jnp.asarray(
                rng.normal(size=(args.batch, h, w, zc)).astype(np.float32) * 0.3),
            "cond_patches": jnp.asarray(rng.normal(
                size=(args.batch, n_cond, lp, vcfg.hidden_size))
                .astype(np.float32)),
            "cond_vecs": jnp.asarray(rng.normal(
                size=(args.batch, n_cond, spec.tower_cfg.projection_dim))
                .astype(np.float32)),
        }
    else:
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
        "mode": args.mode, "stage": args.stage, "batch": args.batch,
        "img": args.img,
        "quant": q, "remat_policy": args.remat_policy,
        "tower_remat": bool(args.tower_remat),
        "precomputed": bool(args.precomputed),
        "step_ms": round(ms, 2),
        "samples_per_sec": round(args.batch / ms * 1000.0, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
