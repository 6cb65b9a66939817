#!/usr/bin/env python
"""Ablation timing for the two hot forwards (CLIP tower, DiT).

Replaces one primitive at a time with an identity (monkeypatched before
trace) to attribute time: attention, activations, layernorms, qk-rmsnorm.
Run on the real TPU; one variant per process invocation keeps HBM free:

    python scripts/ablate.py --target clip --variant full|noattn|noact|noln|skeleton
    python scripts/ablate.py --target dit  --variant full|noattn|noln|noact|noqknorm
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", choices=["clip", "dit"], required=True)
    ap.add_argument("--variant", default="full")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from genhancer_tpu.core import nn, attention as attn_m

    if args.variant in ("noattn", "skeleton"):
        def id_sdpa(q, k, v, *rest):
            return v
        attn_m.sdpa_auto = id_sdpa
        attn_m.sdpa = id_sdpa

        def id_attention(q, k, v, cos, sin):
            b, l, h, d = v.shape
            return v.reshape(b, l, h * d)
        attn_m.attention = id_attention
    if args.variant in ("noact", "skeleton"):
        for k in list(nn.ACTIVATIONS):
            nn.ACTIVATIONS[k] = lambda x: x
        nn.gelu_tanh = lambda x: x
        nn.quick_gelu = lambda x: x
    if args.variant in ("noln", "skeleton"):
        def id_ln(p, x, eps=1e-6):
            if "weight" in p:
                return x * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)
            return x
        nn.layernorm = id_ln
    if args.variant == "noqknorm":
        nn.rmsnorm = lambda p, x, eps=1e-6: x
    if args.variant == "fastqknorm":
        def fast_rmsnorm(p, x, eps=1e-6):
            ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                          keepdims=True)
            inv = jax.lax.rsqrt(ms + eps).astype(x.dtype)
            return (x * inv) * p["scale"].astype(x.dtype)
        nn.rmsnorm = fast_rmsnorm
    if args.variant == "noquickgelu":
        nn.ACTIVATIONS["quick_gelu"] = lambda x: x
    if args.variant == "xlaattn":
        attn_m._USE_PALLAS = "0"

    rng = np.random.default_rng(0)

    if args.target == "clip":
        # reimport AFTER patching so modules bind the patched fns... they bind
        # at call time through module attributes except `attention` imported
        # by models.dit directly — patch those import sites too.
        from genhancer_tpu.models.towers import encoder as enc_m
        from genhancer_tpu.models.towers import clip as clip_m
        cfg = clip_m.CLIP_VARIANTS["clip-vit-large-patch14"]
        params = clip_m.init_clip(jax.random.key(0), cfg)
        px = jnp.asarray(rng.random((args.batch, 224, 224, 3), np.float32),
                         jnp.bfloat16)

        @jax.jit
        def fwd(p):
            last, pooled = clip_m.vision_forward(p["vision_model"], px, cfg.vision)
            return pooled

        ms = timeit(fwd, params, iters=args.iters)
    else:
        from genhancer_tpu.models import dit as dit_m
        if args.variant in ("noattn", "skeleton"):
            def id_attention(q, k, v, cos, sin):
                b, l, h, d = v.shape
                return v.reshape(b, l, h * d)
            dit_m.attention = id_attention
        cfg = dit_m.DIT_CONFIGS["flux-dev"]
        params = nn.tree_cast(dit_m.init_dit(jax.random.key(0), cfg), jnp.bfloat16)
        L = 196
        xt = jnp.asarray(rng.standard_normal((args.batch, L, 64)), jnp.bfloat16)
        txt = jnp.asarray(rng.standard_normal((args.batch, 1, 4096)), jnp.bfloat16)
        vec = jnp.asarray(rng.standard_normal((args.batch, 768)), jnp.bfloat16)
        from genhancer_tpu.core.rope import spatial_ids
        img_ids = jnp.broadcast_to(spatial_ids(14, 14, t=0.0)[None], (args.batch, L, 3))
        txt_ids = jnp.zeros((args.batch, 1, 3), jnp.float32)
        ts = jnp.full((args.batch,), 0.5, jnp.bfloat16)
        gd = jnp.full((args.batch,), 4.0, jnp.bfloat16)

        @jax.jit
        def fwd(p):
            return dit_m.dit_forward(p, cfg, img=xt, img_ids=img_ids, txt=txt,
                                     txt_ids=txt_ids, timesteps=ts, y=vec,
                                     guidance=gd)

        ms = timeit(fwd, params, iters=args.iters)

    print({"target": args.target, "variant": args.variant, "batch": args.batch,
           "ms": round(ms, 3)})


if __name__ == "__main__":
    main()
