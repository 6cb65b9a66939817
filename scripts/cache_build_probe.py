"""Cache-build cost breakdown: where do the 2.71 ms/img go?

The precompute cache build (``data/precompute.make_frozen_fn``) runs the
frozen VAE encoder + tower forward once per dataset image; its per-image
cost is the whole amortization term in bench.py's single-run accounting
(reference schedule: 100k steps x bs16 x accum2 over ~3M CC3M images,
test_SigLIP_384_stage1.yaml).  Analytic floors at 224px: VAE encoder
200.1 GF + CLIP-L 161.7 GF -> 1.84 ms/img bf16 / 0.92 ms/img int8 on one
v5e.  This probe times each component separately, bf16 vs int8, across
batch sizes, to find the gap.

Usage: ONE TPU job at a time.  python scripts/cache_build_probe.py
"""
import argparse
import time

import numpy as np


def bench_fn(fn, *args, reps=10):
    """Sync via a host read of a scalar reduction, NOT block_until_ready:
    over the axon relay block_until_ready resolves on the handle, not the
    computation (it measured a 193 ms train step as 6.7 ms)."""
    import jax
    import jax.numpy as jnp

    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(jnp.sum(leaf).astype(jnp.float32))

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    sync(o)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batches", type=str, default="32,64,128")
    ap.add_argument("--quants", type=str, default="none,int8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from genhancer_tpu.core import quant as q_m
    from genhancer_tpu.data import precompute as pre_m
    from genhancer_tpu.models import vae as vae_m
    from genhancer_tpu.models.towers import clip as clip_m

    vae_cfg = vae_m.VAE_CONFIGS["flux-dev"]
    tower_cfg = clip_m.CLIP_VARIANTS["clip-vit-large-patch14"]

    key = jax.random.key(0)
    vp_f = vae_m.init_vae(key, vae_cfg)
    tp_f = clip_m.init_clip(key, tower_cfg)
    rng = np.random.default_rng(0)

    for quant in args.quants.split(","):
        if quant == "int8":
            vp = dict(vp_f, encoder=q_m.quantize_conv_tree(vp_f["encoder"]))
            tp = q_m.quantize_linear_tree(tp_f)
        elif quant == "int8mix":
            # mixed-precision encoder (r5 vae_conv_mxu_probe finding): int8
            # convs only at >=256 channels — at the 224px level (128 ch) the
            # int8 conv emitter measures SLOWER than bf16 (80.9 vs 97.8
            # TF/s at B=64), so low-channel convs stay bf16
            vp = dict(vp_f, encoder=q_m.quantize_conv_tree(
                vp_f["encoder"], min_channels=256))
            tp = q_m.quantize_linear_tree(tp_f)
        elif quant == "int8clip":   # int8 tower, bf16 VAE convs
            vp = vp_f
            tp = q_m.quantize_linear_tree(tp_f)
        else:
            vp, tp = vp_f, tp_f

        @jax.jit
        def vae_only(vpp, px):
            x = (px - 0.5).astype(jnp.bfloat16)
            return vae_m.encoder_forward(vpp["encoder"], vae_cfg, x)

        @jax.jit
        def clip_only(tpp, px):
            x = (px - 0.5).astype(jnp.bfloat16)
            cls_tok, _ = pre_m.tower_features("clip", {"model": tpp}, x,
                                              tower_cfg)
            return cls_tok

        full = pre_m.make_frozen_fn("clip", tp, tower_cfg, vp, vae_cfg,
                                    vae_dtype=jnp.bfloat16,
                                    compute_dtype=jnp.bfloat16,
                                    with_patches=False)
        for bs in [int(b) for b in args.batches.split(",")]:
            px = jnp.asarray(rng.random((bs, args.img, args.img, 3),
                                        dtype=np.float32))
            tv = bench_fn(vae_only, vp, px)
            tc = bench_fn(clip_only, tp, px)
            tf = bench_fn(full, px)
            print(f"quant={quant:5s} bs={bs:4d}  vae {tv/bs:.3f}  "
                  f"clip {tc/bs:.3f}  full {tf/bs:.3f} ms/img  "
                  f"(sum {tv/bs + tc/bs:.3f})", flush=True)


if __name__ == "__main__":
    main()
