"""Precompute-conditioning CLI: cache the frozen stage-1 compute to shards.

    python -m genhancer_tpu.cli.precompute --config cfg.yaml \
        --output_dir /data/pre_shards [--batch 32]

Reads the same YAML as the trainer (model_name/tower/clip_config/data_config
select the frozen models and the source shards), runs the frozen VAE encoder
+ tower over the dataset once on-device, and writes ``pre-%06d.tar`` feature
shards (see data/precompute.py for format + exactness notes).  Train against
them with::

    data_config:
      img_dir: /data/pre_shards     # or video_dir
      precomputed: true

Video caching is semantics-exact (deterministic frame transform; the VAE
posterior is re-sampled per step from cached moments).  Image caching
defaults to the augmentation-preserving mode: ``--variants K`` i.i.d.
RandomResizedCrop draws per image; the loader samples one per visit
(marginally identical to inline augmentation — data/precompute.py).
``--augment center`` selects the legacy deterministic single-crop cache.
"""

from __future__ import annotations

import argparse
import logging

log = logging.getLogger("genhancer_tpu.precompute")


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description="genhancer-tpu precompute")
    parser.add_argument("--config", required=True, help="path to YAML config")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--samples_per_shard", type=int, default=2000)
    parser.add_argument("--augment", choices=("train", "center"),
                        default="train",
                        help="image mode: 'train' caches --variants i.i.d. "
                             "RandomResizedCrop draws per image "
                             "(augmentation-preserving); 'center' caches one "
                             "deterministic center crop")
    parser.add_argument("--variants", type=int, default=1,
                        help="augmentation variants per image (augment=train)."
                             " Each variant is an i.i.d. RandomResizedCrop "
                             "draw, so K=1 already matches the inline "
                             "augmentation distribution for single-epoch "
                             "schedules; set K >= ceil(epochs) so revisits "
                             "of the same image also get fresh crops")
    parser.add_argument("--mode", choices=("features", "latents"),
                        default="features",
                        help="features: moments + tower features (stage-1 "
                             "cache, both frozen paths skipped).  latents: "
                             "moments + the crop pixels, no tower — the "
                             "stage-2 cache (tower trains live on the "
                             "cached crop); train with data_config."
                             "precomputed: 'latents'")
    args = parser.parse_args(argv)

    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S", level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from .. import registry
    from ..data import precompute as pre
    from ..train.config import load_config

    cfg = load_config(args.config)
    cc = cfg.get("clip_config", {}) or {}
    dc = cfg.get("data_config", {}) or {}
    img_size = int(dc.get("img_size", 224))
    is_video = "video_dir" in dc
    src = dc.get("video_dir") if is_video else dc.get("img_dir")
    if not src:
        parser.error("data_config must contain img_dir or video_dir")

    kind, tower_cfg = registry.tower_family_and_config(
        cfg.get("tower", "openai_clip"), int(cc.get("clip_image_size", img_size)),
        cc.get("clip_type"))
    key = jax.random.key(int(cfg.get("seed", 0)))
    vae_params, vae_cfg = registry.build_vae(cfg.get("model_name", "flux-dev"),
                                             cfg.get("ae_path"),
                                             jax.random.fold_in(key, 1))
    tower_params, tower_cfg = registry.load_tower(
        kind, tower_cfg, cc.get("model_dir"), jax.random.fold_in(key, 2))

    vae_dtype = (jnp.float32 if cfg.get("vae_dtype") == "fp32" else jnp.bfloat16)
    # tower compute dtype mirrors the trainer (factory.build_task reads
    # mixed_precision) so cached features match the inline path exactly
    compute_dtype = (jnp.bfloat16
                     if cfg.get("mixed_precision", "bf16") == "bf16"
                     else jnp.float32)
    if args.mode == "latents":
        if is_video:
            parser.error("--mode latents is image-only for now (the video "
                         "stage-2 hot path is the n_cond-frame tower pass, "
                         "not the single target-frame VAE encode)")
        fn = pre.make_frozen_latent_fn(vae_params, vae_cfg,
                                       vae_dtype=vae_dtype)
    else:
        fn = pre.make_frozen_fn(kind, tower_params, tower_cfg, vae_params,
                                vae_cfg, vae_dtype=vae_dtype,
                                compute_dtype=compute_dtype,
                                with_patches=is_video)
    if is_video:
        n = pre.precompute_video_dir(src, args.output_dir, fn, img_size,
                                     batch=args.batch,
                                     samples_per_shard=args.samples_per_shard)
        log.info("cached %d video frames -> %s", n, args.output_dir)
    else:
        if args.augment == "center":
            log.warning("augment=center fixes the crop per sample (center "
                        "crop replaces RandomResizedCrop); use the default "
                        "augment=train for the augmentation-preserving cache")
        else:
            log.info("augmentation-preserving cache: %d RandomResizedCrop "
                     "variants per image", args.variants)
        n = pre.precompute_image_dir(src, args.output_dir, fn, img_size,
                                     batch=args.batch,
                                     samples_per_shard=args.samples_per_shard,
                                     augment=args.augment,
                                     variants=args.variants,
                                     seed=int(cfg.get("seed", 0)),
                                     mode=args.mode)
        log.info("cached %d images -> %s", n, args.output_dir)
    return {"written": n, "output_dir": args.output_dir}


def cli() -> None:
    main()


if __name__ == "__main__":
    main()
