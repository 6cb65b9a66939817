"""Reconstruction CLI (working replacement for the reference's bitrotted
``reconstruction/reconstruct_stage1.py``).

``python -m genhancer_tpu.cli.reconstruct --config cfg.yaml --image in.jpg
--load_dir out/ --load_step 1000 --output_dir recon/``
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    parser = argparse.ArgumentParser(description="stage-1 reconstruction")
    parser.add_argument("--config", required=True)
    parser.add_argument("--image", required=True)
    parser.add_argument("--load_dir", required=True)
    parser.add_argument("--load_step", type=int, required=True)
    parser.add_argument("--output_dir", default="reconstruction_out")
    parser.add_argument("--num_steps", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from ..train.config import load_config
    from ..tasks import factory
    from ..eval.reconstruct import reconstruct_from_checkpoints

    cfg = load_config(args.config)
    cfg.setdefault("task", "image_stage1")
    spec, (tower_params, vae_params), _loader, *_ = factory.build_task(cfg)
    out = reconstruct_from_checkpoints(
        spec, args.load_dir, args.load_step, args.image, args.output_dir,
        tower_params=tower_params, vae_params=vae_params,
        num_steps=args.num_steps, seed=args.seed)
    print(f"reconstruction written to {out}")
    return out


def cli() -> None:
    """Console-script entry: main() returns a result dict for programmatic
    callers/tests; returning it from the entry point would become the process
    exit status (truthy dict -> exit 1), so the script wrapper discards it."""
    main()


if __name__ == "__main__":
    cli()
