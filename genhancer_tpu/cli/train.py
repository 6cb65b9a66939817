"""Training CLI: ``python -m genhancer_tpu.cli.train --config cfg.yaml``.

Preserves the reference launch surface (``--config`` YAML,
``train_SigLIP_stage1.py:75-87``) and adds:
  * ``--task`` / ``--tower`` overrides (else read from the YAML);
  * ``--trainer <reference script name>`` to map any of the 12 reference
    trainer names onto a task (tasks.factory.TRAINER_COMPAT);
  * ``--profile`` to capture a jax.profiler trace of steps 2-4.

No ``accelerate launch`` wrapper is needed: single-process drives all local
chips through the mesh; multi-host uses the standard JAX distributed env.
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description="genhancer-tpu trainer")
    parser.add_argument("--config", required=True, help="path to YAML config")
    parser.add_argument("--task", default=None,
                        help="task name (e.g. image_stage1, video_sliding_stage2_all)")
    parser.add_argument("--tower", default=None,
                        help="tower family: openai_clip | siglip | metaclip")
    parser.add_argument("--trainer", default=None,
                        help="reference trainer script name to emulate")
    parser.add_argument("--profile", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S", level=logging.INFO)

    from ..train.config import load_config
    from ..tasks.factory import TRAINER_COMPAT

    cfg = load_config(args.config)
    if args.trainer:
        task, tower = TRAINER_COMPAT[args.trainer.removesuffix(".py")]
        cfg["task"], cfg["tower"] = task, tower
    if args.task:
        cfg["task"] = args.task
    if args.tower:
        cfg["tower"] = args.tower
    if "task" not in cfg:
        parser.error("config must contain 'task' (or pass --task/--trainer)")

    from ..train.trainer import train_from_config
    metrics = train_from_config(cfg, profile=args.profile)
    logging.getLogger(__name__).info("final metrics: %s", metrics)
    return metrics


def cli() -> None:
    """Console-script entry: main() returns a result dict for programmatic
    callers/tests; returning it from the entry point would become the process
    exit status (truthy dict -> exit 1), so the script wrapper discards it."""
    main()


if __name__ == "__main__":
    cli()
