"""Optimizer: AdamW + global-norm clipping + warmup schedules via optax.

Parity with the reference training setup: ``torch.optim.AdamW(lr, betas, wd,
eps)`` over trainable params (``train_SigLIP_stage1.py:147-153``), gradient
clipping by global norm ``max_grad_norm`` applied before the step (:272), and
``diffusers.get_scheduler`` lr schedules (constant / constant_with_warmup /
linear / cosine, :163-168; the shipped configs use ``constant`` with
``lr_warmup_steps: 10``).
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def make_lr_schedule(name: str, learning_rate: float, warmup_steps: int = 0,
                     total_steps: Optional[int] = None):
    warmup_steps = int(warmup_steps or 0)
    if name in ("constant", "constant_with_warmup"):
        if warmup_steps > 0:
            # diffusers 'constant' still ignores warmup; 'constant_with_warmup'
            # ramps linearly.  The reference passes warmup to get_scheduler with
            # name 'constant', which in diffusers means NO warmup — we honor
            # warmup only for constant_with_warmup and keep 'constant' flat.
            if name == "constant_with_warmup":
                return optax.join_schedules(
                    [optax.linear_schedule(0.0, learning_rate, warmup_steps),
                     optax.constant_schedule(learning_rate)], [warmup_steps])
        return optax.constant_schedule(learning_rate)
    if name == "linear":
        assert total_steps is not None
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.linear_schedule(learning_rate, 0.0, max(total_steps - warmup_steps, 1))],
            [warmup_steps])
    if name == "cosine":
        assert total_steps is not None
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps)
    raise ValueError(f"unknown lr_scheduler: {name}")


def make_optimizer(cfg, total_steps: Optional[int] = None) -> optax.GradientTransformation:
    """cfg: a train Config (train.config) with the reference optimizer knobs."""
    schedule = make_lr_schedule(cfg.get("lr_scheduler", "constant"),
                                float(cfg.get("learning_rate", 1e-4)),
                                int(cfg.get("lr_warmup_steps", 0)),
                                total_steps or cfg.get("max_train_steps"))
    return optax.chain(
        optax.clip_by_global_norm(float(cfg.get("max_grad_norm", 1.0))),
        optax.adamw(
            learning_rate=schedule,
            b1=float(cfg.get("adam_beta1", 0.9)),
            b2=float(cfg.get("adam_beta2", 0.999)),
            eps=float(cfg.get("adam_epsilon", 1e-8)),
            weight_decay=float(cfg.get("adam_weight_decay", 0.01)),
        ),
    )


def effective_steps_per_epoch(train_batch_size: int, grad_accum: int,
                              dataset_size: int = int(3e6)) -> float:
    """Reference hardcodes a 3e6-sample epoch (train_SigLIP_stage1.py:158)."""
    return math.ceil(dataset_size / train_batch_size) / grad_accum
