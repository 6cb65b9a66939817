"""Default-suite e2e smoke (VERDICT r2 #5): the cheapest full CLI path —
train 2 steps, checkpoint, resume to 4 — runs on every `pytest tests/`
invocation so a break in the most valuable integration path is visible
between rounds, not just on --runslow.  The full e2e matrix (stage-2,
export, accumulation, parallel knobs) stays in test_e2e_train.py (slow).
"""
import numpy as np

from test_e2e_train import shards, tiny_models, write_cfg  # fixtures  # noqa: F401


def test_train_checkpoint_resume_smoke(tmp_path, shards, tiny_models):  # noqa: F811
    from genhancer_tpu.cli.train import main
    cfgp = write_cfg(tmp_path, img_dir=shards, max_train_steps=2,
                     checkpointing_steps=2)
    m1 = main(["--config", cfgp])
    assert m1["step"] == 2 and np.isfinite(m1["loss"])
    cfgp2 = write_cfg(tmp_path, img_dir=shards, max_train_steps=4,
                      checkpointing_steps=10, resume_from_checkpoint="latest")
    m2 = main(["--config", cfgp2])
    assert m2["step"] == 4 and np.isfinite(m2["loss"])
