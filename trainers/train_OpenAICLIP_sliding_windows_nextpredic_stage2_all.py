#!/usr/bin/env python
"""Reference-compatible entry point: maps onto the config-driven task
dispatcher (genhancer_tpu.tasks.factory.TRAINER_COMPAT["train_OpenAICLIP_sliding_windows_nextpredic_stage2_all"])."""
import sys
from genhancer_tpu.cli.train import main

if __name__ == "__main__":
    main(sys.argv[1:] + ["--trainer", "train_OpenAICLIP_sliding_windows_nextpredic_stage2_all"])
