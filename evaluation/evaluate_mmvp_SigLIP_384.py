#!/usr/bin/env python
"""Reference-compatible MMVP eval entry (evaluate_mmvp_SigLIP_384) — presets tower family
siglip@384; all paths are real CLI flags (fixes reference quirk Q7)."""
import sys
from genhancer_tpu.cli.evaluate import main

if __name__ == "__main__":
    preset = ["--tower", "siglip", "--clip_image_size", "384"]
    main(sys.argv[1:] + preset)
