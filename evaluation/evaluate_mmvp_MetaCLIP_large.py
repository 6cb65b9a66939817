#!/usr/bin/env python
"""Reference-compatible MMVP eval entry (evaluate_mmvp_MetaCLIP_large) — presets tower family
metaclip@224; all paths are real CLI flags (fixes reference quirk Q7)."""
import sys
from genhancer_tpu.cli.evaluate import main

if __name__ == "__main__":
    preset = ["--tower", "metaclip", "--clip_image_size", "224", "--clip_type", "large"]
    main(sys.argv[1:] + preset)
