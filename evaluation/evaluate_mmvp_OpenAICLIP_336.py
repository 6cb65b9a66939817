#!/usr/bin/env python
"""Reference-compatible MMVP eval entry (evaluate_mmvp_OpenAICLIP_336) — presets tower family
openai_clip@336; all paths are real CLI flags (fixes reference quirk Q7)."""
import sys
from genhancer_tpu.cli.evaluate import main

if __name__ == "__main__":
    preset = ["--tower", "openai_clip", "--clip_image_size", "336"]
    main(sys.argv[1:] + preset)
