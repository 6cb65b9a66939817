#!/usr/bin/env python
"""Reference-compatible MMVP eval entry (evaluate_mmvp_OpenAICLIP_224) — presets tower family
openai_clip@224; all paths are real CLI flags (fixes reference quirk Q7)."""
import sys
from genhancer_tpu.cli.evaluate import main

if __name__ == "__main__":
    preset = ["--tower", "openai_clip", "--clip_image_size", "224"]
    main(sys.argv[1:] + preset)
