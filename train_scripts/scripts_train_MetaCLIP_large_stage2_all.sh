#!/usr/bin/env bash
# Launch script (scripts_train_MetaCLIP_large_stage2_all) — TPU-native replacement for the reference's
# `accelerate launch` wrappers: one process drives all local chips through
# the mesh; AE points at the FLUX.1-dev VAE safetensors (src/flux/util.py:145).
set -euo pipefail
export AE=${AE:-/path/to/ae.safetensors}
exec genhancer-train --config configs/MetaCLIP_large_stage2_all.yaml "$@"
