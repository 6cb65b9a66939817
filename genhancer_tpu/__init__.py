"""genhancer_tpu: a TPU-native (JAX/XLA/Pallas) generative post-training framework.

Re-implements the capabilities of GenHancer (reference: Jam1ezhang/GenHancer):
two-stage generative post-training that sharpens CLIP-family vision towers by
conditioning a lightweight FLUX-style rectified-flow denoiser on tower outputs,
in image mode (reconstruction) and video modes (middle-frame / next-frame /
2-frame / sliding-window prediction), plus the MMVP-VLM evaluation harness.

Design notes (TPU-first, not a port):
  * All compute-path code is functional JAX: models are (init, apply) pairs over
    explicit parameter pytrees; everything hot runs under one jit.
  * Matmuls run in bfloat16 on the MXU; norms/softmax accumulate in float32.
  * Data parallelism is a jax.sharding.Mesh axis ("data") with XLA-inserted
    ICI collectives, not a DDP/NCCL wrapper layer.
  * Parameter pytrees use torch-state-dict-compatible key structure so that the
    reference checkpoint layout (checkpoint-dit-*.bin, HF export dirs) can be
    written/read losslessly (see genhancer_tpu.weights).
"""

__version__ = "0.1.0"
