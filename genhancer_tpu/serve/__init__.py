"""Production serving for trained GenHancer artifacts.

The reference has no serving path — inference means re-running a training
script's reconstruction offline (`Continuous/reconstruction/`,
SURVEY.md §2.6).  This package is the framework's deployment story:

  * :mod:`engine` — a TPU inference engine over stage-1 checkpoints:
    jit-compiled reconstruction (full Euler denoise loop in one XLA
    program) and tower embedding, pre-compiled at startup for a fixed set
    of batch buckets so serving never pays a compile online.
  * :mod:`batcher` — dynamic micro-batching: concurrent requests are
    grouped to the smallest bucket within a bounded wait, keeping the MXU
    fed at high offered load while bounding tail latency at low load.
  * :mod:`http` — a dependency-free HTTP front end (stdlib
    ``http.server``) exposing /v1/reconstruct, /v1/embed, /healthz and
    /v1/stats.

CLI: ``genhancer-serve --config <stage1 yaml> [--load_dir ... --load_step N]``.
"""

from .engine import InferenceEngine  # noqa: F401
from .batcher import MicroBatcher  # noqa: F401
