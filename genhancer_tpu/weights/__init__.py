from . import torch_io, hf_convert  # noqa: F401
