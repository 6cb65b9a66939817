from . import config, flow, optim, lora  # noqa: F401
