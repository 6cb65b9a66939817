from . import dit, vae  # noqa: F401
