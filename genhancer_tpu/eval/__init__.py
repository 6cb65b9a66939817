from . import mmvp  # noqa: F401
