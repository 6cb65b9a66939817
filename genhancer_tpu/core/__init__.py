from . import nn, rope, attention  # noqa: F401
