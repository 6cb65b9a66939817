from . import clip, siglip, projectors  # noqa: F401
