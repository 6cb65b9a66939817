from . import conditioning, image, video  # noqa: F401
