from . import wds, transforms, cc3m, video, prefetch  # noqa: F401
