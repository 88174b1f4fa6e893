from . import exact  # noqa: F401
