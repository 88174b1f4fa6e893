from . import panel  # noqa: F401
