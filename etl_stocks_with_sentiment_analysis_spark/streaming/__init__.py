from . import ingest, stateful  # noqa: F401
