from . import ingest, source, stateful  # noqa: F401
