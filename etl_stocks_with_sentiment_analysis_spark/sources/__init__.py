from .readers import (  # noqa: F401
    ensure_nanos_conf,
    load_table,
    read_csv,
    read_json,
)
