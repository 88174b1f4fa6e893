from .readers import load_table, read_csv, read_json  # noqa: F401
