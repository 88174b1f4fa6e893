"""Cross-engine-deterministic hash bucketing.

MD5 produces identical lowercase hex in Spark and DuckDB, so a bucket
derived from its leading hex digits is the portable substitute for
`rand(seed)` in every sampling / split / mixing operator: stable
across engines, runs, and partitionings. The DuckDB mirror of
:func:`md5_bucket` is
``(STRPOS('0123456789abcdef', SUBSTR(MD5(CAST(x AS VARCHAR)), 1, 1)) - 1) * 16
+ STRPOS('0123456789abcdef', SUBSTR(MD5(...), 2, 1)) - 1``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def md5_hex(key: Column) -> Column:
    """Lowercase MD5 hex of the key rendered as a string."""
    return F.md5(key.cast("string"))


def md5_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, 256) from the first two MD5 hex
    digits of the key — the shared membership test of sample_hash_split,
    sample_weighted_mix, sample_temperature_mix, and dedup_decontaminate
    (change it here and in every oracle together, never per-site)."""
    hx = md5_hex(key)

    def digit(i: int) -> Column:
        return F.instr(F.lit(_HEX), F.substring(hx, i, 1)) - 1

    return digit(1) * 16 + digit(2)
