"""Single-slice construction of small driver-local DataFrames.

``spark.createDataFrame(rows, schema)`` parallelizes the pickled rows
into ``defaultParallelism`` slices (32 on the bench box). Every slice
is a separate Python-worker round-trip at action time, and the
metadata frames the engine builds (partition-key maps, stats frames,
one-row index geometry, tracking events) are almost always consumed
through ``coalesce(1)`` writes or small ``collect()``s — a coalesce(1)
task walks all 32 pickled slices SEQUENTIALLY through the Python
runner, which measured ~4.5–7 s for a ONE-ROW frame at local[32]
(guide §4: every Python boundary crossing has a fixed cost; here the
default slicing multiplies it by the core count for no benefit, and
the cost *grows* with the core count).

``local_rows_df`` keeps the exact createDataFrame semantics — same
pickle serialization, same schema verification applied per row — but
parallelizes into a single slice (one round-trip). Measured: one-row
frame write 5.4 s → 0.4 s at local[32]; the win scales with every
metadata action in the commit/read protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["local_rows_df"]

# rows-per-slice guard: a "small local frame" caller that ever passes
# something big still gets sliced sanely instead of one giant pickle
_ROWS_PER_SLICE = 50_000


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with a slice count
    sized to the data (1 for metadata-sized frames) instead of the
    core count. ``rows`` must be a driver-local sequence."""
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        # the empty-local-relation shortcut has no Python slices at
        # all — nothing to fix, and parallelize([]) would error
        return spark.createDataFrame([], schema)
    # sessions without a SparkContext (Spark Connect, test doubles)
    # keep the plain createDataFrame path
    sc = getattr(spark, "sparkContext", None)
    if sc is None:
        return spark.createDataFrame(rows, schema)
    n = min(
        len(rows) // _ROWS_PER_SLICE + 1,
        max(int(sc.defaultParallelism), 1),
    )
    return spark.createDataFrame(sc.parallelize(rows, n), schema)
