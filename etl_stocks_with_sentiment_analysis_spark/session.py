"""SparkSession factory.

Scale notes (100 TB target):
- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast-join conversion replace any
  hand-tuned plan choices at cluster scale.
- ``spark.sql.shuffle.partitions`` defaults to ~2-3x total cores on a
  real cluster; locally we size it to the local core count so tiny
  test data is not over-parallelized (200 empty tasks cost more than
  they parallelize). AQE coalescing makes the exact number soft.
- Session timezone is pinned UTC so timestamp→date semantics match
  the DuckDB oracle (naive-UTC) bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-stocks-sentiment-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]" if cpus else "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet is TIMESTAMP(NANOS); Spark has no per-read
        # option for it, so the flag lives here at session build
        # (sources.readers.ensure_nanos_conf re-asserts it for
        # sessions not built by this factory).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
