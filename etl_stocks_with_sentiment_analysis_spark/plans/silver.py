"""Silver-layer materialization: the bronze→silver→gold medallion of
the reference's raw→staging→marts dbt flow
(`/root/reference/dbt_project/models/`), laid out for 100 TB.

Measured locally (see ARCHITECTURE.md): injecting repartition("ticker")
into the per-query lineage ADDS an exchange (Spark still demands
(ticker, date) clustering at the fact join) and saves nothing. The
structural fix at scale is storage-layer: materialize the panel ONCE,
bucketed by ticker and partitioned by year, so every downstream
window (partitionBy ticker) and fact join (on ticker, date) reads
co-located data and the per-query shuffle disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import panel


def materialize_silver(
    spark: SparkSession,
    sf_dir: str,
    database: str = "silver",
    n_buckets: int = 32,
) -> None:
    """Write prices + explanations as bucketed, date-partitioned tables.

    - bucketBy(ticker): windows and (ticker, date) joins co-locate;
      repeated analytics pay zero shuffle for the panel key.
    - partitionBy(year): date-range predicates prune whole partitions
      (the dominant filter in every dashboard query).
    - n_buckets sizes to the cluster: ~2-4x executor count at 100 TB.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name, df in (
        ("prices", panel.prices(spark, sf_dir)),
        ("explanations", panel.explanations(spark, sf_dir)),
    ):
        (
            df.withColumn("year", F.year("date"))
            .write.mode("overwrite")
            .partitionBy("year")
            .bucketBy(n_buckets, "ticker")
            .sortBy("ticker", "date")
            .format("parquet")
            .saveAsTable(f"{database}.{name}")
        )


def gold_from_silver(spark: SparkSession, database: str = "silver") -> DataFrame:
    """The flagship gold table read from bucketed silver: same result
    as plans.panel.fct_prices_with_grok but the window sort and the
    left join consume bucket-local data (no exchange on the fact
    side). Used by tests to assert result parity + plan shape."""
    from pyspark.sql import Window

    p = spark.table(f"{database}.prices")
    e = spark.table(f"{database}.explanations")
    w = Window.partitionBy("ticker").orderBy("date")
    prev = F.lag("close").over(w)
    c = p.select(
        "ticker",
        "date",
        "low",
        "high",
        "close",
        "volume",
        (F.col("close") - prev).alias("price_change"),
        ((F.col("close") - prev) / F.nullif(prev, F.lit(0)) * 100).alias("pct_change"),
    )
    abs_pct = F.abs(F.col("pct_change"))
    return c.join(e.drop("year"), ["ticker", "date"], "left").select(
        "ticker",
        "date",
        "close",
        "pct_change",
        F.lower("sentiment").alias("sentiment"),
        F.lower("topic").alias("topic"),
        F.when(abs_pct > 5, "large_move")
        .when(abs_pct > 2, "medium_move")
        .otherwise("small_move")
        .alias("move_category"),
    )
