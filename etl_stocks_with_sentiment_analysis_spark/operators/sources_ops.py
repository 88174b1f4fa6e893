"""Source-side operators (SURVEY.md §2.1, S1/S6/S8).

S8 (the LLM enrichment stage) is replaced by a deterministic,
network-free rule classifier per BASELINE.json ("MLlib for sentiment
analysis" — the trainable variant lives in ml/; this operator is the
rule-based stage with an exact SQL oracle). The same logic is also
exposed as an Arrow-batched mapInPandas stage (U1) in
:mod:`..llmdata.enrich` — tests assert both paths agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import panel
from ..registry import register
from ..sources import load_table


@register(
    "source_market_batch",
    oracle=panel.sql_with(*panel.PANEL, body="SELECT * FROM prices"),
)
def source_market_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — batch market-data ingest → (ticker, date) OHLCV panel
    (`stock_grok_pipeline.py:67-74`). Here: columnar parquet scan +
    one map-side-combined aggregation."""
    return panel.prices(spark, sf_dir)


@register(
    "source_market_fallback",
    oracle=panel.sql_with(*panel.PANEL, body="SELECT * FROM prices"),
)
def source_market_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — retry-on-failure ingest (`stock_grok_pipeline.py:130-156`):
    the panel is read in 4 ticker-hash buckets through
    `read_with_retry`, with a deterministic flaky-source simulation
    (buckets 0 and 2 fail their FIRST attempt). One retry round must
    yield a frame identical to the clean read — the oracle is exactly
    S1's."""
    from ..sources.readers import read_with_retry

    base = panel.prices(spark, sf_dir)
    attempts: dict[int, int] = {}

    def read_bucket(b: int) -> DataFrame:
        attempts[b] = attempts.get(b, 0) + 1
        if b % 2 == 0 and attempts[b] == 1:
            raise IOError(f"simulated transient source fault, bucket {b}")
        return base.filter(F.col("ticker") % 4 == b)

    return read_with_retry([0, 1, 2, 3], read_bucket)


_S6_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag"""


@register("source_sql_query", oracle=_S6_SQL)
def source_sql_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — parameterized SQL-over-source (`ml/data_loader.py:67,105`):
    the engine's Spark SQL API path (vs DataFrame API elsewhere).
    TPC-H-Q1-shaped; revenue exact via cents quantization."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_S6_SQL)


_S8_ORACLE = """
SELECT doc_id,
       CASE WHEN POSITION('fast' IN text) > 0 AND POSITION('slow' IN text) > 0 THEN 'neutral'
            WHEN POSITION('fast' IN text) > 0 THEN 'positive'
            WHEN POSITION('slow' IN text) > 0 THEN 'negative'
            ELSE 'neutral' END AS sentiment,
       CASE WHEN POSITION('join' IN text) > 0 THEN 'joins'
            WHEN POSITION('window' IN text) > 0 THEN 'windows'
            WHEN POSITION('stream' IN text) > 0 THEN 'streaming'
            ELSE 'general' END AS topic
FROM documents"""


@register("source_enrich_llm", oracle=_S8_ORACLE)
def source_enrich_llm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 — row-wise enrichment stage (`stock_grok_pipeline.py:204-260`)
    with the LLM call replaced by a deterministic rule classifier.
    Pure JVM expressions (whole-stage codegen) — the batched Python
    variant is U1 (`llmdata.enrich.enrich_map_in_pandas`)."""
    docs = load_table(spark, sf_dir, "documents")
    has = lambda w: F.instr(F.col("text"), w) > 0  # noqa: E731
    sentiment = (
        F.when(has("fast") & has("slow"), "neutral")
        .when(has("fast"), "positive")
        .when(has("slow"), "negative")
        .otherwise("neutral")
    )
    topic = (
        F.when(has("join"), "joins")
        .when(has("window"), "windows")
        .when(has("stream"), "streaming")
        .otherwise("general")
    )
    return docs.select("doc_id", sentiment.alias("sentiment"), topic.alias("topic"))


_S9_ORACLE = panel.sql_with(
    panel.PRICES_CTE,
    panel.EXPLANATIONS_CTE,
    body="SELECT * FROM explanations",
)


@register("source_backup_restore", oracle=_S9_ORACLE)
def source_backup_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 — seed-artifact backup/restore: CSV dump of the explanations
    table (the `grok_explanations_backup.csv` analog) read back with an
    explicit schema — never inferSchema (it scans the data twice)."""
    import os

    from .sinks import scratch_dir

    target = os.path.join(scratch_dir("s9_"), "backup_csv")
    panel.explanations(spark, sf_dir).write.mode("overwrite").option(
        "header", True
    ).csv(target)
    schema = (
        "ticker LONG, date DATE, sentiment STRING, topic STRING, explanation STRING"
    )
    return spark.read.csv(target, header=True, schema=schema)


_CDC_ORACLE = """
WITH old AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 11 != 0
),
new AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
           + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END AS cents
  FROM orders WHERE o_orderkey % 13 != 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       o.cents AS old_price_cents,
       n.cents AS new_price_cents
FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR o.cents != n.cents"""


@register("source_snapshot_diff", oracle=_CDC_ORACLE)
def source_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots — the incremental
    ingest primitive: given yesterday's and today's full extracts,
    emit only the delta (insert / update / delete per key) so the 100 TB
    downstream reprocesses the changed slice, not the world. Snapshots
    are derived deterministically from `orders` (keys % 11 arrive only
    in the new extract, keys % 13 were dropped from it, keys % 7 had
    their price bumped one dollar); unchanged rows are filtered out.

    Scale: one full-outer shuffle join on the snapshot key plus the
    change classification — the canonical CDC diff. Both sides hash on
    the same key, so with bucketed snapshot tables this is a
    zero-exchange merge; value comparison is on exact integer cents
    (never raw-double equality across engines).
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    # Classification keys are the JOIN KEYS, never the value columns:
    # a NULL price on a present key must read as an update candidate,
    # not an insert/delete (matches the oracle's IS NULL tests).
    old = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("k_old"), cents.alias("old_price_cents")
    )
    new = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("k_new"),
        (
            cents
            + F.when(F.col("o_orderkey") % 7 == 0, F.lit(100)).otherwise(F.lit(0))
        ).alias("new_price_cents"),
    )
    joined = old.join(new, old["k_old"] == new["k_new"], "full_outer")
    change = (
        F.when(F.col("k_old").isNull(), F.lit("insert"))
        .when(F.col("k_new").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(
            F.col("k_old").isNull()
            | F.col("k_new").isNull()
            | (F.col("old_price_cents") != F.col("new_price_cents"))
        )
        .select(
            F.coalesce("k_old", "k_new").alias("o_orderkey"),
            "change_type",
            "old_price_cents",
            "new_price_cents",
        )
    )
