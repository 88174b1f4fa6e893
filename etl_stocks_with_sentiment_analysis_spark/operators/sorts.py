"""Sort / limit / top-k operators (SURVEY.md §2.6, O1–O5).

Spark compiles ORDER BY + LIMIT into TakeOrderedAndProject — a
per-partition top-k followed by a k-row merge on the driver, so a
top-10 over 100 TB never materializes a global sort. Ties are broken
with the unique (ticker, date) key so LIMIT is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import panel
from ..registry import register


@register(
    "sort_panel",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="SELECT ticker, date, close FROM prices ORDER BY ticker, date LIMIT 100",
    ),
)
def sort_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — canonical panel order (`ml/data_loader.py:63,101`)."""
    return (
        panel.prices(spark, sf_dir)
        .orderBy("ticker", "date")
        .select("ticker", "date", "close")
        .limit(100)
    )


@register(
    "sort_desc_multi",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="SELECT ticker, date, close FROM prices ORDER BY date DESC, ticker LIMIT 100",
    ),
)
def sort_desc_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — recency feed ordering (`dashboard.py:49,69`)."""
    return (
        panel.prices(spark, sf_dir)
        .orderBy(F.desc("date"), "ticker")
        .select("ticker", "date", "close")
        .limit(100)
    )


@register(
    "topk_largest",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="""
SELECT ticker, date, pct_change FROM changes WHERE pct_change IS NOT NULL
ORDER BY pct_change DESC, ticker, date LIMIT 10""",
    ),
)
def topk_largest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 — top-10 gainers (`dashboard.py:232` nlargest)."""
    return (
        panel.changes(spark, sf_dir)
        .filter(F.col("pct_change").isNotNull())
        .orderBy(F.desc("pct_change"), "ticker", "date")
        .select("ticker", "date", "pct_change")
        .limit(10)
    )


@register(
    "topk_smallest",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="""
SELECT ticker, date, pct_change FROM changes WHERE pct_change IS NOT NULL
ORDER BY pct_change ASC, ticker, date LIMIT 10""",
    ),
)
def topk_smallest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — top-10 losers (`dashboard.py:240` nsmallest)."""
    return (
        panel.changes(spark, sf_dir)
        .filter(F.col("pct_change").isNotNull())
        .orderBy(F.asc("pct_change"), "ticker", "date")
        .select("ticker", "date", "pct_change")
        .limit(10)
    )


@register(
    "limit_head",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="SELECT ticker, date, close FROM prices ORDER BY ticker, date LIMIT 20",
    ),
)
def limit_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 — LIMIT n / head(n) (`dashboard.py:251-253`)."""
    return (
        panel.prices(spark, sf_dir)
        .orderBy("ticker", "date")
        .select("ticker", "date", "close")
        .limit(20)
    )


_SKYLINE_ORACLE = panel.sql_with(
    panel.PRICES_CTE,
    """points AS (
  SELECT ticker, MAX(high) AS peak_price, CAST(SUM(volume) AS BIGINT) AS total_volume
  FROM prices GROUP BY ticker
)""",
    body="""
SELECT p.ticker, p.peak_price, p.total_volume
FROM points p
WHERE NOT EXISTS (
  SELECT 1 FROM points q
  WHERE q.peak_price >= p.peak_price AND q.total_volume >= p.total_volume
    AND (q.peak_price > p.peak_price OR q.total_volume > p.total_volume)
)""",
)


@register("topk_skyline", oracle=_SKYLINE_ORACLE)
def topk_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto front) of tickers over (peak price, total
    volume): rows no other row dominates on both axes — the multi-
    criteria generalization of top-k (after "Integration of Skyline
    Queries into Spark SQL", EDBT 2023 — see PAPERS.md; the reference
    itself has only single-axis top-k, SURVEY §2.6).

    Scale: the dominance test runs on the AGGREGATED points (group
    cardinality, not fact cardinality) — the groupBy is the data
    reduction; the anti-join is a broadcast over dimension-sized
    points. A fact-scale skyline would first take partition-local
    skylines (skyline(S) ⊆ ∪ skyline(Sᵢ), dominance is transitive)
    and re-apply the same test to the union.
    """
    pts = (
        panel.prices(spark, sf_dir)
        .groupBy("ticker")
        .agg(
            F.max("high").alias("peak_price"),
            F.sum("volume").cast("long").alias("total_volume"),
        )
    )
    q = pts.select(
        F.col("peak_price").alias("q_peak"), F.col("total_volume").alias("q_vol")
    )
    dominated = (
        (F.col("q_peak") >= F.col("peak_price"))
        & (F.col("q_vol") >= F.col("total_volume"))
        & (
            (F.col("q_peak") > F.col("peak_price"))
            | (F.col("q_vol") > F.col("total_volume"))
        )
    )
    return pts.join(F.broadcast(q), dominated, "left_anti")
