"""Projection / filter operators (SURVEY.md §2.2, P1–P9).

Every filter here is a Catalyst-pushable predicate: at 100 TB, date
predicates prune parquet partitions and row groups before a byte of
the measure columns is read (check `.explain` → PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import panel
from ..registry import register


@register(
    "proj_stg_prices",
    oracle=panel.sql_with(*panel.PANEL_CHG, body="SELECT * FROM changes"),
)
def proj_stg_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — the staging projection with computed change columns
    (`stg_stock_prices.sql:3-14`)."""
    return panel.changes(spark, sf_dir)


@register(
    "proj_normalize_lower",
    oracle=panel.sql_with(
        panel.PRICES_CTE,
        panel.EXPLANATIONS_CTE,
        body="""
SELECT ticker, date, LOWER(sentiment) AS sentiment, LOWER(topic) AS topic, explanation
FROM explanations""",
    ),
)
def proj_normalize_lower(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — lowercase normalization (`stg_grok_explanations.sql:3-9`)."""
    return panel.explanations(spark, sf_dir).select(
        "ticker",
        "date",
        F.lower("sentiment").alias("sentiment"),
        F.lower("topic").alias("topic"),
        "explanation",
    )


@register(
    "filter_date_range",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="""
SELECT ticker, date, close, pct_change FROM changes
WHERE date >= DATE '1996-01-01' AND date <= DATE '1997-12-31'""",
    ),
)
def filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — parameterized date-range filter (`ml/data_loader.py:55-61`)."""
    return (
        panel.changes(spark, sf_dir)
        .filter(F.col("date").between("1996-01-01", "1997-12-31"))
        .select("ticker", "date", "close", "pct_change")
    )


@register(
    "filter_in_list",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="SELECT ticker, date, close FROM prices WHERE ticker IN (1, 2, 3, 5, 8)",
    ),
)
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — ticker IN (...) (`ml/data_loader.py:95-99`)."""
    return (
        panel.prices(spark, sf_dir)
        .filter(F.col("ticker").isin(1, 2, 3, 5, 8))
        .select("ticker", "date", "close")
    )


@register(
    "filter_not_null",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="SELECT ticker, date, pct_change FROM changes WHERE pct_change IS NOT NULL",
    ),
)
def filter_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — drop each ticker's first row (`dashboard.py:68` WHERE prev_close IS NOT NULL)."""
    return (
        panel.changes(spark, sf_dir)
        .filter(F.col("pct_change").isNotNull())
        .select("ticker", "date", "pct_change")
    )


@register(
    "filter_positive",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="SELECT ticker, date, close FROM prices WHERE close > 0",
    ),
)
def filter_positive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — close > 0 guard (`sql/dashboard_views.sql:16`)."""
    return (
        panel.prices(spark, sf_dir)
        .filter(F.col("close") > 0)
        .select("ticker", "date", "close")
    )


@register(
    "filter_eq_date",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="SELECT ticker, date, close, volume FROM prices WHERE date = DATE '1997-06-02'",
    ),
)
def filter_eq_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — single execution-date filter (`stock_grok_pipeline.py:189-190`)."""
    return panel.prices(spark, sf_dir).filter(
        F.col("date") == F.lit("1997-06-02").cast("date")
    ).select("ticker", "date", "close", "volume")


@register(
    "distinct_dates",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="SELECT DISTINCT date FROM prices ORDER BY date DESC LIMIT 5",
    ),
)
def distinct_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — recent distinct dates (`stock_grok_pipeline.py:176`)."""
    return (
        panel.prices(spark, sf_dir)
        .select("date")
        .distinct()
        .orderBy(F.desc("date"))
        .limit(5)
    )


@register(
    "dropna_rows",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="""
SELECT ticker, date, price_change, pct_change FROM changes
WHERE price_change IS NOT NULL AND pct_change IS NOT NULL""",
    ),
)
def dropna_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — na.drop on a column subset (`ml/feature_engineering.py:224,248-250`)."""
    return (
        panel.changes(spark, sf_dir)
        .na.drop(subset=["price_change", "pct_change"])
        .select("ticker", "date", "price_change", "pct_change")
    )
