"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_stocks_with_sentiment_analysis_spark``;
this module only adapts the registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_stocks_with_sentiment_analysis_spark import registry  # noqa: E402
from etl_stocks_with_sentiment_analysis_spark.plans import panel  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the gold fact table (stg prices + LAG pct_change
    ⟕ sentiment enrichment + move bucketing) on sf0.001."""
    return panel.fct_prices_with_grok(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (subset: SQL-expressible ops)."""
    return registry.all_oracles()
