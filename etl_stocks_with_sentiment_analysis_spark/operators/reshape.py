"""Reshape / pivot operators (SURVEY.md §2.9, R1).

Spark's `.pivot()` with an explicit value list skips the extra
distinct-values job and keeps the schema static — at scale, always
pass the list (a dynamic pivot on a high-cardinality column is a
driver OOM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import panel
from ..registry import register

_MONTHS = list(range(1, 13))


def _r1_oracle() -> str:
    cols = ",\n".join(
        f"       CAST(SUM(CASE WHEN MONTH(date) = {m} THEN volume END) AS BIGINT) AS m{m:02d}"
        for m in _MONTHS
    )
    return panel.sql_with(
        *panel.PANEL,
        body=f"SELECT ticker,\n{cols}\nFROM prices GROUP BY ticker",
    )


@register("pivot_heatmap", oracle=_r1_oracle())
def pivot_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 — pivot_table ticker × period (`dashboard.py:151-157`).

    The reference pivots ticker×date for a heatmap; here the pivot
    column is month (stable 12-value vocabulary) and the cell is the
    exact integer volume sum.
    """
    df = panel.prices(spark, sf_dir).withColumn("m", F.month("date"))
    p = df.groupBy("ticker").pivot("m", _MONTHS).agg(F.sum("volume"))
    return p.select(
        "ticker", *[F.col(str(m)).alias(f"m{m:02d}") for m in _MONTHS]
    )


_UNPIVOT_ORACLE = panel.sql_with(
    *panel.PANEL,
    body="""
SELECT ticker, date, field, value FROM (
  SELECT ticker, date, 'low' AS field, low AS value FROM prices
  UNION ALL
  SELECT ticker, date, 'high', high FROM prices
  UNION ALL
  SELECT ticker, date, 'close', close FROM prices
)""",
)


@register("reshape_unpivot", oracle=_UNPIVOT_ORACLE)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 — melt/unpivot (pandas `df.melt` analog): wide OHLC columns
    → long (ticker, date, field, value). Spark's native `unpivot`
    rewrites to a generator expression — row count triples but nothing
    shuffles; the narrow long format is what a feature store or
    tall-table sink ingests. All three measures are exact
    (min/max/cents-sum), so raw doubles hash-match."""
    return (
        panel.prices(spark, sf_dir)
        .unpivot(
            ids=["ticker", "date"],
            values=["low", "high", "close"],
            variableColumnName="field",
            valueColumnName="value",
        )
    )
