"""Data-quality checks — the dbt-test surface of the reference
re-expressed as one declarative runner (`dbt test` wired at
`/root/reference/airflow/dags/stock_grok_pipeline.py:301-306`;
`dbt_project/models/schema.yml:1-9` declares sources but ZERO tests —
the MECHANISM is reference surface, so this engine ships it with a
real default suite over the panel).

Check vocabulary = dbt's four core generic tests:

- ``unique``      — no duplicate key tuples (COUNT(*) − COUNT(DISTINCT key))
- ``not_null``    — per-column NULL count
- ``accepted_values`` — values outside a fixed vocabulary
- ``relationships``   — child keys that do not exist in the parent
  (referential integrity, LEFT ANTI count)

Every check is a single aggregate or anti-join — map-side combinable,
no driver-side row iteration, integer outputs (exact cross-engine).
The default suite includes one check that legitimately FINDS
violations (``fct.sentiment not_null`` — the gold table's left join
leaves ~20% NULL sentiment by construction, FIXTURES.md §2), proving
the runner detects and reports rather than rubber-stamping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from . import panel

# (table, check, target, details) — the default suite. `target` is the
# column (or +-joined tuple) the check guards; kept as strings so the
# result frame is stable and SQL-comparable.
SUITE = [
    ("prices", "unique", "ticker+date"),
    ("prices", "not_null", "close"),
    ("prices", "not_null", "volume"),
    ("explanations", "accepted_values", "sentiment"),
    ("explanations", "relationships", "ticker+date->prices"),
    ("fct", "not_null", "sentiment"),  # expected-fail: ~20% NULL by design
]

_SENTIMENTS = ("Positive", "Negative", "Neutral")


def _row(table: str, check: str, target: str, n: F.Column) -> F.Column:
    return F.struct(
        F.lit(table).alias("table_name"),
        F.lit(check).alias("check"),
        F.lit(target).alias("target"),
        n.cast("long").alias("n_violations"),
        F.when(n == 0, 1).otherwise(0).cast("long").alias("passed"),
    )


def run_quality_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the default suite; one row per check with its violation
    count — the `dbt test` result table."""
    p = panel.prices(spark, sf_dir)
    e = panel.explanations(spark, sf_dir)
    fct = panel.fct_prices_with_grok(spark, sf_dir)

    rows = []
    rows.append(
        p.agg(
            _row(
                "prices", "unique", "ticker+date",
                F.count("*") - F.countDistinct("ticker", "date"),
            ).alias("r")
        )
    )
    for col in ("close", "volume"):
        rows.append(
            p.agg(
                _row(
                    "prices", "not_null", col,
                    F.count(F.when(F.col(col).isNull(), 1)),
                ).alias("r")
            )
        )
    rows.append(
        e.agg(
            _row(
                "explanations", "accepted_values", "sentiment",
                F.count(
                    F.when(~F.col("sentiment").isin(*_SENTIMENTS), 1)
                ),
            ).alias("r")
        )
    )
    orphans = e.join(p.select("ticker", "date"), ["ticker", "date"],
                     "left_anti")
    rows.append(
        orphans.agg(
            _row(
                "explanations", "relationships", "ticker+date->prices",
                F.count("*"),
            ).alias("r")
        )
    )
    rows.append(
        fct.agg(
            _row(
                "fct", "not_null", "sentiment",
                F.count(F.when(F.col("sentiment").isNull(), 1)),
            ).alias("r")
        )
    )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select("r.*")


_QUALITY_ORACLE = panel.sql_with(
    *panel.PANEL_ENRICHED,
    panel.FCT_CTE,
    body="""
SELECT table_name, "check", target, n_violations,
       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS passed
FROM (
  SELECT 'prices' AS table_name, 'unique' AS "check",
         'ticker+date' AS target,
         CAST(COUNT(*) - COUNT(DISTINCT (ticker, date)) AS BIGINT)
           AS n_violations
  FROM prices
  UNION ALL
  SELECT 'prices', 'not_null', 'close',
         CAST(COUNT(CASE WHEN close IS NULL THEN 1 END) AS BIGINT)
  FROM prices
  UNION ALL
  SELECT 'prices', 'not_null', 'volume',
         CAST(COUNT(CASE WHEN volume IS NULL THEN 1 END) AS BIGINT)
  FROM prices
  UNION ALL
  SELECT 'explanations', 'accepted_values', 'sentiment',
         CAST(COUNT(CASE WHEN sentiment NOT IN
              ('Positive', 'Negative', 'Neutral') THEN 1 END) AS BIGINT)
  FROM explanations
  UNION ALL
  SELECT 'explanations', 'relationships', 'ticker+date->prices',
         CAST(COUNT(*) AS BIGINT)
  FROM explanations e
  WHERE NOT EXISTS (
    SELECT 1 FROM prices p
    WHERE p.ticker = e.ticker AND p.date = e.date
  )
  UNION ALL
  SELECT 'fct', 'not_null', 'sentiment',
         CAST(COUNT(CASE WHEN sentiment IS NULL THEN 1 END) AS BIGINT)
  FROM fct
) t""",
)


register("quality_dbt_tests", oracle=_QUALITY_ORACLE)(run_quality_suite)
