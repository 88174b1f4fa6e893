"""Feature engineering (SURVEY.md §2.12) — native window/scalar
expressions, NO applyInPandas: every feature from the reference's
pandas pipeline (`/root/reference/ml/feature_engineering.py:96-169`)
is expressed as a Spark column so the whole matrix is ONE window
shuffle + one join, entirely inside codegen.

Feature set (reference ~34-feature vector, `:172-207`): returns,
lag features, rolling mean/std, volume ratio, calendar parts,
sentiment score, topic one-hots; target = next-day volatility class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exact
from ..plans import panel
from ..registry import register

LABELS = ["low", "medium", "high"]  # ml/predict.py:21 inverse map

BASE_FEATURES = [
    "volatility",
    "return_1d",
    "return_3d",
    "return_5d",
    "pct_lag_1",
    "pct_lag_2",
    "pct_lag_3",
    "pct_mean_5",
    "pct_std_5",
    "pct_mean_10",
    "pct_std_10",
    "volume_ratio",
    "day_of_week",
    "month",
    "sentiment_score",
    "topic_earnings",
    "topic_macro",
    "topic_company_specific",
    "topic_speculation",
]


def feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full (ticker, date) → features + target_class frame.

    Built over panel.enriched (join-BEFORE-window): the left join runs
    on the two agg outputs while both are still hash-partitioned on
    the grouping key, and every window feature below reuses enriched's
    (ticker)-partitioning and date sort — one window exchange for the
    entire matrix (4 exchanges total vs 6 for the window-first shape).

    ROLLING SUMS AS CUMSUM DIFFERENCES (r7): Spark evaluates a bounded
    sliding frame (`rowsBetween(-k+1, 0)`) by re-aggregating the whole
    k-row frame for every row — O(n·k) per partition — while the
    running frame (unboundedPreceding..0) is a single O(n) accumulator
    and LAG is an O(n) offset lookup. The k=5/10/20 rolling sums here
    are therefore computed as `cum[i] - cum[i-k]` over the exact-scaled
    BIGINTs (integer subtraction — bit-identical to the frame sum, no
    float cancellation), collapsing ~35 adds/row to ~2. Same window
    partitioning and sort; the extra Window node is offset-frame only,
    no new exchange. NULL semantics match: sums run over
    coalesce(sc, 0) while the count runs over sc itself, so an
    all-null frame yields n=0 → NULL mean/std exactly as before."""
    w = Window.partitionBy("ticker").orderBy("date")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    base = panel.enriched(spark, sf_dir)

    sc = exact.scaled(F.col("pct_change"), 10000)
    sc0 = F.coalesce(sc, F.lit(0))
    base = base.select(
        "*",
        F.sum(sc0).over(wcum).alias("_cs"),
        F.sum(sc0 * sc0).over(wcum).alias("_css"),
        F.count(sc).over(wcum).alias("_cn"),
        F.sum("volume").over(wcum).alias("_cv"),
        F.row_number().over(w).alias("_rn"),
    )
    roll = []
    for k in (5, 10):
        n = F.col("_cn") - F.lag("_cn", k, 0).over(w)
        # NULL when the frame holds no non-null values — restores the
        # frame-SUM's null so ANSI mode sees NULL/0 (→ NULL), not 0/0
        s = F.when(n > 0, F.col("_cs") - F.lag("_cs", k, 0).over(w))
        ssq = F.when(n > 0, F.col("_css") - F.lag("_css", k, 0).over(w))
        roll.append(exact.mean_from_sums(s, n, 10000).alias(f"pct_mean_{k}"))
        roll.append(exact.std_from_sums(s, ssq, n, 10000).alias(f"pct_std_{k}"))

    # volume is never NULL (it is a grouped SUM), so the frame count is
    # just min(row_number, 20) and avg = exact long diff / count
    vma = (F.col("_cv") - F.lag("_cv", 20, 0).over(w)) / F.least(
        F.col("_rn"), F.lit(20)
    )
    sent = F.lower("sentiment")
    next_pct = F.lead("pct_change", 1).over(w)
    abs_next = F.abs(next_pct)

    df = base.select(
        "ticker",
        "date",
        "pct_change",
        ((F.col("high") - F.col("low")) / F.nullif(F.col("close"), F.lit(0)) * 100).alias(
            "volatility"
        ),
        *[
            (
                (F.col("close") / F.nullif(F.lag("close", k).over(w), F.lit(0)) - 1)
                * 100
            ).alias(f"return_{k}d")
            for k in (1, 3, 5)
        ],
        *[F.lag("pct_change", k).over(w).alias(f"pct_lag_{k}") for k in (1, 2, 3)],
        *roll,
        (F.col("volume") / F.nullif(vma, F.lit(0))).alias("volume_ratio"),
        ((F.dayofweek("date") + 5) % 7).cast("int").alias("day_of_week"),
        F.month("date").cast("int").alias("month"),
        F.when(sent == "positive", 1)
        .when(sent == "negative", -1)
        .otherwise(0)
        .alias("sentiment_score"),
        *[
            F.when(F.col("topic") == v, 1).otherwise(0).alias(
                "topic_" + v.replace("-", "_")
            )
            for v in ("earnings", "macro", "company-specific", "speculation")
        ],
        F.when(abs_next < 2, "low")
        .when(abs_next < 5, "medium")
        .otherwise("high")
        .alias("target_class"),
        next_pct.alias("next_pct"),
    )
    return df.filter(F.col("next_pct").isNotNull()).drop("next_pct")


def _matrix_oracle() -> str:
    over = {
        5: "OVER (PARTITION BY c.ticker ORDER BY c.date ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)",
        10: "OVER (PARTITION BY c.ticker ORDER BY c.date ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)",
    }
    roll = ",\n".join(
        f"       {exact.sql_mean('pct_change', 10000, over[k])} AS pct_mean_{k},\n"
        f"       {exact.sql_std('pct_change', 10000, over[k])} AS pct_std_{k}"
        for k in (5, 10)
    )
    return panel.sql_with(
        *panel.PANEL_ENRICHED,
        body=f"""
SELECT * EXCLUDE (next_pct) FROM (
  SELECT c.ticker, c.date, c.pct_change,
       (c.high - c.low) / NULLIF(c.close, 0) * 100 AS volatility,
       (c.close / NULLIF(LAG(c.close, 1) OVER w, 0) - 1) * 100 AS return_1d,
       (c.close / NULLIF(LAG(c.close, 3) OVER w, 0) - 1) * 100 AS return_3d,
       (c.close / NULLIF(LAG(c.close, 5) OVER w, 0) - 1) * 100 AS return_5d,
       LAG(c.pct_change, 1) OVER w AS pct_lag_1,
       LAG(c.pct_change, 2) OVER w AS pct_lag_2,
       LAG(c.pct_change, 3) OVER w AS pct_lag_3,
{roll},
       c.volume / NULLIF(AVG(c.volume) OVER (PARTITION BY c.ticker ORDER BY c.date ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 0) AS volume_ratio,
       CAST(ISODOW(c.date) - 1 AS INT) AS day_of_week,
       CAST(MONTH(c.date) AS INT) AS month,
       CASE LOWER(e.sentiment) WHEN 'positive' THEN 1 WHEN 'negative' THEN -1 ELSE 0 END AS sentiment_score,
       CASE WHEN e.topic = 'earnings' THEN 1 ELSE 0 END AS topic_earnings,
       CASE WHEN e.topic = 'macro' THEN 1 ELSE 0 END AS topic_macro,
       CASE WHEN e.topic = 'company-specific' THEN 1 ELSE 0 END AS topic_company_specific,
       CASE WHEN e.topic = 'speculation' THEN 1 ELSE 0 END AS topic_speculation,
       CASE WHEN ABS(LEAD(c.pct_change, 1) OVER w) < 2 THEN 'low'
            WHEN ABS(LEAD(c.pct_change, 1) OVER w) < 5 THEN 'medium'
            ELSE 'high' END AS target_class,
       LEAD(c.pct_change, 1) OVER w AS next_pct
  FROM changes c LEFT JOIN explanations e ON c.ticker = e.ticker AND c.date = e.date
  WINDOW w AS (PARTITION BY c.ticker ORDER BY c.date)
) WHERE next_pct IS NOT NULL""",
    )


register("ml_feature_matrix", oracle=_matrix_oracle())(feature_matrix)


@register(
    "ml_chrono_split",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker, date,
       CASE WHEN rn <= CAST(FLOOR(n * 0.7) AS BIGINT) THEN 'train'
            WHEN rn <= CAST(FLOOR(n * 0.85) AS BIGINT) THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT ticker, date,
         ROW_NUMBER() OVER (ORDER BY date, ticker) AS rn,
         COUNT(*) OVER () AS n
  FROM prices
)""",
    ),
)
def ml_chrono_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — chronological 70/15/15 split
    (`ml/feature_engineering.py:210-261`).

    Scale shape: the global rank is decomposed into a per-DATE offset
    (cumulative count over the tiny distinct-dates frame — the only
    single-partition step, and it runs on ~#dates rows, never the
    panel) plus a per-date `row_number` partitioned BY date (parallel
    across dates). The panel itself never funnels through one task —
    the old `Window.orderBy(date, ticker)` global row_number did."""
    df = panel.prices(spark, sf_dir).select("ticker", "date")
    per_date = df.groupBy("date").agg(F.count("*").alias("cnt"))
    wd = Window.orderBy("date")
    bounds = per_date.select(
        "date",
        (F.sum("cnt").over(wd) - F.col("cnt")).alias("offset"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    wr = Window.partitionBy("date").orderBy("ticker")
    joined = df.join(F.broadcast(bounds), "date")
    rn = F.col("offset") + F.row_number().over(wr)
    split = (
        F.when(rn <= F.floor(F.col("n") * 0.7).cast("long"), "train")
        .when(rn <= F.floor(F.col("n") * 0.85).cast("long"), "val")
        .otherwise("test")
    )
    return joined.select("ticker", "date", split.alias("split"))


@register(
    "ml_label_encode",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        panel.ACTUALS_CTE,
        body="""
SELECT ticker, date, actual_volatility_class,
       CASE actual_volatility_class WHEN 'low' THEN 0 WHEN 'medium' THEN 1 ELSE 2 END AS label
FROM actuals""",
    ),
)
def ml_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 — fixed label map {'low':0,'medium':1,'high':2}
    (`ml/feature_engineering.py:226-228`)."""
    return panel.actuals(spark, sf_dir).select(
        "ticker",
        "date",
        "actual_volatility_class",
        F.when(F.col("actual_volatility_class") == "low", 0)
        .when(F.col("actual_volatility_class") == "medium", 1)
        .otherwise(2)
        .alias("label"),
    )


def _scaler_oracle() -> str:
    mu = exact.sql_mean("pct_change", 10000)
    sigma = exact.sql_std("pct_change", 10000)
    return panel.sql_with(
        *panel.PANEL_CHG,
        "dts AS (SELECT DISTINCT date FROM changes WHERE pct_change IS NOT NULL)",
        """bnd AS (
  SELECT date AS bdate FROM (
    SELECT date, ROW_NUMBER() OVER (ORDER BY date) AS rn,
           COUNT(*) OVER () AS n
    FROM dts
  ) WHERE rn = CAST(FLOOR(n * 0.7) AS BIGINT)
)""",
        f"""stats AS (
  SELECT {mu} AS mu, {sigma} AS sigma
  FROM changes, bnd WHERE pct_change IS NOT NULL AND date <= bdate
)""",
        body="""
SELECT c.ticker, c.date, c.pct_change,
       (c.pct_change - mu) / NULLIF(sigma, 0) AS pct_change_scaled,
       c.date <= bdate AS is_train
FROM changes c, bnd, stats
WHERE c.pct_change IS NOT NULL""",
    )


@register("ml_standard_scaler", oracle=_scaler_oracle())
def ml_standard_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardScaler with correct train/serve hygiene: mean and std
    are FIT on the chronological train window only (first 70% of
    trading dates — no target leakage from the future), then APPLIED
    to every row. The scikit `StandardScaler.fit(train)` analog of
    the reference's feature pipeline, with moments from exact integer
    sums (functions/exact.py) so the scaled values hash-match DuckDB.

    Scale shape: fit = two tiny driver-side scalar fetches (one
    boundary date off the ranked DISTINCT-dates frame, then three
    exact BIGINT sums from ONE combinable agg over the train window)
    — the same summarize-then-broadcast-literals shape MLlib's own
    StandardScaler.fit uses, and the reason there is no join at all:
    the APPLY pass is a pure scan-side projection with zero
    exchanges. The integer sums round-trip through the driver
    losslessly, so the final double math is still the exact.py
    deterministic expression."""
    df = panel.changes(spark, sf_dir).filter(F.col("pct_change").isNotNull())
    dts = df.select("date").distinct()
    # n = rn + rn_desc - 1 lets both ranks reuse ONE SinglePartition
    # exchange on the tiny dates frame (vs a second count-over-() pass)
    ranked = dts.select(
        "date",
        F.row_number().over(Window.orderBy("date")).alias("rn"),
        F.row_number().over(Window.orderBy(F.desc("date"))).alias("rd"),
    )
    n = F.col("rn") + F.col("rd") - 1
    brow = ranked.filter(F.col("rn") == F.floor(n * 0.7).cast("long")).first()
    if brow is None:
        raise ValueError("empty panel: no boundary date for the 70% split")
    bdate = brow["date"]

    sc = exact.scaled(F.col("pct_change"), 10000)
    srow = (
        df.filter(F.col("date") <= F.lit(bdate))
        .agg(
            F.sum(sc).alias("s"),
            F.sum(sc * sc).alias("ssq"),
            F.count(sc).alias("cnt"),
        )
        .first()
    )
    s, ssq, cnt = F.lit(srow["s"]), F.lit(srow["ssq"]), F.lit(srow["cnt"])
    mu = exact.mean_from_sums(s, cnt, 10000)
    sigma = exact.std_from_sums(s, ssq, cnt, 10000)
    return df.select(
        "ticker",
        "date",
        "pct_change",
        ((F.col("pct_change") - mu) / F.nullif(sigma, F.lit(0.0))).alias(
            "pct_change_scaled"
        ),
        (F.col("date") <= F.lit(bdate)).alias("is_train"),
    )
