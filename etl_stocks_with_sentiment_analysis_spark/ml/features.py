"""Feature engineering (SURVEY.md §2.12) — native window/scalar
expressions, NO applyInPandas: every feature from the reference's
pandas pipeline (`/root/reference/ml/feature_engineering.py:96-169`)
is expressed as a Spark column so the whole matrix is ONE window
shuffle + one join, entirely inside codegen.

Feature set (r10: FULL parity with the reference's declared
~34-feature vector, `:172-207`, plus this engine's pct lags — 38
columns): close/volume, returns, RSI/ATR/Bollinger width, rolling
volatility + return mean/std, volatility & volume-ratio lags, volume
ratio, calendar parts, sentiment score, topic one-hots; target =
next-day volatility class. All rolling features are O(n) cumsum
differences over exact-scaled BIGINTs, never O(n·k) sliding frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exact
from ..plans import panel
from ..registry import register

LABELS = ["low", "medium", "high"]  # ml/predict.py:21 inverse map

# The reference's declared ~34-feature vector
# (`ml/feature_engineering.py:172-207` get_feature_columns: 12 base +
# 8 volatility-rolling + 4 return-rolling + 6 lags + 4 topics),
# r10-widened to full parity plus this engine's pct lags:
# pct_mean/std_{5,10} ARE the reference's return_1d rolling features
# (pct_change == return_1d) and sentiment_score is sentiment_encoded.
BASE_FEATURES = [
    "close",
    "volume",
    "volatility",
    "return_1d",
    "return_3d",
    "return_5d",
    "rsi",
    "atr",
    "bollinger_width",
    "pct_lag_1",
    "pct_lag_2",
    "pct_lag_3",
    "pct_mean_5",
    "pct_std_5",
    "pct_mean_10",
    "pct_std_10",
    "volatility_rolling_3_mean",
    "volatility_rolling_3_std",
    "volatility_rolling_5_mean",
    "volatility_rolling_5_std",
    "volatility_rolling_10_mean",
    "volatility_rolling_10_std",
    "volatility_rolling_20_mean",
    "volatility_rolling_20_std",
    "volatility_lag_1",
    "volatility_lag_2",
    "volatility_lag_3",
    "volume_ratio",
    "volume_ratio_lag_1",
    "volume_ratio_lag_2",
    "volume_ratio_lag_3",
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
    vola = (
        (F.col("high") - F.col("low"))
        / F.nullif(F.col("close"), F.lit(0)) * 100
    )
    base = panel.enriched(spark, sf_dir).withColumn("volatility", vola)

    # RSI/ATR inputs (W7/W8 quantization: cents -> exact BIGINT sums)
    d = F.col("price_change")
    gain_c = F.when(d.isNull(), None).otherwise(
        F.when(d > 0, F.round(d * 100, 0).cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )
    loss_c = F.when(d.isNull(), None).otherwise(
        F.when(d < 0, F.round(-d * 100, 0).cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )
    prev_close = F.lag("close").over(w)
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - prev_close),
        F.abs(F.col("low") - prev_close),
    )
    tr_c = F.when(prev_close.isNull(), None).otherwise(
        F.round(tr * 100, 0).cast("long")
    )
    base = base.select("*", gain_c.alias("_gc"), loss_c.alias("_lc"),
                       tr_c.alias("_tc"))

    sc = exact.scaled(F.col("pct_change"), 10000)
    sc0 = F.coalesce(sc, F.lit(0))
    sv = exact.scaled(F.col("volatility"), 10000)
    sv0 = F.coalesce(sv, F.lit(0))
    sb = exact.scaled(F.col("close"), 100)  # close is never NULL
    base = base.select(
        "*",
        F.sum(sc0).over(wcum).alias("_cs"),
        F.sum(sc0 * sc0).over(wcum).alias("_css"),
        F.count(sc).over(wcum).alias("_cn"),
        F.sum(sv0).over(wcum).alias("_vs"),
        F.sum(sv0 * sv0).over(wcum).alias("_vss"),
        F.count(sv).over(wcum).alias("_vn"),
        F.sum(F.coalesce(F.col("_gc"), F.lit(0))).over(wcum).alias("_cg"),
        F.sum(F.coalesce(F.col("_lc"), F.lit(0))).over(wcum).alias("_cl"),
        F.count("_gc").over(wcum).alias("_cgn"),
        F.sum(F.coalesce(F.col("_tc"), F.lit(0))).over(wcum).alias("_ct"),
        F.count("_tc").over(wcum).alias("_ctn"),
        F.sum(sb).over(wcum).alias("_cbs"),
        F.sum(sb * sb).over(wcum).alias("_cbss"),
        F.sum("volume").over(wcum).alias("_cv"),
        F.row_number().over(w).alias("_rn"),
    )

    def diff(col: str, k: int) -> F.Column:
        return F.col(col) - F.lag(col, k, 0).over(w)

    roll = []
    for k in (5, 10):
        n = diff("_cn", k)
        # NULL when the frame holds no non-null values — restores the
        # frame-SUM's null so ANSI mode sees NULL/0 (→ NULL), not 0/0
        s = F.when(n > 0, diff("_cs", k))
        ssq = F.when(n > 0, diff("_css", k))
        roll.append(exact.mean_from_sums(s, n, 10000).alias(f"pct_mean_{k}"))
        roll.append(exact.std_from_sums(s, ssq, n, 10000).alias(f"pct_std_{k}"))
    # volatility rolling mean/std, reference windows 3/5/10/20 with
    # min_periods=1 (`ml/feature_engineering.py:140-144`)
    for k in (3, 5, 10, 20):
        n = diff("_vn", k)
        s = F.when(n > 0, diff("_vs", k))
        ssq = F.when(n > 0, diff("_vss", k))
        roll.append(
            exact.mean_from_sums(s, n, 10000)
            .alias(f"volatility_rolling_{k}_mean")
        )
        roll.append(
            exact.std_from_sums(s, ssq, n, 10000)
            .alias(f"volatility_rolling_{k}_std")
        )

    # RSI-14 (W7 semantics, min_periods=14)
    n_gain = diff("_cgn", 14)
    avg_gain = diff("_cg", 14).cast("double") / n_gain
    avg_loss = diff("_cl", 14).cast("double") / n_gain
    rsi = F.when(
        n_gain >= 14,
        F.when(avg_loss == 0, F.lit(100.0)).otherwise(
            F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + avg_gain / avg_loss)
        ),
    )
    # ATR-14 (W8 semantics)
    n_tr = diff("_ctn", 14)
    atr = F.when(
        n_tr >= 14, diff("_ct", 14).cast("double") / n_tr / F.lit(100.0)
    )
    # Bollinger width (W9 semantics; close never NULL so the frame
    # count is min(row_number, 20) and the >=20 guard is _rn >= 20)
    n_bb = F.least(F.col("_rn"), F.lit(20))
    bb_s = diff("_cbs", 20)
    bb_ssq = diff("_cbss", 20)
    bb_mean = exact.mean_from_sums(bb_s, n_bb, 100)
    bb_std = exact.std_from_sums(bb_s, bb_ssq, n_bb, 100)
    bollinger = F.when(
        F.col("_rn") >= 20,
        F.lit(4.0) * bb_std / F.nullif(bb_mean, F.lit(0)) * 100,
    )

    # volume is never NULL (it is a grouped SUM), so the frame count is
    # just min(row_number, 20) and avg = exact long diff / count
    vma = diff("_cv", 20) / F.least(F.col("_rn"), F.lit(20))
    sent = F.lower("sentiment")
    next_pct = F.lead("pct_change", 1).over(w)
    abs_next = F.abs(next_pct)

    df = base.select(
        "ticker",
        "date",
        "pct_change",
        "close",
        "volume",
        "volatility",
        *[
            (
                (F.col("close") / F.nullif(F.lag("close", k).over(w), F.lit(0)) - 1)
                * 100
            ).alias(f"return_{k}d")
            for k in (1, 3, 5)
        ],
        rsi.alias("rsi"),
        atr.alias("atr"),
        bollinger.alias("bollinger_width"),
        *[F.lag("pct_change", k).over(w).alias(f"pct_lag_{k}") for k in (1, 2, 3)],
        *roll,
        *[
            F.lag("volatility", k).over(w).alias(f"volatility_lag_{k}")
            for k in (1, 2, 3)
        ],
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
    # volume_ratio lags reference a column computed in the SAME window
    # pass (nested window expressions are illegal) — one more Window
    # node over the identical partitioning, NO new exchange
    df = df.select(
        "*",
        *[
            F.lag("volume_ratio", k).over(w).alias(f"volume_ratio_lag_{k}")
            for k in (1, 2, 3)
        ],
    )
    return df.filter(F.col("next_pct").isNotNull()).drop("next_pct")


def _matrix_oracle() -> str:
    over = {
        k: f"OVER (PARTITION BY ticker ORDER BY date ROWS BETWEEN {k-1} PRECEDING AND CURRENT ROW)"
        for k in (3, 5, 10, 14, 20)
    }
    roll = ",\n".join(
        f"       {exact.sql_mean('pct_change', 10000, over[k])} AS pct_mean_{k},\n"
        f"       {exact.sql_std('pct_change', 10000, over[k])} AS pct_std_{k}"
        for k in (5, 10)
    )
    vroll = ",\n".join(
        f"       {exact.sql_mean('volatility', 10000, over[k])} AS volatility_rolling_{k}_mean,\n"
        f"       {exact.sql_std('volatility', 10000, over[k])} AS volatility_rolling_{k}_std"
        for k in (3, 5, 10, 20)
    )
    avg_gain = f"(CAST(SUM(gain_c) {over[14]} AS DOUBLE) / COUNT(gain_c) {over[14]})"
    avg_loss = f"(CAST(SUM(loss_c) {over[14]} AS DOUBLE) / COUNT(gain_c) {over[14]})"
    bb_mean = exact.sql_mean("close", 100, over[20])
    bb_std = exact.sql_std("close", 100, over[20])
    bb_cnt = f"COUNT({exact.sql_scaled('close', 100)}) {over[20]}"
    return panel.sql_with(
        *panel.PANEL_ENRICHED,
        """fx0 AS (
  SELECT c.ticker, c.date, c.low, c.high, c.close, c.volume,
         c.pct_change, c.price_change, e.sentiment, e.topic,
         (c.high - c.low) / NULLIF(c.close, 0) * 100 AS volatility,
         LAG(c.close) OVER (PARTITION BY c.ticker ORDER BY c.date) AS prev_close
  FROM changes c LEFT JOIN explanations e ON c.ticker = e.ticker AND c.date = e.date
)""",
        """fx1 AS (
  SELECT *,
         CASE WHEN price_change IS NULL THEN NULL
              WHEN price_change > 0 THEN CAST(ROUND(price_change * 100, 0) AS BIGINT)
              ELSE 0 END AS gain_c,
         CASE WHEN price_change IS NULL THEN NULL
              WHEN price_change < 0 THEN CAST(ROUND(-price_change * 100, 0) AS BIGINT)
              ELSE 0 END AS loss_c,
         CASE WHEN prev_close IS NULL THEN NULL
              ELSE CAST(ROUND(GREATEST(high - low, ABS(high - prev_close), ABS(low - prev_close)) * 100, 0) AS BIGINT)
         END AS tr_c
  FROM fx0
)""",
        body=f"""
SELECT * EXCLUDE (next_pct) FROM (
  SELECT *,
         LAG(volume_ratio, 1) OVER wt AS volume_ratio_lag_1,
         LAG(volume_ratio, 2) OVER wt AS volume_ratio_lag_2,
         LAG(volume_ratio, 3) OVER wt AS volume_ratio_lag_3
  FROM (
    SELECT ticker, date, pct_change, close, volume, volatility,
       (close / NULLIF(LAG(close, 1) OVER w, 0) - 1) * 100 AS return_1d,
       (close / NULLIF(LAG(close, 3) OVER w, 0) - 1) * 100 AS return_3d,
       (close / NULLIF(LAG(close, 5) OVER w, 0) - 1) * 100 AS return_5d,
       CASE WHEN COUNT(gain_c) {over[14]} >= 14 THEN
         CASE WHEN {avg_loss} = 0 THEN 100.0
              ELSE 100.0 - 100.0 / (1.0 + {avg_gain} / {avg_loss}) END
       END AS rsi,
       CASE WHEN COUNT(tr_c) {over[14]} >= 14 THEN
         CAST(SUM(tr_c) {over[14]} AS DOUBLE) / COUNT(tr_c) {over[14]} / 100.0
       END AS atr,
       CASE WHEN {bb_cnt} >= 20 THEN
         4.0 * ({bb_std}) / NULLIF({bb_mean}, 0) * 100
       END AS bollinger_width,
       LAG(pct_change, 1) OVER w AS pct_lag_1,
       LAG(pct_change, 2) OVER w AS pct_lag_2,
       LAG(pct_change, 3) OVER w AS pct_lag_3,
{roll},
{vroll},
       LAG(volatility, 1) OVER w AS volatility_lag_1,
       LAG(volatility, 2) OVER w AS volatility_lag_2,
       LAG(volatility, 3) OVER w AS volatility_lag_3,
       volume / NULLIF(AVG(volume) {over[20]}, 0) AS volume_ratio,
       CAST(ISODOW(date) - 1 AS INT) AS day_of_week,
       CAST(MONTH(date) AS INT) AS month,
       CASE LOWER(sentiment) WHEN 'positive' THEN 1 WHEN 'negative' THEN -1 ELSE 0 END AS sentiment_score,
       CASE WHEN topic = 'earnings' THEN 1 ELSE 0 END AS topic_earnings,
       CASE WHEN topic = 'macro' THEN 1 ELSE 0 END AS topic_macro,
       CASE WHEN topic = 'company-specific' THEN 1 ELSE 0 END AS topic_company_specific,
       CASE WHEN topic = 'speculation' THEN 1 ELSE 0 END AS topic_speculation,
       CASE WHEN ABS(LEAD(pct_change, 1) OVER w) < 2 THEN 'low'
            WHEN ABS(LEAD(pct_change, 1) OVER w) < 5 THEN 'medium'
            ELSE 'high' END AS target_class,
       LEAD(pct_change, 1) OVER w AS next_pct
    FROM fx1
    WINDOW w AS (PARTITION BY ticker ORDER BY date)
  )
  WINDOW wt AS (PARTITION BY ticker ORDER BY date)
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
