"""Window operators (SURVEY.md §2.5, W1–W11).

The analytic core of the reference: every op partitions by ticker and
orders by date (`/root/reference/ml/feature_engineering.py:108`,
`stg_stock_prices.sql:11`). Spark: one `Window.partitionBy('ticker')
.orderBy('date')` — all window functions over the same spec share a
single shuffle+sort, so the whole feature block is ONE exchange.

Scale: the panel key (ticker) is high-cardinality at 100 TB (suppkey),
so the window shuffle is well-distributed; skew on a hot ticker is
handled by AQE. Rolling stats use the integer-scaling scheme from
:mod:`..functions.exact` for cross-engine determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exact
from ..plans import panel
from ..registry import register

def W():
    """Lazy canonical window spec (needs an active SparkSession)."""
    return Window.partitionBy("ticker").orderBy("date")


def frame(k: int):
    """Trailing k-row frame [-(k-1), 0] — pandas rolling(k) analog."""
    return Window.partitionBy("ticker").orderBy("date").rowsBetween(-(k - 1), 0)


@register(
    "window_lag_prev_close",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="SELECT ticker, date, close, price_change, pct_change FROM changes",
    ),
)
def window_lag_prev_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — LAG(close) → price_change / pct_change.

    Reference: `stg_stock_prices.sql:11-13`, CTE forms at
    `stock_grok_pipeline.py:182-187`.
    """
    return panel.changes(spark, sf_dir).select(
        "ticker", "date", "close", "price_change", "pct_change"
    )


@register(
    "window_lag_features",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="""
SELECT ticker, date, pct_change,
       LAG(pct_change, 1) OVER (PARTITION BY ticker ORDER BY date) AS pct_lag_1,
       LAG(pct_change, 2) OVER (PARTITION BY ticker ORDER BY date) AS pct_lag_2,
       LAG(pct_change, 3) OVER (PARTITION BY ticker ORDER BY date) AS pct_lag_3,
       LAG(volume, 1) OVER (PARTITION BY ticker ORDER BY date) AS volume_lag_1
FROM changes""",
    ),
)
def window_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — lag-k feature columns (`ml/feature_engineering.py:74-80`)."""
    df = panel.changes(spark, sf_dir)
    return df.select(
        "ticker",
        "date",
        "pct_change",
        *[F.lag("pct_change", k).over(W()).alias(f"pct_lag_{k}") for k in (1, 2, 3)],
        F.lag("volume", 1).over(W()).alias("volume_lag_1"),
    )


@register(
    "window_lead_target",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="""
SELECT ticker, date, pct_change, next_pct,
       CASE WHEN ABS(next_pct) < 2 THEN 'low'
            WHEN ABS(next_pct) < 5 THEN 'medium' ELSE 'high' END AS target_class
FROM (
  SELECT ticker, date, pct_change,
         LEAD(pct_change, 1) OVER (PARTITION BY ticker ORDER BY date) AS next_pct
  FROM changes
)
WHERE next_pct IS NOT NULL""",
    ),
)
def window_lead_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — next-day target via LEAD (`ml/feature_engineering.py:164`)."""
    df = panel.changes(spark, sf_dir).select(
        "ticker",
        "date",
        "pct_change",
        F.lead("pct_change", 1).over(W()).alias("next_pct"),
    )
    abs_next = F.abs(F.col("next_pct"))
    return df.filter(F.col("next_pct").isNotNull()).select(
        "ticker",
        "date",
        "pct_change",
        "next_pct",
        F.when(abs_next < 2, "low")
        .when(abs_next < 5, "medium")
        .otherwise("high")
        .alias("target_class"),
    )


@register(
    "window_pct_change_k",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker, date,
       (close / NULLIF(LAG(close, 1) OVER (PARTITION BY ticker ORDER BY date), 0) - 1) * 100 AS return_1d,
       (close / NULLIF(LAG(close, 3) OVER (PARTITION BY ticker ORDER BY date), 0) - 1) * 100 AS return_3d,
       (close / NULLIF(LAG(close, 5) OVER (PARTITION BY ticker ORDER BY date), 0) - 1) * 100 AS return_5d
FROM prices""",
    ),
)
def window_pct_change_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — k-period returns (`ml/feature_engineering.py:116-118`)."""
    df = panel.prices(spark, sf_dir)
    cols = [
        (
            (F.col("close") / F.nullif(F.lag("close", k).over(W()), F.lit(0)) - 1) * 100
        ).alias(f"return_{k}d")
        for k in (1, 3, 5)
    ]
    return df.select("ticker", "date", *cols)


def _rolling_stats_oracle() -> str:
    parts = []
    for k in (5, 10):
        over = f"OVER (PARTITION BY ticker ORDER BY date ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)"
        parts.append(exact.sql_mean("pct_change", 10000, over) + f" AS pct_mean_{k}")
        parts.append(exact.sql_std("pct_change", 10000, over) + f" AS pct_std_{k}")
    return panel.sql_with(
        *panel.PANEL_CHG,
        body="SELECT ticker, date, pct_change,\n" + ",\n".join(parts) + "\nFROM changes",
    )


@register("window_rolling_mean_std", oracle=_rolling_stats_oracle())
def window_rolling_mean_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 — trailing rolling mean/std, min_periods=1
    (`ml/feature_engineering.py:83-93`). Stats over 1e-4-quantized
    pct_change (see functions.exact for the determinism scheme)."""
    df = panel.changes(spark, sf_dir)
    sc = exact.scaled(F.col("pct_change"), 10000)
    cols = []
    for k in (5, 10):
        f = frame(k)
        s = F.sum(sc).over(f)
        ssq = F.sum(sc * sc).over(f)
        n = F.count(sc).over(f)
        cols.append(exact.mean_from_sums(s, n, 10000).alias(f"pct_mean_{k}"))
        cols.append(exact.std_from_sums(s, ssq, n, 10000).alias(f"pct_std_{k}"))
    return df.select("ticker", "date", "pct_change", *cols)


@register(
    "window_rolling_volume_ma",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker, date, volume,
       AVG(volume) OVER (PARTITION BY ticker ORDER BY date ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS volume_ma_20,
       volume / NULLIF(AVG(volume) OVER (PARTITION BY ticker ORDER BY date ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 0) AS volume_ratio
FROM prices""",
    ),
)
def window_rolling_volume_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 — 20-day volume MA + ratio (`ml/feature_engineering.py:134-137`).
    volume is integral so plain AVG is exact cross-engine."""
    df = panel.prices(spark, sf_dir)
    ma = F.avg("volume").over(frame(20))
    return df.select(
        "ticker",
        "date",
        "volume",
        ma.alias("volume_ma_20"),
        (F.col("volume") / F.nullif(ma, F.lit(0))).alias("volume_ratio"),
    )


_RSI_ORACLE = panel.sql_with(
    *panel.PANEL_CHG,
    body="""
SELECT ticker, date,
       CASE WHEN n_gain >= 14 THEN
         CASE WHEN avg_loss_c = 0 THEN 100.0
              ELSE 100.0 - 100.0 / (1.0 + avg_gain_c / avg_loss_c) END
       END AS rsi_14
FROM (
  SELECT ticker, date,
         COUNT(gain_c) OVER w AS n_gain,
         CAST(SUM(gain_c) OVER w AS DOUBLE) / COUNT(gain_c) OVER w AS avg_gain_c,
         CAST(SUM(loss_c) OVER w AS DOUBLE) / COUNT(loss_c) OVER w AS avg_loss_c
  FROM (
    SELECT ticker, date,
           CASE WHEN price_change IS NULL THEN NULL
                WHEN price_change > 0 THEN CAST(ROUND(price_change * 100, 0) AS BIGINT)
                ELSE 0 END AS gain_c,
           CASE WHEN price_change IS NULL THEN NULL
                WHEN price_change < 0 THEN CAST(ROUND(-price_change * 100, 0) AS BIGINT)
                ELSE 0 END AS loss_c
    FROM changes
  )
  WINDOW w AS (PARTITION BY ticker ORDER BY date ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)""",
)


@register("window_rsi", oracle=_RSI_ORACLE)
def window_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 — RSI-14 with min_periods=14 (`ml/feature_engineering.py:32-40`).

    Gains/losses quantized to cents so the 14-row rolling means are
    exact integer sums; the RSI formula itself is deterministic IEEE.
    """
    df = panel.changes(spark, sf_dir)
    d = F.col("price_change")
    gain_c = F.when(d.isNull(), None).otherwise(
        F.when(d > 0, F.round(d * 100, 0).cast("long")).otherwise(F.lit(0).cast("long"))
    )
    loss_c = F.when(d.isNull(), None).otherwise(
        F.when(d < 0, F.round(-d * 100, 0).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    )
    f = frame(14)
    df = df.select(
        "ticker",
        "date",
        F.count(gain_c).over(f).alias("n_gain"),
        (F.sum(gain_c).over(f).cast("double") / F.count(gain_c).over(f)).alias(
            "avg_gain_c"
        ),
        (F.sum(loss_c).over(f).cast("double") / F.count(loss_c).over(f)).alias(
            "avg_loss_c"
        ),
    )
    rsi = F.when(
        F.col("n_gain") >= 14,
        F.when(F.col("avg_loss_c") == 0, F.lit(100.0)).otherwise(
            F.lit(100.0)
            - F.lit(100.0) / (F.lit(1.0) + F.col("avg_gain_c") / F.col("avg_loss_c"))
        ),
    )
    return df.select("ticker", "date", rsi.alias("rsi_14"))


_ATR_ORACLE = panel.sql_with(
    *panel.PANEL_CHG,
    body="""
SELECT ticker, date,
       CASE WHEN COUNT(tr_c) OVER w >= 14 THEN
         CAST(SUM(tr_c) OVER w AS DOUBLE) / COUNT(tr_c) OVER w / 100.0
       END AS atr_14
FROM (
  SELECT ticker, date,
         CASE WHEN prev_close IS NULL THEN NULL
              ELSE CAST(ROUND(GREATEST(high - low, ABS(high - prev_close), ABS(low - prev_close)) * 100, 0) AS BIGINT)
         END AS tr_c
  FROM (
    SELECT ticker, date, high, low,
           LAG(close) OVER (PARTITION BY ticker ORDER BY date) AS prev_close
    FROM changes
  )
)
WINDOW w AS (PARTITION BY ticker ORDER BY date ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""",
)


@register("window_atr", oracle=_ATR_ORACLE)
def window_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 — ATR-14 true-range rolling mean (`ml/feature_engineering.py:43-51`)."""
    df = panel.changes(spark, sf_dir).select(
        "ticker", "date", "high", "low", F.lag("close").over(W()).alias("prev_close")
    )
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - F.col("prev_close")),
        F.abs(F.col("low") - F.col("prev_close")),
    )
    tr_c = F.when(F.col("prev_close").isNull(), None).otherwise(
        F.round(tr * 100, 0).cast("long")
    )
    f = frame(14)
    atr = F.when(
        F.count(tr_c).over(f) >= 14,
        F.sum(tr_c).over(f).cast("double") / F.count(tr_c).over(f) / F.lit(100.0),
    )
    return df.select("ticker", "date", atr.alias("atr_14"))


def _bollinger_oracle() -> str:
    over = "OVER (PARTITION BY ticker ORDER BY date ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)"
    mean = exact.sql_mean("close", 100, over)
    std = exact.sql_std("close", 100, over)
    cnt = f"COUNT({exact.sql_scaled('close', 100)}) {over}"
    return panel.sql_with(
        *panel.PANEL,
        body=f"""
SELECT ticker, date, close,
       CASE WHEN {cnt} >= 20 THEN {mean} END AS bb_sma_20,
       CASE WHEN {cnt} >= 20 THEN
         (({mean} + 2 * ({std})) - ({mean} - 2 * ({std}))) / NULLIF({mean}, 0) * 100
       END AS bb_width_20
FROM prices""",
    )


@register("window_bollinger_width", oracle=_bollinger_oracle())
def window_bollinger_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 — Bollinger band width (`ml/feature_engineering.py:54-63`)."""
    df = panel.prices(spark, sf_dir)
    sc = exact.scaled(F.col("close"), 100)
    f = frame(20)
    s = F.sum(sc).over(f)
    ssq = F.sum(sc * sc).over(f)
    n = F.count(sc).over(f)
    mean = exact.mean_from_sums(s, n, 100)
    std = exact.std_from_sums(s, ssq, n, 100)
    upper = mean + 2 * std
    lower = mean - 2 * std
    width = (upper - lower) / F.nullif(mean, F.lit(0)) * 100
    return df.select(
        "ticker",
        "date",
        "close",
        F.when(n >= 20, mean).alias("bb_sma_20"),
        F.when(n >= 20, width).alias("bb_width_20"),
    )


@register(
    "window_latest_per_group",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker, date, close, volume FROM (
  SELECT ticker, date, close, volume,
         ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY date DESC) AS rn
  FROM prices
) WHERE rn = 1""",
    ),
)
def window_latest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 — last row per ticker (`ml/predict.py:135` tail(1) analog)."""
    w = Window.partitionBy("ticker").orderBy(F.desc("date"))
    return (
        panel.prices(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("ticker", "date", "close", "volume")
    )


@register(
    "window_latest_global",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        panel.PREDICTIONS_CTE,
        body="""
SELECT model_version, ticker, date
FROM predictions ORDER BY date DESC, ticker DESC LIMIT 1""",
    ),
)
def window_latest_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11 — latest row overall (`sql/dashboard_views.sql:98-103`
    scalar-subquery analog)."""
    return (
        panel.predictions(spark, sf_dir)
        .orderBy(F.desc("date"), F.desc("ticker"))
        .select("model_version", "ticker", "date")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# Round-2 extensions: recursive / path-dependent window ops beyond W1-W11
# ---------------------------------------------------------------------------

# Oracle does the same left fold via list_reduce over each row's
# prefix — the identical sequential IEEE op order as the Spark fold
# (acc*0.875 + x*0.125, left to right), so results stay bit-identical.
# The r5 recursive-CTE formulation was exact too but cost ~12 s per
# gate run (one 53k-row join per recursion step x 533 steps); the
# prefix fold is O(n^2) arithmetic with no recursion machinery and
# runs in under half a second (r6 verdict item #5).
_EMA_ORACLE = (
    "WITH "
    + panel.PRICES_CTE
    + """,
t AS (
  SELECT ticker, date,
         CAST(CAST(ROUND(close * 100, 0) AS BIGINT) AS DOUBLE) AS c,
         ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY date) AS rn
  FROM prices
),
hist AS (
  SELECT ticker, list(c ORDER BY rn) AS cs, list(date ORDER BY rn) AS ds, COUNT(*) AS n
  FROM t GROUP BY ticker
),
idx AS (
  SELECT ticker, cs, ds, UNNEST(generate_series(1, n)) AS i FROM hist
)
SELECT ticker, ds[i] AS date,
       list_reduce(cs[1:i], (acc, x) -> acc * 0.875 + x * 0.125) / 100.0 AS ema
FROM idx"""
)


# Bound on the JVM-fold group size: ~4x any plausible trading-day
# history (the fold is O(n^2) element copies per group — see docstring).
# Groups past the bound are routed to the Arrow twin automatically.
_EMA_MAX_GROUP = 10_000


def _ema_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ticker, date, c) panel with closes quantized to cents — the
    shared input shape of both EMA execution paths."""
    return panel.prices(spark, sf_dir).select(
        "ticker",
        "date",
        F.round(F.col("close") * 100, 0).cast("long").cast("double").alias("c"),
    )


def _ema_fold_frame(px: DataFrame) -> DataFrame:
    """JVM-side EMA fold over calendar-bounded groups (see
    `window_ema`). Caller guarantees every group is within
    _EMA_MAX_GROUP rows; the fold is O(n^2) element copies per group."""
    hist = px.groupBy("ticker").agg(
        F.array_sort(F.collect_list(F.struct("date", "c"))).alias("h")
    )
    ema_arr = F.aggregate(
        F.col("h"),
        F.expr("CAST(array() AS array<double>)"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.when(F.size(acc) == 0, x["c"]).otherwise(
                    F.element_at(acc, -1) * F.lit(0.875) + x["c"] * F.lit(0.125)
                )
            ),
        ),
    )
    return (
        hist.withColumn("e", ema_arr)
        .select("ticker", F.explode(F.arrays_zip("h", "e")).alias("z"))
        .select(
            "ticker",
            F.col("z.h.date").alias("date"),
            (F.col("z.e") / F.lit(100.0)).alias("ema"),
        )
    )


def _ema_arrow_frame(px: DataFrame) -> DataFrame:
    """Arrow applyInPandas EMA — O(n) Python loop per group, safe for
    unbounded per-key history (see `window_ema_arrow`)."""
    import pandas as pd

    def ema_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("date").reset_index(drop=True)
        out = []
        e = None
        for c in pdf["c"]:
            e = c if e is None else e * 0.875 + c * 0.125
            out.append(e / 100.0)
        return pd.DataFrame(
            {"ticker": pdf["ticker"], "date": pdf["date"], "ema": out}
        )

    return px.groupBy("ticker").applyInPandas(
        ema_group, "ticker LONG, date DATE, ema DOUBLE"
    )


def ema_panel(px: DataFrame, max_group: int = _EMA_MAX_GROUP) -> DataFrame:
    """EMA over a (ticker, date, c) panel with AUTOMATIC path choice
    per group: calendar-bounded groups (<= max_group rows) take the
    zero-Python JVM fold; oversized groups degrade gracefully to the
    O(n) Arrow twin instead of failing (r4's raise_error guard,
    r5 task #5). Both paths run the identical IEEE op sequence, so
    routing can never change results — they share one oracle."""
    # group-size via a count window, not an agg+join: the window's
    # hash partitioning on ticker is exactly what the downstream
    # groupBy/applyInPandas need, so each branch costs ONE exchange
    sized = px.withColumn(
        "n_rows", F.count("*").over(Window.partitionBy("ticker"))
    )
    small = sized.filter(F.col("n_rows") <= max_group).drop("n_rows")
    large = sized.filter(F.col("n_rows") > max_group).drop("n_rows")
    return _ema_fold_frame(small).unionByName(_ema_arrow_frame(large))


@register("window_ema", oracle=_EMA_ORACLE)
def window_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average, alpha = 1/8 (pandas `ewm(alpha=...)
    .mean()` analog, `ml/feature_engineering.py` family). A true
    RECURSIVE operator — EMA_t depends on EMA_{t-1}, which no SQL
    window frame expresses. Rather than defaulting to the
    applyInPandas escape hatch (Arrow round-trip + Python workers in
    the hot path), the fold runs entirely JVM-side: collect each
    ticker's bounded history into an array, `aggregate()`
    (higher-order fold) builds the EMA series, `posexplode` restores
    rows. Verified against a DuckDB recursive-CTE oracle.

    Determinism: inputs are quantized to cents first; the fold
    `e*0.875 + c*0.125` uses exact binary constants and the identical
    IEEE op sequence in both engines, so results are bit-identical.

    Scale: one shuffle on ticker (high-cardinality panel key); each
    group folds sequentially inside its JVM task with zero Python
    serialization. Group size is bounded by the trading-day count
    (~2.5k rows/ticker at any SF — ~40 KB of struct array), so the
    collect_list never approaches task-memory limits; array append in
    the fold is O(n²) element copies = ~3M doubles/ticker, noise next
    to the shuffle. Groups past _EMA_MAX_GROUP (where the quadratic
    copy cost would bite) are routed AUTOMATICALLY to the O(n) Arrow
    twin by `ema_panel` — graceful degradation, not a failure; the
    paths are bit-identical so the split is invisible in results.
    """
    return ema_panel(_ema_cents(spark, sf_dir))


_DD_ORACLE = panel.sql_with(
    panel.PRICES_CTE,
    """dd AS (
  SELECT ticker, date,
         CAST(ROUND(close * 100, 0) AS BIGINT) AS c,
         MAX(CAST(ROUND(close * 100, 0) AS BIGINT))
           OVER (PARTITION BY ticker ORDER BY date ROWS UNBOUNDED PRECEDING) AS peak
  FROM prices
)""",
    body="""
SELECT ticker,
       MAX(CAST(ROUND(10000.0 * (1.0 - CAST(c AS DOUBLE) / CAST(peak AS DOUBLE)), 0) AS BIGINT)) AS max_drawdown_bp,
       COUNT(*) AS n_days
FROM dd GROUP BY ticker""",
)


@register("window_max_drawdown", oracle=_DD_ORACLE)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per ticker in basis points: running peak
    (cumulative max window) vs close, then a max-agg. Path-dependent
    but frame-expressible — stays fully JVM-side: one window exchange
    on ticker shared with the panel's canonical spec, then a map-side-
    combinable agg. Drawdown ratio is computed from exact cents
    integers so the cross-engine hash matches.
    """
    c = F.round(F.col("close") * 100, 0).cast("long")
    wcum = W().rowsBetween(Window.unboundedPreceding, 0)
    px = panel.prices(spark, sf_dir).select("ticker", "date", c.alias("c"))
    px = px.withColumn("peak", F.max("c").over(wcum))
    dd = F.round(
        10000.0 * (1.0 - F.col("c").cast("double") / F.col("peak").cast("double")), 0
    ).cast("long")
    return (
        px.select("ticker", dd.alias("dd"))
        .groupBy("ticker")
        .agg(F.max("dd").alias("max_drawdown_bp"), F.count("*").alias("n_days"))
    )


_NTILE_ORACLE = panel.sql_with(
    *panel.PANEL_CHG,
    body="""
SELECT ticker, date, pct_change,
       NTILE(4) OVER (PARTITION BY ticker ORDER BY pct_change, date) AS vol_quartile
FROM changes WHERE pct_change IS NOT NULL""",
)


@register("window_ntile_quartiles", oracle=_NTILE_ORACLE)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ticker return quartiles via NTILE(4) (`pd.qcut` analog).
    The window partitions by ticker — never a global orderBy, so no
    single-partition funnel; ties are broken by date so bucket
    assignment is deterministic across engines."""
    w = Window.partitionBy("ticker").orderBy("pct_change", "date")
    return (
        panel.changes(spark, sf_dir)
        .filter(F.col("pct_change").isNotNull())
        .select(
            "ticker",
            "date",
            "pct_change",
            F.ntile(4).over(w).alias("vol_quartile"),
        )
    )


def _zscore_oracle() -> str:
    over = "OVER w"
    mean = exact.sql_mean("pct_change", 10000, over)
    std = exact.sql_std("pct_change", 10000, over)
    return panel.sql_with(
        *panel.PANEL_CHG,
        body=f"""
SELECT ticker, date, pct_change, z, ABS(z) > 3 AS is_anomaly FROM (
  SELECT ticker, date, pct_change,
         (pct_change - {mean}) / NULLIF({std}, 0) AS z
  FROM changes WHERE pct_change IS NOT NULL
  WINDOW w AS (PARTITION BY ticker ORDER BY date
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)""",
    )


@register("window_zscore_anomaly", oracle=_zscore_oracle())
def window_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection: trailing-20-day z-score of daily returns,
    flagged at |z| > 3 — the data-side feed behind the reference's
    alerting integrations (`airflow/utils/alerts.py` delivers; this
    computes WHAT to deliver). Same single window exchange as the
    other rolling stats; mean/std come from exact integer sums
    (functions/exact.py) so the flag never flips across engines or
    partitionings. z stays NULL while the window has < 2 rows (and
    when std is 0), propagating NULL to the flag — no false alerts on
    cold start."""
    df = panel.changes(spark, sf_dir).filter(F.col("pct_change").isNotNull())
    sc = exact.scaled(F.col("pct_change"), 10000)
    f = frame(20)
    s, ssq, n = F.sum(sc).over(f), F.sum(sc * sc).over(f), F.count(sc).over(f)
    mean = exact.mean_from_sums(s, n, 10000)
    std = exact.std_from_sums(s, ssq, n, 10000)
    z = (F.col("pct_change") - mean) / F.nullif(std, F.lit(0.0))
    return df.select(
        "ticker",
        "date",
        "pct_change",
        z.alias("z"),
        (F.abs(z) > 3).alias("is_anomaly"),
    )


_RESAMPLE_ORACLE = panel.sql_with(
    panel.PRICES_CTE,
    """b AS (SELECT ticker, MIN(date) AS d0, MAX(date) AS d1 FROM prices GROUP BY 1)""",
    """cal AS (
  SELECT ticker, CAST(UNNEST(GENERATE_SERIES(d0, d1, INTERVAL 1 DAY)) AS DATE) AS date
  FROM b
)""",
    body="""
SELECT c.ticker, c.date, p.close AS close_raw,
       LAST_VALUE(p.close IGNORE NULLS) OVER (
         PARTITION BY c.ticker ORDER BY c.date ROWS UNBOUNDED PRECEDING
       ) AS close_ffill,
       p.close IS NULL AS is_gap
FROM cal c LEFT JOIN prices p ON p.ticker = c.ticker AND p.date = c.date""",
)


@register("window_resample_ffill", oracle=_RESAMPLE_ORACLE)
def window_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar resample + forward-fill (pandas `asfreq('D').ffill()`
    analog): densify each ticker's history to EVERY calendar day
    between its first and last observation, carrying the last known
    close across gaps (weekends, halts) and flagging filled rows.
    The gap-fill primitive every daily-panel feature pipeline needs
    before fixed-stride windows are meaningful.

    Scale: the calendar explode is per-ticker bounded (days in range,
    not table size); the densify join is on (ticker, date); the fill
    is one `last(ignorenulls)` running window sharing the panel's
    canonical (ticker × date) partitioning. No value arithmetic —
    closes pass through untouched, so cross-engine equality is exact.
    """
    px = panel.prices(spark, sf_dir).select("ticker", "date", "close")
    bounds = px.groupBy("ticker").agg(
        F.min("date").alias("d0"), F.max("date").alias("d1")
    )
    cal = bounds.select(
        "ticker",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("date"),
    )
    filled = cal.join(px, ["ticker", "date"], "left")
    wfill = W().rowsBetween(Window.unboundedPreceding, 0)
    return filled.select(
        "ticker",
        "date",
        F.col("close").alias("close_raw"),
        F.last("close", ignorenulls=True).over(wfill).alias("close_ffill"),
        F.col("close").isNull().alias("is_gap"),
    )


_VWAP_ORACLE = panel.sql_with(
    panel.PRICES_CTE,
    """c AS (
  SELECT ticker, date, close, volume,
         CAST(ROUND(close * 100, 0) AS BIGINT) AS close_c
  FROM prices
)""",
    body="""
SELECT ticker, date, close, volume,
       CAST(SUM(close_c * volume) OVER w AS DOUBLE)
         / (100.0 * SUM(volume) OVER w) AS running_vwap
FROM c
WINDOW w AS (PARTITION BY ticker ORDER BY date ROWS UNBOUNDED PRECEDING)""",
)


@register("window_running_vwap", oracle=_VWAP_ORACLE)
def window_running_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running volume-weighted average price per ticker — the
    execution-quality benchmark every trading system computes
    (pandas `(p*v).cumsum()/v.cumsum()` analog).

    Determinism: numerator accumulates integer cents×volume (exact
    BIGINT — |close_c·vol| ≤ 1e6·1e4 and the panel's ~2.5k-row
    history keeps the sum < 2^53 with 10⁴× headroom), denominator is
    an integer volume sum; ONE final double division from identical
    integers. Two running sums share the panel's canonical window
    exchange.
    """
    c = F.round(F.col("close") * 100, 0).cast("long")
    wcum = W().rowsBetween(Window.unboundedPreceding, 0)
    px = panel.prices(spark, sf_dir)
    return px.select(
        "ticker",
        "date",
        "close",
        "volume",
        (
            F.sum(c * F.col("volume")).over(wcum).cast("double")
            / (100.0 * F.sum("volume").over(wcum))
        ).alias("running_vwap"),
    )


_STREAK_ORACLE = panel.sql_with(
    *panel.PANEL_CHG,
    """d AS (
  SELECT ticker, date,
         CASE WHEN pct_change < 0 THEN 1 ELSE 0 END AS is_down,
         ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY date) AS rn,
         ROW_NUMBER() OVER (
           PARTITION BY ticker, CASE WHEN pct_change < 0 THEN 1 ELSE 0 END
           ORDER BY date
         ) AS rk
  FROM changes WHERE pct_change IS NOT NULL
)""",
    """runs AS (
  SELECT ticker, MIN(date) AS streak_start, MAX(date) AS streak_end,
         COUNT(*) AS streak_len
  FROM d WHERE is_down = 1
  GROUP BY ticker, rn - rk
)""",
    body="""
SELECT ticker, streak_start, streak_end, streak_len FROM (
  SELECT ticker, streak_start, streak_end, streak_len,
         ROW_NUMBER() OVER (
           PARTITION BY ticker ORDER BY streak_len DESC, streak_start
         ) AS pick
  FROM runs
) WHERE pick = 1""",
)


@register("window_losing_streaks", oracle=_STREAK_ORACLE)
def window_losing_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-down-day run per ticker — the
    gaps-and-islands pattern (run-length encoding via the rn − rk
    difference trick): two row_numbers over the SAME partition key
    (ticker), differing only in the sub-partition flag, make each
    maximal run a constant group id; one grouped agg then one
    per-ticker top-1 window.

    Scale: every window/agg partitions by ticker — three stages share
    the panel's canonical exchange; nothing global, run groups are
    per-ticker bounded. Drawdown-duration, outage-streak, and
    session-gap analyses are this exact shape.
    """
    chg = panel.changes(spark, sf_dir).filter(F.col("pct_change").isNotNull())
    is_down = F.when(F.col("pct_change") < 0, 1).otherwise(0)
    d = chg.select("ticker", "date", is_down.alias("is_down"))
    rn = F.row_number().over(W())
    rk = F.row_number().over(
        Window.partitionBy("ticker", "is_down").orderBy("date")
    )
    runs = (
        d.select("ticker", "date", "is_down", (rn - rk).alias("grp"))
        .filter(F.col("is_down") == 1)
        .groupBy("ticker", "grp")
        .agg(
            F.min("date").alias("streak_start"),
            F.max("date").alias("streak_end"),
            F.count("*").alias("streak_len"),
        )
    )
    pick = Window.partitionBy("ticker").orderBy(
        F.desc("streak_len"), "streak_start"
    )
    return (
        runs.withColumn("pick", F.row_number().over(pick))
        .filter(F.col("pick") == 1)
        .select("ticker", "streak_start", "streak_end", "streak_len")
    )


_RANKNORM_ORACLE = panel.sql_with(
    panel.PRICES_CTE,
    body="""
SELECT ticker, date, volume,
       ROUND(PERCENT_RANK() OVER w, 6) AS volume_pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS volume_cume_dist
FROM prices
WINDOW w AS (PARTITION BY ticker ORDER BY volume, date)""",
)


@register("window_rank_normalize", oracle=_RANKNORM_ORACLE)
def window_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank normalization of volume per ticker: PERCENT_RANK (uniform
    [0,1] feature regardless of distribution — the rank-gauss /
    quantile-transform family of feature engineering) and CUME_DIST
    (empirical CDF value). Deterministic tie-break on date inside the
    ordering. One window exchange on the panel key; both functions
    share the frame. Rank ratios are exact small-integer divisions ⇒
    rounded doubles match cross-engine.
    """
    w = Window.partitionBy("ticker").orderBy("volume", "date")
    return panel.prices(spark, sf_dir).select(
        "ticker",
        "date",
        "volume",
        F.round(F.percent_rank().over(w), 6).alias("volume_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("volume_cume_dist"),
    )


@register("window_ema_arrow", oracle=_EMA_ORACLE)
def window_ema_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`window_ema`'s escape hatch, also registered standalone so the
    Arrow path is measured and oracle-checked in its own right: the
    identical recursion (e·0.875 + c·0.125 over cents-quantized
    closes) as an Arrow-batched applyInPandas grouped map. The Python
    loop is O(n) per group with NO quadratic array copies, so
    unbounded per-key history is safe — the trade is one Arrow
    round-trip per group batch. `ema_panel` routes oversized groups
    here automatically.

    Same oracle as `window_ema`: both twins use exact binary constants
    and the identical IEEE op sequence, so JVM fold, pandas loop, and
    DuckDB recursive CTE are bit-identical — switching paths can never
    change results.
    """
    return _ema_arrow_frame(_ema_cents(spark, sf_dir))
