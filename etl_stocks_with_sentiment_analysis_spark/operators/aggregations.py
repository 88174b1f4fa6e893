"""Aggregation operators (SURVEY.md §2.4, A1–A13).

All are `groupBy().agg()` — Catalyst plans partial (map-side) + final
aggregation automatically, so each agg is one shuffle of already-
combined groups. Float averages use the cents/integer-scaling scheme
(:mod:`..functions.exact`) for cross-engine determinism.

Reference: the dashboard/scoring views at
`/root/reference/sql/dashboard_views.sql` and pandas value_counts
aggregations in `/root/reference/dashboard.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import exact
from ..plans import panel
from ..registry import register

# Exact mean of confidence (cents-quantized) — shared by A1/A3/A4.
_CONF_MEAN_SQL = (
    "ROUND(CAST(SUM(CAST(ROUND(confidence * 100, 0) AS BIGINT)) AS DOUBLE)"
    " / COUNT(*) / 100.0, 4)"
)


def _conf_mean() -> F.Column:
    return F.round(
        F.sum(F.round(F.col("confidence") * 100, 0).cast("long")).cast("double")
        / F.count("*")
        / 100.0,
        4,
    )


@register(
    "agg_accuracy_by_stock",
    oracle=panel.sql_with(
        *panel.PANEL_SCORED,
        body=f"""
SELECT ticker,
       COUNT(*) AS total_predictions,
       CAST(SUM(is_correct) AS BIGINT) AS correct_predictions,
       ROUND(AVG(is_correct) * 100, 1) AS accuracy_pct,
       {_CONF_MEAN_SQL} AS avg_confidence
FROM scored GROUP BY ticker""",
    ),
)
def agg_accuracy_by_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — per-ticker prediction accuracy (`sql/dashboard_views.sql:42-51`)."""
    return panel.scored(spark, sf_dir).groupBy("ticker").agg(
        F.count("*").alias("total_predictions"),
        F.sum("is_correct").alias("correct_predictions"),
        F.round(F.avg("is_correct") * 100, 1).alias("accuracy_pct"),
        _conf_mean().alias("avg_confidence"),
    )


@register(
    "agg_accuracy_by_day",
    oracle=panel.sql_with(
        *panel.PANEL_SCORED,
        body="""
SELECT date,
       COUNT(*) AS total,
       CAST(SUM(is_correct) AS BIGINT) AS correct,
       STRING_AGG(CASE WHEN is_correct = 1 THEN '✅' ELSE '❌' END, ' ' ORDER BY ticker) AS marks
FROM scored GROUP BY date""",
    ),
)
def agg_accuracy_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — per-day counts + ORDERED string aggregation of ✅/❌ marks
    (`sql/dashboard_views.sql:54-66`). Ordered agg in Spark =
    sort-inside-collect: array_sort on (ticker, mark) structs, then
    project the mark and join — deterministic because ticker is unique
    within a date."""
    s = panel.scored(spark, sf_dir).withColumn(
        "mark", F.when(F.col("is_correct") == 1, "✅").otherwise("❌")
    )
    marks = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ticker", "mark"))),
            lambda x: x["mark"],
        ),
        " ",
    )
    return s.groupBy("date").agg(
        F.count("*").alias("total"),
        F.sum("is_correct").alias("correct"),
        marks.alias("marks"),
    )


@register(
    "agg_global_summary",
    oracle=panel.sql_with(
        *panel.PANEL_SCORED,
        body=f"""
SELECT COUNT(*) AS total_predictions,
       CAST(SUM(is_correct) AS BIGINT) AS correct_predictions,
       ROUND(AVG(is_correct) * 100, 1) AS accuracy_pct,
       {_CONF_MEAN_SQL} AS avg_confidence,
       COUNT(DISTINCT ticker) AS tickers_covered,
       MIN(date) AS first_date,
       MAX(date) AS last_date
FROM scored""",
    ),
)
def agg_global_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — global summary incl. COUNT(DISTINCT)
    (`sql/dashboard_views.sql:69-78`)."""
    return panel.scored(spark, sf_dir).agg(
        F.count("*").alias("total_predictions"),
        F.sum("is_correct").alias("correct_predictions"),
        F.round(F.avg("is_correct") * 100, 1).alias("accuracy_pct"),
        _conf_mean().alias("avg_confidence"),
        F.countDistinct("ticker").alias("tickers_covered"),
        F.min("date").alias("first_date"),
        F.max("date").alias("last_date"),
    )


@register(
    "agg_by_model_version",
    oracle=panel.sql_with(
        *panel.PANEL_SCORED,
        body="""
SELECT model_version,
       COUNT(*) AS total_predictions,
       CAST(SUM(is_correct) AS BIGINT) AS correct_predictions,
       ROUND(AVG(is_correct) * 100, 1) AS accuracy_pct,
       MIN(date) AS first_prediction,
       MAX(date) AS last_prediction
FROM scored GROUP BY model_version""",
    ),
)
def agg_by_model_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — accuracy by model version (`sql/dashboard_views.sql:106-116`)."""
    return panel.scored(spark, sf_dir).groupBy("model_version").agg(
        F.count("*").alias("total_predictions"),
        F.sum("is_correct").alias("correct_predictions"),
        F.round(F.avg("is_correct") * 100, 1).alias("accuracy_pct"),
        F.min("date").alias("first_prediction"),
        F.max("date").alias("last_prediction"),
    )


@register(
    "agg_confusion_matrix",
    oracle=panel.sql_with(
        *panel.PANEL_SCORED,
        body="""
SELECT predicted_volatility_class AS predicted,
       actual_volatility_class AS actual,
       COUNT(*) AS n
FROM scored GROUP BY 1, 2""",
    ),
)
def agg_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — confusion matrix (`sql/dashboard_views.sql:139-146`)."""
    return (
        panel.scored(spark, sf_dir)
        .groupBy(
            F.col("predicted_volatility_class").alias("predicted"),
            F.col("actual_volatility_class").alias("actual"),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "agg_precision_per_class",
    oracle=panel.sql_with(
        *panel.PANEL_SCORED,
        body="""
SELECT predicted_volatility_class AS class,
       COUNT(*) AS n_predicted,
       ROUND(SUM(CASE WHEN is_correct = 1 THEN 1 ELSE 0 END) / COUNT(*), 4) AS precision
FROM scored GROUP BY 1""",
    ),
)
def agg_precision_per_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — conditional-agg precision per predicted class
    (`sql/dashboard_views.sql:149-157`)."""
    return (
        panel.scored(spark, sf_dir)
        .groupBy(F.col("predicted_volatility_class").alias("class"))
        .agg(
            F.count("*").alias("n_predicted"),
            F.round(
                F.sum(F.when(F.col("is_correct") == 1, 1).otherwise(0)) / F.count("*"),
                4,
            ).alias("precision"),
        )
    )


@register(
    "agg_recall_per_class",
    oracle=panel.sql_with(
        *panel.PANEL_SCORED,
        body="""
SELECT actual_volatility_class AS class,
       COUNT(*) AS n_actual,
       ROUND(SUM(CASE WHEN is_correct = 1 THEN 1 ELSE 0 END) / COUNT(*), 4) AS recall
FROM scored GROUP BY 1""",
    ),
)
def agg_recall_per_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — recall per actual class (`sql/dashboard_views.sql:160-168`)."""
    return (
        panel.scored(spark, sf_dir)
        .groupBy(F.col("actual_volatility_class").alias("class"))
        .agg(
            F.count("*").alias("n_actual"),
            F.round(
                F.sum(F.when(F.col("is_correct") == 1, 1).otherwise(0)) / F.count("*"),
                4,
            ).alias("recall"),
        )
    )


@register(
    "agg_f1_from_joined",
    oracle=panel.sql_with(
        *panel.PANEL_SCORED,
        """precision_v AS (
  SELECT predicted_volatility_class AS class,
         ROUND(SUM(is_correct) / COUNT(*), 4) AS precision
  FROM scored GROUP BY 1
)""",
        """recall_v AS (
  SELECT actual_volatility_class AS class,
         ROUND(SUM(is_correct) / COUNT(*), 4) AS recall
  FROM scored GROUP BY 1
)""",
        body="""
SELECT p.class, p.precision, r.recall,
       ROUND(2 * p.precision * r.recall / NULLIF(p.precision + r.recall, 0), 4) AS f1
FROM precision_v p JOIN recall_v r ON p.class = r.class""",
    ),
)
def agg_f1_from_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — F1 = 2PR/(P+R) with NULLIF guard over the J4 join
    (`sql/dashboard_views.sql:171-182`)."""
    s = panel.scored(spark, sf_dir)
    prec = s.groupBy(F.col("predicted_volatility_class").alias("class")).agg(
        F.round(F.sum("is_correct") / F.count("*"), 4).alias("precision")
    )
    rec = s.groupBy(F.col("actual_volatility_class").alias("class")).agg(
        F.round(F.sum("is_correct") / F.count("*"), 4).alias("recall")
    )
    j = prec.join(rec, "class", "inner")
    f1 = F.round(
        2
        * F.col("precision")
        * F.col("recall")
        / F.nullif(F.col("precision") + F.col("recall"), F.lit(0)),
        4,
    )
    return j.select("class", "precision", "recall", f1.alias("f1"))


@register(
    "agg_value_counts",
    oracle=panel.sql_with(
        panel.PRICES_CTE,
        panel.EXPLANATIONS_CTE,
        body="""
SELECT LOWER(sentiment) AS sentiment, COUNT(*) AS n
FROM explanations GROUP BY 1""",
    ),
)
def agg_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — value_counts of one column (`dashboard.py:173,195`)."""
    return (
        panel.explanations(spark, sf_dir)
        .groupBy(F.lower("sentiment").alias("sentiment"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "agg_group_size_2d",
    oracle=panel.sql_with(
        panel.PRICES_CTE,
        panel.EXPLANATIONS_CTE,
        body="""
SELECT LOWER(topic) AS topic, LOWER(sentiment) AS sentiment, COUNT(*) AS n
FROM explanations GROUP BY 1, 2""",
    ),
)
def agg_group_size_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — 2-column group size (`dashboard.py:208`)."""
    return (
        panel.explanations(spark, sf_dir)
        .groupBy(
            F.lower("topic").alias("topic"), F.lower("sentiment").alias("sentiment")
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "agg_volatility_stats",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body=f"""
SELECT ticker,
       COUNT(pct_change) AS n_days,
       {exact.sql_mean("pct_change", 10000)} AS pct_mean,
       {exact.sql_std("pct_change", 10000)} AS pct_std
FROM changes WHERE pct_change IS NOT NULL GROUP BY ticker""",
    ),
)
def agg_volatility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — per-ticker mean/std/count of daily moves
    (`dashboard.py:288-290`, pandas sample-std)."""
    df = panel.changes(spark, sf_dir).filter(F.col("pct_change").isNotNull())
    sc = exact.scaled(F.col("pct_change"), 10000)
    s = F.sum(sc)
    ssq = F.sum(sc * sc)
    n = F.count(sc)
    return df.groupBy("ticker").agg(
        F.count("pct_change").alias("n_days"),
        exact.mean_from_sums(s, n, 10000).alias("pct_mean"),
        exact.std_from_sums(s, ssq, n, 10000).alias("pct_std"),
    )


@register(
    "agg_data_statistics",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker,
       COUNT(*) AS n_rows,
       MIN(date) AS first_date,
       MAX(date) AS last_date,
       CAST(SUM(volume) AS BIGINT) AS total_volume
FROM prices GROUP BY ticker""",
    ),
)
def agg_data_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — dataset statistics per ticker (`ml/data_loader.py:181-196`)."""
    return panel.prices(spark, sf_dir).groupBy("ticker").agg(
        F.count("*").alias("n_rows"),
        F.min("date").alias("first_date"),
        F.max("date").alias("last_date"),
        F.sum("volume").alias("total_volume"),
    )


@register(
    "agg_scalar_mean",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body=f"""
SELECT COUNT(pct_change) AS n,
       {exact.sql_mean("pct_change", 10000)} AS avg_pct_change
FROM changes WHERE pct_change IS NOT NULL""",
    ),
)
def agg_scalar_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 — single scalar mean (`dashboard.py:127`)."""
    df = panel.changes(spark, sf_dir).filter(F.col("pct_change").isNotNull())
    sc = exact.scaled(F.col("pct_change"), 10000)
    return df.agg(
        F.count("pct_change").alias("n"),
        exact.mean_from_sums(F.sum(sc), F.count(sc), 10000).alias("avg_pct_change"),
    )


# ---------------------------------------------------------------------------
# Beyond the reference: hypertable-style rollup + exact quantiles
# ---------------------------------------------------------------------------

_ROLLUP_BODY = """
SELECT day, hour, event_type,
       CASE WHEN GROUPING(hour) = 0 THEN 'day_hour_type'
            WHEN GROUPING(day) = 0 THEN 'day_type'
            ELSE 'type' END AS level,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM {src}
GROUP BY GROUPING SETS ((day, hour, event_type), (day, event_type), (event_type))"""

_ROLLUP_PRE = (
    "SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, "
    "CAST(HOUR(ts) AS INT) AS hour, event_type, value FROM events"
)


@register(
    "rollup_time_hierarchy",
    oracle=f"WITH e AS ({_ROLLUP_PRE})\n" + _ROLLUP_BODY.format(src="e"),
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup (continuous-aggregate
    analog): hour/day/all-time aggregates of the events stream in ONE
    GROUPING SETS pass — Catalyst expands the sets and still applies
    partial aggregation, so the raw events shuffle once, not once per
    resolution. `level` disambiguates the NULLed-out grouping columns
    (GROUPING(), not NULL-sniffing — NULL data values stay distinct).
    """
    from ..sources import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(f"WITH e AS ({_ROLLUP_PRE})\n" + _ROLLUP_BODY.format(src="e"))


_QUANT_BODY = """
SELECT ticker,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY volume) AS BIGINT) AS med_volume,
       CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY volume) AS BIGINT) AS p90_volume,
       CAST(PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY volume) AS BIGINT) AS p99_volume
FROM {src}
GROUP BY ticker"""


@register(
    "agg_quantiles",
    oracle=panel.sql_with(panel.PRICES_CTE, body=_QUANT_BODY.format(src="prices")),
)
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ticker volume quantiles with PERCENTILE_DISC — discrete
    quantiles pick an actual data value, so they are exactly
    reproducible cross-engine (interpolating PERCENTILE_CONT mixes
    float arithmetic that differs in ulps between engines — the same
    reason approx sketches are kept out of the oracle-checked surface).
    One shuffle; the per-group sort is bounded by group size.
    """
    panel.prices(spark, sf_dir).createOrReplaceTempView("prices_panel_q")
    return spark.sql(_QUANT_BODY.format(src="prices_panel_q"))


# ---------------------------------------------------------------------------
# Round-2 extensions
# ---------------------------------------------------------------------------

_HIST_ORACLE = panel.sql_with(
    *panel.PANEL_CHG,
    body="""
SELECT LEAST(GREATEST(CAST(FLOOR(pct_change) AS BIGINT), -10), 10) AS bin,
       COUNT(*) AS n
FROM changes WHERE pct_change IS NOT NULL
GROUP BY 1""",
)


@register("agg_histogram_returns", oracle=_HIST_ORACLE)
def agg_histogram_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-distribution histogram: 1%-wide bins clamped to
    [-10, +10] — the fixed-bin histogram is the scale-safe sketch for
    distribution dashboards (bounded output cardinality, one map-side-
    combinable agg; contrast with exact percentiles, which need a
    sort). FLOOR of bit-identical doubles is deterministic."""
    chg = panel.changes(spark, sf_dir).filter(F.col("pct_change").isNotNull())
    bin_ = F.least(
        F.greatest(F.floor("pct_change").cast("long"), F.lit(-10)), F.lit(10)
    )
    return chg.groupBy(bin_.alias("bin")).agg(F.count("*").alias("n"))


_CALIB_ORACLE = panel.sql_with(
    *panel.PANEL_SCORED,
    body="""
SELECT CAST(FLOOR(confidence * 10) AS BIGINT) AS conf_decile,
       COUNT(*) AS n,
       CAST(SUM(is_correct) AS BIGINT) AS n_correct,
       CAST(ROUND(10000.0 * SUM(is_correct) / COUNT(*), 0) AS BIGINT) AS accuracy_bp
FROM scored GROUP BY 1""",
)


@register("agg_calibration_buckets", oracle=_CALIB_ORACLE)
def agg_calibration_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confidence-calibration table: is the model's stated confidence
    honest? Buckets predictions by confidence decile and compares
    observed accuracy (exact integer counts → basis points). The
    reference dashboard plots this from its predictions table
    (`dashboard.py` confidence charts); here it is one combinable
    aggregation."""
    s = panel.scored(spark, sf_dir)
    return s.groupBy(
        F.floor(F.col("confidence") * 10).cast("long").alias("conf_decile")
    ).agg(
        F.count("*").alias("n"),
        F.sum("is_correct").cast("long").alias("n_correct"),
        F.round(10000.0 * F.sum("is_correct") / F.count("*"), 0)
        .cast("long")
        .alias("accuracy_bp"),
    )


_APPROX_DISTINCT_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_exact,
       COUNT(*) AS n_events,
       CAST(1 AS BIGINT) AS within_bound
FROM events GROUP BY event_type"""


@register("agg_approx_distinct", oracle=_APPROX_DISTINCT_ORACLE)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user counts per event_type
    (`approx_count_distinct`, rsd 2%). THE scale answer for
    count-distinct over 100 TB: constant-size sketch per group,
    map-side mergeable, no shuffle of raw user ids — the exact
    variant shuffles every distinct (group, user) pair.

    Self-verifying key: the sketch estimate itself is engine-specific,
    so the output carries the EXACT count plus the deterministic
    boolean ``|approx − exact| ≤ max(3, 5%·exact)`` (HLL++ at rsd 2%
    stays within 5% with overwhelming margin, and the sketch is
    deterministic for fixed data). The DuckDB oracle reproduces the
    exact count and asserts the bound literally — the key is
    exact-oracle checkable while still exercising the sketch."""
    from ..sources import load_table

    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("n_exact"),
        F.count("*").alias("n_events"),
    )
    within = (
        F.abs(F.col("approx_users") - F.col("n_exact"))
        <= F.greatest(F.lit(3.0), 0.05 * F.col("n_exact"))
    )
    return agg.select(
        "event_type",
        "n_exact",
        "n_events",
        within.cast("long").alias("within_bound"),
    )


_APPROX_QUANT_ORACLE = """
SELECT event_type,
       PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY value) AS p50_exact,
       PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY value) AS p90_exact,
       PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY value) AS p99_exact,
       COUNT(value) AS n_vals,
       CAST(1 AS BIGINT) AS within_bound
FROM events GROUP BY event_type"""


@register("agg_approx_quantiles", oracle=_APPROX_QUANT_ORACLE)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of event value per event_type via
    `percentile_approx` (Greenwald-Khanna sketch, accuracy 10000).
    The scale counterpart of `agg_quantiles`: exact percentiles sort
    every group; the GK sketch is constant-memory per group and
    map-side mergeable, so a 100 TB percentile dashboard costs one
    combinable agg.

    Self-verifying key: GK guarantees the returned value's rank is
    within ε·n (ε = 1/accuracy) of the target rank. The plan joins the
    tiny per-group estimate table back (broadcast) to count values
    strictly-below / at-or-below each estimate and emits the
    deterministic rank-bound boolean;
    the exposed columns are the EXACT discrete percentiles (actual
    data values — cross-engine reproducible, same rationale as
    agg_quantiles) plus ``within_bound``, which the DuckDB oracle
    asserts literally."""
    from ..sources import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    ev.createOrReplaceTempView("ev_approx_q")
    est = spark.sql(
        """
        SELECT event_type,
               percentile_approx(value, 0.5, 10000) AS a50,
               percentile_approx(value, 0.9, 10000) AS a90,
               percentile_approx(value, 0.99, 10000) AS a99,
               PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY value) AS p50_exact,
               PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY value) AS p90_exact,
               PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY value) AS p99_exact,
               COUNT(value) AS n_vals
        FROM ev_approx_q GROUP BY event_type"""
    )

    def _rank_cols(q: str):
        lt = F.sum(F.when(F.col("value") < F.col(f"a{q}"), 1).otherwise(0))
        le = F.sum(F.when(F.col("value") <= F.col(f"a{q}"), 1).otherwise(0))
        return lt.alias(f"lt{q}"), le.alias(f"le{q}")

    ranked = (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            *[c for q in ("50", "90", "99") for c in _rank_cols(q)],
            F.first("p50_exact").alias("p50_exact"),
            F.first("p90_exact").alias("p90_exact"),
            F.first("p99_exact").alias("p99_exact"),
            F.first("n_vals").alias("n_vals"),
        )
    )
    eps = 2e-4  # 2× the GK guarantee (ε = 1/accuracy) for float slack
    within = F.lit(True)
    for q, frac in (("50", 0.5), ("90", 0.9), ("99", 0.99)):
        lo = (frac - eps) * F.col("n_vals") - 1
        hi = (frac + eps) * F.col("n_vals") + 1
        within = within & (F.col(f"le{q}") >= lo) & (F.col(f"lt{q}") <= hi)
    return ranked.select(
        "event_type",
        "p50_exact",
        "p90_exact",
        "p99_exact",
        "n_vals",
        within.cast("long").alias("within_bound"),
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_PROFILE_ORACLE = (
    "WITH p AS (SELECT COUNT(*) AS n_rows, "
    + ", ".join(
        f"COUNT({c}) AS nn_{c}, COUNT(DISTINCT {c}) AS nd_{c}"
        for c in _PROFILE_COLS
    )
    + " FROM documents)\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, n_rows, nn_{c} AS n_nonnull,"
        f" CAST(n_rows - nn_{c} AS BIGINT) AS n_null, nd_{c} AS n_distinct FROM p"
        for c in _PROFILE_COLS
    )
)


@register("agg_null_profile", oracle=_PROFILE_ORACLE)
def agg_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling audit: rows / non-null / null / exact distinct
    per column, one output row per column — the table-health scan a
    data platform runs on every new corpus drop (ANALYZE-style stats,
    null-rate regressions, key-uniqueness checks: doc_id is a key iff
    n_distinct = n_nonnull = n_rows).

    One aggregation over the table computes every column's counts
    together (Catalyst expands multi-DISTINCT into one Expand + two
    aggs — still a single scan); the single result row is unpivoted
    to the per-column report with stack(). At 100 TB prefer
    approx_count_distinct per column (see agg_approx_distinct) —
    exact multi-DISTINCT's Expand multiplies shuffle rows by the
    column count; kept exact here for the cross-engine hash.
    """
    from ..sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    row = docs.agg(
        F.count("*").alias("n_rows"),
        *[F.count(c).alias(f"nn_{c}") for c in _PROFILE_COLS],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in _PROFILE_COLS],
    )
    stack_args = ", ".join(
        f"'{c}', nn_{c}, CAST(n_rows - nn_{c} AS LONG), nd_{c}"
        for c in _PROFILE_COLS
    )
    return row.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
        ).alias("column_name", "n_nonnull", "n_null", "n_distinct"),
        "n_rows",
    ).select("column_name", "n_rows", "n_nonnull", "n_null", "n_distinct")


_HHI_ORACLE = panel.sql_with(
    panel.PRICES_CTE,
    body="""
SELECT date,
       COUNT(*) AS n_tickers,
       CAST(SUM(volume) AS BIGINT) AS total_volume,
       ROUND(CAST(SUM(volume * volume) AS DOUBLE)
             / (CAST(SUM(volume) AS DOUBLE) * CAST(SUM(volume) AS DOUBLE)), 6)
         AS hhi
FROM prices
GROUP BY date""",
)


@register("agg_hhi_concentration", oracle=_HHI_ORACLE)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume concentration via the Herfindahl–Hirschman index:
    HHI = Σ(vᵢ/Σv)² = Σvᵢ² / (Σv)² — 1/n for perfectly even flow, →1
    when one instrument dominates. The market-structure health metric
    (and, over corpus sources, the same formula audits training-data
    domain concentration).

    Two exact BIGINT sums (Σv, Σv²) per date — one map-side-combinable
    agg, no window, no join; the division happens once on identical
    integers so the rounded double hash-matches cross-engine.
    """
    px = panel.prices(spark, sf_dir)
    sv = F.sum("volume")
    svv = F.sum(F.col("volume") * F.col("volume"))
    return px.groupBy("date").agg(
        F.count("*").alias("n_tickers"),
        sv.alias("total_volume"),
        F.round(
            svv.cast("double") / (sv.cast("double") * sv.cast("double")), 6
        ).alias("hhi"),
    )


_MODE_ORACLE = panel.sql_with(
    panel.PRICES_CTE,
    panel.EXPLANATIONS_CTE,
    """cnt AS (
  SELECT ticker, topic, COUNT(*) AS n FROM explanations GROUP BY 1, 2
)""",
    body="""
SELECT ticker, topic AS mode_topic, n AS n_days FROM (
  SELECT ticker, topic, n,
         ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY n DESC, topic) AS rk
  FROM cnt
) WHERE rk = 1""",
)


@register("agg_mode_topic", oracle=_MODE_ORACLE)
def agg_mode_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group MODE: each ticker's most frequent
    enrichment topic. Built as count + top-1 window with an explicit
    value tie-break instead of the engine `mode()` aggregate, whose
    tie behavior is engine-arbitrary — an operator that silently
    disagrees between engines (or between runs at different
    parallelism) is not usable in a replayable pipeline.

    Scale: the count collapses to (groups × distinct values) rows
    map-side; the top-1 window runs on that reduced frame, never the
    raw table.
    """
    from pyspark.sql import Window

    e = panel.explanations(spark, sf_dir)
    cnt = e.groupBy("ticker", "topic").agg(F.count("*").alias("n"))
    w = Window.partitionBy("ticker").orderBy(F.desc("n"), "topic")
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("ticker", F.col("topic").alias("mode_topic"), F.col("n").alias("n_days"))
    )


_CUBE_ORACLE = """
SELECT COALESCE(source, '<all>') AS source,
       COALESCE(lang, '<all>') AS lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS agg_level
FROM documents
GROUP BY CUBE (source, lang)"""


@register("agg_cube_source_lang", oracle=_CUBE_ORACLE)
def agg_cube_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — all four grouping sets (source×lang, source,
    lang, grand total) in one pass; the cross-dimension complement of
    `rollup_time_hierarchy` / `corpus_token_budget`'s hierarchies.
    `GROUPING()` bits distinguish subtotal rows from genuine NULL
    groups, never NULL-sniffing.

    Scale: Catalyst expands the cube but keeps partial aggregation per
    grouping set, so the corpus shuffles the combined per-set partials
    once — not one job per set, and never a re-scan per level.
    """
    from ..sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.cube("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.grouping("source") * 2 + F.grouping("lang"))
            .cast("long")
            .alias("agg_level"),
        )
        .select(
            F.coalesce("source", F.lit("<all>")).alias("source"),
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            "n_docs",
            "total_chars",
            "agg_level",
        )
    )
