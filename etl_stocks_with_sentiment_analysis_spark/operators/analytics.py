"""Product/event analytics operators (round-2 extensions).

The reference's dashboard answers "how is the model doing" questions
(`/root/reference/sql/dashboard_views.sql`); a production analytics
engine over the same event firehose also needs the classic
user-journey queries — funnel conversion, cohort retention — plus
cross-asset statistics (pairwise correlation) and deterministic
stratified sampling for training-data extraction. All four are pure
DataFrame plans (no Python stages) with exact-integer determinism per
:mod:`..functions.exact`'s scheme.

Scale notes:
- funnel / cohort aggregate per user_id first (high-cardinality key,
  map-side combinable) before any join; nothing global.
- the correlation matrix is bounded to an explicit watchlist — the
  pairwise join is quadratic in WATCHLIST size only, never in table
  size. Unbounded all-pairs correlation at 100 TB is a design error,
  not a tuning problem; widen the watchlist consciously.
- stratified sampling orders inside each stratum by a hash —
  per-ticker windows, no global sort, identical sample on every
  engine/run (the property `sample_hash_split` establishes for
  row-level splits, lifted to exact per-stratum quotas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import panel
from ..registry import register
from ..sources import load_table

# ---------------------------------------------------------------------------
# Funnel conversion (events: click → purchase)
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH clicks AS (
  SELECT user_id, MIN(ts) AS first_click
  FROM events WHERE event_type = 'click' GROUP BY user_id
),
conv AS (
  SELECT c.user_id, MIN(e.ts) AS first_purchase
  FROM clicks c
  JOIN events e
    ON e.user_id = c.user_id AND e.event_type = 'purchase'
   AND e.ts > c.first_click
  GROUP BY c.user_id
)
SELECT COUNT(*) AS n_clicked,
       COUNT(v.first_purchase) AS n_converted,
       CAST(ROUND(10000.0 * COUNT(v.first_purchase) / COUNT(*), 0) AS BIGINT)
           AS conversion_bp,
       CAST(SUM(EPOCH_US(v.first_purchase) - EPOCH_US(c.first_click)) AS BIGINT)
           AS total_lag_us
FROM clicks c LEFT JOIN conv v ON c.user_id = v.user_id"""


@register("events_funnel", oracle=_FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase funnel: of users who ever clicked, how many
    later purchased, and the summed click→purchase lag. Both stages
    aggregate per user_id BEFORE joining (map-side combinable, join
    cardinality = distinct users, never events×events)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    conv = (
        clicks.join(
            ev.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("pts")
            ),
            "user_id",
        )
        .filter(F.col("pts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("pts").alias("first_purchase"))
    )
    j = clicks.join(conv, "user_id", "left")
    return j.agg(
        F.count("*").alias("n_clicked"),
        F.count("first_purchase").alias("n_converted"),
        F.round(10000.0 * F.count("first_purchase") / F.count("*"), 0)
        .cast("long")
        .alias("conversion_bp"),
        F.sum(
            F.unix_micros("first_purchase") - F.unix_micros("first_click")
        ).alias("total_lag_us"),
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention
# ---------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS day
  FROM events e
)
SELECT CAST(DATE_TRUNC('week', f.first_day) AS DATE) AS cohort_week,
       CAST(FLOOR((a.day - f.first_day) / 7.0) AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM activity a JOIN first_seen f ON a.user_id = f.user_id
GROUP BY 1, 2"""


@register("events_cohort_retention", oracle=_COHORT_ORACLE)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week,
    counted per week-offset of later activity. The per-user MIN and
    the DISTINCT (user, day) projection both combine map-side; the
    join carries one row per active user-day, not per event."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    first_seen = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    activity = ev.select("user_id", day.alias("day")).distinct()
    j = activity.join(first_seen, "user_id")
    return j.groupBy(
        F.date_trunc("week", "first_day").cast("date").alias("cohort_week"),
        F.floor(F.datediff("day", "first_day") / 7.0).alias("week_offset"),
    ).agg(F.countDistinct("user_id").alias("n_users"))


# ---------------------------------------------------------------------------
# Watchlist pairwise return correlation
# ---------------------------------------------------------------------------

_WATCHLIST_MAX = 25  # pairwise work is quadratic in THIS, not in table size

_CORR_ORACLE = panel.sql_with(
    *panel.PANEL_CHG,
    f"""r AS (
  SELECT ticker, date, CAST(ROUND(pct_change * 100, 0) AS BIGINT) AS bp
  FROM changes
  WHERE pct_change IS NOT NULL AND ticker <= {_WATCHLIST_MAX}
)""",
    """sums AS (
  SELECT a.ticker AS t1, b.ticker AS t2,
         COUNT(*) AS n,
         SUM(a.bp) AS sx, SUM(b.bp) AS sy,
         SUM(a.bp * b.bp) AS sxy,
         SUM(a.bp * a.bp) AS sxx, SUM(b.bp * b.bp) AS syy
  FROM r a JOIN r b ON a.date = b.date AND a.ticker < b.ticker
  GROUP BY 1, 2
)""",
    body="""
SELECT t1, t2, n AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / NULLIF(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                  * SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 0.0) AS corr
FROM sums""",
)


@register("agg_corr_watchlist", oracle=_CORR_ORACLE)
def agg_corr_watchlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise daily-return correlation across a bounded watchlist.

    The correlation is assembled from six exact BIGINT sums (n, Σx,
    Σy, Σxy, Σx², Σy²) over basis-point integer returns, so the
    final double is computed from identical integers in both engines —
    never a raw float aggregate. The date-keyed self-join carries only
    watchlist rows; everything else is pruned at the scan.
    """
    chg = (
        panel.changes(spark, sf_dir)
        .filter(
            F.col("pct_change").isNotNull() & (F.col("ticker") <= _WATCHLIST_MAX)
        )
        .select(
            "ticker",
            "date",
            F.round(F.col("pct_change") * 100, 0).cast("long").alias("bp"),
        )
    )
    a = chg.select(
        F.col("ticker").alias("t1"), "date", F.col("bp").alias("bpx")
    )
    b = chg.select(
        F.col("ticker").alias("t2"), "date", F.col("bp").alias("bpy")
    )
    sums = (
        a.join(b, "date")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(
            F.count("*").alias("n"),
            F.sum("bpx").alias("sx"),
            F.sum("bpy").alias("sy"),
            F.sum(F.col("bpx") * F.col("bpy")).alias("sxy"),
            F.sum(F.col("bpx") * F.col("bpx")).alias("sxx"),
            F.sum(F.col("bpy") * F.col("bpy")).alias("syy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    dy = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return sums.select(
        "t1",
        "t2",
        F.col("n").alias("n_days"),
        (num / F.nullif(dx * dy, F.lit(0.0))).alias("corr"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

_STRATA_K = 20

_STRATIFIED_ORACLE = panel.sql_with(
    *panel.PANEL,
    body=f"""
SELECT ticker, date, close FROM (
  SELECT ticker, date, close,
         ROW_NUMBER() OVER (
           PARTITION BY ticker
           ORDER BY MD5(CAST(ticker AS VARCHAR) || '|' || CAST(date AS VARCHAR)), date
         ) AS rn
  FROM prices
) WHERE rn <= {_STRATA_K}""",
)


@register("sample_stratified", oracle=_STRATIFIED_ORACLE)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sample: precisely K rows per ticker,
    chosen by MD5 order of the row key — deterministic across engines,
    runs, and partitionings (unlike `df.sample`, whose output depends
    on partition layout). Per-stratum window only; at 100 TB each
    ticker's window sorts its own partition slice, no global order."""
    w = Window.partitionBy("ticker").orderBy("md5key", "date")
    px = panel.prices(spark, sf_dir).select(
        "ticker",
        "date",
        "close",
        F.md5(
            F.concat_ws("|", F.col("ticker").cast("string"), F.col("date").cast("string"))
        ).alias("md5key"),
    )
    return (
        px.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _STRATA_K)
        .select("ticker", "date", "close")
    )


_ERR_ALERT_BP = 2500  # alert when >25% of a day's events are errors

_ERR_ALERT_ORACLE = f"""
SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_errors,
       CAST(ROUND(10000.0 * SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  / COUNT(*), 0) AS BIGINT) AS err_bp,
       CAST(ROUND(10000.0 * SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  / COUNT(*), 0) AS BIGINT) > {_ERR_ALERT_BP} AS is_alert
FROM events GROUP BY 1"""


@register("events_error_rate_alert", oracle=_ERR_ALERT_ORACLE)
def events_error_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error-rate alert feed: the engine-side condition behind
    the reference's Slack/PagerDuty callbacks (`airflow/utils/
    alerts.py` is delivery; this is detection). One combinable agg
    keyed on day — bounded output, trivially incremental via the
    streaming daily path."""
    ev = load_table(spark, sf_dir, "events")
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    err_bp = F.round(10000.0 * n_err / F.count("*"), 0).cast("long")
    return ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n_events"),
        n_err.cast("long").alias("n_errors"),
        err_bp.alias("err_bp"),
        (err_bp > _ERR_ALERT_BP).alias("is_alert"),
    )


# ---------------------------------------------------------------------------
# Event-sequence paths (Markov transition counts)
# ---------------------------------------------------------------------------

_PATHS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       COUNT(*) AS n_transitions
FROM seq WHERE next_type IS NOT NULL
GROUP BY 1, 2"""


@register("events_top_paths", oracle=_PATHS_ORACLE)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (first-order Markov
    matrix) — the sequence-mining primitive behind journey analysis,
    next-action prediction features, and bot detection (self-loop
    heavy users).

    Scale: one window shuffle keyed by user_id (high-cardinality),
    then a map-side-combinable count to a (types × types)-bounded
    result — the output is independent of event volume. Ordering ties
    inside a user's same-timestamp burst break on event_id, so the
    transition set is deterministic cross-engine.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n_transitions"))
    )


_DAU_WAU_ORACLE = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
     days AS (SELECT DISTINCT day FROM du),
     nev AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
             FROM events GROUP BY 1),
     dau AS (SELECT day, COUNT(*) AS dau_exact FROM du GROUP BY day),
     wau AS (SELECT d.day, COUNT(DISTINCT u.user_id) AS wau_exact
             FROM days d
             JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
             GROUP BY d.day)
SELECT d.day, n.n_events, d.dau_exact, w.wau_exact,
       CAST(1 AS BIGINT) AS dau_within, CAST(1 AS BIGINT) AS wau_within
FROM dau d
JOIN wau w ON d.day = w.day
JOIN nev n ON d.day = n.day"""


@register("events_dau_wau_hll", oracle=_DAU_WAU_ORACLE)
def events_dau_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day WAU via Apache DataSketches HLL
    (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`).

    THE canonical pre-aggregated-distinct pattern at 100 TB: one scan
    builds a constant-size sketch PER DAY; weekly/monthly actives are
    sketch UNIONS over the tiny per-day table — raw user ids are
    never re-scanned or re-shuffled for the rollup, which is exactly
    what COUNT(DISTINCT) over a window cannot avoid.

    Self-verifying key: sketch binaries/estimates are engine-specific,
    so the output exposes the EXACT per-day and trailing-7-day
    distinct counts plus deterministic ``|est − exact| ≤ max(3,
    5%·exact)`` booleans for both estimates (lgConfigK=14 → rsd
    ≈0.8%; 5% is a ≫5σ margin, and the sketch is deterministic for
    fixed data). The DuckDB oracle reproduces the exact counts and
    asserts both bounds literally. The exact WAU here exists to CHECK
    the sketch — at 100 TB only the sketch-union path would run.
    """
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.col("ts").cast("date").alias("day"), "user_id")
    daily = du.groupBy("day").agg(
        F.hll_sketch_agg("user_id", 14).alias("sketch"),
        F.countDistinct("user_id").alias("dau_exact"),
        F.count("*").alias("n_events"),
    )
    dau = daily.select(
        "day",
        "n_events",
        "dau_exact",
        F.hll_sketch_estimate("sketch").alias("dau_est"),
    )
    # Trailing-7-day union as a day-range self-join of the PER-DAY
    # table (one row per calendar day — bounded regardless of event
    # volume), NOT a global rangeBetween window, which would funnel
    # through a single partition; the union agg shuffles on day.
    a = daily.select(F.col("day").alias("day"))
    b = daily.select(F.col("day").alias("bday"), "sketch")
    in_window = (F.col("bday") >= F.date_sub(F.col("day"), 6)) & (
        F.col("bday") <= F.col("day")
    )
    wau_est = (
        a.join(b, in_window)
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("wau_est"))
    )
    # Exact trailing-7-day distinct: same bounded day-range join over
    # the distinct (day, user) pairs — verification scaffolding only.
    pairs = du.distinct()
    wau_exact = (
        a.join(
            pairs.select(F.col("day").alias("bday"), "user_id"),
            in_window,
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau_exact"))
    )

    def _within(est: str, exact: str):
        return (
            F.abs(F.col(est) - F.col(exact))
            <= F.greatest(F.lit(3.0), 0.05 * F.col(exact))
        ).cast("long")

    return (
        dau.join(wau_est, "day")
        .join(wau_exact, "day")
        .select(
            "day",
            "n_events",
            "dau_exact",
            "wau_exact",
            _within("dau_est", "dau_exact").alias("dau_within"),
            _within("wau_est", "wau_exact").alias("wau_within"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Inter-arrival statistics (per-user event cadence)
# ---------------------------------------------------------------------------

_INTERARRIVAL_ORACLE = """
WITH gaps AS (
  SELECT user_id,
         EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         )) AS gap_us
  FROM events
)
SELECT user_id,
       COUNT(gap_us) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY gap_us) AS BIGINT)
         AS median_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY user_id"""


@register("events_interarrival_stats", oracle=_INTERARRIVAL_ORACLE)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival cadence (count / total / min / max /
    median gap in exact microseconds) — the behavioural fingerprint
    behind bot detection (impossibly regular or sub-second cadence),
    engagement scoring, and arrival-process modeling.

    One lag window + one agg, both keyed by user_id (high-cardinality,
    map-side combinable); PERCENTILE_DISC picks an actual gap value so
    the median is exactly reproducible cross-engine (same rationale as
    agg_quantiles).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    gaps = ev.select("user_id", gap.alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.sum("gap_us").alias("total_gap_us"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)")
        .cast("long")
        .alias("median_gap_us"),
    )
