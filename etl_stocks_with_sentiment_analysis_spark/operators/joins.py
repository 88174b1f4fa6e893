"""Join operators (SURVEY.md §2.3, J1–J5).

Scale notes: J1/J2/J3 are fact⋈fact equi-joins on (ticker, date) —
both sides derive from the same lineitem scan and share the grouping
key, so at 100 TB the right layout is bucketing both silver tables by
ticker (co-located SMJ, no shuffle). Locally Catalyst/AQE picks the
strategy. J4/J5 join tiny aggregated sides — broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import panel
from ..registry import register


@register(
    "join_left_prices_grok",
    oracle=panel.sql_with(
        *panel.PANEL_ENRICHED,
        body="""
SELECT c.ticker, c.date, c.close, c.pct_change, e.sentiment, e.topic, e.explanation
FROM changes c LEFT JOIN explanations e ON c.ticker = e.ticker AND c.date = e.date""",
    ),
)
def join_left_prices_grok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — the central fact-table LEFT join prices ⟕ explanations
    (`fct_prices_with_grok.sql:21-24`); unmatched rows keep NULLs.
    Physical shape: join-before-window (panel.enriched) — both agg
    outputs are co-partitioned on the join key, so the join adds no
    exchange."""
    return panel.enriched(spark, sf_dir).select(
        "ticker", "date", "close", "pct_change", "sentiment", "topic", "explanation"
    )


@register(
    "join_inner_pred_actual",
    oracle=panel.sql_with(*panel.PANEL_SCORED, body="SELECT * FROM scored"),
)
def join_inner_pred_actual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — predictions ⨝ actual volatility to score the model
    (`sql/dashboard_views.sql:36-39`)."""
    return panel.scored(spark, sf_dir)


@register(
    "join_anti_unprocessed",
    oracle=panel.sql_with(
        panel.PRICES_CTE,
        panel.EXPLANATIONS_CTE,
        body="""
SELECT p.ticker, p.date, p.close, p.volume
FROM prices p
WHERE NOT EXISTS (
  SELECT 1 FROM explanations e WHERE e.ticker = p.ticker AND e.date = p.date
)""",
    ),
)
def join_anti_unprocessed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — incremental delta: price rows with no explanation yet
    (`stock_grok_pipeline.py:191-195` NOT EXISTS → left_anti)."""
    p = panel.prices(spark, sf_dir)
    e = panel.explanations(spark, sf_dir)
    return p.join(e, ["ticker", "date"], "left_anti").select(
        "ticker", "date", "close", "volume"
    )


PRECISION_CTE = """precision_v AS (
  SELECT predicted_volatility_class AS class,
         ROUND(SUM(is_correct) / COUNT(*), 4) AS precision
  FROM scored GROUP BY 1
)"""

RECALL_CTE = """recall_v AS (
  SELECT actual_volatility_class AS class,
         ROUND(SUM(is_correct) / COUNT(*), 4) AS recall
  FROM scored GROUP BY 1
)"""


@register(
    "join_inner_precision_recall",
    oracle=panel.sql_with(
        *panel.PANEL_SCORED,
        PRECISION_CTE,
        RECALL_CTE,
        body="""
SELECT p.class, p.precision, r.recall
FROM precision_v p JOIN recall_v r ON p.class = r.class""",
    ),
)
def join_inner_precision_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — precision ⨝ recall per class (`sql/dashboard_views.sql:180-181`)."""
    s = panel.scored(spark, sf_dir)
    prec = s.groupBy(
        F.col("predicted_volatility_class").alias("class")
    ).agg(F.round(F.sum("is_correct") / F.count("*"), 4).alias("precision"))
    rec = s.groupBy(F.col("actual_volatility_class").alias("class")).agg(
        F.round(F.sum("is_correct") / F.count("*"), 4).alias("recall")
    )
    return prec.join(rec, "class", "inner")


@register(
    "join_scalar_subquery_latest",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        panel.PREDICTIONS_CTE,
        body="""
SELECT ticker, date, predicted_volatility_class, model_version
FROM predictions
WHERE model_version = (
  SELECT model_version FROM predictions ORDER BY date DESC, ticker DESC LIMIT 1
)""",
    ),
)
def join_scalar_subquery_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — filter to the latest model version via scalar subquery
    (`sql/dashboard_views.sql:98-103`). Spark: 1-row broadcast join."""
    p = panel.predictions(spark, sf_dir)
    latest = (
        p.orderBy(F.desc("date"), F.desc("ticker")).select("model_version").limit(1)
    )
    return p.join(F.broadcast(latest), "model_version").select(
        "ticker", "date", "predicted_volatility_class", "model_version"
    )


@register(
    "join_asof_latest_explanation",
    oracle=panel.sql_with(
        panel.PRICES_CTE,
        panel.EXPLANATIONS_CTE,
        body="""
SELECT p.ticker, p.date, p.close, e.sentiment, e.topic, e.date AS asof_date
FROM prices p ASOF LEFT JOIN explanations e
  ON p.ticker = e.ticker AND e.date <= p.date""",
    ),
)
def join_asof_latest_explanation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join — an operator Spark lacks natively: each
    price row picks the LATEST explanation at or before its date.
    (Beyond the reference, which meets its only as-of-like need with
    LAG — SURVEY.md §2.3; oracle uses DuckDB's native ASOF JOIN.)

    Implementation is the scale-correct union-merge: tag both sides,
    union, one (ticker)-window `last(..., ignorenulls)` carries the
    most recent explanation forward, keep price rows. ONE window
    exchange on the union — never the O(n·m) range join a naive
    `e.date <= p.date` predicate would plan.
    """
    from pyspark.sql import Window

    p = panel.prices(spark, sf_dir).select(
        "ticker", "date", "close",
        F.lit(1).alias("is_price"),
        F.lit(None).cast("string").alias("sentiment"),
        F.lit(None).cast("string").alias("topic"),
        F.lit(None).cast("date").alias("edate"),
    )
    e = panel.explanations(spark, sf_dir).select(
        "ticker", "date",
        F.lit(None).cast("double").alias("close"),
        F.lit(0).alias("is_price"),
        "sentiment", "topic",
        F.col("date").alias("edate"),
    )
    # On equal dates the explanation row (is_price=0) sorts first, so a
    # same-date explanation is visible to the price row (ASOF <=).
    w = (
        Window.partitionBy("ticker")
        .orderBy("date", "is_price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = p.unionByName(e)
    return (
        u.select(
            "ticker", "date", "close", "is_price",
            F.last("sentiment", ignorenulls=True).over(w).alias("sentiment"),
            F.last("topic", ignorenulls=True).over(w).alias("topic"),
            F.last("edate", ignorenulls=True).over(w).alias("asof_date"),
        )
        .filter(F.col("is_price") == 1)
        .drop("is_price")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
    n_salt: int = 8,
) -> DataFrame:
    """Skew-resilient equi-join: spread each hot key over ``n_salt``
    shuffle partitions by salting the (typically larger) left side and
    replicating the right side once per salt value.

    Semantics-preserving for inner/left/left_anti equi-joins: every
    left row still meets exactly the right rows of its key. Use when a
    single key dominates (AQE's skew-join split handles moderate skew
    automatically; salting is the explicit fix when one key exceeds an
    executor). Cost: right side × n_salt — keep the replicated side
    the small one.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l_ = left.withColumn("__salt", salt)
    r_ = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l_.join(r_, keys + ["__salt"], how).drop("__salt")


_RANGE_ORACLE = """
SELECT a.event_id AS click_id, b.event_id AS follow_id, b.event_type AS follow_type,
       EPOCH_US(b.ts) - EPOCH_US(a.ts) AS gap_us
FROM events a JOIN events b
  ON EPOCH_US(b.ts) >= EPOCH_US(a.ts)
 AND EPOCH_US(b.ts) < EPOCH_US(a.ts) + 300000000
 AND a.event_id <> b.event_id
WHERE a.event_type = 'click'"""


@register("join_range_bucketed", oracle=_RANGE_ORACLE)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — follow-on events within 5 minutes of
    each click. Spark has no native range-join strategy: a raw
    inequality predicate plans a BroadcastNestedLoopJoin, O(n·m).
    This is the scale-correct bucketization: quantize time into
    window-sized buckets, emit each probe row into its bucket AND the
    next (a 5-min interval spans at most two 5-min buckets), hash-join
    on the bucket key, then apply the exact range filter. Shuffle
    volume is 2x the probe side — never a cross product. (DuckDB's
    oracle runs its native IEJoin on the same predicate.)
    """
    from ..sources import load_table

    bucket_us = 300_000_000  # window length = bucket length
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    a = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            us.alias("a_us"),
            F.floor(us / bucket_us).alias("b0"),
        )
        .select(
            "click_id",
            "a_us",
            F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("bucket"),
        )
    )
    b = ev.select(
        F.col("event_id").alias("follow_id"),
        F.col("event_type").alias("follow_type"),
        us.alias("b_us"),
        F.floor(us / bucket_us).alias("bucket"),
    )
    return (
        a.join(b, ["bucket"])
        .filter(
            (F.col("b_us") >= F.col("a_us"))
            & (F.col("b_us") < F.col("a_us") + bucket_us)
            & (F.col("click_id") != F.col("follow_id"))
        )
        .select(
            "click_id",
            "follow_id",
            "follow_type",
            (F.col("b_us") - F.col("a_us")).alias("gap_us"),
        )
    )


_SALTED_ORACLE = """
SELECT l.l_orderkey, l.l_linenumber, n.n_name AS nation_name
FROM (SELECT l_orderkey, l_linenumber,
             CASE WHEN l_orderkey % 10 < 7 THEN 0
                  ELSE l_suppkey % 25 END AS skew_key
      FROM lineitem) l
JOIN nation n ON n.n_nationkey = l.skew_key"""


@register("join_salted_skew", oracle=_SALTED_ORACLE)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient salted equi-join, driver-verified on a genuinely
    skewed fixture: ~70% of lineitem rows map to one hot key (0), the
    rest spread over 25 nation keys. `salted_join` spreads the hot key
    over n_salt shuffle partitions by replicating the 25-row dim side
    — semantics identical to the plain inner join (the oracle), plan
    never funnels the hot key through one task. At cluster scale this
    is the explicit fix when one key exceeds an executor; AQE skew
    split handles the moderate cases automatically.
    """
    from ..sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(0))
        .otherwise(F.col("l_suppkey") % 25)
        .cast("long")
        .alias("skew_key"),
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("skew_key"),
        F.col("n_name").alias("nation_name"),
    )
    return salted_join(li, nat, ["skew_key"], "inner", n_salt=8).select(
        "l_orderkey", "l_linenumber", "nation_name"
    )


def bucketed_colocate_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_buckets: int = 8,
    table_prefix: str = "bkt_colocate",
) -> DataFrame:
    """Shuffle-FREE equi-join via bucketed tables: both sides are
    written `bucketBy(n, keys).sortBy(keys)` into the warehouse, so
    matching keys land in the same bucket file on both sides and the
    join needs NO Exchange — each task zips bucket i with bucket i.

    This is the 100 TB answer for a fact-fact join that recurs every
    day (events×orders, train×features): pay the layout shuffle once
    at write time, then every subsequent join of any two tables
    bucketed on the same key count is exchange-less. Contrast
    `salted_join` (one-off skew) and broadcast (small dims) — bucketing
    is for the big-big recurring case. tests/test_scale.py asserts the
    physical plan of the joined read contains no Exchange operator.

    Spark requires `spark.sql.sources.bucketing.enabled` (default on)
    and equal bucket counts; `sortBy` additionally removes the
    per-bucket Sort from the merge join.
    """
    import os
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    lt, rt = f"{table_prefix}_l", f"{table_prefix}_r"
    for df, name in ((left, lt), (right, rt)):
        # a table dir can outlive the catalog entry (fresh session over an
        # old warehouse); drop both so the managed write never collides
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
        (
            df.write.bucketBy(n_buckets, *keys)
            .sortBy(*keys)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    # MERGE hint: this helper's contract is the big-big co-located merge
    # join. Without it, a small-side Catalyst estimate picks broadcast and
    # "Bucketed: false (disabled by query planner)" — correct for a dim
    # table, but then you didn't need bucketing; at fact-fact scale SMJ
    # is what the planner picks anyway and the hint is a no-op.
    return spark.table(lt).hint("merge").join(spark.table(rt), keys)


_ASOF_TOL_DAYS = 7

_ASOF_TOL_ORACLE = panel.sql_with(
    panel.PRICES_CTE,
    panel.EXPLANATIONS_CTE,
    body=f"""
SELECT ticker, date, close,
       CASE WHEN stale THEN NULL ELSE sentiment END AS sentiment,
       CASE WHEN stale THEN NULL ELSE topic END AS topic,
       CASE WHEN stale THEN NULL ELSE asof_date END AS asof_date
FROM (
  SELECT p.ticker, p.date, p.close, e.sentiment, e.topic, e.date AS asof_date,
         e.date IS NULL OR p.date - e.date > {_ASOF_TOL_DAYS} AS stale
  FROM prices p ASOF LEFT JOIN explanations e
    ON p.ticker = e.ticker AND e.date <= p.date
)""",
)


@register("join_asof_tolerance", oracle=_ASOF_TOL_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND (pandas `merge_asof(...,
    tolerance=7d)`): the latest explanation at or before each price
    date counts only if it is at most 7 days old — an enrichment older
    than the bound is worse than none (stale news must not label
    today's move).

    Same scale shape as `join_asof_latest_explanation` (union-merge,
    one window exchange, never the O(n·m) range join); the tolerance
    is a pure post-window expression, so the bound costs nothing.
    """
    from pyspark.sql import Window

    # The enrichment fields travel as ONE struct through ONE
    # last(ignorenulls) window: three independent windows could mix
    # fields from different source rows whenever an explanation has a
    # NULL field or two explanations tie on (ticker, date) — the
    # oracle's ASOF join always carries a single row.
    _ENR_T = "struct<sentiment:string,topic:string,edate:date>"
    p = panel.prices(spark, sf_dir).select(
        "ticker", "date", "close",
        F.lit(1).alias("is_price"),
        F.lit(None).cast(_ENR_T).alias("enr"),
    )
    e = panel.explanations(spark, sf_dir).select(
        "ticker", "date",
        F.lit(None).cast("double").alias("close"),
        F.lit(0).alias("is_price"),
        F.struct(
            F.col("sentiment"), F.col("topic"), F.col("date").alias("edate")
        ).alias("enr"),
    )
    w = (
        Window.partitionBy("ticker")
        .orderBy("date", "is_price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = p.unionByName(e)
    carried = (
        u.select(
            "ticker", "date", "close", "is_price",
            F.last("enr", ignorenulls=True).over(w).alias("enr"),
        )
        .filter(F.col("is_price") == 1)
        .drop("is_price")
    )
    fresh = F.datediff(F.col("date"), F.col("enr.edate")) <= _ASOF_TOL_DAYS
    keep = lambda c: F.when(fresh, F.col(f"enr.{c}")).otherwise(F.lit(None))  # noqa: E731
    return carried.select(
        "ticker", "date", "close",
        keep("sentiment").alias("sentiment"),
        keep("topic").alias("topic"),
        keep("edate").alias("asof_date"),
    )


@register(
    "join_semi_with_lineitems",
    oracle="""
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_cents
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
  AND o_orderstatus = 'O'""",
)
def join_semi_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-SEMI join — existence filtering without duplication: open
    orders that have at least one lineitem, emitted once regardless of
    how many lineitems match (the EXISTS shape; complement of
    `join_anti_unprocessed`).

    Scale: Spark's LeftSemi keeps only the probe side's columns, so
    the build side is reduced to its join key before the shuffle, and
    the output never multiplies rows — the safe way to filter a fact
    table by another fact table's keys. With AQE the key-only build
    side is usually small enough to broadcast after pre-aggregation.
    """
    from ..sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .join(lineitem, "o_orderkey", "left_semi")
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("total_cents"),
        )
    )
