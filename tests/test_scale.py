"""Scale-technique utilities: salted join parity, as-of join edge
semantics."""

from pyspark.sql import functions as F

from etl_stocks_with_sentiment_analysis_spark.operators import joins
from etl_stocks_with_sentiment_analysis_spark.plans import panel


def _rows(df):
    return {tuple(map(str, r)) for r in df.collect()}


def test_salted_join_matches_plain_inner(spark, sf_dir):
    c = panel.changes(spark, sf_dir)
    e = panel.explanations(spark, sf_dir)
    plain = c.join(e, ["ticker", "date"], "inner").select(
        "ticker", "date", "close", "sentiment"
    )
    salted = joins.salted_join(c, e, ["ticker", "date"], "inner", n_salt=4).select(
        "ticker", "date", "close", "sentiment"
    )
    assert _rows(plain) == _rows(salted)


def test_salted_join_matches_plain_left_anti(spark, sf_dir):
    c = panel.changes(spark, sf_dir)
    e = panel.explanations(spark, sf_dir)
    plain = c.join(e, ["ticker", "date"], "left_anti").select("ticker", "date")
    salted = joins.salted_join(
        c, e, ["ticker", "date"], "left_anti", n_salt=4
    ).select("ticker", "date")
    assert _rows(plain) == _rows(salted)


def test_asof_join_same_date_and_carry_forward(spark, sf_dir):
    out = joins.join_asof_latest_explanation(spark, sf_dir)
    # as-of date never exceeds the price date
    assert out.filter(F.col("asof_date") > F.col("date")).count() == 0
    # same-date explanations are taken (ASOF <=, not <)
    e = panel.explanations(spark, sf_dir).select("ticker", "date")
    matched_same_day = out.join(e, ["ticker", "date"], "inner").filter(
        F.col("asof_date") == F.col("date")
    )
    assert matched_same_day.count() == e.count()
    # rows with no prior explanation stay NULL (left semantics)
    assert out.filter(F.col("asof_date").isNull()).count() > 0


def _plan(spark, df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_plan_shapes_hold(spark, sf_dir):
    """Regression guard for the measured plan decisions (ARCHITECTURE.md):
    exchange budgets and no-nested-loop invariants of the hot lineages."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata import dedup
    from etl_stocks_with_sentiment_analysis_spark.ml.features import feature_matrix
    from etl_stocks_with_sentiment_analysis_spark.operators import aggregations

    fm = _plan(spark, feature_matrix(spark, sf_dir))
    # join-before-window: 2 agg shuffles + 1 broadcast + 1 window, max
    assert fm.count("Exchange") <= 4
    assert "NestedLoop" not in fm

    rj = _plan(spark, joins.join_range_bucketed(spark, sf_dir))
    assert "NestedLoop" not in rj  # the naive range predicate would BNLJ

    mh = _plan(spark, dedup.dedup_minhash_lsh(spark, sf_dir))
    # exact-dedup-first plan (r5): 2x rep-fold+min-agg feeding the band
    # self-join, 2x narrow member->rep windows, 2x within-group sides,
    # rep-pair distinct + expansion joins — 10 exchanges, every one on
    # either a distinct-text-sized frame or the answer itself
    assert mh.count("Exchange") <= 10
    assert "NestedLoop" not in mh

    ro = _plan(spark, aggregations.rollup_time_hierarchy(spark, sf_dir))
    assert ro.count("Exchange") <= 2  # one expand + one shuffle family


def test_connected_components_long_chain_bounded_plan(spark, sf_dir):
    """A path graph of diameter 15 (> the old 20-round comfort zone's
    assumptions) must converge to all-zero labels, with checkpointing
    keeping the final plan depth bounded (not 15 nested joins)."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata.dedup import (
        connected_components,
    )

    n = 16
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "a LONG, b LONG"
    )
    labels = connected_components(edges)
    rows = {r["doc_id"]: r["lbl"] for r in labels.collect()}
    assert rows == {i: 0 for i in range(n)}
    # localCheckpoint truncated lineage: at most the ~2 rounds since
    # the last checkpoint remain in the plan (~15 uncheckpointed
    # propagation rounds would show ~30 joins)
    plan = _plan(spark, labels)
    assert plan.count("Join") <= 12


def test_connected_components_nonconvergence_raises(spark, sf_dir):
    import pytest

    from etl_stocks_with_sentiment_analysis_spark.llmdata.dedup import (
        connected_components,
    )

    chain = [(i, i + 1) for i in range(9)]
    edges = spark.createDataFrame(chain + [(b, a) for a, b in chain], "a LONG, b LONG")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=2)


def test_chrono_split_panel_never_single_partition(spark, sf_dir):
    """ml_chrono_split's global rank must decompose into per-date
    offset (tiny frame) + date-partitioned row_number: the only
    SinglePartition exchange allowed is the distinct-dates one."""
    import re

    from etl_stocks_with_sentiment_analysis_spark.ml.features import ml_chrono_split

    plan = _plan(spark, ml_chrono_split(spark, sf_dir))
    assert plan.count("Exchange SinglePartition") <= 1
    # the panel-side ranking window is partitioned by date, not global
    m = re.search(r"row_number\(\) windowspecdefinition\((\w+)", plan)
    assert m and m.group(1).startswith("date")


def test_dashboard_views_register_and_select(spark, sf_dir):
    from etl_stocks_with_sentiment_analysis_spark.plans import views

    names = views.create_dashboard_views(spark, sf_dir)
    assert len(names) == 12
    for v in names:
        assert spark.sql(f"SELECT * FROM {v} LIMIT 1").count() >= 0
    # reference-style SQL over the named views works verbatim
    top = spark.sql(
        "SELECT ticker FROM accuracy_by_stock ORDER BY accuracy_pct DESC LIMIT 1"
    )
    assert top.count() == 1


def test_standard_scaler_fit_stats_and_plan_shape(spark, sf_dir):
    """Scaled train rows must have mean ~0 / std ~1 (fit correctness),
    test rows use the SAME moments (no leakage: their mean need not be
    0), and the only SinglePartition exchanges are the tiny
    distinct-dates rank and the 1-row stats agg — never the panel."""
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.ml.features import (
        ml_standard_scaler,
    )

    df = ml_standard_scaler(spark, sf_dir)
    plan = _plan(spark, df)
    # fit happens at build time (two tiny scalar fetches); the apply
    # plan is scan + project — no exchange, no join at all
    assert plan.count("Exchange SinglePartition") == 0
    assert "NestedLoop" not in plan and "Join" not in plan
    stats = (
        df.filter("is_train")
        .agg(
            F.avg("pct_change_scaled").alias("mu"),
            F.stddev_samp("pct_change_scaled").alias("sd"),
        )
        .first()
    )
    assert abs(stats["mu"]) < 1e-6
    assert abs(stats["sd"] - 1.0) < 1e-3  # quantized at 1/10000 -> ~1
    n_test = df.filter("NOT is_train").count()
    assert n_test > 0


def test_bucketed_colocate_join_has_no_exchange(spark, sf_dir):
    """Bucket-aligned tables must merge-join with zero Exchange (and,
    with sortBy, zero per-bucket Sort) in the physical plan."""
    from etl_stocks_with_sentiment_analysis_spark.operators.joins import (
        bucketed_colocate_join,
    )
    from etl_stocks_with_sentiment_analysis_spark.plans import panel

    px = panel.prices(spark, sf_dir).select("ticker", "date", "close")
    ex = panel.explanations(spark, sf_dir).select("ticker", "date", "topic")
    joined = bucketed_colocate_join(spark, px, ex, ["ticker", "date"], n_buckets=4)

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # and it is a real merge join over bucket files, not a broadcast
    assert "SortMergeJoin" in plan, plan

    # semantics unchanged vs a plain join
    expected = px.join(ex, ["ticker", "date"]).count()
    assert joined.count() == expected
