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
