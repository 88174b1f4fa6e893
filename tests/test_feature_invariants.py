"""Invariant tests in the reference's style
(`/root/reference/tests/test_feature_engineering.py:13-75`):
bounds and boundary semantics, not golden values."""

from pyspark.sql import functions as F

from etl_stocks_with_sentiment_analysis_spark.operators import scalars, windows
from etl_stocks_with_sentiment_analysis_spark.plans import panel


def test_rsi_bounds(spark, sf_dir):
    rows = windows.window_rsi(spark, sf_dir).filter(F.col("rsi_14").isNotNull())
    bad = rows.filter((F.col("rsi_14") < 0) | (F.col("rsi_14") > 100)).count()
    assert bad == 0  # RSI ∈ [0, 100] (reference :62-68)


def test_atr_non_negative(spark, sf_dir):
    rows = windows.window_atr(spark, sf_dir).filter(F.col("atr_14").isNotNull())
    assert rows.filter(F.col("atr_14") < 0).count() == 0  # reference :70-75


def test_volatility_non_negative_and_length_preserving(spark, sf_dir):
    base = panel.prices(spark, sf_dir).filter(F.col("close") > 0)
    vol = scalars.fn_volatility(spark, sf_dir)
    assert vol.count() == base.count()  # length preserving (reference :17-23)
    assert vol.filter(F.col("volatility") < 0).count() == 0


def test_bucket_boundary_semantics(spark):
    """SQL `<` vs pd.cut `<=` disagree exactly at 2.0 / 5.0
    (SURVEY.md §2.8 F3) — both surfaces must keep their own contract."""
    df = spark.createDataFrame(
        [(1.9,), (2.0,), (4.9,), (5.0,), (5.1,)], "v DOUBLE"
    )
    sql_cls = df.select(
        F.when(F.col("v") < 2, "low")
        .when(F.col("v") < 5, "medium")
        .otherwise("high")
        .alias("c")
    ).collect()
    cut_cls = df.select(
        F.when(F.col("v") <= 2, "low")
        .when(F.col("v") <= 5, "medium")
        .otherwise("high")
        .alias("c")
    ).collect()
    assert [r.c for r in sql_cls] == ["low", "medium", "medium", "high", "high"]
    assert [r.c for r in cut_cls] == ["low", "low", "medium", "medium", "high"]


def test_next_business_day_never_weekend(spark, sf_dir):
    nbd = scalars.date_next_business_day(spark, sf_dir)
    # pandas convention: Mon=0..Sun=6; 5/6 are weekend
    weekend = nbd.filter(
        ((F.dayofweek("next_business_day") + 5) % 7) >= 5
    ).count()
    assert weekend == 0


def test_lag_first_row_null_per_ticker(spark, sf_dir):
    chg = panel.changes(spark, sf_dir)
    n_tickers = chg.select("ticker").distinct().count()
    n_null = chg.filter(F.col("pct_change").isNull()).count()
    assert n_null == n_tickers  # exactly one NULL (first date) per ticker
