"""Silver-layer bucketing: result parity with the per-query lineage
and shuffle elimination on the bucketed path."""

import pytest

from etl_stocks_with_sentiment_analysis_spark.plans import panel, silver


@pytest.fixture(scope="module")
def silver_db(spark, sf_dir):
    # warehouse dir is a static conf — use the session default and
    # clean the database (and its files) up afterwards
    spark.sql("DROP DATABASE IF EXISTS silver_t CASCADE")
    silver.materialize_silver(spark, sf_dir, database="silver_t", n_buckets=4)
    yield "silver_t"
    spark.sql("DROP DATABASE IF EXISTS silver_t CASCADE")


def test_gold_parity_with_query_lineage(spark, sf_dir, silver_db):
    gold = silver.gold_from_silver(spark, database=silver_db)
    direct = panel.fct_prices_with_grok(spark, sf_dir).select(*gold.columns)
    a = {tuple(map(str, r)) for r in gold.collect()}
    b = {tuple(map(str, r)) for r in direct.collect()}
    assert a == b


def test_bucketed_join_has_fewer_exchanges(spark, sf_dir, silver_db):
    gold = silver.gold_from_silver(spark, database=silver_db)
    direct = panel.fct_prices_with_grok(spark, sf_dir)

    def n_exchanges(df):
        s = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        return s.count("Exchange")

    assert n_exchanges(gold) < n_exchanges(direct)
