"""Writer semantics: the reference's ON CONFLICT behaviors
(`/root/reference/init.sql:14`, `ml/data_loader.py:140-160`) —
run-twice idempotence and upsert-overwrite."""

import pytest

from pyspark.sql import functions as F

from etl_stocks_with_sentiment_analysis_spark.operators import sinks


@pytest.fixture()
def rows(spark):
    return spark.createDataFrame(
        [(1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (2, "2024-01-01", "c")],
        "ticker INT, date STRING, val STRING",
    )


def test_insert_ignore_idempotent(spark, rows, tmp_path):
    target = str(tmp_path / "sink")
    sinks.insert_ignore(spark, target, rows, ["ticker", "date"])
    sinks.insert_ignore(spark, target, rows, ["ticker", "date"])  # replay
    out = spark.read.parquet(target)
    assert out.count() == 3
    assert out.select("ticker", "date").distinct().count() == 3


def test_insert_ignore_keeps_existing_on_conflict(spark, rows, tmp_path):
    target = str(tmp_path / "sink")
    sinks.insert_ignore(spark, target, rows, ["ticker", "date"])
    clash = spark.createDataFrame(
        [(1, "2024-01-01", "NEW"), (3, "2024-01-01", "d")],
        "ticker INT, date STRING, val STRING",
    )
    sinks.insert_ignore(spark, target, clash, ["ticker", "date"])
    out = spark.read.parquet(target)
    assert out.count() == 4
    kept = out.filter((F.col("ticker") == 1) & (F.col("date") == "2024-01-01"))
    assert kept.first()["val"] == "a"  # DO NOTHING: existing wins


def test_upsert_overwrites_on_conflict(spark, rows, tmp_path):
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    clash = spark.createDataFrame(
        [(1, "2024-01-01", "NEW"), (3, "2024-01-01", "d")],
        "ticker INT, date STRING, val STRING",
    )
    sinks.upsert(spark, target, clash, ["ticker", "date"])
    out = spark.read.parquet(target)
    assert out.count() == 4
    updated = out.filter((F.col("ticker") == 1) & (F.col("date") == "2024-01-01"))
    assert updated.first()["val"] == "NEW"  # DO UPDATE: incoming wins


def test_upsert_idempotent(spark, rows, tmp_path):
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    assert spark.read.parquet(target).count() == 3


def test_create_table_if_absent(spark, rows, tmp_path):
    target = str(tmp_path / "tbl")
    sinks.create_table_if_absent(spark, target, rows)
    assert spark.read.parquet(target).count() == 0
    sinks.insert_ignore(spark, target, rows, ["ticker", "date"])
    sinks.create_table_if_absent(spark, target, rows)  # no-op when present
    assert spark.read.parquet(target).count() == 3


def test_write_csv_roundtrip(spark, rows, tmp_path):
    target = str(tmp_path / "csv")
    sinks.write_csv(rows, target)
    back = spark.read.csv(target, header=True)
    assert back.count() == 3
    assert set(back.columns) == {"ticker", "date", "val"}
