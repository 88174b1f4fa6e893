"""Testdata-drift guard (VERDICT r2 item 4).

The round-2 regression class: the driver regenerated the testdata and
``events.ts`` flipped from TIMESTAMP(NANOS) to ``timestamp[us]``,
which the then-unconditional nanos workaround turned into a plan-time
AnalysisException across ~13 registry keys. This test writes BOTH
encodings as local fixtures and asserts ``load_table`` normalizes each
to session-TZ TimestampType with identical values — so the reader can
never again silently depend on one generator encoding.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from etl_stocks_with_sentiment_analysis_spark.sources.readers import load_table

WALL_CLOCK = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 1, 12, 34, 56, 789000),
    datetime.datetime(2024, 1, 2, 23, 59, 59, 999999),
]


def _write_events(dirpath, ts_type):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(WALL_CLOCK, ts_type),
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["view", "click", "error"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"], pa.string()),
        }
    )
    pq.write_table(tbl, str(dirpath / "events.parquet"))


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("ns"), pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["nanos", "micros-ntz", "micros-utc"],
)
def test_events_ts_normalized_across_encodings(spark, tmp_path, ts_type):
    _write_events(tmp_path, ts_type)
    df = load_table(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = sorted(r["ts"] for r in df.select("ts").collect())
    # Session TZ is UTC, so every encoding must surface the same wall clock.
    assert [t.replace(tzinfo=None) for t in got] == WALL_CLOCK
