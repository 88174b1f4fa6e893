"""Custom stateful streaming operator: per-user running totals via
``applyInPandasWithState`` (SURVEY.md §2.10 extension — the reference
has no streaming engine; this is the Spark-native way to express
operators whose state outlives a micro-batch).

Two twins of the same semantics:

- ``streaming_stateful_running_total`` (registered, exact oracle):
  the batch plan — a running-sum window, one exchange on user_id.
- ``run_running_total_stream`` — the true Structured Streaming path:
  state = (event_count, cents_total) per user_id, carried across
  micro-batches by the state store; each batch's rows are sorted
  (ts, event_id) inside the group, cumulated on top of the restored
  state, and the new totals written back.
  tests/test_streaming.py asserts streaming == batch row-for-row.

Scale: state is two longs per user — bounded by user cardinality, not
event volume; a GroupStateTimeout would expire idle users in a real
deployment. Value sums are integer cents (exact, order-free — see
functions/exact.py): a float running sum would drift between the
streaming and batch twins.
"""

from __future__ import annotations

import math
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .ingest import stream_events

OUT_SCHEMA = (
    "user_id LONG, ts TIMESTAMP, event_id LONG, "
    "running_n LONG, running_value DOUBLE"
)
STATE_SCHEMA = "n LONG, cents LONG"


def _cents(v: float) -> int:
    """ROUND(v*100, 0) with half-away-from-zero ties — matches Spark's
    and DuckDB's ROUND (Python's built-in round() is banker's)."""
    x = v * 100
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _running_total(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out_n, out_v = [], []
    for v in rows["value"]:
        n += 1
        cents += _cents(float(v))
        out_n.append(n)
        out_v.append(cents / 100.0)
    rows = rows.assign(running_n=out_n, running_value=out_v)
    state.update((n, cents))
    yield rows[["user_id", "ts", "event_id", "running_n", "running_value"]]


def run_running_total_stream(
    spark: SparkSession, sf_dir: str, query_name: str = "running_total"
):
    """The applyInPandasWithState path (memory sink, AvailableNow)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = stream_events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    out = ev.groupBy("user_id").applyInPandasWithState(
        _running_total,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


@register(
    "streaming_stateful_running_total",
    oracle="""
SELECT user_id, ts, event_id,
       COUNT(*) OVER w AS running_n,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS DOUBLE) / 100.0
         AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)""",
)
def streaming_stateful_running_total(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch twin of the stateful stream: per-user running event count
    and exact running cents-sum — one window exchange on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        F.count("*").over(w).alias("running_n"),
        (F.sum(cents).over(w).cast("double") / 100.0).alias("running_value"),
    )
