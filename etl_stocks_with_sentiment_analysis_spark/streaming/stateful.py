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


# ---------------------------------------------------------------------------
# transformWithStateInPandas twin — the modern arbitrary-state API
# ---------------------------------------------------------------------------

try:  # Spark 4.x API; import-gated so older runtimes keep the legacy path.
    # The state-server protocol additionally needs google.protobuf (not in
    # this image) — without it the driver-side state worker crashes at
    # query start, so probe it here and fall back to the legacy twin.
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotalProcessor(StatefulProcessor):
        """Same semantics as `_running_total`, expressed against the
        transformWithState handle: state is a named ValueState (the
        API also offers List/Map state, timers, and per-state TTL —
        the pieces a long-running 100 TB stream needs for state
        hygiene that the legacy applyInPandasWithState API lacks)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._totals.get() if self._totals.exists() else (0, 0)
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            out_n, out_v = [], []
            for v in pdf["value"]:
                n += 1
                cents += _cents(float(v))
                out_n.append(n)
                out_v.append(cents / 100.0)
            pdf = pdf.assign(running_n=out_n, running_value=out_v)
            self._totals.update((n, cents))
            yield pdf[["user_id", "ts", "event_id", "running_n", "running_value"]]

        def close(self) -> None:
            pass

    HAS_TWS = True
except ImportError:  # pragma: no cover
    HAS_TWS = False


def run_running_total_stream_tws(
    spark: SparkSession, sf_dir: str, query_name: str = "running_total_tws"
):
    """The transformWithStateInPandas path (RocksDB state store — the
    API requires it; also the provider any stateful 100 TB stream
    should run, since HDFS-backed state lives on the executor heap
    while RocksDB spills to local disk with changelog checkpointing).
    tests/test_streaming.py asserts this twin, the legacy twin, and
    the batch window produce identical rows."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ev = stream_events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotalProcessor(),
        outputStructType=OUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
