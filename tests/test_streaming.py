"""True Structured Streaming paths: file source + AvailableNow +
memory sink, asserted equal to the batch-equivalent plan."""

from pyspark.sql import functions as F

from etl_stocks_with_sentiment_analysis_spark.sources import load_table
from etl_stocks_with_sentiment_analysis_spark.streaming import ingest


def test_streaming_daily_agg_matches_batch(spark, sf_dir):
    q = ingest.run_incremental_daily(spark, sf_dir, query_name="t_daily")
    q.awaitTermination(120)
    streamed = spark.sql(
        "SELECT day, event_type, n_events, total_value FROM t_daily"
    )
    batch = ingest.streaming_tumbling_daily(spark, sf_dir).select(
        "day", "event_type", "n_events", "total_value"
    )
    a = {tuple(map(str, r)) for r in streamed.collect()}
    b = {tuple(map(str, r)) for r in batch.collect()}
    assert a == b  # (n_users is approx in streaming → excluded)


def test_streaming_dedup_drops_replays(spark, sf_dir):
    q = ingest.run_dedup_stream(spark, sf_dir, query_name="t_dedup")
    q.awaitTermination(120)
    n_stream = spark.sql("SELECT COUNT(*) AS n FROM t_dedup").first()["n"]
    n_distinct = (
        load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    )
    assert n_stream == n_distinct


def test_sessionize_gap_semantics(spark, sf_dir):
    sess = ingest.streaming_sessionize(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    # total events preserved across sessions
    assert sess.agg(F.sum("n_events")).first()[0] == ev.count()
    # session ids start at 1 per user
    assert sess.groupBy("user_id").agg(F.min("session_id").alias("m")).filter(
        F.col("m") != 1
    ).count() == 0


def test_stateful_running_total_matches_batch(spark, sf_dir):
    from etl_stocks_with_sentiment_analysis_spark.streaming import stateful

    q = stateful.run_running_total_stream(spark, sf_dir, query_name="t_rt")
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM t_rt")
    batch = stateful.streaming_stateful_running_total(spark, sf_dir)
    a = {tuple(map(str, r)) for r in streamed.collect()}
    b = {tuple(map(str, r)) for r in batch.collect()}
    assert a == b


def test_incremental_upsert_materializes_and_is_idempotent(spark, sf_dir, tmp_path):
    target = str(tmp_path / "daily_sink")
    cols = ["day", "event_type", "n_events", "total_value"]

    def snapshot():
        # default commit mode is the manifest protocol (r9)
        from etl_stocks_with_sentiment_analysis_spark.operators import sinks

        return {
            tuple(map(str, r))
            for r in sinks.read_manifest_table(spark, target)
            .select(*cols)
            .collect()
        }

    q = ingest.run_incremental_upsert(spark, sf_dir, target, query_name="t_up1")
    q.awaitTermination(120)
    batch = {
        tuple(map(str, r))
        for r in ingest.streaming_tumbling_daily(spark, sf_dir).select(*cols).collect()
    }
    assert snapshot() == batch
    # replaying the whole stream upserts the same keys — no dupes
    q2 = ingest.run_incremental_upsert(spark, sf_dir, target, query_name="t_up2")
    q2.awaitTermination(120)
    assert snapshot() == batch


def test_transform_with_state_matches_batch(spark, sf_dir):
    from etl_stocks_with_sentiment_analysis_spark.streaming import stateful

    if not stateful.HAS_TWS:
        import pytest

        pytest.skip("transformWithState API not available")
    q = stateful.run_running_total_stream_tws(spark, sf_dir, query_name="t_tws")
    q.awaitTermination()
    got = spark.sql(
        "SELECT * FROM t_tws ORDER BY user_id, ts, event_id"
    ).collect()
    batch = (
        stateful.streaming_stateful_running_total(spark, sf_dir)
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    assert len(got) == len(batch) > 0
    for g, b in zip(got, batch):
        assert (g["user_id"], g["event_id"], g["running_n"]) == (
            b["user_id"],
            b["event_id"],
            b["running_n"],
        )
        assert g["running_value"] == b["running_value"]  # exact cents math


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    """Real watermark semantics, not just the twin-parity claim: a
    1-day watermark must finalize a day's window once the stream has
    seen events a day past it, and an event arriving for that closed
    window afterwards must be DROPPED (append mode emits each window
    once, state for expired windows is evicted). maxFilesPerTrigger=1
    forces one micro-batch per file so the watermark actually advances
    between the on-time and late files."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_stocks_with_sentiment_analysis_spark.streaming.ingest import _daily_agg

    def events_file(path, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(tbl, str(path))

    d = datetime.datetime
    src = tmp_path / "stream_src"
    src.mkdir()
    # file 1: two on-time day-1 events; file 2: day-3 event (advances
    # the watermark past day 1); file 3: a LATE day-1 event
    events_file(src / "a_batch1.parquet", [
        (1, d(2024, 1, 1, 10), 1, "click", 1.0),
        (2, d(2024, 1, 1, 11), 2, "click", 2.0),
    ])
    events_file(src / "b_batch2.parquet", [(3, d(2024, 1, 3, 9), 3, "click", 4.0)])
    # spacer: the watermark computed from a batch only takes effect in
    # the NEXT batch, so the late file must arrive two batches after
    # the day-3 event that advances it
    events_file(src / "c_batch3.parquet", [(5, d(2024, 1, 3, 10), 5, "click", 16.0)])
    events_file(src / "d_batch4.parquet", [(4, d(2024, 1, 1, 12), 4, "click", 8.0)])
    # the file source orders by modification time — pin it so the late
    # file really arrives AFTER the watermark-advancing ones
    import os
    import time

    now = time.time()
    for i, fname in enumerate(["a_batch1", "b_batch2", "c_batch3", "d_batch4"]):
        os.utime(src / f"{fname}.parquet", (now + 10 * i, now + 10 * i))

    from etl_stocks_with_sentiment_analysis_spark.sources.readers import (
        normalize_event_ts,
    )

    schema = spark.read.parquet(str(src)).schema
    stream = normalize_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    agg = _daily_agg(stream.withWatermark("ts", "1 day"), streaming=True)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {
        str(r["day"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM t_late").collect()
    }
    # day-1 window finalized from the on-time file only: the late 8.0
    # event is gone; the day-3 window stays open (nothing past its
    # watermark yet) and is not emitted in append mode.
    assert out.get("2024-01-01") == (2, 3.0), out
    assert "2024-01-03" not in out


def test_streaming_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """True stream-stream interval join: two watermarked readStream
    sides joined on user_id + 1-hour event-time range, asserted
    row-equal to the registered batch twin over the same events."""
    from etl_stocks_with_sentiment_analysis_spark.sources.readers import (
        normalize_event_ts,
    )
    from etl_stocks_with_sentiment_analysis_spark.streaming.ingest import (
        _attribute,
        streaming_interval_join,
    )

    src = str(tmp_path / "ev_src")
    load_table(spark, sf_dir, "events").coalesce(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = normalize_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    clicks = stream.filter(F.col("event_type") == "click").withWatermark(
        "ts", "2 hours"
    )
    purchases = stream.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", "2 hours"
    )
    q = (
        _attribute(clicks, purchases)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_attr")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM t_attr").collect()
    }
    batch = {tuple(r) for r in streaming_interval_join(spark, sf_dir).collect()}
    assert streamed == batch
    assert len(batch) > 0


def test_streaming_checkpoint_resume_exactly_once(spark, tmp_path):
    """Exactly-once across RESTARTS: two sequential AvailableNow runs
    share one checkpoint; the second run's input replays event_ids the
    first run already delivered. The state-store dedup must drop the
    replays after resume, so the parquet sink holds each event once."""
    import pyarrow as pa
    import pyarrow.parquet as papq
    import datetime

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        papq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                }
            ),
            str(src / name),
        )

    d = datetime.datetime
    write("a.parquet", [(1, d(2024, 1, 1, 10), 7), (2, d(2024, 1, 1, 11), 8)])
    write("b.parquet", [(3, d(2024, 1, 1, 12), 7)])

    schema = spark.read.parquet(str(src)).schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(str(src))
        )
        q = (
            stream.dropDuplicates(["event_id"])
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # first run: events 1,2,3 delivered
    assert spark.read.parquet(sink).count() == 3
    # new backlog arrives; file c REPLAYS event_ids 1 and 3
    write("c.parquet", [(1, d(2024, 1, 1, 10), 7), (3, d(2024, 1, 1, 12), 7)])
    write("d.parquet", [(4, d(2024, 1, 2, 9), 9)])
    run_once()  # resumed from checkpoint — replays must be dropped
    out = spark.read.parquet(sink)
    assert out.count() == 4
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3, 4]


def test_streaming_corpus_dedup_matches_batch_probe(spark, sf_dir, tmp_path):
    """The continuous-crawl probe stream must produce exactly the
    batch incremental-dedup decisions: every new doc, same collision
    counts, same keeps — per-batch work never touching corpus text."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata.dedup import (
        dedup_incremental_batch,
    )
    from etl_stocks_with_sentiment_analysis_spark.streaming.ingest import (
        run_streaming_corpus_dedup,
    )

    target = str(tmp_path / "keeps")
    q = run_streaming_corpus_dedup(spark, sf_dir, target)
    finished = q.awaitTermination(180)
    if not finished:
        q.stop()
    assert finished, "corpus dedup stream did not finish within 180s"
    got = {
        tuple(str(v) for v in r)
        for r in spark.read.parquet(target).collect()
    }
    want = {
        tuple(str(v) for v in r)
        for r in dedup_incremental_batch(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0

    # full replay (checkpoint wiped) must NOT duplicate decisions —
    # the keyed insert-ignore sink absorbs the reprocessed batches
    import shutil

    shutil.rmtree(target + "__checkpoint")
    q2 = run_streaming_corpus_dedup(spark, sf_dir, target)
    finished2 = q2.awaitTermination(180)
    if not finished2:
        q2.stop()
    assert finished2, "replay stream did not finish within 180s"
    replay = {
        tuple(str(v) for v in r)
        for r in spark.read.parquet(target).collect()
    }
    assert replay == want
