"""Round-6 production-semantics tests: the GROWING materialized LSH
index (cross-batch duplicate capture), its replay idempotence, and the
multi-batch streaming twin with deterministic batching.

Parity model: the expected keep/collision decisions are simulated in
pure Python over the ENGINE'S OWN band signatures (collected once for
all docs), so the test verifies the expanding-index plumbing — probe,
sink merge, append ordering — independently of how signatures are
computed (those are oracle-verified elsewhere: `dedup_index_build`,
`dedup_index_append`)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from etl_stocks_with_sentiment_analysis_spark.llmdata.dedup import (
    _band_signatures,
    _minhash_signatures,
    append_lsh_index,
    probe_lsh_index,
)
from etl_stocks_with_sentiment_analysis_spark.streaming.ingest import (
    corpus_dedup_batch_fn,
)

_SCHEMA = "doc_id LONG, text STRING"

_CORPUS = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "one two three four five"),
    (3, "unique corpus text entirely different words"),
]
# batch 1: one dup-of-corpus (dropped), one brand-new (kept, appended)
_BATCH1 = [
    (10, "alpha beta gamma delta epsilon"),
    (11, "brand new crawl document first sighting"),
]
# batch 2: a dup of batch 1's KEPT doc — the cross-batch case a static
# index misses — plus another brand-new doc
_BATCH2 = [
    (20, "brand new crawl document first sighting"),
    (21, "another fresh document never seen before"),
]
# batch 3: dup of batch 2's kept doc + a too-short-to-shingle doc
_BATCH3 = [
    (30, "another fresh document never seen before"),
    (31, "hi"),
]


def _sig_sets(spark):
    """Engine-derived (band, sig) set per doc id, for the Python
    simulation."""
    all_docs = spark.createDataFrame(
        _CORPUS + _BATCH1 + _BATCH2 + _BATCH3, _SCHEMA
    )
    rows = _band_signatures(_minhash_signatures(all_docs)).collect()
    sets: dict = {}
    for r in rows:
        sets.setdefault(r["doc_id"], set()).add((r["band"], r["sig"]))
    return sets


def _simulate(sig_sets, batches, grow):
    """Sequential expanding-index reference: per batch, each doc's
    distinct colliding index docs (shared (band, sig), never itself);
    kept docs join the index AFTER their whole batch."""
    index_ids = {d for d, _ in _CORPUS}
    decisions = {}
    for batch in batches:
        kept_this_batch = []
        for doc_id, _ in batch:
            mine = sig_sets.get(doc_id, set())
            matches = sorted(
                x
                for x in index_ids
                if x != doc_id and mine & sig_sets.get(x, set())
            )
            decisions[doc_id] = (
                len(matches),
                matches[0] if matches else None,
                len(matches) == 0,
            )
            if not matches:
                kept_this_batch.append(doc_id)
        if grow:
            index_ids |= set(kept_this_batch)
    return decisions


def _write_index(spark, tmp_path, name):
    idx = str(tmp_path / name)
    corpus = spark.createDataFrame(_CORPUS, _SCHEMA)
    _band_signatures(_minhash_signatures(corpus)).write.partitionBy(
        "band"
    ).parquet(idx)
    return idx


def _sink_decisions(spark, target):
    return {
        r["new_doc_id"]: (r["n_index_matches"], r["first_match_doc_id"], r["keep"])
        for r in spark.read.parquet(target).collect()
    }


def test_expanding_index_catches_cross_batch_duplicates(spark, tmp_path):
    """Driving the factored batch body directly (deterministic
    batching): batch N+1 duplicates of batch-N kept docs must be
    caught, and the full decision set must equal the sequential
    expanding-index simulation over the engine's own signatures."""
    sig_sets = _sig_sets(spark)
    batches = [_BATCH1, _BATCH2, _BATCH3]
    idx = _write_index(spark, tmp_path, "idx")
    target = str(tmp_path / "keeps")
    fn = corpus_dedup_batch_fn(idx, target, grow_index=True)
    for i, batch in enumerate(batches):
        fn(spark.createDataFrame(batch, _SCHEMA), i)

    got = _sink_decisions(spark, target)
    assert got == _simulate(sig_sets, batches, grow=True)
    # the specific cross-batch catches, spelled out:
    assert got[10] == (1, 1, False)    # dup of corpus doc
    assert got[11] == (0, None, True)  # new, kept + appended
    assert got[20] == (1, 11, False)   # dup of batch-1 KEPT doc — caught
    assert got[30] == (1, 21, False)   # dup of batch-2 kept doc — caught
    assert got[31] == (0, None, True)  # too short to shingle: trivially kept

    # and the test discriminates: a STATIC index (r5 behavior) would
    # have let the cross-batch duplicates through
    static = _simulate(sig_sets, batches, grow=False)
    assert static[20] == (0, None, True) and static[30] == (0, None, True)


def test_expanding_index_replay_is_idempotent(spark, tmp_path):
    """Re-delivering every batch (crash-replay of the whole stream)
    must change neither the sink decisions nor the on-disk index."""
    idx = _write_index(spark, tmp_path, "idx")
    target = str(tmp_path / "keeps")
    fn = corpus_dedup_batch_fn(idx, target, grow_index=True)
    batches = [_BATCH1, _BATCH2, _BATCH3]
    for i, batch in enumerate(batches):
        fn(spark.createDataFrame(batch, _SCHEMA), i)
    first = _sink_decisions(spark, target)
    index_rows = {
        (r["doc_id"], r["band"], r["sig"])
        for r in spark.read.parquet(idx).collect()
    }
    for i, batch in enumerate(batches):  # full replay
        fn(spark.createDataFrame(batch, _SCHEMA), 100 + i)
    assert _sink_decisions(spark, target) == first
    assert {
        (r["doc_id"], r["band"], r["sig"])
        for r in spark.read.parquet(idx).collect()
    } == index_rows
    # grown index contains exactly corpus + kept docs' signatures
    assert {d for d, _, _ in index_rows} == {1, 2, 3, 11, 21}


def test_streaming_multi_batch_grows_index(spark, tmp_path):
    """True readStream drive with THREE deterministic micro-batches
    (one file each, maxFilesPerTrigger=1, mtime-ordered): the
    checkpointed stream must produce the same expanding-index
    decisions as the direct-drive loop."""
    import pandas as pd

    sig_sets = _sig_sets(spark)
    watch = tmp_path / "crawl"
    watch.mkdir()
    now = time.time() - 300
    for i, batch in enumerate([_BATCH1, _BATCH2, _BATCH3]):
        p = str(watch / f"batch{i}.parquet")
        pd.DataFrame(batch, columns=["doc_id", "text"]).to_parquet(p)
        os.utime(p, (now + 60 * i, now + 60 * i))

    idx = _write_index(spark, tmp_path, "idx")
    target = str(tmp_path / "keeps")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(watch))
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(corpus_dedup_batch_fn(idx, target, grow_index=True))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(180)
    if not finished:
        q.stop()
    assert finished, "multi-batch dedup stream did not finish within 180s"

    got = _sink_decisions(spark, target)
    assert got == _simulate(sig_sets, [_BATCH1, _BATCH2, _BATCH3], grow=True)
    assert got[20] == (1, 11, False)  # cross-batch dup caught in-stream


def test_compact_lsh_index_defragments_without_changing_probes(spark, tmp_path):
    """After several appends each band holds multiple small files;
    compaction must shrink to one file per band and leave probe
    decisions row-identical."""
    from pyspark.sql import functions as FF

    from etl_stocks_with_sentiment_analysis_spark.llmdata.dedup import (
        compact_lsh_index,
    )

    idx = _write_index(spark, tmp_path, "idx")
    for batch in [_BATCH1, _BATCH2]:
        append_lsh_index(spark, idx, spark.createDataFrame(batch, _SCHEMA))

    def files_per_band():
        return {
            r["band"]: r["n"]
            for r in spark.read.parquet(idx)
            .select("band", FF.input_file_name().alias("f"))
            .groupBy("band")
            .agg(FF.countDistinct("f").alias("n"))
            .collect()
        }

    probe_df = spark.createDataFrame(_BATCH3, _SCHEMA)
    before_probe = {
        tuple(r) for r in probe_lsh_index(spark, idx, probe_df).collect()
    }
    before_rows = {
        (r["doc_id"], r["band"], r["sig"])
        for r in spark.read.parquet(idx).collect()
    }
    assert max(files_per_band().values()) > 1  # fragmented by the appends

    n_files = compact_lsh_index(spark, idx)
    after_fpb = files_per_band()
    assert max(after_fpb.values()) == 1
    assert n_files == len(after_fpb)
    assert {
        (r["doc_id"], r["band"], r["sig"])
        for r in spark.read.parquet(idx).collect()
    } == before_rows
    assert {
        tuple(r) for r in probe_lsh_index(spark, idx, probe_df).collect()
    } == before_probe


def test_stream_documents_reads_directory_style_tables(spark, tmp_path):
    """r5 advice: against a Spark-written directory-style
    documents.parquet the stream must discover the part files (the
    leaf-name glob used to resolve zero files and silently produce an
    empty sink)."""
    from etl_stocks_with_sentiment_analysis_spark.streaming.ingest import (
        stream_documents,
    )

    sf = tmp_path / "sf"
    sf.mkdir()
    docs = spark.createDataFrame(_CORPUS, _SCHEMA)
    docs.write.parquet(str(sf / "documents.parquet"))  # directory layout

    q = (
        stream_documents(spark, str(sf))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_r6_dirdocs")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish"
    got = {
        (r["doc_id"], r["text"])
        for r in spark.sql("SELECT * FROM t_r6_dirdocs").collect()
    }
    assert got == set(_CORPUS)


def test_dedup_index_append_key_registered(spark, sf_dir):
    """The registered key runs end-to-end at test SF and every batch
    doc got a decision before the append (sanity beyond the oracle)."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata.dedup import (
        dedup_index_append,
    )
    from etl_stocks_with_sentiment_analysis_spark.sources import load_table

    rows = dedup_index_append(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_rows"] >= r["n_sigs"] > 0
        assert r["n_rows"] >= r["n_docs"] > 0
    # the grown index holds at least the corpus split's shingled docs
    docs = load_table(spark, sf_dir, "documents")
    shingled_index_docs = docs.filter(
        (F.col("doc_id") % 10 != 0)
        & (F.size(F.split("text", " ")) >= 3)
    ).count()
    assert max(r["n_docs"] for r in rows) >= min(shingled_index_docs, 1)
