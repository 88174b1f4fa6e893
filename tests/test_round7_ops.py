"""Round-7 manifest hardening: Hadoop-FS routing (file:/// URI
targets), type evolution (widening accepted since r8), GC safety under in-flight and
unreadable-retained states, compaction liveness under contention."""

import json
import os
import threading
import time

import pytest

from etl_stocks_with_sentiment_analysis_spark.operators import fsio, sinks


@pytest.fixture()
def rows(spark):
    return spark.createDataFrame(
        [(1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (2, "2024-01-01", "c")],
        "ticker INT, date STRING, val STRING",
    )


def _mread(spark, target):
    return {
        (r["ticker"], r["date"], r["val"])
        for r in sinks.read_manifest_table(spark, target).collect()
    }


# --- Hadoop-FS routing: file:/// URI targets end-to-end ----------------


def test_manifest_lifecycle_with_file_uri_target(spark, rows, tmp_path):
    """The whole manifest protocol — first commit, conflicting upsert,
    time travel, compaction, read-back — against a `file:///` URI
    target, exercising the Hadoop FileSystem facade for every
    metadata operation (listing, read, CAS publish, GC, markers)."""
    target = (tmp_path / "uri_sink").as_uri()  # file:///...
    assert target.startswith("file:///")
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    clash = spark.createDataFrame(
        [(1, "2024-01-01", "NEW"), (3, "2024-01-03", "d")],
        "ticker INT, date STRING, val STRING",
    )
    sinks.upsert(
        spark, target, clash, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    assert _mread(spark, target) == {
        (1, "2024-01-01", "NEW"), (1, "2024-01-02", "b"),
        (2, "2024-01-01", "c"), (3, "2024-01-03", "d"),
    }
    # time travel within retention through the same URI
    v0 = {
        (r["ticker"], r["date"], r["val"])
        for r in sinks.read_manifest_table(spark, target, version=0).collect()
    }
    assert v0 == {
        (1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (2, "2024-01-01", "c"),
    }
    # compaction through the URI path too
    n_dirs = sinks.compact_manifest_table(spark, target, rows_per_file=1000)
    assert n_dirs == 3  # one entry per distinct date partition
    assert _mread(spark, target) == {
        (1, "2024-01-01", "NEW"), (1, "2024-01-02", "b"),
        (2, "2024-01-01", "c"), (3, "2024-01-03", "d"),
    }
    ver, man = sinks._latest_manifest(target)
    assert ver == 2 and man["partition_col"] == "date"


def test_manifest_concurrent_writers_on_file_uri(spark, tmp_path):
    """Version-CAS atomicity holds for file:/// URI targets: two
    threads, 3 commits each, all rows survive, versions contiguous."""
    target = (tmp_path / "uri_race").as_uri()
    errors: list[Exception] = []

    def writer(tag: str, n: int) -> None:
        try:
            for i in range(n):
                batch = spark.createDataFrame(
                    [(f"{tag}{i}", "2024-01-01", f"v-{tag}{i}")],
                    "ticker STRING, date STRING, val STRING",
                )
                sinks.upsert(
                    spark, target, batch, ["ticker", "date"],
                    commit_mode="manifest",
                )
        except Exception as e:  # noqa: BLE001 - surfaced via main thread
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=("a", 3)),
        threading.Thread(target=writer, args=("b", 3)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    out = {r["ticker"] for r in sinks.read_manifest_table(spark, target).collect()}
    assert out == {f"{t}{i}" for t in "ab" for i in range(3)}
    ver, _ = sinks._latest_manifest(target)
    assert ver == 5  # 6 commits -> versions 0..5


def test_fsio_primitives_roundtrip(spark, tmp_path):
    """The facade's own contract: text roundtrip, CAS conflict,
    listing with types/mtimes, delete, missing-path behaviors."""
    base = str(tmp_path / "fsio")
    fsio.mkdirs(base)
    p = fsio.join(base, "x.json")
    fsio.write_text(p, '{"k": 1}')
    assert fsio.read_text(p) == '{"k": 1}'
    fsio.write_text(p, '{"k": 2}')  # overwrite allowed
    assert json.loads(fsio.read_text(p))["k"] == 2
    with pytest.raises(FileExistsError):
        fsio.create_text_if_absent(p, "nope")
    assert json.loads(fsio.read_text(p))["k"] == 2  # loser changed nothing
    fsio.mkdirs(fsio.join(base, "sub"))
    names = {(fi.name, fi.is_dir) for fi in fsio.list_status(base)}
    assert ("x.json", False) in names and ("sub", True) in names
    assert all(fi.mtime > 0 for fi in fsio.list_status(base))
    with pytest.raises(FileNotFoundError):
        fsio.read_text(fsio.join(base, "absent.json"))
    assert fsio.list_status(fsio.join(base, "nodir")) == []
    assert fsio.delete(p) is True
    assert not fsio.exists(p)
    # same contract through a file:// URI
    up = (tmp_path / "fsio" / "u.json").as_uri()
    fsio.create_text_if_absent(up, "via-uri")
    assert fsio.read_text(up) == "via-uri"
    with pytest.raises(FileExistsError):
        fsio.create_text_if_absent(up, "again")


# --- type-evolution commit guard (r6 advice; r8 allows safe widening) --


def test_manifest_rejects_type_change_at_commit(spark, rows, tmp_path):
    """A NON-WIDENING type change must be REJECTED at commit time:
    accepting e.g. int->string would record a type older snapshots'
    files can't serve. (r8 narrows this guard: the strictly-widening
    numeric moves int->bigint / float->double are now ACCEPTED and
    served by at-write-type cast-projection — tests/test_round8_ops.py
    covers that path; everything else still rejects.)"""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    changed = spark.createDataFrame(
        [(9, "2024-01-09", 7.5)], "ticker INT, date STRING, val DOUBLE"
    )
    with pytest.raises(ValueError, match="widenings"):
        sinks.upsert(
            spark, target, changed, ["ticker", "date"], commit_mode="manifest"
        )
    # the reject left the table fully readable and unchanged
    assert _mread(spark, target) == {
        (1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (2, "2024-01-01", "c"),
    }
    ver, _ = sinks._latest_manifest(target)
    assert ver == 0
    # r8: the previously-rejected int->bigint widening now COMMITS and
    # the carried-forward narrow files read back exactly
    widened = spark.createDataFrame(
        [(9, "2024-01-09", "z")], "ticker BIGINT, date STRING, val STRING"
    )
    sinks.upsert(
        spark, target, widened, ["ticker", "date"], commit_mode="manifest"
    )
    out = sinks.read_manifest_table(spark, target)
    assert dict(out.dtypes)["ticker"] == "bigint"
    assert _mread(spark, target) == {
        (1, "2024-01-01", "a"), (1, "2024-01-02", "b"),
        (2, "2024-01-01", "c"), (9, "2024-01-09", "z"),
    }


# --- GC safety: in-flight snapshots and unreadable retained manifests --


def test_gc_keeps_snapshot_with_fresh_child_mtime(spark, rows, tmp_path):
    """A concurrent writer's in-flight snapshot whose TOP-LEVEL dir
    mtime has aged past the grace window must survive the sweep as
    long as any direct child (partition dir, .inflight marker) is
    fresh — the r6 top-level-mtime rule would delete it and the
    concurrent writer would publish a manifest referencing deleted
    files."""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    # simulate an in-flight concurrent snapshot: old dir mtime, fresh
    # marker inside (as the real writer maintains via fsio.write_text)
    snap = os.path.join(target, "snap-000000000099-deadbeef")
    os.makedirs(snap)
    with open(os.path.join(snap, ".inflight"), "w"):
        pass
    old = time.time() - 10 * 3600
    os.utime(snap, (old, old))  # dir itself looks ancient
    _, man = sinks._latest_manifest(target)
    sinks._gc_superseded(target, man)
    assert os.path.isdir(snap), "sweep deleted an in-flight snapshot"
    # once the children age out too, the sweep reclaims it
    os.utime(os.path.join(snap, ".inflight"), (old, old))
    os.utime(snap, (old, old))
    sinks._gc_superseded(target, man)
    assert not os.path.isdir(snap)


def test_gc_aborts_snapshot_sweep_on_unreadable_retained_manifest(
    spark, rows, tmp_path, monkeypatch
):
    """If a RETAINED manifest fails to parse, the sweep cannot prove
    which snapshots are still referenced — it must skip snapshot
    reclamation entirely for this commit rather than treat the
    manifest as referencing nothing."""
    monkeypatch.setattr(sinks, "_GC_GRACE_SECONDS", 0.0)
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    snaps_before = {e for e in os.listdir(target) if e.startswith("snap-")}
    assert len(snaps_before) == 2
    # corrupt the RETAINED version-0 manifest, then age both snapshots
    with open(os.path.join(target, "_manifest_log", "manifest-000000000000.json"), "w") as f:
        f.write("{ not json")
    old = time.time() - 10 * 3600
    for e in snaps_before:
        os.utime(os.path.join(target, e), (old, old))
        for c in os.listdir(os.path.join(target, e)):
            os.utime(os.path.join(target, e, c), (old, old))
    _, man = sinks._latest_manifest(target)
    sinks._gc_superseded(target, man)
    snaps_after = {e for e in os.listdir(target) if e.startswith("snap-")}
    assert snaps_after == snaps_before, (
        "sweep reclaimed snapshots while a retained manifest was unreadable"
    )


# --- compaction liveness under concurrent writers ----------------------


def test_compaction_lands_despite_concurrent_upserts(spark, tmp_path):
    """Interleaved upserts race a compaction; the compaction retries
    with a FRESH manifest read per attempt and eventually lands with
    every committed row intact (a stale-read retry would drop the
    interleaved rows — this asserts it doesn't)."""
    target = str(tmp_path / "sink")
    first = spark.createDataFrame(
        [(f"s{i}", "2024-01-01", f"v{i}") for i in range(4)],
        "ticker STRING, date STRING, val STRING",
    )
    sinks.upsert(spark, target, first, ["ticker", "date"], commit_mode="manifest")

    errors: list[Exception] = []
    compacted = {}

    def upserter() -> None:
        try:
            for i in range(3):
                batch = spark.createDataFrame(
                    [(f"u{i}", "2024-01-01", f"uv{i}")],
                    "ticker STRING, date STRING, val STRING",
                )
                sinks.upsert(
                    spark, target, batch, ["ticker", "date"],
                    commit_mode="manifest",
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def compactor() -> None:
        try:
            compacted["n"] = sinks.compact_manifest_table(
                spark, target, rows_per_file=1000
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=upserter), threading.Thread(target=compactor)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert compacted.get("n", 0) >= 1  # the compaction landed
    out = {r["ticker"] for r in sinks.read_manifest_table(spark, target).collect()}
    # every upsert that committed BEFORE or DURING the compaction must
    # survive it; the ones after land on top — all 7 keys present
    assert out == {f"s{i}" for i in range(4)} | {f"u{i}" for i in range(3)}


# --- field-id schema evolution: add / rename / drop matrix -------------


def test_manifest_rename_column_keeps_history_attached(spark, rows, tmp_path):
    """RENAME via permanent field id: rows committed under the old
    name must come back under the new name (not null-filled, the r6
    orphaning hazard), stats follow, and time travel still shows the
    old name at old versions."""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    sinks.rename_manifest_column(target, "val", "label")
    out = sinks.read_manifest_table(spark, target)
    assert out.columns == ["ticker", "date", "label"]
    got = {(r["ticker"], r["date"], r["label"]) for r in out.collect()}
    assert got == {
        (1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (2, "2024-01-01", "c"),
    }, "renamed column lost its historical data"
    # stats followed the rename (pruning still works on the new name)
    _, man = sinks._latest_manifest(target)
    assert all("label" in s and "val" not in s for s in man["stats"].values())
    # time travel: version 0 still reads under its as-committed name
    v0 = sinks.read_manifest_table(spark, target, version=0)
    assert v0.columns == ["ticker", "date", "val"]
    # upserting under the NEW name merges into the same column
    more = spark.createDataFrame(
        [(3, "2024-01-03", "d")], "ticker INT, date STRING, label STRING"
    )
    sinks.upsert(spark, target, more, ["ticker", "date"], commit_mode="manifest")
    got = {
        (r["ticker"], r["date"], r["label"])
        for r in sinks.read_manifest_table(spark, target).collect()
    }
    assert (3, "2024-01-03", "d") in got and (1, "2024-01-01", "a") in got


def test_manifest_drop_then_readd_does_not_resurrect(spark, rows, tmp_path):
    """DROP removes the field id from the current schema; re-ADDING
    the same name gets a FRESH id, so the dropped values must NOT
    resurrect under the new column — old rows read NULL there."""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    sinks.drop_manifest_column(target, "val")
    out = sinks.read_manifest_table(spark, target)
    assert out.columns == ["ticker", "date"]
    assert out.count() == 3
    # re-add "val" via an upsert that carries it
    readd = spark.createDataFrame(
        [(9, "2024-01-09", "fresh")], "ticker INT, date STRING, val STRING"
    )
    sinks.upsert(spark, target, readd, ["ticker", "date"], commit_mode="manifest")
    got = {
        (r["ticker"], r["date"], r["val"])
        for r in sinks.read_manifest_table(spark, target).collect()
    }
    assert (9, "2024-01-09", "fresh") in got
    # THE assertion: pre-drop rows must be NULL, not their old values
    assert (1, "2024-01-01", None) in got and (1, "2024-01-01", "a") not in got
    # time travel inside retention still shows the dropped column
    v0 = sinks.read_manifest_table(spark, target, version=0)
    assert "val" in v0.columns


def test_manifest_rename_guards(spark, rows, tmp_path):
    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    with pytest.raises(ValueError, match="partition"):
        sinks.rename_manifest_column(target, "date", "day")
    with pytest.raises(ValueError, match="already exists"):
        sinks.rename_manifest_column(target, "val", "ticker")
    with pytest.raises(ValueError, match="no column"):
        sinks.rename_manifest_column(target, "ghost", "x")
    with pytest.raises(ValueError, match="partition"):
        sinks.drop_manifest_column(target, "date")


def test_manifest_legacy_format_reads_and_upgrades(spark, rows, tmp_path):
    """A pre-field-id manifest (r6 format) still reads name-based;
    rename is refused until compaction rewrites every snapshot under
    a recorded id map, after which rename works."""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    # strip the r7 metadata to simulate an r6-written table
    mpath = os.path.join(target, "_manifest_log", "manifest-000000000000.json")
    man = json.loads(open(mpath).read())
    for k in ("field_ids", "next_field_id", "snap_columns"):
        man.pop(k, None)
    os.remove(mpath)
    with open(mpath, "w") as f:
        json.dump(man, f)
    assert {
        (r["ticker"], r["date"], r["val"])
        for r in sinks.read_manifest_table(spark, target).collect()
    } == {(1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (2, "2024-01-01", "c")}
    with pytest.raises(ValueError, match="compact_manifest_table"):
        sinks.rename_manifest_column(target, "val", "label")
    sinks.compact_manifest_table(spark, target, rows_per_file=1000)
    sinks.rename_manifest_column(target, "val", "label")
    out = sinks.read_manifest_table(spark, target)
    assert out.columns == ["ticker", "date", "label"]
    assert out.filter(out.label.isNotNull()).count() == 3


# --- IVF coarse multi-probe (r7): candidate pool monotonicity ----------


def test_ivf_coarse_probe_monotone_improves_topk(spark):
    """coarse_probe=c pools fine candidates under the query's top-c
    coarse cells — a SUPERSET of the c=1 pool — so with exact re-rank
    every query's rank-i cosine must be >= the c=1 run's rank-i cosine
    (and the default c=1 path is the registered key's oracle-verified
    one)."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata.similarity import (
        ivf_topk,
    )

    sf = "/root/testdata/sf0.001"

    def ranked(cp):
        out = {}
        rows = ivf_topk(spark, sf, nprobe=2, k=3, coarse_probe=cp).collect()
        for r in sorted(rows, key=lambda r: (r["q_id"], -r["cosine"], r["vec_id"])):
            out.setdefault(r["q_id"], []).append(r["cosine"])
        return out

    base, wider = ranked(1), ranked(2)
    assert set(wider) == set(base)  # same query set
    for qid, scores in base.items():
        w = wider[qid]
        assert len(w) >= len(scores)
        for i, s in enumerate(scores):
            assert w[i] >= s - 1e-9, (
                f"q {qid} rank {i}: coarse_probe=2 cosine {w[i]} < "
                f"coarse_probe=1 {s}"
            )


# --- streaming -> manifest sink: multi-batch versions + replay ---------


def test_streaming_manifest_sink_multibatch_and_replay(spark, tmp_path):
    """Each micro-batch of the streaming daily-bars upsert must land
    as its OWN manifest version (version-CAS per batch), the final
    read-back must equal the batch aggregate, time travel must show
    the cumulative growth, and a full REPLAY from a fresh checkpoint
    must converge to the identical table (idempotent-by-key merge)."""
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.sources import load_table
    from etl_stocks_with_sentiment_analysis_spark.streaming import ingest

    # source: one calendar day of events (so the 1-day watermark can
    # never drop rows regardless of file arrival order), split into 3
    # files -> 3 micro-batches under maxFilesPerTrigger=1
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    day0 = ev.select(F.min(F.to_date("ts")).alias("d")).first()["d"]
    one_day = ev.filter(F.to_date("ts") == F.lit(day0)).persist()
    n = one_day.count()
    assert n > 30
    src = tmp_path / "src"
    (tmp_path / "src").mkdir()
    third = n // 3
    numbered = one_day.withColumn(
        "rn",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.orderBy("event_id")
        ),
    )
    for i in range(3):
        lo, hi = i * third, (i + 1) * third if i < 2 else n
        (
            numbered.filter((F.col("rn") > lo) & (F.col("rn") <= hi))
            .drop("rn")
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src / "events.parquet"))
        )
    one_day.unpersist()

    target = str(tmp_path / "daily_manifest")
    q = ingest.run_incremental_upsert(
        spark, str(src), target, query_name="t_mbatch",
        commit_mode="manifest", maxFilesPerTrigger=1,
    )
    q.awaitTermination()

    from etl_stocks_with_sentiment_analysis_spark.operators import sinks

    ver, man = sinks._latest_manifest(target)
    # 3 file-batches plus (on some trigger schedules) a final
    # watermark-flush batch — at least one version per file batch
    assert ver >= 2, f"expected >=3 manifest versions (one per micro-batch), got {ver + 1}"

    # final == batch aggregate over the same source rows
    expect = {
        (r["day"], r["event_type"], r["n_events"], r["total_value"])
        for r in ingest._daily_agg(
            ingest.normalize_event_ts(spark.read.parquet(str(src / "events.parquet")))
        ).collect()
    }
    def table():
        return {
            (r["day"], r["event_type"], r["n_events"], r["total_value"])
            for r in sinks.read_manifest_table(spark, target)
            .select("day", "event_type", "n_events", "total_value")
            .collect()
        }
    assert table() == expect

    # time travel: the OLDEST RETAINED version (K=3 keeps the last
    # three; earlier ones age out — itself part of what's under test)
    # holds strictly fewer events than the final table
    oldest = max(0, ver - 2)
    vold = sinks.read_manifest_table(spark, target, version=oldest)
    assert (
        vold.agg(F.sum("n_events")).first()[0]
        < sum(r[2] for r in expect)
    )

    # replay from a fresh checkpoint converges (foreachBatch upsert is
    # idempotent by (day, event_type)); versions keep advancing
    q2 = ingest.run_incremental_upsert(
        spark, str(src), target, query_name="t_mbatch2",
        commit_mode="manifest", maxFilesPerTrigger=1,
    )
    q2.awaitTermination()
    assert table() == expect
    ver2, _ = sinks._latest_manifest(target)
    assert ver2 == 2 * ver + 1  # replay committed the same batch count


# --- row-level DELETE + change feed ------------------------------------


def test_manifest_delete_scopes_and_drops_empty_partitions(spark, tmp_path):
    """DELETE rewrites only partitions containing matching rows
    (untouched entries keep their exact prior snapshot reference);
    a fully-deleted partition drops out of the partition map; NULL
    predicate rows are KEPT (SQL DELETE semantics)."""
    from pyspark.sql import functions as F

    target = str(tmp_path / "sink")
    rows = spark.createDataFrame(
        [
            (1, "2024-01-01", "a"),
            (2, "2024-01-01", "b"),
            (3, "2024-01-02", "c"),
            (4, "2024-01-03", None),  # NULL val -> predicate NULL -> kept
        ],
        "ticker INT, date STRING, val STRING",
    )
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    _, man0 = sinks._latest_manifest(target)

    # delete day-2 entirely plus one day-1 row; day-3's predicate is
    # NULL for its row (val IS NULL) so it must be kept untouched
    n = sinks.delete_from_manifest_table(
        spark, target, "date = '2024-01-02' OR val = 'b'"
    )
    assert n == 2
    _, man1 = sinks._latest_manifest(target)
    assert "date=2024-01-02" not in man1["partitions"], "emptied partition kept"
    # untouched day-3 partition carries forward BY REFERENCE
    assert (
        man1["partitions"]["date=2024-01-03"]
        == man0["partitions"]["date=2024-01-03"]
    )
    # day-1 was rewritten into the new snapshot
    assert (
        man1["partitions"]["date=2024-01-01"]
        != man0["partitions"]["date=2024-01-01"]
    )
    got = {
        (r["ticker"], r["date"], r["val"])
        for r in sinks.read_manifest_table(spark, target).collect()
    }
    assert got == {(1, "2024-01-01", "a"), (4, "2024-01-03", None)}
    # no-match delete is a no-op commit-wise
    ver_before, _ = sinks._latest_manifest(target)
    assert sinks.delete_from_manifest_table(spark, target, "ticker = 99") == 0
    ver_after, _ = sinks._latest_manifest(target)
    assert ver_after == ver_before
    # time travel still shows the pre-delete table
    v0 = sinks.read_manifest_table(spark, target, version=0)
    assert v0.count() == 4


def test_manifest_changes_schema_mismatch_raises(spark, rows, tmp_path):
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    sinks.rename_manifest_column(target, "val", "label")
    with pytest.raises(ValueError, match="different recorded schemas"):
        sinks.manifest_table_changes(spark, target, 0, 1)


def test_manifest_delete_with_stats_bounds(spark, tmp_path):
    """bounds-pruned DELETE: a disjoint bounds hint proves no entry
    can match and commits nothing; a consistent hint deletes exactly
    what the unbounded predicate would."""
    target = str(tmp_path / "sink")
    rows = spark.createDataFrame(
        [(i, "2024-01-0%d" % (1 + i % 3), float(i)) for i in range(30)],
        "ticker INT, date STRING, v DOUBLE",
    )
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    ver0, _ = sinks._latest_manifest(target)
    # disjoint bounds: v only spans [0, 29]
    assert (
        sinks.delete_from_manifest_table(
            spark, target, "v >= 100.0", bounds={"v": (100.0, None)}
        )
        == 0
    )
    ver1, _ = sinks._latest_manifest(target)
    assert ver1 == ver0  # nothing committed
    # consistent bounds delete == plain predicate delete
    n = sinks.delete_from_manifest_table(
        spark, target, "v >= 25.0", bounds={"v": (25.0, None)}
    )
    assert n == 5
    left = sinks.read_manifest_table(spark, target)
    assert left.count() == 25 and left.agg({"v": "max"}).first()[0] == 24.0


# --- incremental view maintenance + online repartition ------------------


def _ev8(spark):
    """16 rows across 4 partitions (p = id % 4), two groups (g)."""
    return spark.createDataFrame(
        [(i, i % 4, "a" if i < 10 else "b", float(i)) for i in range(16)],
        "id INT, p INT, g STRING, v DOUBLE",
    )


def test_ivm_matches_recompute_and_drops_empty_groups(spark, tmp_path):
    """Maintained view == full recompute across an upsert that moves
    rows between groups and a delete that EMPTIES one group — the
    emptied group must vanish from the maintained view exactly as it
    does from the recompute."""
    target = str(tmp_path / "ivm")
    df = _ev8(spark)
    sinks.upsert(spark, target, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    from pyspark.sql import functions as F

    # move ids 12..15 from group b to group c (b keeps 10, 11)
    moved = df.filter("id >= 12").withColumn("g", F.lit("c"))
    sinks.upsert(spark, target, moved, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    # empty group b entirely
    sinks.delete_from_manifest_table(spark, target, "g = 'b'")
    gcols, measures = ["g"], {"v_sum": "CAST(v AS BIGINT)"}
    view = sinks.materialize_manifest_aggregate(
        spark, target, gcols, measures, version=0)
    for a, b in [(0, 1), (1, 2)]:
        view = sinks.maintain_manifest_aggregate(
            spark, target, view, gcols, measures, a, b)
    got = {(r["g"], r["v_sum"], r["n_rows"]) for r in view.collect()}
    full = sinks.materialize_manifest_aggregate(spark, target, gcols, measures)
    want = {(r["g"], r["v_sum"], r["n_rows"]) for r in full.collect()}
    assert got == want
    assert "b" not in {g for g, _, _ in got}  # emptied group dropped


def test_ivm_rejects_wrong_view_shape(spark, tmp_path):
    target = str(tmp_path / "ivm_shape")
    sinks.upsert(spark, target, _ev8(spark), ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    bad = _ev8(spark).select("g", "v")  # not a maintained view
    with pytest.raises(ValueError, match="maintained shape"):
        sinks.maintain_manifest_aggregate(
            spark, target, bad, ["g"], {"v_sum": "CAST(v AS BIGINT)"}, 0, 0)


def test_change_feed_is_partition_scoped_but_exact(spark, tmp_path):
    """An upsert touching ONE of four partitions: the feed must list
    exactly that partition's changed rows — identical to the full
    image diff — while reading only changed entries (asserted via the
    manifest references: untouched entries carry forward unchanged)."""
    target = str(tmp_path / "scoped")
    df = _ev8(spark)
    sinks.upsert(spark, target, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    from pyspark.sql import functions as F

    one = df.filter("id = 5").withColumn("v", F.lit(99.0))
    sinks.upsert(spark, target, one, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    # structural: 3 of 4 entries carried forward by reference
    from etl_stocks_with_sentiment_analysis_spark.operators.sinks import (
        _manifest_at_version,
    )
    m0, m1 = _manifest_at_version(target, 0), _manifest_at_version(target, 1)
    same = [k for k in m0["partitions"]
            if m1["partitions"].get(k) == m0["partitions"][k]]
    assert len(same) == 3
    feed = sinks.manifest_table_changes(spark, target, 0, 1)
    got = {(r["id"], r["v"], r["change"]) for r in feed.collect()}
    assert got == {(5, 5.0, "delete"), (5, 99.0, "insert")}


def test_repartition_manifest_table_roundtrip(spark, tmp_path):
    """Re-layout preserves rows exactly, records the new partition
    column, keeps the OLD version readable under its old layout, and
    subsequent upserts must use the new column."""
    target = str(tmp_path / "repart")
    df = _ev8(spark)
    sinks.upsert(spark, target, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    n = sinks.repartition_manifest_table(spark, target, "g")
    assert n == 2  # two g-values -> two entries
    now = {(r["id"], r["p"], r["g"], r["v"])
           for r in sinks.read_manifest_table(spark, target).collect()}
    before = {(r["id"], r["p"], r["g"], r["v"])
              for r in sinks.read_manifest_table(spark, target, version=0).collect()}
    want = {(i, i % 4, "a" if i < 10 else "b", float(i)) for i in range(16)}
    assert now == want and before == want
    # upsert under the OLD column now raises; under the NEW one lands
    from pyspark.sql import functions as F

    inc = df.filter("id = 0").withColumn("v", F.lit(42.0))
    with pytest.raises(ValueError, match="partition_col"):
        sinks.upsert(spark, target, inc, ["id", "p"], partition_col="p",
                     commit_mode="manifest")
    sinks.upsert(spark, target, inc, ["id", "g"], partition_col="g",
                 commit_mode="manifest")
    got = {r["v"] for r in sinks.read_manifest_table(spark, target)
           .filter("id = 0").collect()}
    assert got == {42.0}


def test_repartition_to_unpartitioned_and_missing_column(spark, tmp_path):
    target = str(tmp_path / "repart_none")
    sinks.upsert(spark, target, _ev8(spark), ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    with pytest.raises(ValueError, match="not a table column"):
        sinks.repartition_manifest_table(spark, target, "nope")
    n = sinks.repartition_manifest_table(spark, target, None)
    assert n == 1  # single __ALL__ entry
    assert sinks.read_manifest_table(spark, target).count() == 16


# --- metadata row counts + persisted view maintenance -------------------


def test_metadata_counts_track_commits(spark, tmp_path):
    """entry_rows must stay exact through upsert (partial), delete
    (rewritten entries recounted), and compaction; unpartitioned
    tables report one __ALL__ count; manifests predating the field
    raise instead of guessing."""
    from pyspark.sql import functions as F

    target = str(tmp_path / "counts")
    df = _ev8(spark)
    sinks.upsert(spark, target, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    assert sinks.count_manifest_table(target) == 16
    stats = {r["p"]: r["n_rows"]
             for r in sinks.manifest_table_stats(spark, target).collect()}
    assert stats == {0: 4, 1: 4, 2: 4, 3: 4}
    # touch one partition only; others carry recorded counts forward
    one = df.filter("id = 1").withColumn("v", F.lit(50.0))
    sinks.upsert(spark, target, one, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    assert sinks.count_manifest_table(target) == 16
    sinks.delete_from_manifest_table(spark, target, "id IN (2, 6)")
    assert sinks.count_manifest_table(target) == 14
    sinks.compact_manifest_table(spark, target, rows_per_file=100)
    assert sinks.count_manifest_table(target) == 14
    # unpartitioned
    t2 = str(tmp_path / "counts_flat")
    sinks.upsert(spark, t2, df, ["id"], commit_mode="manifest")
    assert sinks.count_manifest_table(t2) == 16
    assert [r["n_rows"] for r in
            sinks.manifest_table_stats(spark, t2).collect()] == [16]
    # legacy manifest (no entry_rows) must raise, not guess
    import json as _json
    ver, man = sinks._latest_manifest(t2)
    man.pop("entry_rows")
    mpath = os.path.join(t2, "_manifest_log", f"manifest-{ver:012d}.json")
    with open(mpath, "w") as fh:
        _json.dump(man, fh)
    with pytest.raises(ValueError, match="predates entry row counts"):
        sinks.count_manifest_table(t2)


_VIEW_MEASURES = {"v_sum": "CAST(v AS BIGINT)"}


def _maintain(spark, target, vp):
    return sinks.maintain_view_artifact(
        spark, target, vp, ["g"], _VIEW_MEASURES)


def _view_rows(spark, vp):
    df, ver = sinks.read_view_artifact(spark, vp)
    return {(r["g"], r["v_sum"], r["n_rows"]) for r in df.collect()}, ver


def _recompute(spark, target):
    full = sinks.materialize_manifest_aggregate(
        spark, target, ["g"], _VIEW_MEASURES)
    return {(r["g"], r["v_sum"], r["n_rows"]) for r in full.collect()}


def test_view_artifact_catchup_and_crash(spark, tmp_path):
    """The artifact must catch up across MULTIPLE missed versions in
    one hop, and a crashed maintainer's incomplete dir (no _OK) must
    be invisible to readers and safely overwritten by the next run."""
    from pyspark.sql import functions as F

    target, vp = str(tmp_path / "t"), str(tmp_path / "view")
    df = _ev8(spark)
    sinks.upsert(spark, target, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    assert _maintain(spark, target, vp) == 0
    assert _maintain(spark, target, vp) == 0  # no-op when current
    # two commits with NO maintain between them
    sinks.upsert(spark, target,
                 df.filter("id >= 12").withColumn("g", F.lit("c")),
                 ["id", "p"], partition_col="p", commit_mode="manifest")
    sinks.delete_from_manifest_table(spark, target, "g = 'b'")
    # crash-sim: a dead maintainer left v2 without its _OK marker
    partial = os.path.join(vp, f"v{2:012d}")
    os.makedirs(partial)
    _, ver = _view_rows(spark, vp)
    assert ver == 0  # incomplete dir invisible
    assert _maintain(spark, target, vp) == 2  # one 2-hop catch-up
    got, ver = _view_rows(spark, vp)
    assert ver == 2
    assert got == _recompute(spark, target)
    assert "b" not in {g for g, _, _ in got}


def test_view_artifact_falls_back_past_retention(spark, tmp_path):
    """A view whose base version aged out of the manifest retention
    window must rebuild via full materialization, not fail."""
    from pyspark.sql import functions as F

    target, vp = str(tmp_path / "t"), str(tmp_path / "view")
    df = _ev8(spark)
    sinks.upsert(spark, target, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    _maintain(spark, target, vp)
    for k in range(4):  # v1..v4 -> v0's manifest is reclaimed (K=3)
        inc = df.filter("id = 0").withColumn("v", F.lit(float(100 + k)))
        sinks.upsert(spark, target, inc, ["id", "p"], partition_col="p",
                     commit_mode="manifest")
    assert _maintain(spark, target, vp) == 4
    got, _ = _view_rows(spark, vp)
    assert got == _recompute(spark, target)


def test_streaming_view_maintenance_multibatch(spark, tmp_path):
    """3 micro-batches (maxFilesPerTrigger=1) each commit a table
    version AND advance the artifact; the final view must equal the
    batch aggregate of everything streamed."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_stocks_with_sentiment_analysis_spark.sources import load_table
    from etl_stocks_with_sentiment_analysis_spark.streaming import ingest

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    sl = ev.filter(F.col("event_id") % 10 == 0).persist()
    n = sl.count()
    assert n > 20
    src = tmp_path / "src"
    src.mkdir()
    third = n // 3
    numbered = sl.withColumn("rn", F.row_number().over(Window.orderBy("event_id")))
    for i in range(3):
        lo, hi = i * third, (i + 1) * third if i < 2 else n
        (numbered.filter((F.col("rn") > lo) & (F.col("rn") <= hi)).drop("rn")
         .coalesce(1).write.mode("append").parquet(str(src / "events.parquet")))
    sl.unpersist()

    target = str(tmp_path / "table")
    vp = str(tmp_path / "view")
    q = ingest.run_streaming_view_maintenance(
        spark, str(src), target, vp,
        query_name="t_view_maint", maxFilesPerTrigger=1,
    )
    q.awaitTermination()
    ver, _ = sinks._latest_manifest(target)
    assert ver >= 2  # one version per file-batch
    view, vver = sinks.read_view_artifact(spark, vp)
    assert vver == ver  # artifact is current
    got = {(r["event_type"], r["value_cents"], r["n_rows"])
           for r in view.collect()}
    want = {
        (r["event_type"], r["value_cents"], r["n_rows"])
        for r in sl.sparkSession.read.parquet(str(src / "events.parquet"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).alias("value_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        ).collect()
    }
    assert got == want


def test_partition_column_bounds_prune_from_the_map(spark, tmp_path):
    """A range bound on the PARTITION column must prune entries using
    the partition map alone (each entry's dir value is min=max), with
    results identical to the unpruned read; NULL-partition entries are
    skipped under a real bound (their rows can't satisfy it) but kept
    under (None, None)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    target = str(tmp_path / "pprune")
    df = spark.createDataFrame(
        [(i, (i % 4) if i % 5 else None, float(i)) for i in range(20)],
        "id INT, p INT, v DOUBLE",
    )
    sinks.upsert(spark, target, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    _, man = sinks._latest_manifest(target)
    schema = StructType.fromJson(json.loads(man["schema"]))
    keys = sorted(man["partitions"])
    assert len(keys) == 5  # 0..3 plus the NULL entry
    kept = sinks._prune_entry_keys(spark, man, schema, keys, {"p": (1, 2)})
    assert len(kept) == 2  # p=1, p=2 only: NULL and out-of-range pruned
    got = {(r["id"], r["p"]) for r in
           sinks.read_manifest_table(spark, target, bounds={"p": (1, 2)}).collect()}
    want = {(i, i % 4) for i in range(20) if i % 5 and i % 4 in (1, 2)}
    assert got == want
    # unbounded "bounds" must not prune the NULL entry
    kept_all = sinks._prune_entry_keys(
        spark, man, schema, keys, {"p": (None, None)})
    assert len(kept_all) == 5


# --- zero-copy clone ----------------------------------------------------


def test_clone_is_zero_copy_then_localizes(spark, tmp_path):
    """A shallow clone publishes ONE manifest and no data dirs; reads
    resolve into the source's snapshots; materializing localizes the
    data so the clone survives the source's GC; an unmaterialized
    clone breaks once the source reclaims the referenced snapshots
    (the documented shallow contract)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    df = _ev8(spark)
    sinks.upsert(spark, src, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    want = {(r["id"], r["p"], r["g"], r["v"]) for r in df.collect()}

    shallow = str(tmp_path / "shallow")
    sinks.clone_manifest_table(spark, src, shallow)
    # zero-copy: only the manifest log + checkpoint pointer exist at the clone
    names = {
        fi.name for fi in fsio.list_status(shallow)
        if not fi.name.startswith(".")  # Hadoop local-FS .crc sidecars
    }
    assert names == {"_manifest_log", "_last_checkpoint"}
    got = {(r["id"], r["p"], r["g"], r["v"])
           for r in sinks.read_manifest_table(spark, shallow).collect()}
    assert got == want
    assert sinks.count_manifest_table(shallow) == 16  # metadata cloned too

    deep = str(tmp_path / "deep")
    sinks.clone_manifest_table(spark, src, deep, materialize=True)
    _, man = sinks._latest_manifest(deep)
    assert man["external_bases"] == {}  # localized

    # cloning over an existing table refuses
    with pytest.raises(ValueError, match="already holds"):
        sinks.clone_manifest_table(spark, src, deep)

    # source evolves past retention; partial upserts alone would keep
    # the original snapshot alive through carried-forward entries in
    # retained manifests (that's the protocol working), so a full
    # rewrite (compaction) plus enough further commits pushes every
    # retained manifest past the original snapshot
    sinks.compact_manifest_table(spark, src, rows_per_file=100)
    for i in range(4):
        inc = df.filter("id = 0").withColumn("v", F.lit(float(i)))
        sinks.upsert(spark, src, inc, ["id", "p"], partition_col="p",
                     commit_mode="manifest")
    # grace window would keep fresh dirs; age them and sweep again
    import os as _os
    import time as _time
    old = _time.time() - 10 * 3600
    for fi in fsio.list_status(src):
        if fi.name.startswith("snap-"):
            d = _os.path.join(src, fi.name)
            for root, dirs, files in _os.walk(d):
                for x in dirs + files:
                    _os.utime(_os.path.join(root, x), (old, old))
            _os.utime(d, (old, old))
    _, cur = sinks._latest_manifest(src)
    sinks._gc_superseded(src, cur)

    # the materialized clone is immune
    got_deep = {(r["id"], r["p"], r["g"], r["v"])
                for r in sinks.read_manifest_table(spark, deep).collect()}
    assert got_deep == want
    # the shallow clone's referenced snapshot is gone -> read fails
    with pytest.raises(Exception):
        sinks.read_manifest_table(spark, shallow).collect()


def test_clone_upsert_writes_only_local_deltas(spark, tmp_path):
    """An upsert on a shallow clone lands its delta in the clone's own
    directory while untouched entries keep pointing at the source;
    a clone of the clone keeps the ORIGINAL base."""
    from pyspark.sql import functions as F

    src, c1, c2 = (str(tmp_path / n) for n in ("src", "c1", "c2"))
    df = _ev8(spark)
    sinks.upsert(spark, src, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    sinks.clone_manifest_table(spark, src, c1)
    one = df.filter("id = 5").withColumn("v", F.lit(99.0))
    sinks.upsert(spark, c1, one, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    _, man = sinks._latest_manifest(c1)
    ext = man["external_bases"]
    # 3 untouched entries external, 1 rewritten entry local
    refs = {k: rel.split("/", 1)[0] for k, rel in man["partitions"].items()}
    external = {k for k, s in refs.items() if s in ext}
    assert len(external) == 3 and len(refs) == 4
    got = {(r["id"], r["v"]) for r in
           sinks.read_manifest_table(spark, c1).collect()}
    assert (5, 99.0) in got and len(got) == 16
    # source unchanged
    src_rows = {(r["id"], r["v"]) for r in
                sinks.read_manifest_table(spark, src).collect()}
    assert (5, 5.0) in src_rows
    # clone-of-clone: external refs still point at the ORIGINAL source
    sinks.clone_manifest_table(spark, c1, c2)
    _, man2 = sinks._latest_manifest(c2)
    assert any(b.endswith("/src") for b in man2["external_bases"].values())
    assert any(b.endswith("/c1") for b in man2["external_bases"].values())
    got2 = {(r["id"], r["v"]) for r in
            sinks.read_manifest_table(spark, c2).collect()}
    assert got2 == got


def test_manifest_table_history(spark, tmp_path):
    """DESCRIBE HISTORY: one row per committed version with recorded
    layout/size facts; the log is append-only so history outlives the
    data-retention window; shallow clones surface their external
    snapshot count."""
    from pyspark.sql import functions as F

    target = str(tmp_path / "hist")
    df = _ev8(spark)
    sinks.upsert(spark, target, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    sinks.upsert(spark, target,
                 df.filter("id = 5").withColumn("v", F.lit(99.0)),
                 ["id", "p"], partition_col="p", commit_mode="manifest")
    sinks.delete_from_manifest_table(spark, target, "id IN (2, 6)")
    h = sinks.manifest_table_history(spark, target).collect()
    assert [(r["version"], r["n_entries"], r["n_rows"]) for r in h] == [
        (0, 4, 16), (1, 4, 16), (2, 4, 14),
    ]
    assert all(r["partition_col"] == "p" for r in h)
    assert h[1]["n_snapshots"] == 2  # v1 = new snap + 3 carried entries
    # two more commits -> v0/v1 data ages out (K=3) but the history
    # keeps every version (append-only manifest log)
    for i in range(2):
        sinks.upsert(spark, target,
                     df.filter("id = 0").withColumn("v", F.lit(float(i))),
                     ["id", "p"], partition_col="p", commit_mode="manifest")
    versions = [r["version"]
                for r in sinks.manifest_table_history(spark, target).collect()]
    assert versions == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError, match="retention"):
        sinks.read_manifest_table(spark, target, version=0)
    # a shallow clone's history shows its external references
    c = str(tmp_path / "c")
    sinks.clone_manifest_table(spark, target, c)
    hc = sinks.manifest_table_history(spark, c).collect()
    assert len(hc) == 1 and hc[0]["n_external_snapshots"] >= 1
    assert hc[0]["n_rows"] == 14


# --- Z-order compaction + per-file stats skipping ----------------------


def _zdf(spark, n=2000):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("x"),
            ((F.col("id") * 7919) % 101).cast("double").alias("y"),
        )
    )


def test_zorder_compaction_row_parity_and_file_stats(spark, tmp_path):
    """cluster_by rewrite changes ONLY the layout: rows identical,
    per-file stats recorded for every written file, entry count 1
    (unpartitioned)."""
    target = str(tmp_path / "zt")
    df = _zdf(spark)
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    before = {tuple(r) for r in sinks.read_manifest_table(spark, target).collect()}
    n = sinks.compact_manifest_table(
        spark, target, rows_per_file=200, cluster_by=["x", "y"]
    )
    assert n == 1  # one __ALL__ entry
    after = {tuple(r) for r in sinks.read_manifest_table(spark, target).collect()}
    assert after == before
    _, man = sinks._latest_manifest(target)
    fstats = man["file_stats"]["__ALL__"]
    assert len(fstats) >= 8  # ~2000/200 files
    assert sum(rec["rows"] for rec in fstats.values()) == 2000
    for rec in fstats.values():
        assert {"x", "y", "k"} <= set(rec["stats"])


def test_zorder_file_pruning_skips_on_both_dimensions(spark, tmp_path):
    """A bounds read on EITHER cluster column opens strictly fewer
    files than the layout holds, and results equal the plain filter."""
    from pyspark.sql.types import StructType

    target = str(tmp_path / "zt")
    df = _zdf(spark)
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    sinks.compact_manifest_table(
        spark, target, rows_per_file=200, cluster_by=["x", "y"]
    )
    _, man = sinks._latest_manifest(target)
    schema = StructType.fromJson(json.loads(man["schema"]))
    total = sum(len(v) for v in man["file_stats"].values())
    keys = sorted(man["partitions"])
    for col in ("x", "y"):
        bounds = {col: (10.0, 25.0)}
        sel = sinks._prune_entry_files(spark, man, schema, keys, bounds)
        kept = sum(len(v) for v in sel.values() if v is not None)
        assert kept < total, f"no file skipped on {col}"
        got = {
            tuple(r)
            for r in sinks.read_manifest_table(spark, target, bounds=bounds)
            .collect()
        }
        want = {
            tuple(r)
            for r in sinks.read_manifest_table(spark, target)
            .filter(f"{col} >= 10.0 and {col} <= 25.0")
            .collect()
        }
        assert got == want


def test_zorder_all_files_pruned_reads_empty(spark, tmp_path):
    """Bounds fully outside the data prune EVERY file of the single
    entry — the read plans zero scans and returns an empty frame with
    the recorded schema."""
    target = str(tmp_path / "zt")
    sinks.upsert(spark, target, _zdf(spark), ["k"], commit_mode="manifest")
    sinks.compact_manifest_table(
        spark, target, rows_per_file=500, cluster_by=["x", "y"]
    )
    out = sinks.read_manifest_table(
        spark, target, bounds={"x": (1000.0, 2000.0)}
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "x", "y"]


def test_zorder_rejects_partitioned_and_string_columns(spark, tmp_path):
    from pyspark.sql import functions as F

    target = str(tmp_path / "zp")
    df = _zdf(spark, 200).withColumn("p", (F.col("k") % 3).cast("int"))
    sinks.upsert(
        spark, target, df, ["k", "p"], partition_col="p",
        commit_mode="manifest",
    )
    with pytest.raises(ValueError, match="unpartitioned"):
        sinks.compact_manifest_table(
            spark, target, rows_per_file=100, cluster_by=["x"]
        )
    target2 = str(tmp_path / "zs")
    df2 = _zdf(spark, 200).withColumn("s", F.lit("abc"))
    sinks.upsert(spark, target2, df2, ["k"], commit_mode="manifest")
    with pytest.raises(ValueError, match="zorder"):
        sinks.compact_manifest_table(
            spark, target2, rows_per_file=100, cluster_by=["s"]
        )


def test_file_stats_carry_forward_on_partition_scoped_upsert(spark, tmp_path):
    """An upsert touching one partition keeps the other entries'
    per-file stats by reference (same carry-forward rule as entry
    stats) and records fresh file stats for the rewritten entry."""
    from pyspark.sql import functions as F

    target = str(tmp_path / "cf")
    df = _zdf(spark, 300).withColumn("p", (F.col("k") % 3).cast("int"))
    sinks.upsert(
        spark, target, df, ["k", "p"], partition_col="p",
        commit_mode="manifest",
    )
    _, man0 = sinks._latest_manifest(target)
    untouched = man0["file_stats"]["p=2"]
    delta = df.filter("p = 0").withColumn("x", F.col("x") + 1000.0)
    sinks.upsert(
        spark, target, delta, ["k", "p"], partition_col="p",
        commit_mode="manifest",
    )
    _, man1 = sinks._latest_manifest(target)
    assert man1["file_stats"]["p=2"] == untouched  # carried by reference
    new_p0 = man1["file_stats"]["p=0"]
    assert all(
        float(rec["stats"]["x"][0]) >= 1000.0 for rec in new_p0.values()
    )


def test_file_stats_cap_drops_not_stales(spark, tmp_path, monkeypatch):
    """Past the per-entry cap, file stats are OMITTED (entry-level
    skipping only) — and a rewrite of a previously-file-stated entry
    under the cap must DROP the old file list, never carry a stale
    one (those files are gone)."""
    target = str(tmp_path / "cap")
    df = _zdf(spark, 400)
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    _, man0 = sinks._latest_manifest(target)
    assert man0["file_stats"].get("__ALL__")  # under cap: recorded
    monkeypatch.setattr(sinks, "_FILE_STATS_MAX_PER_ENTRY", 0)
    sinks.upsert(
        spark, target, df.limit(10), ["k"], commit_mode="manifest"
    )
    _, man1 = sinks._latest_manifest(target)
    assert "__ALL__" not in man1["file_stats"]  # capped AND not stale
    # reads (with and without bounds) still correct via entry stats
    assert sinks.read_manifest_table(spark, target).count() == 400
    got = sinks.read_manifest_table(
        spark, target, bounds={"x": (10.0, 25.0)}
    ).count()
    want = sinks.read_manifest_table(spark, target).filter(
        "x >= 10.0 and x <= 25.0"
    ).count()
    assert got == want


# --- Point index (equality-probe file skipping) ------------------------


def test_point_index_prunes_and_is_exact(spark, tmp_path):
    """Equality probe on a unique id opens fewer files; results match
    the plain filter for present AND absent ids (absent → empty,
    usually zero files opened)."""
    target = str(tmp_path / "pi")
    df = _zdf(spark, 2000)
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    sinks.compact_manifest_table(
        spark, target, rows_per_file=200, point_index=["k"]
    )
    from pyspark.sql.types import StructType

    _, man = sinks._latest_manifest(target)
    schema = StructType.fromJson(json.loads(man["schema"]))
    keys = sorted(man["partitions"])
    total = sum(len(v) for v in man["file_point_index"].values())
    assert total >= 8
    sel = sinks._prune_point_files(
        spark, man, schema, keys, {"k": (1234, 1234)},
        {k: None for k in keys},
    )
    kept = sum(len(v) for v in sel.values() if v is not None)
    assert kept < total
    got = sinks.read_manifest_table(
        spark, target, bounds={"k": (1234, 1234)}
    ).collect()
    assert [(r["k"], r["x"], r["y"]) for r in got] == [
        (r["k"], r["x"], r["y"])
        for r in sinks.read_manifest_table(spark, target)
        .filter("k = 1234").collect()
    ]
    # absent id: provably-empty read
    assert sinks.read_manifest_table(
        spark, target, bounds={"k": (999_999, 999_999)}
    ).count() == 0


def test_point_index_dropped_on_rewrite_fresh_files_unindexed(
    spark, tmp_path
):
    """An upsert after indexing rewrites the entry: the stale index
    must NOT survive (its files are gone), and the probe falls back
    to reading normally with identical results."""
    target = str(tmp_path / "pi2")
    df = _zdf(spark, 500)
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    sinks.compact_manifest_table(
        spark, target, rows_per_file=100, point_index=["k"]
    )
    _, man0 = sinks._latest_manifest(target)
    assert man0["file_point_index"].get("__ALL__")
    from pyspark.sql import functions as F

    sinks.upsert(
        spark, target,
        df.limit(5).withColumn("x", F.lit(9999.0)),
        ["k"], commit_mode="manifest",
    )
    _, man1 = sinks._latest_manifest(target)
    assert "__ALL__" not in man1["file_point_index"]
    got = sinks.read_manifest_table(
        spark, target, bounds={"k": (3, 3)}
    ).collect()
    assert len(got) == 1 and got[0]["x"] == 9999.0


def test_point_index_composes_with_zorder_minmax(spark, tmp_path):
    """cluster_by + point_index in one rewrite: a query pinning the
    indexed column AND bounding a z-column prunes through both
    mechanisms and still matches the plain filter."""
    target = str(tmp_path / "pi3")
    df = _zdf(spark, 2000)
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    sinks.compact_manifest_table(
        spark, target, rows_per_file=200,
        cluster_by=["x", "y"], point_index=["k"],
    )
    b = {"k": (777, 777), "x": (0.0, 100.0)}
    got = sinks.read_manifest_table(spark, target, bounds=b).collect()
    want = sinks.read_manifest_table(spark, target).filter(
        "k = 777 and x >= 0.0 and x <= 100.0"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_point_index_rejects_partition_column(spark, tmp_path):
    from pyspark.sql import functions as F

    target = str(tmp_path / "pi4")
    df = _zdf(spark, 200).withColumn("p", (F.col("k") % 3).cast("int"))
    sinks.upsert(
        spark, target, df, ["k", "p"], partition_col="p",
        commit_mode="manifest",
    )
    with pytest.raises(ValueError, match="redundant"):
        sinks.compact_manifest_table(
            spark, target, rows_per_file=100, point_index=["p"]
        )


# --- Merge-on-read (predicate) deletes ---------------------------------


def test_mor_delete_lifecycle_unpartitioned(spark, tmp_path):
    """Metadata-only commit; reads apply the predicate; an upsert
    (full rewrite on an unpartitioned table) makes it physical and
    re-inserted rows survive; compaction clears; counts guarded."""
    target = str(tmp_path / "mor")
    df = _zdf(spark, 100)
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    n = sinks.delete_from_manifest_table(
        spark, target, "x = 3.0", mode="merge_on_read"
    )
    assert n == sum(1 for r in df.collect() if r["x"] == 3.0) > 0
    _, man = sinks._latest_manifest(target)
    assert len(man["delete_predicates"]) == 1
    assert sinks.read_manifest_table(spark, target).count() == 100 - n
    with pytest.raises(ValueError, match="pending merge-on-read"):
        sinks.count_manifest_table(target)
    with pytest.raises(ValueError, match="pending merge-on-read"):
        sinks.rename_manifest_column(target, "x", "x2")
    # re-insert one matching row: the rewrite applies the predicate to
    # OLD rows and the new row survives (entry scoping)
    one = spark.createDataFrame([(3, 3.0, 0.0)], "k LONG, x DOUBLE, y DOUBLE")
    sinks.upsert(spark, target, one, ["k"], commit_mode="manifest")
    got = sinks.read_manifest_table(spark, target)
    assert got.filter("k = 3").count() == 1
    assert got.count() == 100 - n + 1
    _, man2 = sinks._latest_manifest(target)
    assert man2["delete_predicates"] == []  # full rewrite retired it
    assert sinks.count_manifest_table(target) == 100 - n + 1


def test_mor_delete_partition_scoped_retire(spark, tmp_path):
    """On a partitioned table only the rewritten entry retires the
    predicate; other entries keep deleting; time travel pre-delete
    shows everything; the change feed reports the logical deletes
    even though no entry rel changed."""
    from pyspark.sql import functions as F

    target = str(tmp_path / "morp")
    df = _zdf(spark, 300).withColumn("p", (F.col("k") % 3).cast("int"))
    sinks.upsert(
        spark, target, df, ["k", "p"], partition_col="p",
        commit_mode="manifest",
    )
    v0, _ = sinks._latest_manifest(target)
    n = sinks.delete_from_manifest_table(
        spark, target, "x < 10.0", mode="merge_on_read"
    )
    v1, _ = sinks._latest_manifest(target)
    assert sinks.read_manifest_table(
        spark, target, version=v0
    ).count() == 300
    feed = sinks.manifest_table_changes(spark, target, v0, v1)
    assert feed.filter("change = 'delete'").count() == n
    assert feed.filter("change = 'insert'").count() == 0
    # rewrite partition 0 with its ORIGINAL rows: its x<10 rows come
    # back, other partitions stay logically deleted
    refresh = df.filter("p = 0")
    sinks.upsert(
        spark, target, refresh, ["k", "p"], partition_col="p",
        commit_mode="manifest",
    )
    got = sinks.read_manifest_table(spark, target)
    want = df.filter("p = 0 or x >= 10.0")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    _, man = sinks._latest_manifest(target)
    preds = man["delete_predicates"]
    assert len(preds) == 1
    rel0 = man["partitions"]["p=0"]
    assert rel0 not in preds[0]["applies_to"]
    assert man["partitions"]["p=1"] in preds[0]["applies_to"]


def test_mor_delete_stacks_and_bounds_scope(spark, tmp_path):
    """Two pending predicates compose on read; a bounds hint narrows
    applies_to to the non-disjoint entries only."""
    from pyspark.sql import functions as F

    target = str(tmp_path / "morb")
    df = _zdf(spark, 300).withColumn("p", (F.col("k") % 3).cast("int"))
    sinks.upsert(
        spark, target, df, ["k", "p"], partition_col="p",
        commit_mode="manifest",
    )
    sinks.delete_from_manifest_table(
        spark, target, "x = 1.0", mode="merge_on_read"
    )
    # k is unique per partition residue; bound k to partition p=1's
    # range is impossible — instead bound on k full range but assert
    # predicate 2 scoped by a k-bounds hint covering only some entries
    sinks.delete_from_manifest_table(
        spark, target, "y = 2.0 and k <= 50", bounds={"k": (None, 50)},
        mode="merge_on_read",
    )
    got = sinks.read_manifest_table(spark, target)
    want = df.filter("x <> 1.0 and not (y = 2.0 and k <= 50)")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    _, man = sinks._latest_manifest(target)
    assert len(man["delete_predicates"]) == 2


def test_ivm_maintains_across_mor_delete(spark, tmp_path):
    """Cross-feature invariant: a merge-on-read delete flows through
    the change feed as logical delete rows, so incremental view
    maintenance lands on exactly the recompute."""
    from pyspark.sql import functions as F

    target = str(tmp_path / "ivmmor")
    df = _zdf(spark, 300).withColumn("p", (F.col("k") % 3).cast("int"))
    sinks.upsert(
        spark, target, df, ["k", "p"], partition_col="p",
        commit_mode="manifest",
    )
    v0, _ = sinks._latest_manifest(target)
    measures = {"sx": "CAST(ROUND(x * 100, 0) AS BIGINT)"}
    view0 = sinks.materialize_manifest_aggregate(
        spark, target, ["p"], measures, version=v0
    )
    sinks.delete_from_manifest_table(
        spark, target, "x < 20.0", mode="merge_on_read"
    )
    v1, _ = sinks._latest_manifest(target)
    maintained = sinks.maintain_manifest_aggregate(
        spark, target, view0, ["p"], measures, v0, v1
    )
    recomputed = sinks.materialize_manifest_aggregate(
        spark, target, ["p"], measures, version=v1
    )
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, recomputed.collect())
    )


def test_maybe_compact_triggers_and_preserves_layout(spark, tmp_path):
    """Auto-optimize: no-op under the threshold; triggers on
    fragmentation OR pending merge-on-read deletes; the rewrite
    re-applies the recorded cluster_by/point_index layout."""
    target = str(tmp_path / "auto")
    df = _zdf(spark, 1000)
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    sinks.compact_manifest_table(
        spark, target, rows_per_file=200,
        cluster_by=["x", "y"], point_index=["k"],
    )
    # ~5 files, compacted, nothing pending: no-op
    assert sinks.maybe_compact_manifest_table(
        spark, target, rows_per_file=200, max_files=64
    ) is False
    # pending MoR delete forces a run even under the file threshold
    sinks.delete_from_manifest_table(
        spark, target, "x = 5.0", mode="merge_on_read"
    )
    assert sinks.maybe_compact_manifest_table(
        spark, target, rows_per_file=200, max_files=64
    ) is True
    _, man = sinks._latest_manifest(target)
    assert man["delete_predicates"] == []  # applied
    assert man["layout"] == {"cluster_by": ["x", "y"], "point_index": ["k"]}
    assert man["file_point_index"].get("__ALL__")  # re-indexed
    n = sinks.read_manifest_table(spark, target).count()
    assert n == 1000 - df.filter("x = 5.0").count()
    # fragmentation trigger: tiny max_files
    assert sinks.maybe_compact_manifest_table(
        spark, target, rows_per_file=200, max_files=2
    ) is True


def test_clone_carries_pending_mor_deletes(spark, tmp_path):
    """A zero-copy clone deep-copies the manifest, so pending
    merge-on-read deletes stay logically applied on the clone (the
    predicate's applies_to rels resolve through external_bases), and
    materializing the clone makes them physical there."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = _zdf(spark, 200)
    sinks.upsert(spark, src, df, ["k"], commit_mode="manifest")
    n = sinks.delete_from_manifest_table(
        spark, src, "x = 4.0", mode="merge_on_read"
    )
    sinks.clone_manifest_table(spark, src, dst)
    assert sinks.read_manifest_table(spark, dst).count() == 200 - n
    sinks.compact_manifest_table(spark, dst, 1000)  # localize + apply
    _, man = sinks._latest_manifest(dst)
    assert man["delete_predicates"] == []
    assert man["external_bases"] == {}
    assert sinks.read_manifest_table(spark, dst).count() == 200 - n
    # the SOURCE still has its predicate pending, untouched by the
    # clone's life
    _, sman = sinks._latest_manifest(src)
    assert len(sman["delete_predicates"]) == 1


def test_true_concurrent_mor_deletes_vs_upserts(spark, tmp_path):
    """REAL concurrency: one thread streams 4 partition-scoped upserts
    into p=0 while another issues 4 merge-on-read deletes targeting
    sentinel rows that live only in p=1. Every serialization must
    land versions 0..8 contiguous, keep every upserted row (the
    predicates never match them), logically delete all 4 sentinels
    (p=1 is never rewritten, so every predicate stays scoped to it),
    and keep p=1's innocent rows."""
    import threading

    from pyspark.sql import functions as F

    target = str(tmp_path / "race")
    base = spark.createDataFrame(
        [(i, float(100 + i) if i < 4 else 0.0, 1) for i in range(8)]
        + [(100, 0.0, 0)],
        "k LONG, x DOUBLE, p INT",
    )
    sinks.upsert(
        spark, target, base, ["k", "p"], partition_col="p",
        commit_mode="manifest",
    )
    errors: list[Exception] = []

    def upserter() -> None:
        try:
            for i in range(4):
                batch = spark.createDataFrame(
                    [(200 + i, 0.0, 0)], "k LONG, x DOUBLE, p INT"
                )
                sinks.upsert(
                    spark, target, batch, ["k", "p"], partition_col="p",
                    commit_mode="manifest",
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def deleter() -> None:
        try:
            for i in range(4):
                sinks.delete_from_manifest_table(
                    spark, target, f"x = {100 + i}.0",
                    mode="merge_on_read",
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=upserter),
        threading.Thread(target=deleter),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    ver, man = sinks._latest_manifest(target)
    assert ver == 8  # 1 seed + 4 upserts + 4 metadata deletes
    assert len(man["delete_predicates"]) == 4  # p=1 never rewritten
    got = {
        (r["k"], r["x"], r["p"])
        for r in sinks.read_manifest_table(spark, target).collect()
    }
    assert {(200 + i, 0.0, 0) for i in range(4)} <= got
    assert not any(x >= 100.0 for _, x, _ in got)  # sentinels gone
    assert {(i, 0.0, 1) for i in range(4, 8)} <= got  # innocents kept
    assert (100, 0.0, 0) in got


# --- UPDATE (DML triad) -------------------------------------------------


def test_update_swap_semantics_and_type_cast(spark, tmp_path):
    """SET expressions evaluate against the PRE-update row (a column
    swap works), untouched rows pass through, and expressions cast
    back to the recorded column type."""
    target = str(tmp_path / "upd")
    df = _zdf(spark, 100)
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    n = sinks.update_manifest_table(
        spark, target, {"x": "y", "y": "x"}, "k < 10"
    )
    assert n == 10
    got = {r["k"]: (r["x"], r["y"])
           for r in sinks.read_manifest_table(spark, target).collect()}
    want = {r["k"]: ((r["y"], r["x"]) if r["k"] < 10 else (r["x"], r["y"]))
            for r in df.collect()}
    assert got == want
    # int-typed expression on a double column casts back to double
    sinks.update_manifest_table(spark, target, {"x": "42"}, "k = 50")
    _, man = sinks._latest_manifest(target)
    import json as _json
    from pyspark.sql.types import StructType

    sch = StructType.fromJson(_json.loads(man["schema"]))
    assert dict((f.name, f.dataType.simpleString()) for f in sch.fields)[
        "x"
    ] == "double"
    assert sinks.read_manifest_table(spark, target).filter(
        "k = 50"
    ).first()["x"] == 42.0


def test_update_rejects_partition_column_and_unknown(spark, tmp_path):
    from pyspark.sql import functions as F

    target = str(tmp_path / "updp")
    df = _zdf(spark, 90).withColumn("p", (F.col("k") % 3).cast("int"))
    sinks.upsert(
        spark, target, df, ["k", "p"], partition_col="p",
        commit_mode="manifest",
    )
    with pytest.raises(ValueError, match="partition column"):
        sinks.update_manifest_table(spark, target, {"p": "1"}, "k = 1")
    with pytest.raises(ValueError, match="not in table"):
        sinks.update_manifest_table(spark, target, {"zz": "1"}, "k = 1")
    # partition scoping: updating rows in p=0 leaves p=1/p=2 entries
    # carried by reference
    _, man0 = sinks._latest_manifest(target)
    n = sinks.update_manifest_table(
        spark, target, {"x": "x + 1000"}, "p = 0 and k < 30"
    )
    assert n == 10
    _, man1 = sinks._latest_manifest(target)
    assert man1["partitions"]["p=1"] == man0["partitions"]["p=1"]
    assert man1["partitions"]["p=2"] == man0["partitions"]["p=2"]
    assert man1["partitions"]["p=0"] != man0["partitions"]["p=0"]


def test_update_respects_pending_mor_delete(spark, tmp_path):
    """An UPDATE whose entry rewrite passes through the reader keeps
    logically-deleted rows dead (they are not resurrected into the
    new snapshot) and the pending predicate retires from the
    rewritten entry."""
    target = str(tmp_path / "updmor")
    df = _zdf(spark, 100)
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    sinks.delete_from_manifest_table(
        spark, target, "k < 5", mode="merge_on_read"
    )
    n = sinks.update_manifest_table(
        spark, target, {"x": "x + 1.0"}, "k >= 90"
    )
    assert n == 10
    got = sinks.read_manifest_table(spark, target)
    assert got.count() == 95
    assert got.filter("k < 5").count() == 0
    _, man = sinks._latest_manifest(target)
    assert man["delete_predicates"] == []  # full rewrite retired it


# --- CDC apply ----------------------------------------------------------


def test_apply_changes_update_delete_and_entry_drop(spark, tmp_path):
    """A mixed batch: update (delete+insert same key) takes the new
    image, plain delete removes, a partition fully deleted drops out
    of the map, untouched partitions carry by reference."""
    from pyspark.sql import functions as F

    target = str(tmp_path / "cdc")
    df = _zdf(spark, 90).withColumn("p", (F.col("k") % 3).cast("int"))
    sinks.upsert(
        spark, target, df, ["k", "p"], partition_col="p",
        commit_mode="manifest",
    )
    _, man0 = sinks._latest_manifest(target)
    # update k=0 (p=0): delete old image + insert new; delete ALL p=1
    p1_rows = df.filter("p = 1")
    old0 = df.filter("k = 0").withColumn("change", F.lit("delete"))
    new0 = (
        df.filter("k = 0")
        .withColumn("x", F.lit(777.0))
        .withColumn("change", F.lit("insert"))
    )
    dels = p1_rows.withColumn("change", F.lit("delete"))
    batch = old0.unionByName(new0).unionByName(dels)
    sinks.apply_changes_manifest_table(
        spark, target, batch, ["k", "p"], partition_col="p"
    )
    _, man1 = sinks._latest_manifest(target)
    assert "p=1" not in man1["partitions"]  # fully deleted entry drops
    assert man1["partitions"]["p=2"] == man0["partitions"]["p=2"]  # untouched
    got = sinks.read_manifest_table(spark, target)
    assert got.filter("k = 0").first()["x"] == 777.0
    assert got.filter("p = 1").count() == 0
    assert got.count() == 90 - p1_rows.count()


def test_apply_changes_validation(spark, tmp_path):
    df = _zdf(spark, 10)
    target = str(tmp_path / "cdcv")
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    with pytest.raises(ValueError, match="change"):
        sinks.apply_changes_manifest_table(spark, target, df, ["k"])
    from pyspark.sql import functions as F

    batch = df.withColumn("change", F.lit("insert"))
    with pytest.raises(ValueError, match="no manifest table"):
        sinks.apply_changes_manifest_table(
            spark, str(tmp_path / "nope"), batch, ["k"]
        )


def test_entry_stats_nan_rollup_matches_spark_semantics(spark, tmp_path):
    """The driver-side entry rollup must mirror Spark's ordering:
    NaN sorts GREATEST — max picks NaN when present, min never does
    (unless all values are NaN); nulls are ignored."""
    import math

    target = str(tmp_path / "nan")
    df = spark.createDataFrame(
        [(0, 1.0), (1, float("nan")), (2, None), (3, -5.0)],
        "k LONG, x DOUBLE",
    )
    sinks.upsert(spark, target, df, ["k"], commit_mode="manifest")
    _, man = sinks._latest_manifest(target)
    mn, mx = man["stats"]["__ALL__"]["x"]
    assert float(mn) == -5.0
    assert math.isnan(float(mx))  # NaN is Spark's greatest double
    # bounds pruning on x stays sound: NaN max can't prove disjoint
    assert sinks.read_manifest_table(
        spark, target, bounds={"x": (0.0, 2.0)}
    ).count() == 1
