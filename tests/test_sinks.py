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
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="rename")
    clash = spark.createDataFrame(
        [(1, "2024-01-01", "NEW"), (3, "2024-01-01", "d")],
        "ticker INT, date STRING, val STRING",
    )
    sinks.upsert(spark, target, clash, ["ticker", "date"], commit_mode="rename")
    out = spark.read.parquet(target)
    assert out.count() == 4
    updated = out.filter((F.col("ticker") == 1) & (F.col("date") == "2024-01-01"))
    assert updated.first()["val"] == "NEW"  # DO UPDATE: incoming wins


def test_upsert_idempotent(spark, rows, tmp_path):
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="rename")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="rename")
    assert spark.read.parquet(target).count() == 3


def _partition_bytes(root, part):
    """{relative file path: bytes} for one partition directory."""
    import os

    out = {}
    pdir = os.path.join(root, part)
    for dirpath, _, files in os.walk(pdir):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = fh.read()
    return out


def test_upsert_partitioned_touches_only_incoming_partitions(spark, rows, tmp_path):
    """Partition-scoped upsert: files of partitions absent from
    `incoming` must be byte-identical afterwards (dynamic overwrite
    rewrote only the touched partition)."""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], partition_col="date", commit_mode="rename")
    before = _partition_bytes(target, "date=2024-01-02")
    assert before  # partition exists

    clash = spark.createDataFrame(
        [(1, "2024-01-01", "NEW"), (3, "2024-01-01", "d")],
        "ticker INT, date STRING, val STRING",
    )
    sinks.upsert(spark, target, clash, ["ticker", "date"], partition_col="date", commit_mode="rename")
    after = _partition_bytes(target, "date=2024-01-02")
    assert after == before  # untouched partition: same files, same bytes

    out = spark.read.parquet(target)
    assert out.count() == 4
    updated = out.filter((F.col("ticker") == 1) & (F.col("date") == "2024-01-01"))
    assert updated.first()["val"] == "NEW"  # incoming wins in touched partition
    kept = out.filter((F.col("ticker") == 2) & (F.col("date") == "2024-01-01"))
    assert kept.first()["val"] == "c"  # non-conflicting row in touched partition kept


def test_upsert_partitioned_idempotent_and_no_staging_leak(spark, rows, tmp_path):
    import os

    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], partition_col="date", commit_mode="rename")
    sinks.upsert(spark, target, rows, ["ticker", "date"], partition_col="date", commit_mode="rename")
    assert spark.read.parquet(target).count() == 3
    # neither staging siblings nor per-partition backups survive success
    leftovers = [d for d in os.listdir(tmp_path) if d != "sink"]
    assert leftovers == []
    assert [d for d in os.listdir(target) if d.endswith("__old")] == []


def test_upsert_crash_mid_commit_rolls_back_and_stays_readable(
    spark, rows, tmp_path, monkeypatch
):
    """Kill-mid-write: a failure while installing the SECOND touched
    partition must roll back the first (already-swapped) partition and
    leave the sink byte-readable with its pre-upsert contents."""
    import os

    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], partition_col="date", commit_mode="rename")
    before = {tuple(map(str, r)) for r in spark.read.parquet(target).collect()}

    clash = spark.createDataFrame(
        [(1, "2024-01-01", "X"), (1, "2024-01-02", "Y")],  # touches both partitions
        "ticker INT, date STRING, val STRING",
    )
    real_rename = os.rename
    installs = {"n": 0}

    def flaky(src, dst):
        if "__staging" in src and not dst.endswith("__old"):
            installs["n"] += 1
            if installs["n"] == 2:
                raise OSError("simulated crash mid-commit")
        return real_rename(src, dst)

    monkeypatch.setattr(sinks.os, "rename", flaky)
    with pytest.raises(OSError, match="simulated crash"):
        sinks.upsert(spark, target, clash, ["ticker", "date"], partition_col="date", commit_mode="rename")
    monkeypatch.undo()

    after = {tuple(map(str, r)) for r in spark.read.parquet(target).collect()}
    assert after == before  # full rollback, still readable
    assert not os.path.exists(target + "__staging")
    assert [d for d in os.listdir(target) if d.endswith("__old")] == []


def test_upsert_partition_col_must_be_key(spark, rows, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sinks.upsert(spark, str(tmp_path / "s"), rows, ["ticker"], partition_col="date", commit_mode="rename")


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


def test_compact_preserves_rows_and_reduces_files(spark, sf_dir, tmp_path):
    import os

    from etl_stocks_with_sentiment_analysis_spark.operators.sinks import compact
    from etl_stocks_with_sentiment_analysis_spark.plans import panel

    target = str(tmp_path / "frag")
    px = panel.prices(spark, sf_dir)
    px.repartition(64).write.parquet(target)  # simulate small-files buildup
    before = {tuple(map(str, r)) for r in spark.read.parquet(target).collect()}
    n_before = len([f for f in os.listdir(target) if f.endswith(".parquet")])
    assert n_before >= 32

    compact(spark, target, 4)
    after = {tuple(map(str, r)) for r in spark.read.parquet(target).collect()}
    n_after = len([f for f in os.listdir(target) if f.endswith(".parquet")])
    assert after == before
    assert n_after <= 4
    assert not os.path.exists(target.rstrip("/") + "__old")


def test_scd2_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.operators.sinks import (
        sink_scd2_merge,
    )

    out = sink_scd2_merge(spark, sf_dir)
    # exactly one current row per ticker
    cur = out.filter("is_current").groupBy("ticker").count()
    assert cur.filter(F.col("count") != 1).count() == 0
    # closed rows end exactly when a current row for the key begins
    closed = out.filter(~F.col("is_current")).select("ticker", "valid_to")
    opens = out.filter("is_current").select(
        "ticker", F.col("valid_from").alias("valid_to")
    )
    assert closed.join(opens, ["ticker", "valid_to"], "left_anti").count() == 0
    # no open-ended overlap: closed rows start before they end
    assert out.filter(
        ~F.col("is_current") & (F.col("valid_from") >= F.col("valid_to"))
    ).count() == 0


def test_clustered_write_yields_disjoint_file_ranges(spark, sf_dir, tmp_path):
    import os

    import pyarrow.parquet as pq

    from etl_stocks_with_sentiment_analysis_spark.operators.sinks import clustered_write
    from etl_stocks_with_sentiment_analysis_spark.plans import panel

    target = str(tmp_path / "clustered")
    px = panel.prices(spark, sf_dir)
    clustered_write(px, target, ["ticker"], n_files=8)

    ranges = []
    for fname in os.listdir(target):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(target, fname)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "ticker"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2  # range partitioner actually split the key space
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b  # disjoint: a point predicate prunes to ~1 file

    # row count survives the re-layout
    assert spark.read.parquet(target).count() == px.count()


def test_retention_sweep_drops_only_expired_partitions(spark, rows, tmp_path):
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], partition_col="date", commit_mode="rename")
    dropped = sinks.retention_sweep(target, "date", keep_from="2024-01-02")
    assert dropped == ["2024-01-01"]
    out = spark.read.parquet(target)
    assert {str(r["date"]) for r in out.collect()} == {"2024-01-02"}
    # idempotent: second sweep is a no-op
    assert sinks.retention_sweep(target, "date", keep_from="2024-01-02") == []


def test_upsert_self_heals_whole_table_crash_with_target_missing(
    spark, rows, tmp_path
):
    """Unpartitioned commit killed after `target` → `target__old` but
    before staging moved in: the live dir is MISSING. The next upsert
    must restore the backup and merge into it — not take the
    fresh-write path (which would silently drop the old table and
    leave a stale __old that breaks the commit after that)."""
    import os

    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="rename")
    os.rename(target, target + "__old")  # simulate the kill state

    clash = spark.createDataFrame(
        [(1, "2024-01-02", "NEW")], "ticker INT, date STRING, val STRING"
    )
    sinks.upsert(spark, target, clash, ["ticker", "date"], commit_mode="rename")

    out = {
        (r["ticker"], str(r["date"]), r["val"])
        for r in spark.read.parquet(target).collect()
    }
    assert (1, "2024-01-01", "a") in out  # old table survived
    assert (2, "2024-01-01", "c") in out
    assert (1, "2024-01-02", "NEW") in out  # merge applied after heal
    assert not os.path.exists(target + "__old")


def test_upsert_self_heals_interrupted_commit(spark, rows, tmp_path):
    """A kill between the backup rename and the install rename leaves a
    partition as `X__old` only; the next upsert must restore it before
    merging, and a stale backup next to a live dir must be cleared."""
    import os
    import shutil

    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], partition_col="date", commit_mode="rename")

    # simulate kill state (b): live dir missing, only backup present
    live = os.path.join(target, "date=2024-01-01")
    os.rename(live, live + "__old")
    # simulate stale state (a) on the other partition: backup AND live
    live2 = os.path.join(target, "date=2024-01-02")
    shutil.copytree(live2, live2 + "__old")

    clash = spark.createDataFrame(
        [(1, "2024-01-02", "NEW")], "ticker INT, date STRING, val STRING"
    )
    sinks.upsert(spark, target, clash, ["ticker", "date"], partition_col="date", commit_mode="rename")

    out = {(r["ticker"], str(r["date"]), r["val"]) for r in spark.read.parquet(target).collect()}
    assert (1, "2024-01-01", "a") in out  # restored from backup
    assert (2, "2024-01-01", "c") in out
    assert (1, "2024-01-02", "NEW") in out  # merge applied after heal
    assert [d for d in os.listdir(target) if d.endswith("__old")] == []


# --- manifest commit mode (object-store-safe protocol) ----------------


def _mread(spark, target):
    return {
        (r["ticker"], str(r["date"]), r["val"])
        for r in sinks.read_manifest_table(spark, target).collect()
    }


def test_manifest_upsert_overwrites_on_conflict_and_idempotent(
    spark, rows, tmp_path
):
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    clash = spark.createDataFrame(
        [(1, "2024-01-01", "NEW"), (3, "2024-01-01", "d")],
        "ticker INT, date STRING, val STRING",
    )
    sinks.upsert(spark, target, clash, ["ticker", "date"], commit_mode="manifest")
    out = _mread(spark, target)
    assert len(out) == 4
    assert (1, "2024-01-01", "NEW") in out  # DO UPDATE: incoming wins
    assert (2, "2024-01-01", "c") in out
    # replay: same contents, no duplicate keys
    sinks.upsert(spark, target, clash, ["ticker", "date"], commit_mode="manifest")
    assert _mread(spark, target) == out


def test_manifest_partitioned_carries_untouched_partitions_by_reference(
    spark, rows, tmp_path
):
    """Untouched partitions must survive BYTE-IDENTICAL — the manifest
    carries them forward by reference into the old snapshot, so their
    files are never rewritten."""
    import os

    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    _, man0 = sinks._latest_manifest(target)
    before = _partition_bytes(target, man0["partitions"]["date=2024-01-02"])
    assert before

    clash = spark.createDataFrame(
        [(1, "2024-01-01", "NEW"), (3, "2024-01-01", "d")],
        "ticker INT, date STRING, val STRING",
    )
    sinks.upsert(
        spark, target, clash, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    _, man1 = sinks._latest_manifest(target)
    # untouched partition: same referenced directory, same bytes
    assert man1["partitions"]["date=2024-01-02"] == man0["partitions"]["date=2024-01-02"]
    assert _partition_bytes(target, man1["partitions"]["date=2024-01-02"]) == before
    # touched partition: repointed to the new snapshot
    assert man1["partitions"]["date=2024-01-01"] != man0["partitions"]["date=2024-01-01"]
    out = _mread(spark, target)
    assert (1, "2024-01-01", "NEW") in out
    assert (2, "2024-01-01", "c") in out
    assert (1, "2024-01-02", "b") in out


def test_manifest_crash_between_data_and_manifest_write(
    spark, rows, tmp_path, monkeypatch
):
    """THE object-store crash state: snapshot data fully written, killed
    before the manifest lands. Readers must keep seeing the old
    contents (the orphan snapshot is invisible), and the next commit
    must succeed and converge to the correct merged table."""
    import os

    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    before = _mread(spark, target)

    clash = spark.createDataFrame(
        [(1, "2024-01-01", "NEW")], "ticker INT, date STRING, val STRING"
    )

    def boom(target_, version, manifest):
        raise OSError("simulated crash before manifest publish")

    real_publish = sinks._write_manifest_atomic
    monkeypatch.setattr(sinks, "_write_manifest_atomic", boom)
    with pytest.raises(OSError, match="simulated crash"):
        sinks.upsert(
            spark, target, clash, ["ticker", "date"],
            partition_col="date", commit_mode="manifest",
        )
    monkeypatch.undo()

    # reader still resolves the OLD manifest; orphan snapshot invisible
    assert _mread(spark, target) == before
    orphans = [e for e in os.listdir(target) if e.startswith("snap-")]
    assert len(orphans) == 2  # snap-0 (live) + the orphan attempt

    # retry converges; orphan data dir is reused/cleaned by version GC
    sinks.upsert(
        spark, target, clash, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    out = _mread(spark, target)
    assert (1, "2024-01-01", "NEW") in out
    assert (2, "2024-01-01", "c") in out
    assert (1, "2024-01-02", "b") in out


def test_manifest_crash_mid_manifest_write_leaves_no_partial_commit(
    spark, rows, tmp_path, monkeypatch
):
    """A kill DURING the manifest file write must never publish a
    half-written manifest: the temp file is not a commit, readers stay
    on the previous version."""
    import os

    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    before = _mread(spark, target)

    real_link = os.link

    def flaky(src, dst):
        if os.path.basename(dst).startswith(sinks._MANIFEST_PREFIX):
            raise OSError("simulated crash mid-manifest-publish")
        return real_link(src, dst)

    monkeypatch.setattr(sinks.os, "link", flaky)
    clash = spark.createDataFrame(
        [(1, "2024-01-01", "NEW")], "ticker INT, date STRING, val STRING"
    )
    with pytest.raises(OSError, match="simulated crash"):
        sinks.upsert(spark, target, clash, ["ticker", "date"], commit_mode="manifest")
    monkeypatch.undo()

    assert _mread(spark, target) == before
    # the aborted temp file is ignored by the reader's manifest pattern
    sinks.upsert(spark, target, clash, ["ticker", "date"], commit_mode="manifest")
    assert (1, "2024-01-01", "NEW") in _mread(spark, target)


def test_manifest_gc_drops_fully_unreferenced_snapshots(
    spark, rows, tmp_path, monkeypatch
):
    """With retention shrunk to 1 and the in-flight grace window off,
    an unpartitioned rewrite's previous snapshot is unreferenced by
    every retained manifest and must be GC'd (the r5 immediate-GC
    behavior, now the K=1 corner of the retention policy)."""
    import os

    monkeypatch.setattr(sinks, "_RETAIN_VERSIONS", 1)
    monkeypatch.setattr(sinks, "_GC_GRACE_SECONDS", 0.0)
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    snaps = [e for e in os.listdir(target) if e.startswith("snap-")]
    assert len(snaps) == 1 and snaps[0].startswith("snap-000000000001")
    assert _mread(spark, target) == {
        (1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (2, "2024-01-01", "c"),
    }


def test_manifest_unknown_commit_mode_rejected(spark, rows, tmp_path):
    with pytest.raises(ValueError, match="commit_mode"):
        sinks.upsert(
            spark, str(tmp_path / "s"), rows, ["ticker", "date"],
            commit_mode="two-phase",
        )


def test_manifest_empty_first_commit_reads_as_empty_table(spark, tmp_path):
    """A first partitioned commit with an EMPTY incoming frame must
    publish a readable empty table (recorded schema), not brick the
    target: later reads return zero rows and later commits succeed."""
    empty = spark.createDataFrame([], "ticker INT, date STRING, val STRING")
    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, empty, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    out = sinks.read_manifest_table(spark, target)
    assert out is not None and out.count() == 0
    assert set(out.columns) == {"ticker", "date", "val"}
    rows = spark.createDataFrame(
        [(1, "2024-01-01", "a")], "ticker INT, date STRING, val STRING"
    )
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    assert _mread(spark, target) == {(1, "2024-01-01", "a")}


def test_manifest_null_partition_value_roundtrips_as_null(spark, tmp_path):
    """NULL partition values must come back as real NULLs, never the
    Hive sentinel string, and must merge as the same key on replay."""
    rows = spark.createDataFrame(
        [(1, None, "a"), (2, "2024-01-01", "b")],
        "ticker INT, date STRING, val STRING",
    )
    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    out = sinks.read_manifest_table(spark, target)
    got = {(r["ticker"], r["date"], r["val"]) for r in out.collect()}
    assert (1, None, "a") in got
    assert "__HIVE_DEFAULT_PARTITION__" not in {r["date"] for r in out.collect()}
    # NULL keys never conflict (Postgres ON CONFLICT semantics: a
    # unique index treats NULLs as distinct), so a replayed null-key
    # row INSERTS alongside the old one rather than updating it —
    # identical to the rename-mode anti-join behavior
    clash = spark.createDataFrame(
        [(1, None, "NEW")], "ticker INT, date STRING, val STRING"
    )
    sinks.upsert(
        spark, target, clash, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    out2 = {(r["ticker"], r["date"], r["val"])
            for r in sinks.read_manifest_table(spark, target).collect()}
    assert (1, None, "NEW") in out2 and (1, None, "a") in out2
    assert len(out2) == 3


def test_manifest_superseded_versions_are_garbage_collected(
    spark, rows, tmp_path, monkeypatch
):
    """The manifest LOG is append-only (deleting a version name would
    let a stalled writer re-CAS it and lose a commit silently), but
    superseded SNAPSHOT data past the window is reclaimed: with
    retention=1, after commit N only version N's snapshot survives."""
    import os

    monkeypatch.setattr(sinks, "_RETAIN_VERSIONS", 1)
    monkeypatch.setattr(sinks, "_GC_GRACE_SECONDS", 0.0)
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    manifests = [e for e in os.listdir(os.path.join(target, "_manifest_log"))
                 if e.startswith("manifest-")]
    assert sorted(manifests) == [
        "manifest-000000000000.json", "manifest-000000000001.json"
    ]  # append-only log: every committed version name stays taken
    _, man = sinks._latest_manifest(target)
    live = {rel.split("/", 1)[0] for rel in man["partitions"].values()}
    snaps = {e for e in os.listdir(target) if e.startswith("snap-")}
    assert snaps == live  # superseded snapshot data reclaimed


def test_manifest_schema_evolution_adds_column_with_nulls(spark, rows, tmp_path):
    """An incoming frame with a NEW column widens the table: kept rows
    read back with NULL in the added column, the manifest records the
    widened schema, and old carried-forward snapshots project to it."""
    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    widened = spark.createDataFrame(
        [(1, "2024-01-01", "NEW", "web")],
        "ticker INT, date STRING, val STRING, src STRING",
    )
    sinks.upsert(
        spark, target, widened, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    out = sinks.read_manifest_table(spark, target)
    assert set(out.columns) == {"ticker", "date", "val", "src"}
    got = {(r["ticker"], r["date"], r["val"], r["src"]) for r in out.collect()}
    assert (1, "2024-01-01", "NEW", "web") in got
    assert (2, "2024-01-01", "c", None) in got   # merged partition, old row
    assert (1, "2024-01-02", "b", None) in got   # untouched old snapshot


def test_compact_manifest_table_preserves_rows_and_snapshots(
    spark, rows, tmp_path, monkeypatch
):
    """Compaction publishes a single fresh snapshot with identical
    contents; fragmented predecessors are reclaimed (retention shrunk
    to 1 so the reclaim is immediate and assertable)."""
    import os

    monkeypatch.setattr(sinks, "_RETAIN_VERSIONS", 1)
    monkeypatch.setattr(sinks, "_GC_GRACE_SECONDS", 0.0)
    target = str(tmp_path / "sink")
    for i in range(3):  # three commits -> partitions scattered over snaps
        batch = spark.createDataFrame(
            [(10 + i, f"2024-01-0{i + 1}", f"v{i}")],
            "ticker INT, date STRING, val STRING",
        )
        sinks.upsert(
            spark, target, batch, ["ticker", "date"],
            partition_col="date", commit_mode="manifest",
        )
    before = _mread(spark, target)
    n_dirs = sinks.compact_manifest_table(spark, target, rows_per_file=1000)
    assert n_dirs == 3  # one dir per date partition
    assert _mread(spark, target) == before
    snaps = {e for e in os.listdir(target) if e.startswith("snap-")}
    assert len(snaps) == 1 and next(iter(snaps)).startswith("snap-000000000003")


def test_manifest_typed_partition_scoping_preserves_carried_rows(spark, tmp_path):
    """Regression for the str(value) scoping bug: with a BOOLEAN
    partition column (Python renders 'True', Spark dirs 'true'), the
    touched partition's non-conflicting rows must survive the merge —
    a stringly match would skip the old dir and lose them."""
    rows = spark.createDataFrame(
        [(1, True, "a"), (2, False, "b")], "id INT, flag BOOLEAN, val STRING"
    )
    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, rows, ["id", "flag"],
        partition_col="flag", commit_mode="manifest",
    )
    clash = spark.createDataFrame([(3, True, "c")], "id INT, flag BOOLEAN, val STRING")
    sinks.upsert(
        spark, target, clash, ["id", "flag"],
        partition_col="flag", commit_mode="manifest",
    )
    got = {
        (r["id"], r["flag"], r["val"])
        for r in sinks.read_manifest_table(spark, target).collect()
    }
    assert got == {(1, True, "a"), (2, False, "b"), (3, True, "c")}


def test_manifest_date_typed_partition_scoping_and_roundtrip(spark, tmp_path):
    """DATE-typed partition column (the most common lake layout): dir
    strings must cast back to real dates on read, and typed scoping
    must carry untouched date partitions across commits."""
    import datetime

    d1, d2 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)
    rows = spark.createDataFrame(
        [(1, d1, "a"), (2, d2, "b")], "ticker INT, date DATE, val STRING"
    )
    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    clash = spark.createDataFrame([(1, d1, "NEW")], "ticker INT, date DATE, val STRING")
    sinks.upsert(
        spark, target, clash, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    out = sinks.read_manifest_table(spark, target)
    assert dict(out.dtypes)["date"] == "date"
    got = {(r["ticker"], r["date"], r["val"]) for r in out.collect()}
    assert got == {(1, d1, "NEW"), (2, d2, "b")}


def test_compact_manifest_table_unpartitioned(spark, rows, tmp_path, monkeypatch):
    import os

    monkeypatch.setattr(sinks, "_RETAIN_VERSIONS", 1)
    monkeypatch.setattr(sinks, "_GC_GRACE_SECONDS", 0.0)
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    before = _mread(spark, target)
    n_dirs = sinks.compact_manifest_table(spark, target, rows_per_file=2)
    assert n_dirs == 1  # single __ALL__ snapshot entry
    assert _mread(spark, target) == before
    snaps = [e for e in os.listdir(target) if e.startswith("snap-")]
    assert len(snaps) == 1 and snaps[0].startswith("snap-000000000001")


# --- r6: optimistic concurrency, retention/time travel, data skipping --


def test_manifest_concurrent_writers_both_survive(
    spark, rows, tmp_path, monkeypatch
):
    """The r5 'what's wrong' race, fixed: writer A reads the manifest,
    writer B commits in between, A's publish must LOSE the version-CAS,
    re-read, re-merge, and land on the next version — both writers'
    rows survive. The interleave is forced deterministically by
    hooking A's manifest read."""
    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )

    writer_b_rows = spark.createDataFrame(
        [(7, "2024-01-01", "from-B")], "ticker INT, date STRING, val STRING"
    )
    writer_a_rows = spark.createDataFrame(
        [(8, "2024-01-02", "from-A")], "ticker INT, date STRING, val STRING"
    )

    # hook the WRITER's resolver (r12b: _latest_manifest_for_write —
    # hooking the plain reader no longer stages the race, because the
    # writer resolver's forward walk would absorb B's commit before
    # the CAS and converge without a retry, which is also correct)
    real_for_write = sinks._latest_manifest_for_write
    state = {"interleaved": False, "a_reads": 0}

    def racy_for_write(t):
        out = real_for_write(t)
        state["a_reads"] += 1
        if not state["interleaved"]:
            state["interleaved"] = True
            # B commits fully while A holds its (now stale) view
            monkeypatch.setattr(
                sinks, "_latest_manifest_for_write", real_for_write
            )
            sinks.upsert(
                spark, target, writer_b_rows, ["ticker", "date"],
                partition_col="date", commit_mode="manifest",
            )
            monkeypatch.setattr(
                sinks, "_latest_manifest_for_write", racy_for_write
            )
        return out  # stale on the first read

    monkeypatch.setattr(sinks, "_latest_manifest_for_write", racy_for_write)
    sinks.upsert(
        spark, target, writer_a_rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    monkeypatch.undo()

    assert state["a_reads"] >= 2, "A never retried — the CAS did not fire"
    out = _mread(spark, target)
    assert (7, "2024-01-01", "from-B") in out  # B's commit not clobbered
    assert (8, "2024-01-02", "from-A") in out  # A's retry landed
    assert (2, "2024-01-01", "c") in out       # original rows intact
    ver, _ = sinks._latest_manifest(target)
    assert ver == 2  # v0 initial, v1 = B, v2 = A's retried commit


def test_manifest_true_concurrent_writers_stress(spark, tmp_path):
    """REAL concurrency (not a staged interleave): two driver threads
    each commit 4 disjoint upserts into one manifest table
    simultaneously. Every row from every commit must survive and the
    final version count must equal the total number of commits — the
    version-CAS serializes the racers, the retention window keeps each
    loser's read-version files alive while it re-merges."""
    import threading

    target = str(tmp_path / "sink")
    errors: list[Exception] = []

    def writer(tag: str, n: int) -> None:
        try:
            for i in range(n):
                batch = spark.createDataFrame(
                    [(f"{tag}{i}", "2024-01-01", f"val-{tag}{i}")],
                    "ticker STRING, date STRING, val STRING",
                )
                sinks.upsert(
                    spark, target, batch, ["ticker", "date"],
                    commit_mode="manifest",
                )
        except Exception as e:  # noqa: BLE001 - surfaced via main thread
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=("a", 4)),
        threading.Thread(target=writer, args=("b", 4)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors

    out = {r["ticker"] for r in sinks.read_manifest_table(spark, target).collect()}
    assert out == {f"{tag}{i}" for tag in "ab" for i in range(4)}
    ver, _ = sinks._latest_manifest(target)
    assert ver == 7  # 8 commits -> versions 0..7, none lost or skipped


def test_manifest_retention_keeps_old_versions_readable(spark, rows, tmp_path):
    """Snapshot retention: a lazy frame resolved before a commit still
    collects correctly after it (its files are retained), and
    read-at-version returns each historical table; versions past the
    window raise."""
    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    held = sinks.read_manifest_table(spark, target)  # lazy, resolves v0

    clash = spark.createDataFrame(
        [(1, "2024-01-01", "NEW")], "ticker INT, date STRING, val STRING"
    )
    sinks.upsert(
        spark, target, clash, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )

    # the held v0 frame still reads the ORIGINAL contents
    got_held = {(r["ticker"], str(r["date"]), r["val"]) for r in held.collect()}
    assert got_held == {
        (1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (2, "2024-01-01", "c"),
    }
    # explicit time travel
    v0 = sinks.read_manifest_table(spark, target, version=0)
    got_v0 = {(r["ticker"], str(r["date"]), r["val"]) for r in v0.collect()}
    assert got_v0 == got_held
    v1 = sinks.read_manifest_table(spark, target, version=1)
    assert (1, "2024-01-01", "NEW") in {
        (r["ticker"], str(r["date"]), r["val"]) for r in v1.collect()
    }
    with pytest.raises(ValueError, match="version 9"):
        sinks.read_manifest_table(spark, target, version=9)


def test_manifest_version_past_retention_window_is_reclaimed(
    spark, rows, tmp_path, monkeypatch
):
    """Versions older than _RETAIN_VERSIONS lose their DATA (snapshots
    reclaimed) and read-at-version raises cleanly — but their manifest
    files stay (append-only log protects the version-CAS namespace)."""
    monkeypatch.setattr(sinks, "_RETAIN_VERSIONS", 2)
    monkeypatch.setattr(sinks, "_GC_GRACE_SECONDS", 0.0)
    target = str(tmp_path / "sink")
    for i in range(4):  # versions 0..3
        batch = spark.createDataFrame(
            [(i, "2024-01-01", f"v{i}")], "ticker INT, date STRING, val STRING"
        )
        sinks.upsert(spark, target, batch, ["ticker", "date"], commit_mode="manifest")
    import os

    versions = sorted(
        sinks._manifest_version(e)
        for e in os.listdir(os.path.join(target, "_manifest_log"))
        if e.startswith("manifest-") and e.endswith(".json")
    )
    assert versions == [0, 1, 2, 3]  # append-only log keeps all names
    with pytest.raises(ValueError, match="retention"):
        sinks.read_manifest_table(spark, target, version=0)
    # retained old version still fully readable
    v2 = {(r["ticker"], r["val"])
          for r in sinks.read_manifest_table(spark, target, version=2).collect()}
    assert v2 == {(0, "v0"), (1, "v1"), (2, "v2")}


def test_manifest_partition_col_mismatch_rejected(spark, rows, tmp_path):
    """r5 advice: a partitioned upsert onto a table first committed
    with different (or no) partitioning must raise, not mis-key rows."""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"], commit_mode="manifest")
    with pytest.raises(ValueError, match="partition_col"):
        sinks.upsert(
            spark, target, rows, ["ticker", "date"],
            partition_col="date", commit_mode="manifest",
        )
    target2 = str(tmp_path / "sink2")
    sinks.upsert(
        spark, target2, rows, ["ticker", "date"],
        partition_col="date", commit_mode="manifest",
    )
    with pytest.raises(ValueError, match="partition_col"):
        sinks.upsert(
            spark, target2, rows, ["ticker", "date"],
            partition_col="ticker", commit_mode="manifest",
        )


def _files_read(df):
    from pyspark.sql import functions as F

    return {
        r["f"]
        for r in df.select(F.input_file_name().alias("f")).distinct().collect()
        if r["f"]
    }


def test_manifest_stats_pruning_skips_unmatched_entries(spark, tmp_path):
    """Data skipping: per-entry min/max stats recorded at commit time
    must prune entries whose range can't match the requested bounds —
    fewer FILES are actually read — while returning exactly the rows a
    plain filter would."""
    rows = spark.createDataFrame(
        [
            (1, "2024-01-01", 5.0, "a"),
            (2, "2024-01-01", 9.0, "b"),
            (3, "2024-01-02", 105.0, "c"),
            (4, "2024-01-02", 109.0, "d"),
            (5, "2024-01-03", 1005.0, "e"),
        ],
        "id INT, date STRING, v DOUBLE, val STRING",
    )
    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, rows, ["id", "date"],
        partition_col="date", commit_mode="manifest",
    )
    _, man = sinks._latest_manifest(target)
    assert man["stats"]["date=2024-01-01"]["v"] == ["5.0", "9.0"]

    full = sinks.read_manifest_table(spark, target)
    pruned = sinks.read_manifest_table(spark, target, bounds={"v": (100.0, 200.0)})
    assert {(r["id"], r["v"]) for r in pruned.collect()} == {(3, 105.0), (4, 109.0)}
    assert len(_files_read(pruned)) < len(_files_read(full))

    # bounds on a column with no stats recorded for an entry: correctness
    # unchanged (entry read + filtered) — simulate by dropping stats
    import json as _json
    import os

    mlog = os.path.join(target, "_manifest_log")
    mpath = [e for e in os.listdir(mlog) if e.startswith("manifest-")]
    path = os.path.join(mlog, sorted(mpath)[-1])
    man2 = _json.load(open(path))
    man2["stats"] = {}
    os.remove(path)
    with open(path, "w") as f:
        _json.dump(man2, f)
    unpruned = sinks.read_manifest_table(spark, target, bounds={"v": (100.0, 200.0)})
    assert {(r["id"], r["v"]) for r in unpruned.collect()} == {(3, 105.0), (4, 109.0)}


def test_manifest_stats_carry_forward_and_half_open_bounds(spark, tmp_path):
    """Untouched entries keep their prior stats across commits, and
    half-open bounds (one side None) prune correctly."""
    rows = spark.createDataFrame(
        [(1, "2024-01-01", 5.0), (2, "2024-01-02", 100.0)],
        "id INT, date STRING, v DOUBLE",
    )
    target = str(tmp_path / "sink")
    sinks.upsert(
        spark, target, rows, ["id", "date"],
        partition_col="date", commit_mode="manifest",
    )
    clash = spark.createDataFrame(
        [(3, "2024-01-02", 200.0)], "id INT, date STRING, v DOUBLE"
    )
    sinks.upsert(
        spark, target, clash, ["id", "date"],
        partition_col="date", commit_mode="manifest",
    )
    _, man = sinks._latest_manifest(target)
    # untouched partition's stats carried forward verbatim
    assert man["stats"]["date=2024-01-01"]["v"] == ["5.0", "5.0"]
    # touched partition's stats recomputed over the merged contents
    assert man["stats"]["date=2024-01-02"]["v"] == ["100.0", "200.0"]

    lo_only = sinks.read_manifest_table(spark, target, bounds={"v": (50.0, None)})
    assert {r["v"] for r in lo_only.collect()} == {100.0, 200.0}
    full = sinks.read_manifest_table(spark, target)
    assert len(_files_read(lo_only)) < len(_files_read(full))
    hi_only = sinks.read_manifest_table(spark, target, bounds={"v": (None, 10.0)})
    assert {r["v"] for r in hi_only.collect()} == {5.0}
