"""Round-12b — MULTI-TABLE atomic transaction protocol (pending
manifests + one outcome-file CAS; sinks.py multi-table block).

The SQL-level composition is covered by `sink_manifest_txn_multi`
(oracle-checked); these tests drive the PROTOCOL edges directly:
mid-commit invisibility, crash-without-outcome, writer force-abort,
the late committer losing the outcome CAS, outcome mirroring across
a coordinator drop, version numbering past aborted slots, and the
streaming source skipping aborted versions (whose planner runs in a
JVM-less Python worker — a genuine cross-process resolution check).
"""

import os
import threading

import pytest

from etl_stocks_with_sentiment_analysis_spark.operators import fsio, sinks


def _df(spark, rows):
    return spark.createDataFrame(rows, "k INT, v INT, g INT")


def _count(spark, t):
    return sinks.read_manifest_table(spark, t).count()


def _fresh_outcome_view():
    """Simulate a fresh process: drop every cached txn outcome."""
    with sinks._TXN_OUTCOME_LOCK:
        sinks._TXN_OUTCOME_CACHE.clear()


def test_multi_table_commit_atomic_visibility(spark, tmp_path):
    """Both participants stay invisible while pending; ONE outcome CAS
    flips both visible; checkpoints land at the committed versions."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    sinks.upsert(spark, a, _df(spark, [(1, 10, 0)]), ["k", "g"],
                 partition_col="g")
    sinks.upsert(spark, b, _df(spark, [(5, 50, 0)]), ["k", "g"],
                 partition_col="g")
    outcome = sinks._txn_mirror_path(a, "txn-vis-1")
    with sinks.pending_transaction("txn-vis-1", outcome) as ctx:
        sinks.upsert(spark, a, _df(spark, [(2, 20, 0)]), ["k", "g"],
                     partition_col="g")
        # r13 read-your-own-writes: the OWNING thread sees its staged
        # version; any other thread still sees only committed state
        assert _count(spark, a) == 2
        other: list[int] = []
        th = threading.Thread(
            target=lambda: other.append(_count(spark, a))
        )
        th.start()
        th.join()
        assert other == [1]  # staged, invisible to other sessions
        sinks.upsert(spark, b, _df(spark, [(6, 60, 0)]), ["k", "g"],
                     partition_col="g")
        assert _count(spark, a) == 2 and _count(spark, b) == 2
    # scope closed but outcome not yet published: still invisible
    _fresh_outcome_view()
    assert _count(spark, a) == 1 and _count(spark, b) == 1
    sinks.commit_pending_transaction(ctx)
    assert _count(spark, a) == 2 and _count(spark, b) == 2
    # a fresh view (no cache) resolves through the outcome file too
    _fresh_outcome_view()
    assert _count(spark, a) == 2 and _count(spark, b) == 2
    assert len(ctx["published"]) == 2
    for tgt, ver in ctx["published"]:
        assert sinks._read_checkpoint(tgt) == ver
        assert sinks._version_is_committed(tgt, ver)
    # history shows the committed txn versions like normal commits
    hist = sinks.manifest_table_history(spark, a)
    assert hist.count() == 2


def test_crash_then_writer_force_abort_and_late_commit_loses(
    spark, tmp_path, monkeypatch
):
    """A committer that dies before the outcome CAS leaves NOTHING
    visible; the next writer force-aborts the orphaned pendings and
    proceeds; the late committer's outcome CAS then loses and raises
    TransactionAbortedError — all-or-nothing under every ordering."""
    monkeypatch.setattr(sinks, "_TXN_RESOLVE_WAIT_SECONDS", 0.2)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    sinks.upsert(spark, a, _df(spark, [(1, 10, 0)]), ["k", "g"],
                 partition_col="g")
    sinks.upsert(spark, b, _df(spark, [(5, 50, 0)]), ["k", "g"],
                 partition_col="g")
    outcome = sinks._txn_mirror_path(a, "txn-crash-1")
    with sinks.pending_transaction("txn-crash-1", outcome) as ctx:
        sinks.upsert(spark, a, _df(spark, [(2, 20, 0)]), ["k", "g"],
                     partition_col="g")
        sinks.upsert(spark, b, _df(spark, [(6, 60, 0)]), ["k", "g"],
                     partition_col="g")
    # "crash": no outcome ever written. Readers see the old state.
    _fresh_outcome_view()
    assert _count(spark, a) == 1 and _count(spark, b) == 1
    # a new writer on `a` trips over the unresolved pending, waits
    # briefly, force-aborts it, and lands its own commit
    sinks.upsert(spark, a, _df(spark, [(3, 30, 0)]), ["k", "g"],
                 partition_col="g")
    got = {
        (r["k"], r["v"])
        for r in sinks.read_manifest_table(spark, a).collect()
    }
    assert got == {(1, 10), (3, 30)}  # staged (2,20) aborted, not lost-in
    # the late committer now loses the outcome CAS
    with pytest.raises(sinks.TransactionAbortedError):
        sinks.commit_pending_transaction(ctx)
    # and table b's pending resolves aborted — forever pre-txn
    _fresh_outcome_view()
    assert _count(spark, b) == 1
    # aborted versions: excluded from history, refused by time travel
    pub = dict(ctx["published"])
    assert not sinks._version_is_committed(b, pub[b])
    hist_vers = {
        r["version"]
        for r in sinks.manifest_table_history(spark, b).collect()
    }
    assert pub[b] not in hist_vers
    with pytest.raises(ValueError, match="transaction"):
        sinks._manifest_at_version(b, pub[b])
    # writers number PAST the aborted slot on b too
    sinks.upsert(spark, b, _df(spark, [(7, 70, 0)]), ["k", "g"],
                 partition_col="g")
    assert _count(spark, b) == 2
    ver_b, _ = sinks._latest_manifest(b)
    assert ver_b == pub[b] + 1


def test_outcome_mirror_survives_coordinator_drop(spark, tmp_path):
    """After COMMIT the outcome is mirrored into every participant:
    dropping the coordinating table (which hosts the canonical
    outcome file) must not flip the other participants invisible."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    sinks.upsert(spark, b, _df(spark, [(5, 50, 0)]), ["k", "g"],
                 partition_col="g")
    outcome = sinks._txn_mirror_path(a, "txn-mirror-1")
    with sinks.pending_transaction("txn-mirror-1", outcome) as ctx:
        sinks.upsert(spark, a, _df(spark, [(1, 10, 0)]), ["k", "g"],
                     partition_col="g")
        sinks.upsert(spark, b, _df(spark, [(6, 60, 0)]), ["k", "g"],
                     partition_col="g")
    sinks.commit_pending_transaction(ctx)
    assert _count(spark, b) == 2
    # coordinator table dropped entirely — canonical outcome gone
    fsio.delete(a, recursive=True)
    _fresh_outcome_view()
    assert _count(spark, b) == 2  # resolved via b's local mirror
    mirror = sinks._txn_mirror_path(b, "txn-mirror-1")
    assert fsio.exists(mirror)


def test_explicit_abort_keeps_everything_invisible(spark, tmp_path):
    """abort_pending_transaction (the ROLLBACK/error path) resolves
    the staged versions immediately — no 2s writer wait, no residue."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    sinks.upsert(spark, a, _df(spark, [(1, 10, 0)]), ["k", "g"],
                 partition_col="g")
    outcome = sinks._txn_mirror_path(a, "txn-abort-1")
    with sinks.pending_transaction("txn-abort-1", outcome) as ctx:
        sinks.upsert(spark, a, _df(spark, [(2, 20, 0)]), ["k", "g"],
                     partition_col="g")
        sinks.upsert(spark, b, _df(spark, [(6, 60, 0)]), ["k", "g"],
                     partition_col="g")
    sinks.abort_pending_transaction(ctx)
    assert _count(spark, a) == 1
    # b was BORN inside the aborted txn: no committed version at all
    ver, man = sinks._latest_manifest(b)
    assert ver is None and man is None
    with pytest.raises(sinks.TransactionAbortedError):
        sinks.commit_pending_transaction(ctx)
    # a table whose only versions are aborted accepts a fresh commit
    sinks.upsert(spark, b, _df(spark, [(7, 70, 0)]), ["k", "g"],
                 partition_col="g")
    assert _count(spark, b) == 1


def test_streaming_source_skips_aborted_versions(spark, tmp_path):
    """The readStream source (planner runs in a JVM-less Python
    worker — cross-process outcome resolution) delivers committed
    appends only: an aborted txn version inside the offset range
    yields nothing, and the next committed version diffs against the
    last COMMITTED predecessor, not the aborted slot."""
    from etl_stocks_with_sentiment_analysis_spark.streaming.source import (
        register_manifest_stream_source,
    )

    register_manifest_stream_source(spark)
    t = str(tmp_path / "tbl")
    sinks.upsert(spark, t, _df(spark, [(1, 10, 0)]), ["k", "g"],
                 partition_col="g")  # v0
    outcome = sinks._txn_mirror_path(t, "txn-stream-1")
    with sinks.pending_transaction("txn-stream-1", outcome) as ctx:
        sinks.upsert(spark, t, _df(spark, [(2, 20, 1)]), ["k", "g"],
                     partition_col="g")  # v1, will abort
    sinks.abort_pending_transaction(ctx)
    sinks.upsert(spark, t, _df(spark, [(3, 30, 2)]), ["k", "g"],
                 partition_col="g")  # v2, committed
    stream = (
        spark.readStream.format("manifest_stream")
        .option("path", t).option("startingVersion", "0").load()
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["k"], r["v"], r["g"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 10, 0), (3, 30, 2)}  # aborted (2,20,1) skipped


def test_pending_txn_defers_gc_and_checkpoint(spark, tmp_path):
    """A pending publish must not move the reader checkpoint pointer
    (readers would aim at an invisible version) and must not GC —
    the pre-txn snapshots are still the table's live data if the
    transaction aborts."""
    a = str(tmp_path / "a")
    sinks.upsert(spark, a, _df(spark, [(1, 10, 0)]), ["k", "g"],
                 partition_col="g")
    ck0 = sinks._read_checkpoint(a)
    snaps0 = {
        e.name for e in fsio.list_status(a) if e.name.startswith("snap-")
    }
    outcome = sinks._txn_mirror_path(a, "txn-gc-1")
    with sinks.pending_transaction("txn-gc-1", outcome) as ctx:
        sinks.upsert(spark, a, _df(spark, [(1, 11, 0)]), ["k", "g"],
                     partition_col="g")  # rewrites partition g=0
    assert sinks._read_checkpoint(a) == ck0  # pointer unmoved
    snaps1 = {
        e.name for e in fsio.list_status(a) if e.name.startswith("snap-")
    }
    assert snaps0 <= snaps1  # nothing GC'd while pending
    sinks.commit_pending_transaction(ctx)
    assert sinks._read_checkpoint(a) == ctx["published"][0][1]
    got = {
        (r["k"], r["v"])
        for r in sinks.read_manifest_table(spark, a).collect()
    }
    assert got == {(1, 11)}


def test_txn_backfill_shape_delete_two_tables_atomically(spark, tmp_path):
    """The reference's backfill clears TWO tables inside one
    transaction (`backfill.py:39-44`: DELETE FROM grok_explanations;
    DELETE FROM stock_prices; conn.commit()). Same statements here:
    both clears invisible until COMMIT, then both land together."""
    from etl_stocks_with_sentiment_analysis_spark.operators import sqldml

    spark.conf.set("spark.manifest_sql.warehouse", str(tmp_path / "wh"))
    run = lambda s, p=None: sqldml.execute_sql(spark, s, params=p)
    run("CREATE SCHEMA IF NOT EXISTS bf")
    run("CREATE TABLE bf.prices (k BIGINT, v BIGINT)")
    run("CREATE TABLE bf.grok (k BIGINT, v BIGINT)")
    run("INSERT INTO bf.prices VALUES (1, 10), (2, 20)")
    run("INSERT INTO bf.grok VALUES (1, 11)")
    run("BEGIN")
    run("DELETE FROM bf.grok")
    run("DELETE FROM bf.prices")
    # read-your-own-writes (r13): THIS session's reads see the
    # buffered clears; the committed state is untouched until COMMIT
    assert run("SELECT COUNT(*) AS n FROM bf.prices").collect()[0]["n"] == 0
    assert run("SELECT COUNT(*) AS n FROM bf.grok").collect()[0]["n"] == 0
    from etl_stocks_with_sentiment_analysis_spark.operators import sinks

    assert sinks.count_manifest_table(
        sqldml._resolve_table("bf.prices")
    ) == 2
    assert sinks.count_manifest_table(sqldml._resolve_table("bf.grok")) == 1
    run("COMMIT")
    assert run("SELECT COUNT(*) AS n FROM bf.prices").collect()[0]["n"] == 0
    assert run("SELECT COUNT(*) AS n FROM bf.grok").collect()[0]["n"] == 0


def test_txn_statement_order_and_update(spark, tmp_path):
    """Mixed-kind transactions execute in statement order (each
    statement sees its predecessors' staged effects), including
    UPDATE: INSERT-then-DELETE removes the row, DELETE-then-INSERT
    keeps it, UPDATE rewrites staged rows — all atomically in one
    outcome flip, with per-kind commits grouped."""
    from etl_stocks_with_sentiment_analysis_spark.operators import sqldml

    spark.conf.set("spark.manifest_sql.warehouse", str(tmp_path / "wh"))
    run = lambda s, p=None: sqldml.execute_sql(spark, s, params=p)
    run("CREATE SCHEMA IF NOT EXISTS so")
    run("CREATE TABLE so.t (k BIGINT, v BIGINT, UNIQUE(k))")
    run("INSERT INTO so.t VALUES (1, 10), (2, 20)")
    run("BEGIN")
    run("INSERT INTO so.t VALUES (3, 30), (4, 40)")  # staged
    run("DELETE FROM so.t WHERE k IN (1, 3)")        # kills seeded+staged
    run("INSERT INTO so.t VALUES (5, 50)")           # after the delete
    run("UPDATE so.t SET v = v + 1 WHERE k >= 4")    # staged rows too
    run("COMMIT")
    got = {
        (r["k"], r["v"]) for r in run("SELECT k, v FROM so.t").collect()
    }
    assert got == {(2, 20), (4, 41), (5, 51)}
    # ROLLBACK of buffered UPDATE/DELETE leaves no trace
    run("BEGIN")
    run("DELETE FROM so.t")
    run("UPDATE so.t SET v = 0 WHERE true")
    run("ROLLBACK")
    assert run("SELECT COUNT(*) AS n FROM so.t").collect()[0]["n"] == 3
    # transactional clear-and-reload (TRUNCATE + INSERT, the Postgres
    # pattern): this session's mid-txn SELECT sees the reloaded state
    # (read-your-own-writes, r13 — the verification-SELECT shape);
    # committed state swaps atomically at COMMIT
    run("BEGIN")
    run("TRUNCATE TABLE so.t")
    run("INSERT INTO so.t VALUES (9, 90)")
    assert run("SELECT COUNT(*) AS n FROM so.t").collect()[0]["n"] == 1
    run("COMMIT")
    got = {
        (r["k"], r["v"]) for r in run("SELECT k, v FROM so.t").collect()
    }
    assert got == {(9, 90)}
    # single-statement single-table txn still takes the direct path
    # (no _txn dir materialized by it — the earlier multi-commit
    # transactions on so.t DID create one, so check a fresh table)
    run("CREATE TABLE so.solo (k BIGINT)")
    run("BEGIN")
    run("INSERT INTO so.solo VALUES (1)")
    run("COMMIT")
    solo = sqldml._resolve_table("so.solo")
    assert not fsio.exists(
        os.path.join(solo, sinks._LOG_DIR, sinks._TXN_DIR)
    )
    assert run("SELECT COUNT(*) AS n FROM so.solo").collect()[0]["n"] == 1


def test_concurrent_multi_table_txn_fuzz(spark, tmp_path, monkeypatch):
    """3 writers x 8 ops race TWO tables with a mix of multi-table
    BEGIN/COMMIT transactions (SQL text), plain single-table SQL
    upserts, and ZOMBIE transactions (pending scope abandoned without
    an outcome — the crashed-committer shape, which other writers must
    force-abort in their way). Writers own disjoint key ranges so
    committed ops replay per-writer-sequentially; the final state of
    BOTH tables must equal the model built from successfully COMMITTED
    ops alone — any half-landed transaction or any zombie row breaks
    the equality."""
    import random
    import threading

    from etl_stocks_with_sentiment_analysis_spark.operators import sqldml

    monkeypatch.setattr(sinks, "_TXN_RESOLVE_WAIT_SECONDS", 0.3)
    monkeypatch.setattr(sinks, "_RETAIN_VERSIONS", 64)
    spark.conf.set(
        "spark.manifest_sql.warehouse", str(tmp_path / "wh")
    )
    run = lambda s, p=None: sqldml.execute_sql(spark, s, params=p)
    run("CREATE SCHEMA IF NOT EXISTS fzm")
    run("DROP TABLE IF EXISTS fzm.a")
    run("DROP TABLE IF EXISTS fzm.b")
    run("CREATE TABLE fzm.a (k BIGINT, v BIGINT, UNIQUE(k))")
    run("CREATE TABLE fzm.b (k BIGINT, v BIGINT, UNIQUE(k))")
    ta = sqldml._resolve_table("fzm.a")
    tb = sqldml._resolve_table("fzm.b")
    n_writers, n_ops = 3, 8
    errors: list[str] = []
    logs: list[list[tuple]] = [[] for _ in range(n_writers)]
    upd = (
        "INSERT INTO fzm.{t} (k, v) VALUES {vals} "
        "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v"
    )

    def worker(wid: int) -> None:
        rng = random.Random(1200 + wid)
        for seq in range(n_ops):
            op_id = wid * 1000 + seq
            ks = sorted({wid * 100 + rng.randint(1, 9) for _ in range(2)})
            kind = rng.choice(["txn", "txn", "plain_a", "plain_b",
                               "zombie", "txn_mixed"])
            try:
                if kind == "txn_mixed":
                    # transactional DELETE+UPSERT across both tables
                    # (r12b statement groups): delete one of the
                    # writer's keys from b, upsert into a — atomic
                    run("BEGIN")
                    try:
                        run(f"DELETE FROM fzm.b WHERE k = {ks[0]}")
                        run(upd.format(
                            t="a", vals=f"({ks[0]}, {op_id})"
                        ))
                        # read-your-own-writes UNDER CONCURRENCY
                        # (r13): this writer's keys are disjoint, so
                        # its in-txn reads must equal its own buffer
                        # regardless of other writers' commits racing
                        got_a = run(
                            f"SELECT v FROM fzm.a WHERE k = {ks[0]}"
                        ).collect()
                        assert [r["v"] for r in got_a] == [op_id], got_a
                        got_b = run(
                            "SELECT COUNT(*) AS n FROM fzm.b "
                            f"WHERE k = {ks[0]}"
                        ).collect()[0]["n"]
                        assert got_b == 0, got_b
                        run("COMMIT")
                    except sinks.TransactionAbortedError:
                        continue
                    except Exception:
                        if sqldml._current_txn() is not None:
                            run("ROLLBACK")
                        raise
                    logs[wid].append(("mixed", [ks[0]], None, op_id))
                elif kind == "txn":
                    vals_a = ", ".join(f"({k}, {op_id})" for k in ks)
                    vals_b = ", ".join(
                        f"({k}, {op_id})" for k in ks[:1]
                    )
                    run("BEGIN")
                    try:
                        run(upd.format(t="a", vals=vals_a))
                        run(upd.format(t="b", vals=vals_b))
                        run("COMMIT")
                    except sinks.TransactionAbortedError:
                        continue  # atomic no-op: nothing landed
                    except Exception:
                        if sqldml._current_txn() is not None:
                            run("ROLLBACK")
                        raise
                    logs[wid].append(("txn", ks, ks[:1], op_id))
                elif kind == "zombie":
                    zid = f"zombie-{wid}-{seq}"
                    outcome = sinks._txn_mirror_path(ta, zid)
                    df = spark.createDataFrame(
                        [(k, 10**9 + op_id) for k in ks],
                        "k BIGINT, v BIGINT",
                    )
                    with sinks.pending_transaction(zid, outcome):
                        sinks.upsert(spark, ta, df, ["k"])
                    # abandoned: no outcome published, ever
                else:
                    t = "a" if kind == "plain_a" else "b"
                    vals = ", ".join(f"({k}, {op_id})" for k in ks)
                    run(upd.format(t=t, vals=vals))
                    logs[wid].append((f"set_{t}", ks, None, op_id))
            except sinks.ManifestConflictError:
                continue  # lost every CAS retry: clean no-op
            except Exception as e:  # noqa: BLE001 - fuzz collects all
                errors.append(f"w{wid}#{seq} {kind}: {e!r}")

    threads = [
        threading.Thread(target=worker, args=(w,))
        for w in range(n_writers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    model_a: dict[int, int] = {}
    model_b: dict[int, int] = {}
    for wid in range(n_writers):
        for kind, ks, ks_b, op_id in logs[wid]:
            if kind == "txn":
                for k in ks:
                    model_a[k] = op_id
                for k in ks_b:
                    model_b[k] = op_id
            elif kind == "mixed":
                model_b.pop(ks[0], None)
                model_a[ks[0]] = op_id
            elif kind == "set_a":
                for k in ks:
                    model_a[k] = op_id
            else:
                for k in ks:
                    model_b[k] = op_id
    _fresh_outcome_view()
    final_a = {
        r["k"]: r["v"] for r in run("SELECT k, v FROM fzm.a").collect()
    }
    final_b = {
        r["k"]: r["v"] for r in run("SELECT k, v FROM fzm.b").collect()
    }
    assert final_a == model_a
    assert final_b == model_b
    assert not any(v >= 10**9 for v in final_a.values())  # no zombies
    # histories contain committed versions only
    for tgt in (ta, tb):
        for r in sinks.manifest_table_history(spark, tgt).collect():
            assert sinks._version_is_committed(tgt, r["version"])


def test_information_schema_and_show_tables(spark, tmp_path):
    """Introspection edges: the rewriter never touches string
    literals; view columns resolve; DESCRIBE HISTORY's committed_at
    rides along; ANALYZE routes to commit-time stats."""
    from etl_stocks_with_sentiment_analysis_spark.operators import sqldml

    spark.conf.set("spark.manifest_sql.warehouse", str(tmp_path / "wh"))
    run = lambda s, p=None: sqldml.execute_sql(spark, s, params=p)
    run("CREATE SCHEMA IF NOT EXISTS isx")
    run("CREATE TABLE isx.t (a BIGINT, b TEXT)")
    run("CREATE OR REPLACE VIEW isx.w AS SELECT a FROM isx.t")
    cols = {
        (r["column_name"], r["data_type"])
        for r in run(
            "SELECT column_name, data_type FROM information_schema.columns "
            "WHERE table_schema = 'isx' AND table_name = 't'"
        ).collect()
    }
    assert cols == {("a", "bigint"), ("b", "string")}
    vcols = [
        r["column_name"]
        for r in run(
            "SELECT column_name FROM information_schema.columns "
            "WHERE table_schema = 'isx' AND table_name = 'w'"
        ).collect()
    ]
    assert vcols == ["a"]
    # a string literal containing the phrase is data, not a reference
    got = run(
        "SELECT 'information_schema.tables' AS s"
    ).collect()[0]["s"]
    assert got == "information_schema.tables"
    hist = run("DESCRIBE HISTORY isx.t")
    assert "committed_at" in hist.columns
    assert hist.filter("committed_at IS NOT NULL").count() == hist.count()


def test_timestamp_as_of(spark, tmp_path):
    """TIMESTAMP AS OF: resolves the newest committed version at or
    before the instant, skips aborted transaction slots, errors
    before the first commit, and RESTORE TO TIMESTAMP AS OF rolls
    back through the same resolution."""
    import datetime
    import time

    from etl_stocks_with_sentiment_analysis_spark.operators import sqldml

    t = str(tmp_path / "t")
    sinks.upsert(spark, t, _df(spark, [(1, 10, 0)]), ["k", "g"],
                 partition_col="g")  # v0
    time.sleep(0.05)
    t_mid = time.time()
    time.sleep(0.05)
    # aborted txn version occupies v1 AFTER t_mid
    with sinks.pending_transaction(
        "tt-ts-1", sinks._txn_mirror_path(t, "tt-ts-1")
    ) as ctx:
        sinks.upsert(spark, t, _df(spark, [(2, 20, 0)]), ["k", "g"],
                     partition_col="g")
    sinks.abort_pending_transaction(ctx)
    sinks.upsert(spark, t, _df(spark, [(3, 30, 1)]), ["k", "g"],
                 partition_col="g")  # v2
    assert sinks.version_at_timestamp(t, t_mid) == 0
    assert sinks.version_at_timestamp(t, time.time()) == 2  # skips v1
    with pytest.raises(ValueError, match="no committed version"):
        sinks.version_at_timestamp(t, t_mid - 3600)
    got = {
        (r["k"], r["v"])
        for r in sinks.read_manifest_table(
            spark, t, timestamp=t_mid
        ).collect()
    }
    assert got == {(1, 10)}
    with pytest.raises(ValueError, match="version OR timestamp"):
        sinks.read_manifest_table(spark, t, version=0, timestamp=t_mid)
    # datetime and ISO-string spellings resolve identically
    iso = (
        datetime.datetime.fromtimestamp(t_mid, datetime.timezone.utc)
        .replace(tzinfo=None).isoformat()
    )
    assert sinks.version_at_timestamp(t, iso) == 0
    # SQL: RESTORE TABLE ... TO TIMESTAMP AS OF rolls back to v0
    spark.conf.set("spark.manifest_sql.warehouse", str(tmp_path / "wh"))
    sqldml.bind_sql_table(spark, "tt.t", t)
    sqldml.execute_sql(
        spark, f"RESTORE TABLE tt.t TO TIMESTAMP AS OF '{iso}'"
    )
    got = {
        (r["k"], r["v"])
        for r in sinks.read_manifest_table(spark, t).collect()
    }
    assert got == {(1, 10)}


def test_cli_table_snapshot(spark, tmp_path, capsys):
    """`table snapshot <a> <b>` prints a consistent pin per table;
    single-target actions refuse several paths."""
    from etl_stocks_with_sentiment_analysis_spark.__main__ import main

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    with sinks.transaction():
        sinks.upsert(spark, a, _df(spark, [(1, 10, 0)]), ["k", "g"],
                     partition_col="g")
        sinks.upsert(spark, b, _df(spark, [(5, 50, 0)]), ["k", "g"],
                     partition_col="g")
    assert main(["table", "snapshot", a, b]) in (None, 0)
    out = capsys.readouterr().out
    assert f"{a} @ version 0" in out and f"{b} @ version 0" in out
    assert main(["table", "count", a, b]) == 1
    assert "only `snapshot`" in capsys.readouterr().out


def test_crash_between_outcome_and_mirrors(spark, tmp_path, monkeypatch):
    """The one crash window the mirrors leave open: the committer dies
    AFTER the canonical outcome CAS but BEFORE mirroring/checkpoints.
    The transaction must still be COMMITTED everywhere — resolution
    falls through to the canonical path and re-mirrors locally."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    outcome = sinks._txn_mirror_path(a, "txn-mirror-crash")
    with sinks.pending_transaction("txn-mirror-crash", outcome) as ctx:
        sinks.upsert(spark, a, _df(spark, [(1, 10, 0)]), ["k", "g"],
                     partition_col="g")
        sinks.upsert(spark, b, _df(spark, [(5, 50, 0)]), ["k", "g"],
                     partition_col="g")
    real = sinks._write_outcome_if_absent
    calls = {"n": 0}

    def die_after_canonical(path, text):
        real(path, text)
        calls["n"] += 1
        raise KeyboardInterrupt("simulated kill after outcome CAS")

    monkeypatch.setattr(sinks, "_write_outcome_if_absent",
                        die_after_canonical)
    with pytest.raises(KeyboardInterrupt):
        sinks.commit_pending_transaction(ctx)
    monkeypatch.undo()
    assert calls["n"] == 1  # canonical landed, mirrors did not
    _fresh_outcome_view()
    # b resolves committed via the CANONICAL outcome (its own mirror
    # never landed) and re-mirrors it locally on that first,
    # cache-cold resolution...
    assert _count(spark, b) == 1
    assert fsio.exists(sinks._txn_mirror_path(b, "txn-mirror-crash"))
    # ...and a (hosting the canonical file) resolves committed too
    assert _count(spark, a) == 1


def test_savepoints(spark, tmp_path):
    """SAVEPOINT / ROLLBACK TO / RELEASE over the transaction buffer:
    rollback-to discards later statements (including a later table's
    whole participation), the savepoint survives its own rollback,
    release destroys later savepoints but keeps statements."""
    from etl_stocks_with_sentiment_analysis_spark.operators import sqldml

    spark.conf.set("spark.manifest_sql.warehouse", str(tmp_path / "wh"))
    run = lambda s, p=None: sqldml.execute_sql(spark, s, params=p)
    run("CREATE SCHEMA IF NOT EXISTS sv")
    run("CREATE TABLE sv.a (k BIGINT, v BIGINT)")
    run("CREATE TABLE sv.b (k BIGINT)")
    with pytest.raises(ValueError, match="outside"):
        run("SAVEPOINT s1")
    run("BEGIN")
    run("INSERT INTO sv.a VALUES (1, 10)")
    run("SAVEPOINT s1")
    run("INSERT INTO sv.a VALUES (2, 20)")
    run("INSERT INTO sv.b VALUES (9)")     # b joins after s1
    run("SAVEPOINT s2")
    run("INSERT INTO sv.a VALUES (3, 30)")
    run("ROLLBACK TO SAVEPOINT s1")        # drops (2,20), b, (3,30), s2
    with pytest.raises(ValueError, match="no such savepoint"):
        run("ROLLBACK TO SAVEPOINT s2")
    run("INSERT INTO sv.a VALUES (4, 40)")
    run("ROLLBACK TO s1")                  # s1 survives its own rollback
    run("INSERT INTO sv.a VALUES (5, 50)")
    run("RELEASE SAVEPOINT s1")            # statements kept, s1 gone
    with pytest.raises(ValueError, match="no such savepoint"):
        run("ROLLBACK TO s1")
    run("COMMIT")
    got = {(r["k"], r["v"]) for r in run("SELECT k, v FROM sv.a").collect()}
    assert got == {(1, 10), (5, 50)}
    assert run("SELECT COUNT(*) AS n FROM sv.b").collect()[0]["n"] == 0


def test_snapshot_closure_repairs_torn_pins(spark, tmp_path):
    """snapshot_tables' transaction closure: a pin set captured
    mid-outcome-flip (table A pinned AT its txn version, table B
    pinned BEFORE its participation) is raised to include the whole
    transaction — the outcome payload names every participant."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    sinks.upsert(spark, a, _df(spark, [(1, 10, 0)]), ["k", "g"],
                 partition_col="g")  # a@0
    sinks.upsert(spark, b, _df(spark, [(5, 50, 0)]), ["k", "g"],
                 partition_col="g")  # b@0
    with sinks.transaction():
        sinks.upsert(spark, a, _df(spark, [(2, 20, 0)]), ["k", "g"],
                     partition_col="g")  # a@1
        sinks.upsert(spark, b, _df(spark, [(6, 60, 0)]), ["k", "g"],
                     partition_col="g")  # b@1
    # simulate the mid-flip capture: A at its txn version, B before
    torn = {a: 1, b: 0}
    closed = sinks._close_snapshot_over_txns(dict(torn))
    assert closed == {a: 1, b: 1}
    # and the public API returns a consistent, closed cut
    pins = sinks.snapshot_tables([a, b])
    assert pins == {a: 1, b: 1}
    got_b = {
        (r["k"], r["v"])
        for r in sinks.read_manifest_table(
            spark, b, version=pins[b]
        ).collect()
    }
    assert got_b == {(5, 50), (6, 60)}


def test_transaction_context_manager_api(spark, tmp_path):
    """sinks.transaction() — the Python-API BEGIN/COMMIT: normal exit
    commits every staged table atomically (coordinator elected
    lazily from the first commit); an exception aborts them all."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    with sinks.transaction():
        sinks.upsert(spark, a, _df(spark, [(1, 10, 0)]), ["k", "g"],
                     partition_col="g")
        sinks.upsert(spark, b, _df(spark, [(5, 50, 0)]), ["k", "g"],
                     partition_col="g")
        # r13: the OWNER reads its own staged commit; other threads
        # would still resolve (None, None) until the outcome CAS
        assert _count(spark, a) == 1
        seen: list = []
        th = threading.Thread(
            target=lambda: seen.append(sinks._latest_manifest(a))
        )
        th.start()
        th.join()
        assert seen == [(None, None)]  # invisible to other sessions
    assert _count(spark, a) == 1 and _count(spark, b) == 1
    with pytest.raises(RuntimeError, match="boom"):
        with sinks.transaction():
            sinks.upsert(spark, a, _df(spark, [(2, 20, 0)]), ["k", "g"],
                         partition_col="g")
            raise RuntimeError("boom")
    _fresh_outcome_view()
    assert _count(spark, a) == 1  # aborted with the exception
    # an empty scope is a no-op (no outcome file, no error)
    with sinks.transaction():
        pass


def test_repair_never_uses_aborted_txn_versions(
    spark, tmp_path, monkeypatch
):
    """FSCK repair must not resurrect an aborted transaction's state:
    repairing a rotted version duplicates the newest COMMITTED version
    below it, skipping aborted slots; an unresolved pending found by
    repair (crashed committer, offline by contract) is resolved to
    aborted, not treated as corruption."""
    monkeypatch.setattr(sinks, "_TXN_RESOLVE_WAIT_SECONDS", 0.2)
    t = str(tmp_path / "t")
    sinks.upsert(spark, t, _df(spark, [(1, 10, 0)]), ["k", "g"],
                 partition_col="g")  # v0
    outcome = sinks._txn_mirror_path(t, "txn-rep-1")
    with sinks.pending_transaction("txn-rep-1", outcome):
        sinks.upsert(spark, t, _df(spark, [(2, 20, 0)]), ["k", "g"],
                     partition_col="g")  # v1, crash: never resolved
    sinks.upsert(spark, t, _df(spark, [(3, 30, 1)]), ["k", "g"],
                 partition_col="g")  # v2 (force-aborts v1 in its way)
    # rot v2's manifest bytes
    with open(
        os.path.join(t, sinks._LOG_DIR, sinks._manifest_name(2)), "w"
    ) as fh:
        fh.write("{ rotted")
    repaired = sinks.repair_manifest_table(t)
    assert repaired == [2]
    got = {
        (r["k"], r["v"])
        for r in sinks.read_manifest_table(spark, t).collect()
    }
    # duplicate of COMMITTED v0 — the aborted v1's (2,20) must NOT
    # reappear (v2's own (3,30) is lost with its bytes, documented)
    assert got == {(1, 10)}
    assert not sinks._version_is_committed(t, 1)

    # unresolved pending alone: repair resolves it to aborted and
    # reports nothing corrupt
    u = str(tmp_path / "u")
    sinks.upsert(spark, u, _df(spark, [(1, 10, 0)]), ["k", "g"],
                 partition_col="g")
    with sinks.pending_transaction(
        "txn-rep-2", sinks._txn_mirror_path(u, "txn-rep-2")
    ):
        sinks.upsert(spark, u, _df(spark, [(2, 20, 0)]), ["k", "g"],
                     partition_col="g")
    assert sinks.repair_manifest_table(u) == []
    _fresh_outcome_view()
    assert not sinks._version_is_committed(u, 1)
    assert _count(spark, u) == 1


def test_single_table_paths_untouched(spark, tmp_path):
    """No pending context: commits write no pending_txn stamp and the
    resolver's fast path takes the no-key shortcut."""
    a = str(tmp_path / "a")
    sinks.upsert(spark, a, _df(spark, [(1, 10, 0)]), ["k", "g"],
                 partition_col="g")
    ver, _ = sinks._latest_manifest(a)
    raw = sinks._read_manifest_version(a, ver)
    assert "pending_txn" not in raw
    assert sinks._txn_visibility(a, raw) == "committed"
    assert not fsio.exists(
        os.path.join(a, sinks._LOG_DIR, sinks._TXN_DIR)
    )
