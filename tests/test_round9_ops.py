"""Round-9 tests: the r8 ADVICE fixes (foreign non-padded manifest
names, repaired_from leak through metadata-only commits, base-cache
eviction race, rename-guard URI false positives) plus the round's
feature work (SQL addressability, multi-column partitioning,
manifest-by-default commits)."""

import json
import os
import threading

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


# --- ADVICE r8: foreign non-padded manifest names --------------------


def test_foreign_nonpadded_manifest_name_resolves(spark, rows, tmp_path):
    """A foreign tool appends `manifest-3.json` (no zero padding).
    The listing must reopen the version by its MATCHED name — the old
    code re-derived the padded canonical name, read _ABSENT, silently
    resolved an older version, and the next commit would permanently
    shadow the foreign commit."""
    target = str(tmp_path / "sink")
    for i in range(3):
        batch = spark.createDataFrame(
            [(1, "2024-01-01", f"v{i}")], "ticker INT, date STRING, val STRING"
        )
        sinks.upsert(spark, target, batch, ["ticker", "date"],
                     commit_mode="manifest")
    ver, man = sinks._latest_manifest(target)
    assert ver == 2
    # foreign writer: duplicate the folded latest state as version 3
    # under a NON-padded name, and (like any foreign writer) does not
    # refresh our pointer
    dup = json.loads(json.dumps(man))
    dup["version"] = 3
    fsio.write_text(
        fsio.join(target, sinks._LOG_DIR, "manifest-3.json"),
        json.dumps(dup, indent=1, sort_keys=True),
    )
    os.remove(os.path.join(target, sinks._CHECKPOINT_NAME))
    ver2, man2 = sinks._latest_manifest(target)
    assert ver2 == 3 and man2["version"] == 3
    # by-version read also finds it via the recorded alias
    assert isinstance(sinks._read_manifest_version(target, 3), dict)
    # the next commit lands ABOVE the foreign version, never shadowing
    nxt = spark.createDataFrame(
        [(9, "2024-01-09", "new")], "ticker INT, date STRING, val STRING"
    )
    sinks.upsert(spark, target, nxt, ["ticker", "date"],
                 commit_mode="manifest")
    ver3, _ = sinks._latest_manifest(target)
    assert ver3 == 4
    assert (9, "2024-01-09", "new") in _mread(spark, target)


# --- ADVICE r8: repaired_from must not leak through metadata commits --


def test_metadata_commit_strips_repaired_marker(spark, rows, tmp_path):
    """After repairing a rotted LATEST version, a subsequent
    metadata-only commit must not inherit `repaired_from` — history
    would show unrepaired versions as repaired."""
    target = str(tmp_path / "sink")
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 commit_mode="manifest")
    batch = spark.createDataFrame(
        [(1, "2024-01-01", "z")], "ticker INT, date STRING, val STRING"
    )
    sinks.upsert(spark, target, batch, ["ticker", "date"],
                 commit_mode="manifest")
    # rot the latest version's bytes, then repair
    p = fsio.join(target, sinks._LOG_DIR, sinks._manifest_name(1))
    fsio.write_text(p, "{this is not json", sync=False)
    assert sinks.repair_manifest_table(target) == [1]
    _, man = sinks._latest_manifest(target)
    assert man.get("repaired_from") == 0
    # metadata-only commit on top: marker must NOT propagate
    new = sinks._commit_metadata_only(target, lambda m: None)
    assert "repaired_from" not in new
    _, man2 = sinks._latest_manifest(target)
    assert man2["version"] == 2 and "repaired_from" not in man2


# --- ADVICE r8: base-cache eviction is thread-safe --------------------


def test_base_cache_concurrent_eviction():
    """Hammer _cache_base from many threads with the cache pinned at
    its max size — the unlocked pop(next(iter(...))) could raise
    'dictionary changed size during iteration' mid-commit."""
    sinks._BASE_STATE_CACHE.clear()
    errs: list[BaseException] = []

    def work(tid: int) -> None:
        try:
            for i in range(2000):
                sinks._cache_base(f"t{tid}", i, {"v": i})
        except BaseException as e:  # noqa: BLE001 — recording for assert
            errs.append(e)

    threads = [threading.Thread(target=work, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(sinks._BASE_STATE_CACHE) <= sinks._BASE_STATE_CACHE_MAX
    sinks._BASE_STATE_CACHE.clear()


# --- ADVICE r8: rename guard only rejects real scheme'd URIs ----------


def test_rename_guard_accepts_colon_paths(spark, rows, tmp_path):
    """A local path whose segment contains a colon is not a URI."""
    target = str(tmp_path / "out:v2" / "tbl")
    sinks.upsert(spark, target, rows, ["ticker", "date"],
                 commit_mode="rename")
    got = {tuple(r) for r in spark.read.parquet(target).collect()}
    assert (1, "2024-01-01", "a") in got and len(got) == 3


def test_rename_guard_still_rejects_real_uris(spark, rows, tmp_path):
    with pytest.raises(ValueError, match="scheme'd URI"):
        sinks.upsert(spark, "file:///tmp/never/lands", rows,
                     ["ticker", "date"], commit_mode="rename")
    with pytest.raises(ValueError, match="scheme'd URI"):
        sinks.upsert(spark, "s3://bucket/tbl", rows,
                     ["ticker", "date"], commit_mode="rename")


# --- r9: SQL addressability (register_manifest_view) ------------------


def test_register_manifest_view_lifecycle(spark, tmp_path):
    """Register -> SQL reads v0; a new commit is invisible to the
    stale view (pinned snapshot) but visible after re-registration;
    version= pins time travel."""
    target = str(tmp_path / "tbl")
    v0 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "id INT, p STRING, v INT"
    )
    sinks.upsert(spark, target, v0, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    sinks.register_manifest_view(spark, target, "r9_view")
    assert spark.sql("SELECT SUM(v) AS s FROM r9_view").collect()[0]["s"] == 60
    inc = spark.createDataFrame([(4, "b", 40)], "id INT, p STRING, v INT")
    sinks.upsert(spark, target, inc, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    # stale view still reads its pinned version
    assert spark.sql("SELECT SUM(v) AS s FROM r9_view").collect()[0]["s"] == 60
    # re-registration tracks the new commit
    sinks.register_manifest_view(spark, target, "r9_view")
    assert spark.sql("SELECT SUM(v) AS s FROM r9_view").collect()[0]["s"] == 100
    # explicit version= is SQL time travel
    sinks.register_manifest_view(spark, target, "r9_view_v0", version=0)
    assert (
        spark.sql("SELECT SUM(v) AS s FROM r9_view_v0").collect()[0]["s"] == 60
    )
    with pytest.raises(ValueError):
        sinks.register_manifest_view(spark, str(tmp_path / "nope"), "r9_none")


def test_register_manifest_view_bounds_prune_files(spark, tmp_path):
    """A bounds-scoped view references strictly fewer files than the
    unscoped view (stats-based skipping happens at resolve time, so
    it is visible in inputFiles), and returns exactly the in-bounds
    rows."""
    target = str(tmp_path / "tbl")
    rows = [(i, f"p{i % 4}", i * 10) for i in range(64)]
    df = spark.createDataFrame(rows, "id INT, p STRING, v INT")
    sinks.upsert(spark, target, df, ["id", "p"], commit_mode="manifest")
    # the r15 rebalanced write coalesces a tiny commit to one file
    # (nothing left for FILE-level skipping to prove); compact into
    # the layout file skipping exists for — unpartitioned, clustered
    # on the bounded column, several tight-range stat-carrying files
    sinks.compact_manifest_table(
        spark, target, rows_per_file=8, cluster_by=["v"]
    )
    full = sinks.register_manifest_view(spark, target, "r9_full")
    scoped = sinks.register_manifest_view(
        spark, target, "r9_scoped", bounds={"v": (0, 50)}
    )
    assert 0 < len(scoped.inputFiles()) < len(full.inputFiles())
    got = {
        r["id"] for r in spark.sql("SELECT id FROM r9_scoped").collect()
    }
    assert got == {i for i in range(64) if 0 <= i * 10 <= 50}


def test_register_manifest_view_sql_partition_filter(spark, tmp_path):
    """A WHERE on the partition column written in SQL becomes a real
    PartitionFilter in the scan (the reader restores the partition
    column via Spark partition discovery, not a literal)."""
    target = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"p{i % 4}", i) for i in range(16)], "id INT, p STRING, v INT"
    )
    sinks.upsert(spark, target, df, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    sinks.register_manifest_view(spark, target, "r9_pf")
    q = spark.sql("SELECT SUM(v) AS s FROM r9_pf WHERE p = 'p1'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "p1" in plan
    assert q.collect()[0]["s"] == sum(i for i in range(16) if i % 4 == 1)


# --- r9: manifest is the default commit mode ---------------------------


def test_default_commit_mode_is_manifest(spark, rows, tmp_path):
    """An upsert with no commit_mode lands on the ACID path: the
    manifest log exists, read_manifest_table round-trips, a second
    identical upsert is idempotent, and txn= is accepted."""
    target = str(tmp_path / "tbl")
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    assert os.path.isdir(os.path.join(target, sinks._LOG_DIR))
    assert sinks._latest_manifest(target)[0] == 0
    sinks.upsert(spark, target, rows, ["ticker", "date"])
    assert sinks.read_manifest_table(spark, target).count() == 3
    # txn works without naming a mode (it requires manifest mode)
    sinks.upsert(spark, target, rows, ["ticker", "date"], txn=("app", 0))


# --- r9: multi-column partitioning -------------------------------------


@pytest.fixture()
def mc_rows(spark):
    return spark.createDataFrame(
        [
            (1, 1, "web", 10),
            (2, 1, "app", 20),
            (3, 2, "web", 30),
            (4, 2, "app", 40),
            (5, 2, None, 50),
        ],
        "id INT, wk INT, src STRING, v INT",
    )


def _mc_target(tmp_path, spark, mc_rows):
    target = str(tmp_path / "tbl")
    sinks.upsert(spark, target, mc_rows, ["id", "wk", "src"],
                 partition_col=["wk", "src"], commit_mode="manifest")
    return target


def test_multicol_commit_roundtrip_and_keys(spark, mc_rows, tmp_path):
    """Two-level layout: entry keys are nested wk=../src=.. paths, the
    NULL partition value round-trips, and the read restores both
    columns typed."""
    target = _mc_target(tmp_path, spark, mc_rows)
    _, man = sinks._latest_manifest(target)
    assert man["partition_cols"] == ["wk", "src"]
    assert man["partition_types"] == {"wk": "int", "src": "string"}
    assert all("/" in k and k.startswith("wk=") for k in man["partitions"])
    got = _mread(spark, target)
    assert got == {(1, 1, "web", 10), (2, 1, "app", 20), (3, 2, "web", 30),
                   (4, 2, "app", 40), (5, 2, None, 50)}
    df = sinks.read_manifest_table(spark, target)
    assert dict(df.dtypes)["wk"] == "int" and dict(df.dtypes)["src"] == "string"


def test_multicol_upsert_scopes_to_touched_tuples(spark, mc_rows, tmp_path):
    """A second commit touching one (wk, src) combination carries
    every other entry forward BY REFERENCE — O(touched tuples)."""
    target = _mc_target(tmp_path, spark, mc_rows)
    inc = spark.createDataFrame(
        [(1, 1, "web", 99), (6, 1, "web", 60)], "id INT, wk INT, src STRING, v INT"
    )
    sinks.upsert(spark, target, inc, ["id", "wk", "src"],
                 partition_col=["wk", "src"], commit_mode="manifest")
    _, man = sinks._latest_manifest(target)
    rels = {k: rel.split("/", 1)[0] for k, rel in man["partitions"].items()}
    snaps = set(rels.values())
    assert len(snaps) == 2  # old snapshot still referenced
    # only the touched tuple's entry moved to the new snapshot
    moved = [k for k, s in rels.items() if s == max(snaps)]
    assert moved == ["wk=1/src=web"]
    got = _mread(spark, target)
    assert (1, 1, "web", 99) in got and (6, 1, "web", 60) in got
    assert (5, 2, None, 50) in got and len(got) == 6


def test_multicol_bounds_prune_each_level(spark, mc_rows, tmp_path):
    """Range bounds on either partition level prune entries from the
    partition map alone; results stay exact; NULL entries are skipped
    under a real bound."""
    target = _mc_target(tmp_path, spark, mc_rows)
    full = len(sinks.read_manifest_table(spark, target).inputFiles())
    bw = sinks.read_manifest_table(spark, target, bounds={"wk": (2, 2)})
    assert 0 < len(bw.inputFiles()) < full
    assert {r["id"] for r in bw.collect()} == {3, 4, 5}
    bs = sinks.read_manifest_table(spark, target, bounds={"src": ("web", "web")})
    assert 0 < len(bs.inputFiles()) < full
    assert {r["id"] for r in bs.collect()} == {1, 3}  # NULL src pruned
    both = sinks.read_manifest_table(
        spark, target, bounds={"wk": (2, 2), "src": ("web", "web")}
    )
    assert {r["id"] for r in both.collect()} == {3}


def test_multicol_delete_update_and_repartition(spark, mc_rows, tmp_path):
    target = _mc_target(tmp_path, spark, mc_rows)
    n = sinks.delete_from_manifest_table(spark, target, "v = 20")
    assert n == 1
    assert (2, 1, "app", 20) not in _mread(spark, target)
    n = sinks.update_manifest_table(spark, target, {"v": "v + 1"}, "id = 3")
    assert n == 1
    assert (3, 2, "web", 31) in _mread(spark, target)
    with pytest.raises(ValueError, match="partition column"):
        sinks.update_manifest_table(spark, target, {"wk": "wk + 1"}, "id = 3")
    # re-layout: two cols -> one col, then upserts must name the new one
    sinks.repartition_manifest_table(spark, target, "wk")
    _, man = sinks._latest_manifest(target)
    assert sinks._man_pcols(man) == ["wk"]
    with pytest.raises(ValueError, match="partitioning"):
        sinks.upsert(spark, target, mc_rows, ["id", "wk", "src"],
                     partition_col=["wk", "src"], commit_mode="manifest")
    # and one col -> two cols
    sinks.repartition_manifest_table(spark, target, ["src", "wk"])
    _, man = sinks._latest_manifest(target)
    assert sinks._man_pcols(man) == ["src", "wk"]
    got = _mread(spark, target)
    assert (3, 2, "web", 31) in got and (5, 2, None, 50) in got


def test_multicol_rename_mode_rejected(spark, mc_rows, tmp_path):
    with pytest.raises(ValueError, match="manifest"):
        sinks.upsert(spark, str(tmp_path / "t"), mc_rows, ["id", "wk", "src"],
                     partition_col=["wk", "src"], commit_mode="rename")


def test_multicol_schema_guards(spark, mc_rows, tmp_path):
    """Rename/drop refuse EITHER partition column; stats exclude both."""
    target = _mc_target(tmp_path, spark, mc_rows)
    sinks.compact_manifest_table(spark, target, rows_per_file=10)
    for c in ("wk", "src"):
        with pytest.raises(ValueError, match="partition column"):
            sinks.rename_manifest_column(target, c, "x")
        with pytest.raises(ValueError, match="partition column"):
            sinks.drop_manifest_column(target, c)
    _, man = sinks._latest_manifest(target)
    for st in (man.get("stats") or {}).values():
        assert "wk" not in st and "src" not in st


# --- r9: touched-key delta diff stays fold-equivalent ------------------


def test_delta_fast_diff_fold_equivalence(spark, tmp_path):
    """The touched-key-scoped delta encoder (r9) must fold to exactly
    the state a full diff would: across data commits, a full-state
    metadata edit (rename), and post-rename data commits (schema
    mismatch vs base -> full-scan fallback), every version's stats
    speak the CURRENT column names and dropped columns never
    resurrect."""
    target = str(tmp_path / "tbl")
    rows = spark.createDataFrame(
        [(i, f"p{i % 3}", i * 10) for i in range(9)],
        "id INT, p STRING, v INT",
    )
    sinks.upsert(spark, target, rows, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    inc = spark.createDataFrame([(0, "p0", 99)], "id INT, p STRING, v INT")
    sinks.upsert(spark, target, inc, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    # v1 is a delta touching one entry only
    raw1 = sinks._read_manifest_version(target, 1)
    assert raw1.get("format") == "delta"
    assert set(raw1["set"].get("partitions", {})) == {"p=p0"}
    # metadata edit: compact (records field ids), then rename v -> w.
    # The rename commit publishes a FULL state (entry stats move keys
    # without rels changing — outside the fast-diff contract).
    sinks.compact_manifest_table(spark, target, rows_per_file=100)
    sinks.rename_manifest_column(target, "v", "w")
    ver, man = sinks._latest_manifest(target)
    raw_ren = sinks._read_manifest_version(target, ver)
    assert raw_ren.get("format") != "delta"
    assert all("w" in st and "v" not in st for st in man["stats"].values())
    # post-rename data commit: schema differs from the delta base, so
    # the encoder full-scans — folded stats must carry the NEW name
    # for untouched entries too
    inc2 = spark.createDataFrame([(1, "p1", 7)], "id INT, p STRING, w INT")
    sinks.upsert(spark, target, inc2, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    ver2, man2 = sinks._latest_manifest(target)
    assert sinks._read_manifest_version(target, ver2).get("format") == "delta"
    assert all(
        "w" in st and "v" not in st for st in man2["stats"].values()
    ), "stale pre-rename stats leaked through the fast diff"
    got = {tuple(r) for r in
           sinks.read_manifest_table(spark, target).collect()}
    assert (1, "p1", 7) in got and (0, "p0", 99) in got and len(got) == 9
    # drop + verify no resurrection in folded descendants
    sinks.drop_manifest_column(target, "w")
    inc3 = spark.createDataFrame([(2, "p2")], "id INT, p STRING")
    sinks.upsert(spark, target, inc3, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    _, man3 = sinks._latest_manifest(target)
    assert all("w" not in st and "v" not in st
               for st in man3["stats"].values())
    assert sorted(sinks.read_manifest_table(spark, target).columns) == [
        "id", "p"
    ]


def test_merge_on_read_delete_commit_is_full_state(spark, tmp_path):
    """A merge-on-read DELETE is a metadata-only commit — published as
    a full state so the delta fast-diff contract never sees a
    rel-unchanged entry-section edit."""
    rows = spark.createDataFrame(
        [(i, f"p{i % 2}", i) for i in range(6)], "id INT, p STRING, v INT"
    )
    target = str(tmp_path / "tbl")
    sinks.upsert(spark, target, rows, ["id", "p"], partition_col="p",
                 commit_mode="manifest")
    n = sinks.delete_from_manifest_table(
        spark, target, "v >= 4", mode="merge_on_read"
    )
    assert n == 2
    ver, _ = sinks._latest_manifest(target)
    raw = sinks._read_manifest_version(target, ver)
    assert raw.get("format") != "delta"
    got = {r["id"] for r in sinks.read_manifest_table(spark, target).collect()}
    assert got == {0, 1, 2, 3}
