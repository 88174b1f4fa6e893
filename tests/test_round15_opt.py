"""Round 15 optimization regression tests.

Covers the commit-protocol fast paths introduced in the optimization
round: parquet-footer entry stats (must be indistinguishable from the
read-back Spark job), and the observe-riding CHECK enforcement's
refusal semantics (covered in round10 tests; here we only assert the
footer path's fallback discipline)."""

import datetime
import decimal

import pytest

from etl_stocks_with_sentiment_analysis_spark.operators import sinks


def _keys_for(spark, snap, df, pcol):
    pcols = [pcol] if pcol else []
    if pcol:
        new_keys = sorted(sinks._walk_partition_dirs(snap, pcols))
        ptypes = {pcol: dict(df.dtypes)[pcol]}
    else:
        new_keys = ["__ALL__"]
        ptypes = {}
    return pcols, ptypes, new_keys


def _both(spark, snap, df, pcol):
    pcols, ptypes, new_keys = _keys_for(spark, snap, df, pcol)
    foot = sinks._entry_stats_footer(spark, snap, df.schema, pcols, new_keys)
    sp = sinks._entry_stats_spark(
        spark, snap, df.schema, pcols, ptypes, new_keys
    )
    return foot, sp


def test_footer_stats_match_spark_readback_mixed_types(spark, tmp_path):
    rows = [
        (1, 100, "alpha", datetime.date(2024, 1, 5), 0.0001, float("nan"),
         decimal.Decimal("1.50"), True),
        (2, -7, "z" * 300, datetime.date(2023, 12, 31), float("inf"), 2.5,
         decimal.Decimal("-0.07"), False),
        (3, None, None, None, None, None, None, None),
    ]
    sch = (
        "id BIGINT, i INT, s STRING, d DATE, x DOUBLE, nanx DOUBLE, "
        "dec DECIMAL(10,2), b BOOLEAN"
    )
    df = spark.createDataFrame(rows, sch)
    snap = str(tmp_path / "mixed")
    df.write.mode("overwrite").parquet(snap)
    foot, sp = _both(spark, snap, df, None)
    assert foot is not None, "footer path unexpectedly fell back"
    assert foot == sp
    # the Java-notation cases the formatter exists for
    st = foot[0]["__ALL__"]
    assert st["x"] == ["1.0E-4", "Infinity"]
    assert st["nanx"] == ["2.5", "NaN"]
    assert st["dec"] == ["-0.07", "1.50"]
    assert st["b"] == ["false", "true"]


def test_footer_stats_match_spark_readback_partitioned(spark, tmp_path):
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 2000)
        .select(
            (F.col("id") % 3).cast("string").alias("grp"),
            F.col("id").alias("v"),
            (F.col("id") / 7.0).cast("float").alias("f"),
        )
        .repartition(4)
    )
    snap = str(tmp_path / "part")
    df.write.mode("overwrite").partitionBy("grp").parquet(snap)
    foot, sp = _both(spark, snap, df, "grp")
    assert foot is not None
    assert foot == sp
    assert set(foot[0]) == {"grp=0", "grp=1", "grp=2"}
    assert sum(foot[1].values()) == 2000


def test_footer_stats_fall_back_on_int96_timestamps(spark, tmp_path):
    # Spark's default parquet timestamp layout (INT96) records no
    # usable chunk statistics; the dispatcher must take the read-back
    # Spark job, not emit wrong/empty stats.
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 5, 12, 34, 56, 123000))],
        "k BIGINT, ts TIMESTAMP",
    )
    snap = str(tmp_path / "ts")
    df.write.mode("overwrite").parquet(snap)
    foot, sp = _both(spark, snap, df, None)
    if foot is None:
        # INT96 layout: fallback (the normal case)
        assert sp[1]["__ALL__"] == 1
    else:
        # micros layout (outputTimestampType changed): must match
        assert foot == sp


def test_java_notation_float_strings():
    # byte parity with JVM Double.toString across its notation ranges
    from etl_stocks_with_sentiment_analysis_spark.operators.sinks import (
        _footer_serializers,
    )
    from pyspark.sql.types import StructType, StructField, DoubleType

    schema = StructType([StructField("x", DoubleType())])
    (kind, ser) = _footer_serializers(schema, ["x"], "UTC")["x"]
    assert ser(5.0) == "5.0"
    assert ser(0.001) == "0.001"
    assert ser(0.0001) == "1.0E-4"
    assert ser(10000000.0) == "1.0E7"
    assert ser(9999999.0) == "9999999.0"
    assert ser(123456789.012) == "1.23456789012E8"
    assert ser(-0.0) == "-0.0"
    assert ser(float("nan")) == "NaN"
    assert ser(float("-inf")) == "-Infinity"
    assert ser(1e22) == "1.0E22"
    assert ser(1.5e-05) == "1.5E-5"


def test_merge_dup_refusal_rides_commit_and_cleans_up(spark, tmp_path):
    """r15: MERGE source-uniqueness validation rides the commit write
    (observed window metric) instead of a separate pre-write aggregate
    action. The refusal semantics must be unchanged: a dup source
    raises, the table version does not advance, and the never-published
    snapshot dir is removed."""
    import os

    target = str(tmp_path / "mdup")
    base = spark.createDataFrame(
        [(1, "g1", "a", 10), (2, "g1", "b", 20)],
        "id INT, g STRING, s STRING, v INT",
    )
    sinks.upsert(spark, target, base, ["id", "g"], partition_col="g")
    ver_before = sinks._latest_manifest(target)[0]
    snaps_before = {
        d for d in os.listdir(target) if d.startswith("snap-")
    }
    dup = spark.createDataFrame(
        [(1, "g1", "x", 1), (1, "g1", "y", 2)],
        "id INT, g STRING, s STRING, v INT",
    )
    with pytest.raises(ValueError, match="multiple rows per ON key"):
        sinks.merge_manifest_table(
            spark, target, dup, ["id", "g"], partition_col="g"
        )
    assert sinks._latest_manifest(target)[0] == ver_before
    snaps_after = {
        d for d in os.listdir(target) if d.startswith("snap-")
    }
    assert snaps_after == snaps_before, "refused snapshot dir leaked"
    got = {
        tuple(r)
        for r in sinks.read_manifest_table(spark, target).collect()
    }
    assert got == {(1, "g1", "a", 10), (2, "g1", "b", 20)}
    # unique source still merges fine through the same path
    ok = spark.createDataFrame(
        [(1, "g1", "x", 1), (3, "g1", "c", 30)],
        "id INT, g STRING, s STRING, v INT",
    )
    sinks.merge_manifest_table(
        spark, target, ok, ["id", "g"], partition_col="g"
    )
    got = {
        tuple(r)
        for r in sinks.read_manifest_table(spark, target).collect()
    }
    assert got == {(1, "g1", "x", 1), (2, "g1", "b", 20), (3, "g1", "c", 30)}


def test_manifest_dirs_plan_memo_reuse_and_invalidation(spark, tmp_path):
    """r15 reader-plan memo: the same manifest CONTENT reuses one
    constructed DataFrame (plan reuse only — actions still scan
    parquet); a new commit (different content) builds a fresh plan and
    reads the new rows."""
    target = str(tmp_path / "memo")
    base = spark.createDataFrame(
        [(1, "g1", 10), (2, "g2", 20)], "id INT, g STRING, v INT"
    )
    sinks.upsert(spark, target, base, ["id", "g"], partition_col="g")
    _, man1 = sinks._latest_manifest(target)
    df_a = sinks._read_manifest_dirs(spark, target, man1)
    df_b = sinks._read_manifest_dirs(spark, target, man1)
    assert df_a is df_b, "identical manifest content must hit the memo"
    # scoped reads key separately from full reads
    df_scoped = sinks._read_manifest_dirs(
        spark, target, man1, only_keys=["g=g1"]
    )
    assert df_scoped is not df_a
    assert df_scoped.count() == 1
    # a new commit changes the manifest content -> fresh plan, new rows
    more = spark.createDataFrame([(3, "g1", 30)], "id INT, g STRING, v INT")
    sinks.upsert(spark, target, more, ["id", "g"], partition_col="g")
    _, man2 = sinks._latest_manifest(target)
    df_c = sinks._read_manifest_dirs(spark, target, man2)
    assert df_c is not df_a
    assert {tuple(r) for r in df_c.collect()} == {
        (1, "g1", 10), (2, "g2", 20), (3, "g1", 30)
    }
    # the old manifest's plan still serves time-travel reads
    assert sinks._read_manifest_dirs(spark, target, man1) is df_a


def test_create_table_single_metadata_commit(spark, tmp_path):
    """r15: CREATE TABLE publishes ONE metadata-only v0 manifest (no
    Spark job, no empty snapshot dir) recording schema + constraints +
    sql_meta together. The recorded schema must be byte-identical to
    the old empty-frame path's, history depth is 1, and the usual
    post-CREATE flows (INSERT, constraint refusal, read-back) work."""
    import os

    from etl_stocks_with_sentiment_analysis_spark.operators import sqldml

    spark.conf.set("spark.manifest_sql.warehouse", str(tmp_path / "wh"))
    run = lambda s, p=None: sqldml.execute_sql(spark, s, params=p)
    run("DROP TABLE IF EXISTS copt.t")
    run("CREATE SCHEMA IF NOT EXISTS copt")
    run(
        """CREATE TABLE copt.t (
               k BIGINT NOT NULL, grp INT, v DOUBLE,
               UNIQUE(k, grp), CHECK (v >= 0)
           ) PARTITIONED BY (grp)"""
    )
    target = sqldml._resolve_table("copt.t")
    ver, man = sinks._latest_manifest(target)
    assert ver == 0 and man["partitions"] == {}
    # no snapshot dir was ever written
    assert not any(d.startswith("snap-") for d in os.listdir(target))
    # schema byte-parity with the old empty-frame commit path
    old_schema = spark.createDataFrame(
        [], "k BIGINT, grp INT, v DOUBLE"
    ).schema.json()
    assert man["schema"] == old_schema
    assert man["sql_meta"]["unique_keys"] == ["k", "grp"]
    assert "k_not_null" in man["constraints"]
    assert run("DESCRIBE HISTORY copt.t").count() == 1
    # empty read-back with the recorded schema
    empty = run("SELECT * FROM copt.t")
    assert empty.columns == ["k", "grp", "v"] and empty.count() == 0
    # post-CREATE flows: INSERT lands at v1; CHECK refuses bad rows
    run("INSERT INTO copt.t VALUES (1, 2, 0.5)")
    assert run("SELECT COUNT(*) AS n FROM copt.t").collect()[0]["n"] == 1
    assert sinks._latest_manifest(target)[0] == 1
    with pytest.raises(ValueError, match="NOT NULL|not_null"):
        run("INSERT INTO copt.t VALUES (NULL, 3, 1.0)")
    with pytest.raises(ValueError, match="CHECK|check"):
        run("INSERT INTO copt.t VALUES (5, 3, -1.0)")
    # IF NOT EXISTS is a no-op on the live table
    run("CREATE TABLE IF NOT EXISTS copt.t (k BIGINT, UNIQUE(k))")
    assert sinks._latest_manifest(target)[0] == 1


def test_create_empty_manifest_shape_matches_publish_snapshot(spark, tmp_path):
    """Drift guard: `create_empty_manifest_table` hand-assembles the
    manifest dict that `_publish_snapshot` builds for data commits. A
    field added to one and forgotten in the other would ship SQL-
    created tables whose manifests lack keys readers index directly —
    assert the two constructors emit the SAME key set."""
    from etl_stocks_with_sentiment_analysis_spark.operators import sqldml

    spark.conf.set("spark.manifest_sql.warehouse", str(tmp_path / "wh"))
    run = lambda s, p=None: sqldml.execute_sql(spark, s, params=p)
    run("DROP TABLE IF EXISTS par.t")
    run("CREATE SCHEMA IF NOT EXISTS par")
    run("CREATE TABLE par.t (k BIGINT NOT NULL, v BIGINT, UNIQUE(k))")
    target = sqldml._resolve_table("par.t")
    man0 = sinks._manifest_at_version(target, 0)
    run("INSERT INTO par.t VALUES (1, 10)")
    man1 = sinks._manifest_at_version(target, 1)
    assert set(man0) == set(man1), (
        "CREATE-born manifest keys drifted from _publish_snapshot's: "
        f"only-in-create={set(man0) - set(man1)}, "
        f"only-in-commit={set(man1) - set(man0)}"
    )


def test_upsert_leaves_caller_persisted_source_cached(spark, tmp_path):
    """r15 review fix: the commit-scoped source materialization must
    NOT unpersist a cache the CALLER created on the incoming frame
    (persist() on a cached frame is a silent no-op, so blindly
    re-persisting would make the commit's finally release theirs)."""
    target = str(tmp_path / "cached_src")
    base = spark.createDataFrame(
        [(1, "g1", 1), (2, "g2", 2)], "id INT, g STRING, v INT"
    )
    sinks.upsert(spark, target, base, ["id", "g"], partition_col="g")
    src = spark.createDataFrame([(3, "g1", 3)], "id INT, g STRING, v INT")
    src.persist()
    try:
        src.count()
        assert src.storageLevel.useMemory
        sinks.upsert(spark, target, src, ["id", "g"], partition_col="g")
        assert src.storageLevel.useMemory, (
            "commit released the caller's cache on the source frame"
        )
    finally:
        src.unpersist()
    got = sinks.read_manifest_table(spark, target)
    assert got.count() == 3


def test_shared_lsh_index_isolation_and_reuse(spark, sf_dir):
    """r15 shared LSH band index: read-only callers reuse ONE build per
    (session, sf_dir); mutable callers get a private copy whose appends
    never leak into the shared artifact (key isolation under any
    execution order)."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata import dedup

    a = dedup._lsh_index_dir(spark, sf_dir, prefix="tshared1_")
    b = dedup._lsh_index_dir(spark, sf_dir, prefix="tshared2_")
    assert a == b, "read-only callers must share one artifact"
    assert dedup.shared_lsh_build_wall(spark, sf_dir) is not None

    priv = dedup._lsh_index_dir(
        spark, sf_dir, prefix="tsharedm_", mutable=True
    )
    assert priv != a
    before = spark.read.parquet(a).count()
    # mutate ONLY the private copy
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.filter("doc_id % 10 = 0").limit(20)
    dedup.append_lsh_index(spark, priv, batch)
    assert spark.read.parquet(a).count() == before, (
        "shared artifact mutated by a private-copy append"
    )
    assert spark.read.parquet(priv).count() >= before
