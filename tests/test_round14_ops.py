"""Round-14 tests — the r13 advisor fixes: string-literal-aware psql
meta-command stripping, positional (table-reference-only) RYOW
overlay rewriting, the commit-timestamp forever-cache refusing the
owner's read-your-own-writes shortcut, and the session-weak status
cache."""

import gc
import threading
import weakref

import pytest

from etl_stocks_with_sentiment_analysis_spark.operators import sinks, sqldml


@pytest.fixture()
def wh(spark, tmp_path):
    spark.conf.set("spark.manifest_sql.warehouse", str(tmp_path / "wh"))
    yield str(tmp_path / "wh")


# --- psql meta-command stripper (string-literal aware) ------------------


def test_strip_psql_meta_preserves_multiline_literals():
    """A continuation line of a multi-line string VALUE that begins
    with a backslash word (pg_dump --inserts emits embedded newlines
    literally) is DATA, not a meta-command — it must survive."""
    text = (
        "\\restrict abc\n"
        "INSERT INTO t VALUES (1, 'first line\n"
        "\\documentclass{article}\n"
        "\\date{today}\n"
        "last line');\n"
        "\\unrestrict abc\n"
        "INSERT INTO t VALUES (2, 'plain');\n"
    )
    got = sqldml._strip_psql_meta(text)
    assert "\\documentclass{article}" in got
    assert "\\date{today}" in got
    assert "\\restrict" not in got
    assert "\\unrestrict" not in got


def test_strip_psql_meta_tracks_quotes_comments_dollar():
    """Doubled quotes, line/block comments, and dollar-quoted bodies
    all position the stripper correctly."""
    text = (
        "SELECT 'it''s a\n"
        "\\x continuation';\n"      # inside '' (after doubling) — keep
        "-- a comment with ' that must not open a string\n"
        "\\connect somedb\n"        # true meta-command — strip
        "SELECT $$body\n"
        "\\. not a terminator\n"
        "$$;\n"
        "/* block ' comment\n"
        "spanning */ SELECT 1;\n"
        "\\q\n"                     # meta-command after block closed
    )
    got = sqldml._strip_psql_meta(text)
    assert "\\x continuation" in got
    assert "\\. not a terminator" in got
    assert "\\connect" not in got
    assert "\\q" not in got


def test_execute_sql_multiline_literal_roundtrip(spark, wh):
    """End-to-end: a text value whose continuation line starts with a
    backslash word survives INSERT → SELECT exactly (r13 would have
    silently truncated the value or corrupted the statement)."""
    run = lambda s: sqldml.execute_sql(spark, s)
    run("DROP TABLE IF EXISTS r14.tex")
    run("CREATE SCHEMA IF NOT EXISTS r14")
    run("CREATE TABLE r14.tex (k BIGINT, body STRING, UNIQUE(k))")
    body = "preamble\n\\documentclass{article}\n\\date{2026-08-16}\nend"
    run(f"INSERT INTO r14.tex VALUES (1, '{body}')")
    got = run("SELECT body FROM r14.tex WHERE k = 1").collect()[0]["body"]
    assert got == body


# --- RYOW overlay rewrite is positional ---------------------------------


def test_ryow_overlay_skips_alias_and_column_positions(spark, wh):
    """An AS alias or expression token equal to a buffered table's
    view name must NOT be rewritten — only table-reference positions
    (after FROM/JOIN, or a comma in a FROM-list) are."""
    run = lambda s: sqldml.execute_sql(spark, s)
    run("DROP TABLE IF EXISTS evts")
    run("CREATE TABLE evts (k BIGINT, UNIQUE(k))")
    run("INSERT INTO evts VALUES (1)")
    run("BEGIN")
    run("INSERT INTO evts VALUES (2)")
    # alias equals the buffered view name: column must keep its name,
    # and the FROM reference must still see the buffered row
    df = run("SELECT COUNT(*) AS evts FROM evts")
    assert df.columns == ["evts"]
    assert df.collect()[0]["evts"] == 2
    # comma in a FROM-list IS a table position — overlay applies
    df2 = run(
        "SELECT COUNT(*) AS n FROM (SELECT 1 AS x) t, evts"
    )
    assert df2.collect()[0]["n"] == 2
    # a subquery's own alias list is not a table position
    df3 = run(
        "SELECT evts FROM (SELECT k AS evts FROM evts) q ORDER BY evts"
    )
    assert [r["evts"] for r in df3.collect()] == [1, 2]
    run("ROLLBACK")
    assert run("SELECT COUNT(*) AS n FROM evts").collect()[0]["n"] == 1


def test_rewrite_txn_overlay_unit():
    ov = {"evts": "evts__ryow_1"}
    f = sqldml._rewrite_txn_overlay
    assert f("SELECT COUNT(*) AS evts FROM evts", ov) == (
        "SELECT COUNT(*) AS evts FROM evts__ryow_1"
    )
    assert f("SELECT evts + 1 FROM evts", ov) == (
        "SELECT evts + 1 FROM evts__ryow_1"
    )
    assert f("SELECT a FROM t JOIN evts ON t.k = evts.k", ov) == (
        "SELECT a FROM t JOIN evts__ryow_1 ON t.k = evts.k"
    )
    assert f("SELECT a FROM t, evts WHERE t.k = evts.k", ov) == (
        "SELECT a FROM t, evts__ryow_1 WHERE t.k = evts.k"
    )
    # subquery closes: the outer FROM-list comma still re-arms
    assert f("SELECT a FROM (SELECT 1 AS b) s, evts", ov) == (
        "SELECT a FROM (SELECT 1 AS b) s, evts__ryow_1"
    )
    # GROUP BY / ORDER BY / SELECT-list commas are not table positions
    assert f("SELECT x, evts FROM t GROUP BY x, evts", ov) == (
        "SELECT x, evts FROM t GROUP BY x, evts"
    )


# --- commit-timestamp cache: no owner shortcut --------------------------


def test_committed_at_not_poisoned_by_aborted_txn(spark, tmp_path):
    """Resolving TIMESTAMP AS OF *inside* a transaction must not
    memoize the owner's still-pending staged version: if the
    transaction then aborts, later timestamp reads in the same
    process must never resolve to the aborted version."""
    target = str(tmp_path / "cache_poison")
    df1 = spark.range(3).withColumnRenamed("id", "k")
    sinks.upsert(spark, target, df1, ["k"])
    committed_v = max(sinks._list_manifest_versions(target))
    try:
        with sinks.transaction():
            df2 = spark.range(5, 10).withColumnRenamed("id", "k")
            sinks.upsert(spark, target, df2, ["k"])
            staged_v = max(sinks._list_manifest_versions(target))
            assert staged_v > committed_v
            staged_at = sinks._committed_at(target, staged_v)
            # the OWNER may resolve its own staged commit time (RYOW)…
            assert staged_at is not None
            # …but the forever-cache must not have memoized it
            assert staged_v not in sinks._COMMIT_TS_CACHE.get(target, {})
            raise RuntimeError("abort this transaction")
    except RuntimeError:
        pass
    # after the abort the staged version is invisible to timestamps
    assert sinks._committed_at(target, staged_v) is None
    v = sinks.version_at_timestamp(target, staged_at + 3600.0)
    assert v == committed_v


# --- status cache is weak per session -----------------------------------


def test_status_cache_weak_and_per_session(spark, wh):
    run = lambda s: sqldml.execute_sql(spark, s)
    run("DROP TABLE IF EXISTS r14.sc")
    run("CREATE SCHEMA IF NOT EXISTS r14")
    run("CREATE TABLE r14.sc (k BIGINT, UNIQUE(k))")
    f1 = sqldml._status(spark, "INSERT", "r14.sc", 1)
    f2 = sqldml._status(spark, "INSERT", "r14.sc", 1)
    assert f1 is f2  # memoized per (op, table, n)
    assert isinstance(sqldml._STATUS_CACHE, weakref.WeakKeyDictionary)
    assert spark in sqldml._STATUS_CACHE

    class FakeSession:
        def createDataFrame(self, rows, schema):
            return ("frame", rows, schema)

    fake = FakeSession()
    sqldml._status(fake, "INSERT", "t", 1)
    assert fake in sqldml._STATUS_CACHE
    ref = weakref.ref(fake)
    del fake
    gc.collect()
    # a dropped session's entry (and its frames) collect automatically
    assert ref() is None


# --- persisted ANN index lifecycle ---------------------------------------


def _scaled_queries(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.llmdata import similarity as sim

    return (
        sim._scaled_vectors(spark, sf_dir)
        .filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )


def test_ann_index_probe_recall_parity(spark, sf_dir, tmp_path):
    """A probe of an index built over the FULL corpus returns the
    IDENTICAL top-k as the in-query `ivf_topk` build — the invariant
    that makes the persisted artifact safe to serve from (the r13
    verdict's 'recall parity with the in-query build')."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata import similarity as sim

    idx = str(tmp_path / "annidx_full")
    sim.build_ann_index(spark, sim._scaled_vectors(spark, sf_dir), idx)
    probed = sim.probe_ann_index(
        spark, idx, _scaled_queries(spark, sf_dir), nprobe=2, k=3
    )
    inquery = sim.ivf_topk(spark, sf_dir, nprobe=2, k=3)
    got = sorted(map(tuple, probed.collect()))
    want = sorted(map(tuple, inquery.collect()))
    assert got == want and len(got) > 0


def test_ann_index_append_replay_and_compact(spark, sf_dir, tmp_path):
    """Append is replay-idempotent (second delivery is a no-op),
    compaction reduces the file count and leaves probes row-identical."""
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.llmdata import similarity as sim

    vecs = sim._scaled_vectors(spark, sf_dir)
    idx = str(tmp_path / "annidx_grow")
    sim.build_ann_index(spark, vecs.filter(F.col("vec_id") % 10 != 0), idx)
    batch = vecs.filter(F.col("vec_id") % 10 == 0)
    sim.append_ann_index(spark, idx, batch)
    stats1 = sorted(map(tuple, sim._ann_index_stats(spark, idx).collect()))
    sim.append_ann_index(spark, idx, batch)  # replay
    stats2 = sorted(map(tuple, sim._ann_index_stats(spark, idx).collect()))
    assert stats1 == stats2
    q = _scaled_queries(spark, sf_dir)
    before = sorted(map(tuple, sim.probe_ann_index(spark, idx, q).collect()))
    import os

    assign = os.path.join(idx, "assign")
    files_before = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(assign)
    )
    n_files = sim.compact_ann_index(spark, idx)
    assert n_files <= files_before
    after = sorted(map(tuple, sim.probe_ann_index(spark, idx, q).collect()))
    assert before == after and len(after) > 0


def test_ann_index_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The probe's assign/ scan carries a dynamic-pruning partition
    filter on cell_id — the physical guarantee behind the
    flat-in-corpus probe cost (only probed cells are read)."""
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.llmdata import similarity as sim

    idx = str(tmp_path / "annidx_dpp")
    sim.build_ann_index(
        spark,
        sim._scaled_vectors(spark, sf_dir).filter(F.col("vec_id") % 10 != 0),
        idx,
    )
    res = sim.probe_ann_index(spark, idx, _scaled_queries(spark, sf_dir))
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()


# --- greedy wordpiece token counts ---------------------------------------


def test_bpe_word_count_known_values(spark):
    """Hand-checked greedy longest-prefix segmentations over the
    pinned vocab."""
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.llmdata import text as T

    def seg(word):
        # python reference of the same greedy rule
        rem, cnt = word.lower(), 0
        while rem:
            ml = max(
                (len(p) for p in T._BPE_VOCAB if rem.startswith(p)),
                default=1,
            )
            rem = rem[ml:]
            cnt += 1
        return cnt

    words = [
        "the", "theory", "nation", "stocks", "trading", "Überraschung",
        "a", "", "42", "anti-pattern", "documentation", "xyzzy",
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", F.expr(T._bpe_word_count_expr("w")).alias("n")
    )
    got = {r["w"]: r["n"] for r in df.collect()}
    for w in words:
        assert got[w] == seg(w), (w, got[w], seg(w))
    # sanity on the rule itself: 'the' is one token, and every word
    # tokenizes to between 1 and len(word) tokens
    assert seg("the") == 1
    for w in words:
        if w:
            assert 1 <= seg(w) <= len(w)


def test_bpe_counts_bound_ws_counts(spark, sf_dir):
    """Per doc: bpe tokens >= whitespace tokens (each word is >= 1
    token) and <= character count (each step eats >= 1 char)."""
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.llmdata.text import (
        text_token_count_bpe,
    )
    from etl_stocks_with_sentiment_analysis_spark.sources import load_table

    counts = text_token_count_bpe(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(F.regexp_replace("text", " ", "")).alias("n_chars_nospace"),
    )
    bad = (
        counts.join(docs, "doc_id")
        .filter(
            (F.col("n_bpe_tokens") < F.col("n_ws_tokens"))
            | (F.col("n_bpe_tokens") > F.col("n_chars_nospace"))
        )
        .count()
    )
    assert bad == 0


# --- bounded RYOW overlay replanning -------------------------------------


def test_ryow_overlay_cache_incremental_and_invalidation(spark, wh):
    """Past `_OVERLAY_CKPT_GROUPS` buffered groups the overlay is
    cached + extended incrementally; a concurrent committed write
    must still invalidate it (each in-txn read sees the LATEST
    committed snapshot under the buffer)."""
    run = lambda s: sqldml.execute_sql(spark, s)
    run("DROP TABLE IF EXISTS r14.oc")
    run("CREATE SCHEMA IF NOT EXISTS r14")
    run("CREATE TABLE r14.oc (k BIGINT, v BIGINT, UNIQUE(k))")
    run("INSERT INTO r14.oc VALUES (0, 0)")
    run("BEGIN")
    for i in range(1, 13):  # 24 groups: INSERT + UPDATE alternate
        run(f"INSERT INTO r14.oc VALUES ({i}, {i})")
        run(f"UPDATE r14.oc SET v = v + 100 WHERE k = {i}")
    got = run(
        "SELECT COUNT(*) AS n, SUM(v) AS s FROM r14.oc"
    ).collect()[0]
    assert got["n"] == 13 and got["s"] == sum(i + 100 for i in range(1, 13))
    txn = sqldml._current_txn()
    assert txn and txn.get("overlay_cache"), "cache should be active"
    # read again with no new statements: served from the cached frame
    got2 = run("SELECT SUM(v) AS s FROM r14.oc").collect()[0]["s"]
    assert got2 == got["s"]
    # another connection commits mid-transaction -> cache invalidates
    saved, sqldml._TXN_LOCAL.txn = sqldml._current_txn(), None
    run("INSERT INTO r14.oc VALUES (99, 9900)")
    sqldml._TXN_LOCAL.txn = saved
    got3 = run(
        "SELECT COUNT(*) AS n, SUM(v) AS s FROM r14.oc"
    ).collect()[0]
    assert got3["n"] == 14 and got3["s"] == got["s"] + 9900
    # buffer keeps extending incrementally after the rebuild
    run("INSERT INTO r14.oc VALUES (50, 50)")
    got4 = run("SELECT COUNT(*) AS n FROM r14.oc").collect()[0]["n"]
    assert got4 == 15
    run("ROLLBACK")
    n = run("SELECT COUNT(*) AS n FROM r14.oc").collect()[0]["n"]
    assert n == 2  # base row + the concurrent commit only


# --- pluggable alert delivery --------------------------------------------


def test_alert_shim_delivery_dedup_isolation(spark, sf_dir, tmp_path):
    """The delivery half of the reference's notification callbacks:
    fan-out to registered sinks, PagerDuty-style dedup_key collapse,
    per-sink fault isolation, and the failure/success scope."""
    from etl_stocks_with_sentiment_analysis_spark.operators.analytics import (
        events_error_rate_alert,
    )
    from etl_stocks_with_sentiment_analysis_spark.plans import alerts

    got: list = []
    alerts.reset_dedup()
    alerts.register_alert_sink("rec", got.append)
    alerts.register_alert_sink("boom", lambda ev: 1 / 0)  # must isolate
    out = str(tmp_path / "alerts.jsonl")
    alerts.register_alert_sink("file", alerts.file_sink(out))
    try:
        frame = events_error_rate_alert(spark, sf_dir)
        n_flagged = frame.filter("is_alert").count()
        n = alerts.emit_frame_alerts(
            frame, "is_alert", "events_error_rate",
            "error rate {err_bp} bp on {day}", dedup_cols=("day",),
        )
        assert n == n_flagged
        assert len(got) == n_flagged
        assert all(ev.kind == "threshold" for ev in got)
        # replay the same detection run: dedup collapses everything
        assert alerts.emit_frame_alerts(
            frame, "is_alert", "events_error_rate",
            "error rate {err_bp} bp on {day}", dedup_cols=("day",),
        ) == 0
        # the file sink recorded the webhook-shaped payloads
        import json

        lines = [json.loads(x) for x in open(out)]
        assert len(lines) == n_flagged
        assert all("dedup_key" in x and "severity" in x for x in lines)
        # failure/success callback scope
        with alerts.alerting("pipe_ok"):
            pass
        with pytest.raises(ValueError):
            with alerts.alerting("pipe_bad"):
                raise ValueError("boom-detail")
        kinds = [(ev.source, ev.kind) for ev in got[n_flagged:]]
        assert ("pipe_ok", "success") in kinds
        assert ("pipe_bad", "failure") in kinds
        fail_ev = [ev for ev in got if ev.kind == "failure"][0]
        assert "boom-detail" in fail_ev.summary
    finally:
        alerts.unregister_alert_sink("rec")
        alerts.unregister_alert_sink("boom")
        alerts.unregister_alert_sink("file")
        alerts.reset_dedup()


def test_rewrite_txn_overlay_mixed_join_comma_and_fn_args():
    """SQL-92 mixed syntax keeps the FROM-list armed through a join's
    ON spec; function-argument commas never count as table commas."""
    ov = {"evts": "evts__ryow_1"}
    f = sqldml._rewrite_txn_overlay
    # comma after JOIN ... ON continues the table list
    assert f(
        "SELECT a FROM t JOIN u ON t.k = u.k, evts WHERE 1=1", ov
    ) == "SELECT a FROM t JOIN u ON t.k = u.k, evts__ryow_1 WHERE 1=1"
    # a column named like the table inside a function call in ON
    assert f(
        "SELECT a FROM t JOIN u ON f(t.k, evts) = 1", ov
    ) == "SELECT a FROM t JOIN u ON f(t.k, evts) = 1"
    # IN (SELECT ...) subquery: inner FROM still rewrites
    assert f(
        "SELECT a FROM t WHERE x IN (SELECT k FROM evts)", ov
    ) == "SELECT a FROM t WHERE x IN (SELECT k FROM evts__ryow_1)"


def test_tokenize_bpe_consistent_with_counts(spark, sf_dir):
    """The token STREAM and the token COUNT keys must agree: pieces
    per doc == n_bpe_tokens, pieces reassemble the lowercased word,
    and vocab ids round-trip through the pinned vocab."""
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.llmdata.text import (
        _BPE_VOCAB,
        text_token_count_bpe,
        text_tokenize_bpe,
    )

    toks = text_tokenize_bpe(spark, sf_dir)
    per_doc = toks.groupBy("doc_id").agg(F.count("*").alias("n_pieces"))
    counts = text_token_count_bpe(spark, sf_dir)
    bad = (
        counts.join(per_doc, "doc_id", "left")
        .filter(
            F.coalesce(F.col("n_pieces"), F.lit(0)) != F.col("n_bpe_tokens")
        )
        .count()
    )
    assert bad == 0
    # pieces concatenate back EXACTLY to the lowercased source words
    # (3 whole docs; empty split words produce no pieces by design)
    from collections import defaultdict

    from etl_stocks_with_sentiment_analysis_spark.sources import load_table

    doc_ids = [r["doc_id"] for r in toks.select("doc_id").distinct().limit(3).collect()]
    got = defaultdict(str)
    for r in (
        toks.filter(F.col("doc_id").isin(doc_ids))
        .orderBy("doc_id", "widx", "tpos")
        .collect()
    ):
        got[(r["doc_id"], r["widx"])] += r["piece"]
    src = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(doc_ids))
        .collect()
    }
    assert got
    for (doc_id, widx), joined in got.items():
        assert joined == src[doc_id].split(" ")[widx - 1].lower()
    # every non-empty source word of those docs is present
    for doc_id, text in src.items():
        for i, wd in enumerate(text.split(" "), start=1):
            if wd:
                assert got[(doc_id, i)] == wd.lower()
    # vocab ids: -1 only for 1-char non-vocab pieces; others round-trip
    rows = toks.filter(F.col("vocab_id") >= 0).limit(500).collect()
    for r in rows:
        assert _BPE_VOCAB[r["vocab_id"]] == r["piece"]
    unk = toks.filter(F.col("vocab_id") < 0).limit(200).collect()
    for r in unk:
        assert len(r["piece"]) == 1 and r["piece"] not in _BPE_VOCAB


def test_ann_pq_shortlist_converges_to_plain_probe(spark, sf_dir, tmp_path):
    """A shortlist at least as large as any probed cell's population
    reproduces the plain exact probe bit-for-bit; small shortlists
    return subsets of the probed candidates with monotone recall."""
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.llmdata import similarity as sim

    idx = str(tmp_path / "annidx_sl")
    sim.build_ann_index(
        spark,
        sim._scaled_vectors(spark, sf_dir).filter(F.col("vec_id") % 10 != 0),
        idx,
    )
    q = _scaled_queries(spark, sf_dir)
    plain = sorted(map(tuple, sim.probe_ann_index(spark, idx, q).collect()))
    huge = sorted(
        map(
            tuple,
            sim.probe_ann_index(
                spark, idx, q, pq_shortlist=10**6
            ).collect(),
        )
    )
    assert huge == plain and len(plain) > 0
    # recall of the exact probe's top-3 is monotone in the shortlist
    def recall(s):
        got = {
            (r["q_id"], r["vec_id"])
            for r in sim.probe_ann_index(
                spark, idx, q, pq_shortlist=s
            ).collect()
        }
        want = {(a, b) for a, b, _ in plain}
        return len(got & want) / len(want)

    r4, r16 = recall(4), recall(16)
    assert r4 <= r16 <= 1.0


def test_ann_kmeans_index_lifecycle(spark, sf_dir, tmp_path):
    """The learned-codebook index honors the same lifecycle contract:
    every corpus vector assigned to exactly one learned cell, appends
    against the FROZEN centroids are replay-idempotent, compaction is
    probe-identical, and a huge pq_shortlist reproduces the plain
    probe."""
    from pyspark.sql import functions as F

    from etl_stocks_with_sentiment_analysis_spark.llmdata import similarity as sim

    vecs = sim._scaled_vectors(spark, sf_dir)
    corpus = vecs.filter(F.col("vec_id") % 10 != 0)
    idx = str(tmp_path / "annidx_km")
    sim.build_ann_index_kmeans(spark, corpus, idx, k=8, seed=42)
    stats = sim._ann_index_stats(spark, idx)
    assert stats.agg(F.sum("n_vecs")).collect()[0][0] == corpus.count()
    assert stats.count() <= 8  # at most k learned cells
    batch = vecs.filter(F.col("vec_id") % 10 == 0)
    sim.append_ann_index(spark, idx, batch)
    s1 = sorted(map(tuple, sim._ann_index_stats(spark, idx).collect()))
    sim.append_ann_index(spark, idx, batch)  # replay
    s2 = sorted(map(tuple, sim._ann_index_stats(spark, idx).collect()))
    assert s1 == s2
    assert (
        sim._ann_index_stats(spark, idx).agg(F.sum("n_vecs")).collect()[0][0]
        == vecs.count()
    )
    q = _scaled_queries(spark, sf_dir)
    plain = sorted(map(tuple, sim.probe_ann_index(spark, idx, q).collect()))
    assert plain
    sl = sorted(
        map(
            tuple,
            sim.probe_ann_index(spark, idx, q, pq_shortlist=10**6).collect(),
        )
    )
    assert sl == plain
    sim.compact_ann_index(spark, idx)
    after = sorted(map(tuple, sim.probe_ann_index(spark, idx, q).collect()))
    assert after == plain


def test_rewrite_txn_overlay_parenthesized_join():
    """`FROM (evts JOIN u ON ...)` — a parenthesized join's first
    word is a table reference (r14 review finding #2)."""
    ov = {"evts": "evts__ryow_1"}
    f = sqldml._rewrite_txn_overlay
    assert f(
        "SELECT a FROM (evts JOIN u ON evts.k = u.k)", ov
    ) == "SELECT a FROM (evts__ryow_1 JOIN u ON evts.k = u.k)"
    # function-call parens still never count as table positions
    assert f("SELECT f(evts) FROM t", ov) == "SELECT f(evts) FROM t"


def test_rollback_to_savepoint_invalidates_overlay_cache(spark, wh):
    """ROLLBACK TO SAVEPOINT truncates the buffer; a later read must
    rebuild the overlay, never serve a checkpoint containing the
    rolled-back statements (r14 review finding #1)."""
    run = lambda s: sqldml.execute_sql(spark, s)
    run("DROP TABLE IF EXISTS r14.sv")
    run("CREATE SCHEMA IF NOT EXISTS r14")
    run("CREATE TABLE r14.sv (k BIGINT, v BIGINT, UNIQUE(k))")
    run("BEGIN")
    for i in range(1, 6):  # 10 groups -> past the checkpoint bar
        run(f"INSERT INTO r14.sv VALUES ({i}, {i})")
        run(f"UPDATE r14.sv SET v = v + 100 WHERE k = {i}")
    run("SAVEPOINT sp")
    for i in range(10, 22):  # grow well past the savepoint
        run(f"INSERT INTO r14.sv VALUES ({i}, {i})")
    # cache the big overlay (24+ ops)
    assert run("SELECT COUNT(*) AS n FROM r14.sv").collect()[0]["n"] == 17
    run("ROLLBACK TO SAVEPOINT sp")
    # regrow the buffer past the OLD cached op count with DIFFERENT rows
    for i in range(50, 70):
        run(f"INSERT INTO r14.sv VALUES ({i}, {i})")
    rows = {
        r["k"]
        for r in run("SELECT k FROM r14.sv").collect()
    }
    assert rows == set(range(1, 6)) | set(range(50, 70))
    assert not rows & set(range(10, 22))  # rolled-back rows invisible
    run("ROLLBACK")


def test_alert_failed_delivery_keeps_dedup_key(spark, tmp_path):
    """An alert whose every sink delivery failed stays deliverable on
    retry (r14 review finding #4)."""
    from etl_stocks_with_sentiment_analysis_spark.plans import alerts

    alerts.reset_dedup()
    state = {"fail": True}

    def flaky(ev):
        if state["fail"]:
            raise OSError("disk full")

    alerts.register_alert_sink("flaky", flaky)
    try:
        ev = alerts.AlertEvent(
            kind="threshold", source="t", summary="s", dedup_key="k1"
        )
        assert alerts.emit_alert(ev) == 0  # delivery failed
        state["fail"] = False
        assert alerts.emit_alert(ev) == 1  # retry delivers
        assert alerts.emit_alert(ev) == 0  # now deduplicated
    finally:
        alerts.unregister_alert_sink("flaky")
        alerts.reset_dedup()


def test_read_pq_meta_missing_dir_falls_back_only(spark, tmp_path):
    """Only a MISSING pq_meta dir falls back to the pinned geometry;
    a corrupt one propagates (r14 review finding #3)."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata import similarity as sim

    idx = str(tmp_path / "meta_idx")
    import os

    os.makedirs(idx, exist_ok=True)
    # r15 widened the meta tuple with the learned-codebook kcode;
    # a missing dir still falls back to the pinned ANCHOR geometry
    # (kcode None = anchor codebook path)
    assert sim._read_pq_meta(spark, idx) == (sim._PQ_M, sim._PQ_DSUB, None)
    bad = os.path.join(idx, "pq_meta")
    os.makedirs(bad, exist_ok=True)
    with open(os.path.join(bad, "part-00000.parquet"), "w") as f:
        f.write("this is not parquet")
    with pytest.raises(Exception):
        sim._read_pq_meta(spark, idx)


def test_ryow_fuzz_deep_buffer_with_savepoints(spark, wh):
    """The r13 fuzz at 12 steps barely crosses the overlay-cache bar
    (8 commit groups) and never REGROWS past a rolled-back cache
    point — exactly the blind spot the r14 review's savepoint-cache
    bug lived in. This trial runs 40 mixed statements with reads
    every 2 steps against the serial dict model, forcing: cache
    activation, incremental extension, ROLLBACK TO truncation below a
    cached op count, and regrowth beyond it."""
    import random

    run = lambda s: sqldml.execute_sql(spark, s)
    rng = random.Random(1414)
    run("CREATE SCHEMA IF NOT EXISTS rf")
    run("DROP TABLE IF EXISTS rf.deep")
    run("CREATE TABLE rf.deep (k BIGINT, v BIGINT, UNIQUE(k))")
    seed = {k: k * 10 for k in range(1, 4)}
    run(
        "INSERT INTO rf.deep VALUES "
        + ", ".join(f"({k}, {v})" for k, v in seed.items())
    )
    model = dict(seed)
    saves: list[tuple[str, dict]] = []
    run("BEGIN")
    for step in range(40):
        kind = rng.choice(
            ["ins", "upsert", "update", "delete", "savepoint",
             "rollback_to", "ins", "update"]
        )
        k = rng.randint(1, 15)
        v = 1000 + step
        if kind == "ins" and k not in model:
            run(f"INSERT INTO rf.deep VALUES ({k}, {v})")
            model[k] = v
        elif kind == "upsert":
            run(
                f"INSERT INTO rf.deep VALUES ({k}, {v}) "
                "ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v"
            )
            model[k] = v
        elif kind == "update":
            run(f"UPDATE rf.deep SET v = v + 1 WHERE k <= {k}")
            model = {
                mk: mv + (1 if mk <= k else 0) for mk, mv in model.items()
            }
        elif kind == "delete":
            run(f"DELETE FROM rf.deep WHERE k = {k}")
            model.pop(k, None)
        elif kind == "savepoint":
            name = f"d{step}"
            run(f"SAVEPOINT {name}")
            saves.append((name, dict(model)))
        elif kind == "rollback_to" and saves:
            idx = rng.randrange(len(saves))
            name, snap = saves[idx]
            run(f"ROLLBACK TO SAVEPOINT {name}")
            model = dict(snap)
            saves = saves[: idx + 1]
        else:
            continue
        if step % 2 == 0:
            got = {
                r["k"]: r["v"]
                for r in run("SELECT k, v FROM rf.deep").collect()
            }
            assert got == model, (step, kind, got, model)
    run("COMMIT")
    got = {
        r["k"]: r["v"] for r in run("SELECT k, v FROM rf.deep").collect()
    }
    assert got == model
