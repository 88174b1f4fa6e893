"""Invariants for the round-4 pipeline additions: segment-level
boilerplate removal, deterministic corpus shuffle-sharding, CDC
snapshot diff, and small-file compaction.

The exact cross-engine values are already covered by each key's DuckDB
oracle (tools/check_oracle.py); these tests assert the STRUCTURAL
properties the oracles cannot express — reconstruction identities,
permutation bijectivity, diff classification consistency, and the
on-disk file layout the compaction job exists to produce.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_stocks_with_sentiment_analysis_spark.llmdata.text import (
    corpus_shuffle_shard,
    text_boilerplate_strip,
)
from etl_stocks_with_sentiment_analysis_spark.operators.sinks import (
    compact_small_files,
)
from etl_stocks_with_sentiment_analysis_spark.operators.sources_ops import (
    source_snapshot_diff,
)
from etl_stocks_with_sentiment_analysis_spark.sources import load_table


def test_boilerplate_strip_reconstruction(spark, sf_dir):
    """A doc with zero boilerplate segments reconstructs to its exact
    original text; every doc's kept-token count equals its original
    token count minus 10 per removed full segment (the tail segment
    may be shorter)."""
    out = text_boilerplate_strip(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    j = out.join(docs, "doc_id")
    clean_docs = j.filter(F.col("n_boilerplate") == 0)
    assert clean_docs.count() > 0
    assert clean_docs.filter(F.col("clean_text") != F.col("text")).count() == 0
    # boilerplate really is removed somewhere in the corpus
    assert j.filter(F.col("n_boilerplate") > 0).count() > 0
    # kept segments never exceed total segments
    assert j.filter(F.col("n_boilerplate") > F.col("n_segments")).count() == 0


def test_boilerplate_is_cross_doc(spark, sf_dir):
    """Each removed segment string appears in >= 3 distinct docs of the
    original corpus — the definition, checked from the raw table."""
    docs = load_table(spark, sf_dir, "documents")
    segs = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, CAST(ceil(size(split(text,' '))/10.0) AS INT)-1),"
                " i -> concat_ws(' ', slice(split(text,' '), i*10+1, 10)))"
            )
        ).alias("s"),
    )
    df = segs.groupBy("s").agg(F.countDistinct("doc_id").alias("df"))
    n_boiler_from_raw = (
        segs.join(df, "s").filter(F.col("df") >= 3).groupBy("doc_id").count()
    )
    out = text_boilerplate_strip(spark, sf_dir).filter(F.col("n_boilerplate") > 0)
    mismatch = (
        out.join(n_boiler_from_raw, "doc_id", "full_outer")
        .filter(
            F.coalesce(F.col("n_boilerplate"), F.lit(-1))
            != F.coalesce(F.col("count"), F.lit(-1))
        )
        .count()
    )
    assert mismatch == 0


def test_shuffle_shard_is_permutation(spark, sf_dir):
    """Shard/position assignment is a bijection: every doc appears
    once, (shard_id, pos_in_shard) pairs are unique, positions are
    dense 1..n_shard per shard, and shard_id is within [0, 16)."""
    out = corpus_shuffle_shard(spark, sf_dir).cache()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    assert out.select("shard_id", "pos_in_shard").distinct().count() == n_docs
    assert out.filter((F.col("shard_id") < 0) | (F.col("shard_id") > 15)).count() == 0
    dense = out.groupBy("shard_id").agg(
        F.count("*").alias("n"), F.max("pos_in_shard").alias("mx")
    )
    assert dense.filter(F.col("n") != F.col("mx")).count() == 0
    out.unpersist()


def test_shuffle_shard_deterministic(spark, sf_dir):
    a = corpus_shuffle_shard(spark, sf_dir).orderBy("doc_id").collect()
    b = corpus_shuffle_shard(spark, sf_dir).orderBy("doc_id").collect()
    assert a == b


def test_snapshot_diff_classification(spark, sf_dir):
    """insert rows have no old price, delete rows no new price, update
    rows differ — and the diff contains exactly the engineered key
    classes (%11 inserts, %13 deletes, %7 price bumps)."""
    out = source_snapshot_diff(spark, sf_dir).cache()
    k = F.col("o_orderkey")
    bad = out.filter(
        ((F.col("change_type") == "insert") & F.col("old_price_cents").isNotNull())
        | ((F.col("change_type") == "delete") & F.col("new_price_cents").isNotNull())
        | (
            (F.col("change_type") == "update")
            & (F.col("old_price_cents") == F.col("new_price_cents"))
        )
    )
    assert bad.count() == 0
    assert out.filter((F.col("change_type") == "insert") & (k % 11 != 0)).count() == 0
    assert out.filter((F.col("change_type") == "delete") & (k % 13 != 0)).count() == 0
    ups = out.filter(F.col("change_type") == "update")
    assert ups.filter((k % 7 != 0)).count() == 0
    assert (
        ups.filter(
            F.col("new_price_cents") - F.col("old_price_cents") != 100
        ).count()
        == 0
    )
    out.unpersist()


@pytest.mark.parametrize("rows_per_file", [100, 1000])
def test_compact_small_files_layout_and_identity(spark, tmp_path, rows_per_file):
    """Compaction hits the bin-pack file-count target exactly and
    preserves content row-for-row."""
    src, out = str(tmp_path / "frag"), str(tmp_path / "packed")
    df = spark.range(0, 2500).withColumn("v", F.col("id") * 2)
    df.repartition(32).write.parquet(src)
    got = compact_small_files(spark, src, out, rows_per_file)
    want = -(-2500 // rows_per_file)
    assert got == want
    n_parts = sum(1 for f in os.listdir(out) if f.startswith("part-"))
    assert n_parts == want
    back = spark.read.parquet(out)
    assert back.count() == 2500
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


def test_dashboard_renders_all_sections(spark, sf_dir):
    from etl_stocks_with_sentiment_analysis_spark.dashboard import (
        SECTIONS,
        render_dashboard,
    )

    out = render_dashboard(spark, sf_dir)
    for title, key, _ in SECTIONS:
        assert title in out and key in out
    assert "accuracy_pct" in out  # key-metrics payload actually present


def test_incremental_dedup_consistent_with_full_lsh(spark, sf_dir):
    """Every (new, index) collision the incremental probe reports is
    also a pair of the full LSH self-join, and vice versa for pairs
    that straddle the batch/index split — the incremental path must
    find exactly the cross-split subset of the full pairing."""
    from etl_stocks_with_sentiment_analysis_spark.llmdata.dedup import (
        dedup_incremental_batch,
        dedup_minhash_lsh,
    )

    pairs = dedup_minhash_lsh(spark, sf_dir)
    cross = pairs.filter(
        ((F.col("doc_a") % 10 == 0) & (F.col("doc_b") % 10 != 0))
        | ((F.col("doc_a") % 10 != 0) & (F.col("doc_b") % 10 == 0))
    )
    n_cross = cross.count()
    incr = dedup_incremental_batch(spark, sf_dir)
    n_hits = int(
        incr.agg(F.sum("n_index_matches").alias("s")).first()["s"]
    )
    assert n_hits == n_cross
    # keep flag is the complement of having any match
    bad = incr.filter(
        (F.col("keep") & (F.col("n_index_matches") > 0))
        | (~F.col("keep") & (F.col("n_index_matches") == 0))
    ).count()
    assert bad == 0
