"""Round-5 operator invariants: materialized-LSH-index equivalence and
commit-mode equivalence — the properties that make the new artifacts
safe drop-in substitutes for their compute-on-the-fly twins."""

from pyspark.sql import functions as F

from etl_stocks_with_sentiment_analysis_spark.llmdata import dedup
from etl_stocks_with_sentiment_analysis_spark.operators import sinks


def _rows(df):
    return {tuple(str(v) for v in r) for r in df.collect()}


def test_index_probe_equals_single_pass_incremental(spark, sf_dir):
    """Materialize-then-probe must be indistinguishable from the
    single-pass incremental computation — the invariant that makes the
    persisted band index safe to keep between daily runs."""
    on_the_fly = dedup.dedup_incremental_batch(spark, sf_dir)
    via_index = dedup.dedup_index_probe(spark, sf_dir)
    assert _rows(via_index) == _rows(on_the_fly)


def test_index_build_counts_match_lineage(spark, sf_dir):
    """The written artifact must carry exactly the index split's band
    rows: per-band doc counts from the parquet equal the in-memory
    band frame's."""
    built = {
        (r["band"], r["n_rows"], r["n_docs"])
        for r in dedup.dedup_index_build(spark, sf_dir).collect()
    }
    from etl_stocks_with_sentiment_analysis_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    bands = dedup._band_signatures(dedup._minhash_signatures(docs)).filter(
        F.col("doc_id") % 10 != 0
    )
    expect = {
        (r["band"], r["n_rows"], r["n_docs"])
        for r in bands.groupBy("band")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .collect()
    }
    assert built == expect


def test_upsert_commit_modes_produce_identical_tables(spark, tmp_path):
    """rename and manifest commit modes share one merge semantics: the
    same upsert sequence must yield identical final contents."""
    rows = spark.createDataFrame(
        [(1, "2024-01-01", "a"), (1, "2024-01-02", "b"), (2, "2024-01-01", "c")],
        "ticker INT, date STRING, val STRING",
    )
    clash = spark.createDataFrame(
        [(1, "2024-01-01", "NEW"), (3, "2024-01-02", "d")],
        "ticker INT, date STRING, val STRING",
    )
    t_ren = str(tmp_path / "ren")
    t_man = str(tmp_path / "man")
    for t, mode in ((t_ren, "rename"), (t_man, "manifest")):
        sinks.upsert(
            spark, t, rows, ["ticker", "date"],
            partition_col="date", commit_mode=mode,
        )
        sinks.upsert(
            spark, t, clash, ["ticker", "date"],
            partition_col="date", commit_mode=mode,
        )
    got_ren = _rows(spark.read.parquet(t_ren).select("ticker", "date", "val"))
    got_man = _rows(
        sinks.read_manifest_table(spark, t_man).select("ticker", "date", "val")
    )
    assert got_ren == got_man
    assert ("1", "2024-01-01", "NEW") in got_man
