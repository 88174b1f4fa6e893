"""U1/U2/U3 surface: the Arrow-batched Python stages must agree with
their JVM-expression twins (same semantics, different physical path)."""

from etl_stocks_with_sentiment_analysis_spark.llmdata import enrich, multimodal
from etl_stocks_with_sentiment_analysis_spark.operators.sources_ops import (
    source_enrich_llm,
)
from etl_stocks_with_sentiment_analysis_spark.sources import load_table


def as_rowset(df, cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_mapinpandas_enrich_matches_jvm_rules(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    py = enrich.enrich_map_in_pandas(docs)
    jvm = source_enrich_llm(spark, sf_dir)
    cols = ["doc_id", "sentiment", "topic"]
    assert as_rowset(py, cols) == as_rowset(jvm, cols)


def test_multimodal_features_match_metadata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    feats = multimodal.extract_features(multimodal.with_binary_payload(docs))
    meta = multimodal.multimodal_metadata(spark, sf_dir)
    a = as_rowset(feats, ["doc_id", "n_bytes", "origin"])
    b = as_rowset(meta, ["doc_id", "n_bytes", "origin"])
    assert a == b


def test_decode_stub_is_deterministic_and_guards():
    import pytest

    out1 = multimodal.decode_stub(b"abc")
    out2 = multimodal.decode_stub(b"abc")
    assert out1 == out2 and out1["n_bytes"] == 3
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(None)
