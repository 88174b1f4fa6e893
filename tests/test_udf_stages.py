"""U1/U2/U3 surface: the Arrow-batched Python stages must agree with
their JVM-expression twins (same semantics, different physical path)."""

import pandas as pd
import pytest

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


def test_real_decode_on_generated_ppms(spark):
    """The pure-Python PPM decoder runs UNGATED in every environment:
    generate real P6 blobs, push them through the same mapInPandas
    plumbing, and recover dimensions + pixel stats per image."""
    def ppm(w, h, val):
        return b"P6\n%d %d\n255\n" % (w, h) + bytes([val]) * (w * h * 3)

    rows = [(1, ppm(8, 4, 7)), (2, ppm(16, 2, 200))]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    schema = "doc_id BIGINT, width BIGINT, height BIGINT, pixel_sum BIGINT"

    def gen(batches):
        for pdf in batches:
            feats = [multimodal.decode_ppm(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "pixel_sum": [f["pixel_sum"] for f in feats],
                }
            )

    out = {r["doc_id"]: r for r in df.mapInPandas(gen, schema).collect()}
    assert out[1]["width"] == 8 and out[1]["height"] == 4
    assert out[1]["pixel_sum"] == 8 * 4 * 3 * 7
    assert out[2]["width"] == 16 and out[2]["pixel_sum"] == 16 * 2 * 3 * 200
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"PNG not a ppm")
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n4 4\n255\n" + b"x" * 5)  # truncated
    with pytest.raises(ValueError):
        # 2-byte samples: refusing beats slicing half the pixel array
        multimodal.decode_ppm(b"P6\n2 2\n65535\n" + b"x" * 24)
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n2 2\n0\n" + b"x" * 12)  # maxval 0
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n0 2\n255\n")  # zero width


@pytest.mark.skipif(not multimodal.HAS_PIL, reason="PIL not in this image")
def test_real_decode_on_generated_pngs(spark):
    """When PIL is present, the SAME mapInPandas plumbing decodes real
    PNGs end-to-end (width/height/mode recovered per blob)."""
    import io

    from PIL import Image

    def png(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png(8, 4)), (2, png(16, 2))]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    schema = "doc_id BIGINT, width INT, height INT, mode STRING"

    def gen(batches):
        for pdf in batches:
            feats = [multimodal.decode_image(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mode": [f["mode"] for f in feats],
                }
            )

    out = {r["doc_id"]: r for r in df.mapInPandas(gen, schema).collect()}
    assert out[1]["width"] == 8 and out[1]["height"] == 4
    assert out[2]["width"] == 16 and out[2]["mode"] == "RGB"
    resized = multimodal.resize_image(png(256, 128))
    w, h = Image.open(io.BytesIO(resized)).size
    assert (w, h) == (64, 32)  # thumbnail preserves aspect under 64x64
