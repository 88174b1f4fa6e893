"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so DECODE IS STUBBED (a
deterministic fake behind `decode_stub`; the real implementation slot
raises NotImplementedError) — but everything Spark-side is real and
tested: binary column schema, metadata projection, Arrow batch shape
through mapInPandas, and partition-friendly layout.

At 100 TB: payloads stay as parquet binary chunks co-located with
metadata; feature extraction is an Arrow-batched mapInPandas stage so
each task decodes its partition's blobs without driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata (schema layer).

    Test stand-in: UTF-8 bytes of `text` play the role of an
    image/audio blob; metadata mirrors what a real ingest would carry.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder (REAL CODECS NOT AVAILABLE HERE).

    Production slot: replace with PIL/libav decode. Raises for
    unsupported modes like a real decoder would.
    """
    if payload is None:
        raise NotImplementedError("real decoder required for empty payloads")
    return {"n_bytes": len(payload), "checksum": sum(payload) % 65536}


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas — the real plumbing; the per-blob decode is stubbed).
    """
    schema = "doc_id BIGINT, n_bytes BIGINT, checksum BIGINT, origin STRING"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                    "origin": [m["origin"] for m in pdf["meta"]],
                }
            )

    return df.mapInPandas(gen, schema)


@register(
    "multimodal_metadata",
    oracle="""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       'application/octet-stream' AS mime,
       source AS origin
FROM documents""",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over binary payloads (JVM-side)."""
    docs = load_table(spark, sf_dir, "documents")
    b = with_binary_payload(docs)
    return b.select(
        "doc_id",
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.origin").alias("origin"),
    )


@register("multimodal_features", oracle=None)  # Python stage → rows-only check
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end binary→features pipeline through mapInPandas (the
    decode step is the documented stub). Rows-only driver check; exact
    equivalence with a relational oracle is asserted in
    tests/test_multimodal.py."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(docs))
