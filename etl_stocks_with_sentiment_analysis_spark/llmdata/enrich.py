"""U1/U2 — the Python-UDF surface (SURVEY.md §2.11).

U1: the reference's only true row-wise black-box UDF is the LLM
enrichment call (`/root/reference/airflow/dags/stock_grok_pipeline.py:216-260`).
Here it is an Arrow-batched mapInPandas stage running a deterministic
rule classifier (network-free per BASELINE.json); the JVM-expression
twin is operators/sources_ops.source_enrich_llm — same semantics, so
U1 gets a real SQL oracle too.

U2: `groupby().apply()` (`ml/feature_engineering.py:111-131`) maps to
applyInPandas. Demonstrated with a per-ticker min-max normalization
whose semantics are also SQL-expressible (window min/max), giving the
grouped-map path an exact oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import panel
from ..registry import register
from ..sources import load_table


def classify_batch(texts: pd.Series) -> pd.DataFrame:
    """The deterministic stand-in for the LLM call: rule-based
    sentiment/topic. Vectorized pandas — one Arrow batch at a time."""
    has_fast = texts.str.contains("fast", regex=False)
    has_slow = texts.str.contains("slow", regex=False)
    sentiment = np.where(
        has_fast & has_slow,
        "neutral",
        np.where(has_fast, "positive", np.where(has_slow, "negative", "neutral")),
    )
    topic = np.where(
        texts.str.contains("join", regex=False),
        "joins",
        np.where(
            texts.str.contains("window", regex=False),
            "windows",
            np.where(texts.str.contains("stream", regex=False), "streaming", "general"),
        ),
    )
    return pd.DataFrame({"sentiment": sentiment, "topic": topic})


def enrich_map_in_pandas(docs: DataFrame) -> DataFrame:
    """U1 — Arrow-batched enrichment stage (mapInPandas)."""
    schema = "doc_id BIGINT, sentiment STRING, topic STRING"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = classify_batch(pdf["text"])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return docs.mapInPandas(gen, schema)


@register(
    "udf_enrich_row",
    oracle="""
SELECT doc_id,
       CASE WHEN POSITION('fast' IN text) > 0 AND POSITION('slow' IN text) > 0 THEN 'neutral'
            WHEN POSITION('fast' IN text) > 0 THEN 'positive'
            WHEN POSITION('slow' IN text) > 0 THEN 'negative'
            ELSE 'neutral' END AS sentiment,
       CASE WHEN POSITION('join' IN text) > 0 THEN 'joins'
            WHEN POSITION('window' IN text) > 0 THEN 'windows'
            WHEN POSITION('stream' IN text) > 0 THEN 'streaming'
            ELSE 'general' END AS topic
FROM documents""",
)
def udf_enrich_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — the enrichment UDF through the actual Python/Arrow path."""
    return enrich_map_in_pandas(load_table(spark, sf_dir, "documents"))


@register(
    "udf_grouped_apply",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker, date,
       CASE WHEN mx > mn THEN (close - mn) / (mx - mn) ELSE 0.5 END AS norm_close
FROM (
  SELECT ticker, date, close,
         MIN(close) OVER (PARTITION BY ticker) AS mn,
         MAX(close) OVER (PARTITION BY ticker) AS mx
  FROM prices
)""",
    ),
)
def udf_grouped_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — grouped-map UDF (applyInPandas): per-ticker min-max
    normalization of close. min/max are exact and the division is
    deterministic IEEE, so the pandas path hash-matches the SQL oracle."""
    prices = panel.prices(spark, sf_dir)
    schema = "ticker BIGINT, date DATE, norm_close DOUBLE"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["close"].min(), pdf["close"].max()
        rng = mx - mn
        vals = (
            (pdf["close"] - mn) / rng if rng > 0 else pd.Series(0.5, index=pdf.index)
        )
        return pd.DataFrame(
            {"ticker": pdf["ticker"], "date": pdf["date"], "norm_close": vals}
        )

    return prices.groupBy("ticker").applyInPandas(norm, schema)
