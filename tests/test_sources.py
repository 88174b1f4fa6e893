"""S2 retry-reader semantics: a flaky source that fails its first
attempt per marked partition must, after retries, produce the
IDENTICAL DataFrame as a clean read (`stock_grok_pipeline.py:130-156`
re-fetches only failed tickers)."""

import pytest

from pyspark.sql import functions as F

from etl_stocks_with_sentiment_analysis_spark.plans import panel
from etl_stocks_with_sentiment_analysis_spark.sources.readers import read_with_retry


def test_retry_yields_identical_frame(spark, sf_dir):
    base = panel.prices(spark, sf_dir)
    attempts = {}
    retried = []

    def read_bucket(b):
        attempts[b] = attempts.get(b, 0) + 1
        if b in (0, 2) and attempts[b] == 1:
            raise IOError("flaky")
        return base.filter(F.col("ticker") % 4 == b)

    out = read_with_retry(
        [0, 1, 2, 3], read_bucket, on_retry=lambda a, ps: retried.append((a, ps))
    )
    assert retried == [(1, [0, 2])]  # only the failed buckets re-fetched
    assert attempts == {0: 2, 1: 1, 2: 2, 3: 1}
    # identical to the clean read, row for row
    assert out.exceptAll(base).count() == 0
    assert base.exceptAll(out).count() == 0


def test_retry_exhaustion_raises(spark, sf_dir):
    def always_fail(p):
        raise IOError("down")

    with pytest.raises(RuntimeError, match="failed after 2 attempts"):
        read_with_retry([1], always_fail, max_attempts=2)
