"""Profile one registered query key's driver-side execution.

Runs the key once warm, then once under cProfile, and prints the top
driver-side calls by cumulative time. Py4J socket waits attribute to
their Python callers, so this shows WHICH engine call (commit, read,
refresh, collect) blocks the wall — the per-statement attribution the
bench's single wall number can't give.

Usage: python tools/profile_key.py <key> [sf_dir] [--sort cumulative]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_stocks_with_sentiment_analysis_spark import registry
from etl_stocks_with_sentiment_analysis_spark.session import get_spark


def main() -> None:
    key = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile-key")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    def run_once() -> float:
        t0 = time.time()
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    warm = run_once()  # JIT + listing warm-up, matches bench methodology
    print(f"warm wall: {warm:.3f}s")

    pr = cProfile.Profile()
    pr.enable()
    t0 = time.time()
    qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    pr.disable()
    print(f"profiled wall: {wall:.3f}s")

    buf = io.StringIO()
    stats = pstats.Stats(pr, stream=buf)
    stats.sort_stats("cumulative").print_stats(45)
    print(buf.getvalue())


if __name__ == "__main__":
    main()
