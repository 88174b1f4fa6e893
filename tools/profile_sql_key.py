"""Per-statement wall attribution for execute_sql-driven keys.

Wraps `sqldml.execute_sql` with a timer, runs the key once warm and
once measured, and prints each SQL statement's wall — the attribution
a cProfile cumulative view smears across the dispatcher.

Usage: python tools/profile_sql_key.py <key> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_stocks_with_sentiment_analysis_spark import registry
from etl_stocks_with_sentiment_analysis_spark.operators import sqldml
from etl_stocks_with_sentiment_analysis_spark.session import get_spark


def main() -> None:
    key = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile-sql-key")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm

    rows: list[tuple[float, str]] = []
    real = sqldml.execute_sql

    def timed(spark_, sql_text, params=None):
        t0 = time.time()
        out = real(spark_, sql_text, params=params)
        rows.append((time.time() - t0, " ".join(sql_text.split())[:110]))
        return out

    sqldml.execute_sql = timed
    try:
        t0 = time.time()
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
    finally:
        sqldml.execute_sql = real

    print(f"total wall: {wall:.3f}s over {len(rows)} statements")
    for secs, stmt in rows:
        print(f"{secs:7.3f}s  {stmt}")
    print(f"sum of statements: {sum(s for s, _ in rows):.3f}s "
          f"(rest = plan build + final noop write)")


if __name__ == "__main__":
    main()
