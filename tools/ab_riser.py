"""Same-box A/B for bench risers (r8 judge item 2; widened r10 to the
panel-family keys the r9 verdict flagged: `agg_accuracy_by_stock`
+61%, `rollup_time_hierarchy` +45%, `join_asof_latest_explanation`
+44%, `join_left_prices_grok` +33%). Run from INSIDE each git
worktree (r8 tip 864f9fd, HEAD) on the same box back-to-back; the
package is imported from the CURRENT DIRECTORY so one copy of this
script can drive any checkout. Times each key at sf0.1 with 1 warm +
5 timed runs and prints one JSON line with median + spread, the
protocol bench.py uses (see PERF.md "bench medians and cold start":
first-key JIT absorbs ~7s, so the warm run is mandatory and only
medians are comparable).

Usage:  python tools/ab_riser.py [label] [key ...]
        (default keys: the four r9 panel-family risers)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from etl_stocks_with_sentiment_analysis_spark import registry  # noqa: E402
from etl_stocks_with_sentiment_analysis_spark.session import get_spark  # noqa: E402

DEFAULT_KEYS = [
    "agg_accuracy_by_stock",
    "rollup_time_hierarchy",
    "join_asof_latest_explanation",
    "join_left_prices_grok",
]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    keys = sys.argv[2:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-riser")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    out = {}
    for key in keys:
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(5):
            t0 = time.time()
            qs[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
        walls.sort()
        out[key] = {
            "median": round(walls[2], 3),
            "spread": [round(walls[0], 3), round(walls[-1], 3)],
        }
    print(json.dumps({"label": label, "sf_dir": sf_dir, "keys": out}))


if __name__ == "__main__":
    main()
