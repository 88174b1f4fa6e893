"""Same-box A/B for the r8 bench risers (r9 judge item 2):
`sink_upsert_manifest` (+9% r7->r8) and `dedup_incremental_batch`
(+12%). Run this script from INSIDE each git worktree (r7 tip, r8
tip, HEAD) on the same box back-to-back; it times the two keys at
sf0.1 with 1 warm + 5 timed runs and prints one JSON line with
median + spread, the protocol bench.py uses (see PERF.md "bench
medians and cold start": first-key JIT absorbs ~7s, so the warm run
is mandatory and only medians are comparable).

Usage:  python tools/ab_riser.py [label]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_stocks_with_sentiment_analysis_spark import registry  # noqa: E402
from etl_stocks_with_sentiment_analysis_spark.session import get_spark  # noqa: E402

KEYS = ["sink_upsert_manifest", "dedup_incremental_batch"]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-riser")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    out = {}
    for key in KEYS:
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
