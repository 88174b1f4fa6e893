"""Capture .explain('formatted') for bench headline queries.

Writes plans/r16/<key>_<tag>.txt for each headline key (or an explicit
key list). Evidence artifact for the optimization round: the judge
checks plan-shape claims (Exchange counts, join strategies,
PushedFilters) against these files.

Usage:
    python tools/capture_plans.py before [key ...]
    python tools/capture_plans.py after  [key ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_stocks_with_sentiment_analysis_spark import registry
from etl_stocks_with_sentiment_analysis_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    keys = sys.argv[2:]
    if not keys:
        import bench

        keys = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    for key in keys:
        try:
            df = qs[key](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 - record the failure as evidence
            plan = f"ERROR capturing plan: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
