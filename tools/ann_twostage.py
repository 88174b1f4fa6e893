"""Two-stage IVFADC probe at production dims (r14).

`similarity_index_probe_pq`'s pitch is that ADC over stored codes (m
table lookups per pair) beats the exact O(d) dot product AT HIGH
DIMS. This tool measures it where the claim lives: build the
persisted index on the seeded clustered corpus at each dim (PQ
geometry m = dim/8 stored with the index), then time the PLAIN exact
probe vs the TWO-STAGE probe (ADC shortlist -> exact re-rank on the
survivors) with the same queries, and report the two-stage recall@3
against the plain probe's results (the stage can only lose what the
16-bit codes mis-rank; shortlist size is the dial).

Writes the `## Two-stage IVFADC probe at high dims (r14)` section of
ML_BASELINE.md.

Usage: python tools/ann_twostage.py [--n 40000] [--groups 400]
       [--dims 256 1536] [--shortlist 32]
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from etl_stocks_with_sentiment_analysis_spark.llmdata import similarity as sim  # noqa: E402
from etl_stocks_with_sentiment_analysis_spark.session import get_spark  # noqa: E402
from tools.ivf_clustered import build_clustered, timed_median  # noqa: E402
from tools.ivf_recall import replace_section  # noqa: E402

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def queries_frame(spark, sf_dir: str):
    return (
        sim._scaled_vectors(spark, sf_dir)
        .filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )


def top3(df) -> dict[int, list[int]]:
    out: dict[int, list[int]] = {}
    for r in sorted(
        df.collect(), key=lambda r: (r["q_id"], -r["cosine"], r["vec_id"])
    ):
        out.setdefault(r["q_id"], []).append(r["vec_id"])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40000)
    ap.add_argument("--groups", type=int, default=400)
    ap.add_argument("--dims", type=int, nargs="+", default=[256, 1536])
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--shortlist", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("ann-twostage")
    spark.sparkContext.setLogLevel("ERROR")
    lines = [
        "",
        f"Measured {datetime.date.today()} on the seeded clustered corpus "
        f"(n={args.n}, groups={args.groups}; `tools/ann_twostage.py`). "
        "Index BUILT ONCE per dim (PQ geometry m = dim/8 persisted in "
        "pq_meta), plain exact probe vs two-stage "
        f"(ADC shortlist {args.shortlist} -> exact re-rank), nprobe=2, "
        "k=3, median of 3. `recall vs plain` counts the two-stage "
        "top-3 hits against the plain probe's top-3 — what the ADC "
        "stage's 2-bit codes mis-rank out of the shortlist.",
        "",
        "| dim | m | plain probe s | two-stage s | ratio | recall vs plain |",
        "|---|---|---|---|---|---|",
    ]
    for dim in args.dims:
        out = f"/tmp/ann_ts_{dim}"
        sigma = args.noise * (64.0 / dim) ** 0.5
        print(f"== dim={dim}: corpus (sigma={sigma:.4f}) ...", flush=True)
        build_clustered(spark, out, args.n, args.groups, sigma, dim=dim)
        idx = os.path.join(REPO, ".scratch", f"ann_ts_idx_{dim}")
        sim.build_ann_index(
            spark,
            sim._scaled_vectors(spark, out),
            idx,
            pq_m=dim // 8,
            pq_dsub=8,
        )
        q = queries_frame(spark, out)
        plain_df = sim.probe_ann_index(spark, idx, q, nprobe=2, k=3)
        plain_top = top3(plain_df)
        plain_wall = timed_median(
            lambda: sim.probe_ann_index(spark, idx, q, nprobe=2, k=3)
            .write.format("noop").mode("overwrite").save()
        )
        ts = lambda: sim.probe_ann_index(
            spark, idx, q, nprobe=2, k=3, pq_shortlist=args.shortlist
        )
        ts_top = top3(ts())
        ts_wall = timed_median(
            lambda: ts().write.format("noop").mode("overwrite").save()
        )
        hits = sum(
            len(set(ts_top.get(qid, [])) & set(want))
            for qid, want in plain_top.items()
        )
        total = sum(len(v) for v in plain_top.values())
        rec = round(hits / total, 3) if total else float("nan")
        ratio = round(ts_wall / plain_wall, 2) if plain_wall else float("nan")
        print(
            f"dim={dim}: plain {plain_wall}s, two-stage {ts_wall}s "
            f"(ratio {ratio}), recall-vs-plain {rec}",
            flush=True,
        )
        lines.append(
            f"| {dim} | {dim // 8} | {plain_wall} | {ts_wall} | {ratio} "
            f"| {rec} |"
        )
    lines.append("")
    replace_section(
        os.path.join(REPO, "ML_BASELINE.md"),
        "## Two-stage IVFADC probe at high dims (r14)",
        "\n".join(lines),
    )


if __name__ == "__main__":
    main()
