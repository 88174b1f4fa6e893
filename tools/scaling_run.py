"""Parallel-scaling evidence run (r16, VERDICT item 4).

At sf0.1 every tracked key's wall is 0.2-7 s and fixed per-job costs
dominate, so 8-vs-32-core ratios sit near 1 and prove nothing about
the operators' parallelism. This tool synthesizes a 10x-sf0.1 corpus
(~sf1; deterministic REPLICA SHIFTS of the read-only testdata — the
testdata itself is never modified) into the repo scratch dir, then
times a compute-bound key subset with the bench methodology (1 warm +
3 timed, median, noop sink) at the current $SPARK_GRAFT_CPUS.

Replica construction keeps join/group cardinalities scaling linearly:

- lineitem/orders: l_suppkey (ticker), l_orderkey/o_orderkey shift by
  replica * (max+1) — the prices panel gets 10x tickers, the
  explanations join stays 1:1 per replica.
- events: event_id/user_id shift — 10x users.
- documents: doc_id shifts AND every WORD gets a per-replica token
  transform (translate on the vowel alphabet) — replicas share no
  3-shingles, so MinHash buckets stay sparse and the LSH pipeline
  scales linearly instead of hot buckets growing quadratically (the
  first attempt suffixed one token per text: 10 near-identical
  variants shared most shingles, buckets densified 10x and the
  band self-join exploded ~quadratically — measuring answer-size
  explosion, not operator scaling).
- embeddings: vec_id shifts and every component is perturbed with a
  per-(replica, dimension) deterministic offset — replicas land in
  different sign-LSH buckets, keeping within-bucket pair counts
  linear.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/scaling_run.py [--build-only]
    SPARK_GRAFT_CPUS=8  python tools/scaling_run.py

Prints one JSON line {"cpus": N, "queries": {key: sec}}; PERF.md
records the 8-vs-32 ratio table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_stocks_with_sentiment_analysis_spark import registry
from etl_stocks_with_sentiment_analysis_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
DEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    f"scale{REPLICAS}x_sf0_1",
)

KEYS = [
    "source_market_batch",
    "window_lag_prev_close",
    "window_rsi",
    "agg_accuracy_by_stock",
    "rollup_time_hierarchy",
    "join_left_prices_grok",
    "join_asof_latest_explanation",
    "ml_feature_matrix",
    "text_quality_score",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "similarity_bruteforce_topk",
]


def _shift(df, col, offset):
    from pyspark.sql import functions as F

    return df.withColumn(col, (F.col(col) + F.lit(offset)).cast("bigint"))


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DEST, exist_ok=True)
    marker = os.path.join(DEST, "_built")
    if os.path.exists(marker):
        return
    read = lambda n: spark.read.parquet(os.path.join(SRC, f"{n}.parquet"))
    # 64 output files per scaled table: a replica union otherwise
    # writes ~1 small single-row-group file per replica, capping scan
    # parallelism at ~10 tasks — the scaling run would then measure
    # the file count, not the operators (parquet can't split a file
    # below one row group, so neither maxPartitionBytes nor
    # minPartitionNum can recover splits that don't exist).
    write = lambda df, n: df.repartition(64).write.mode(
        "overwrite"
    ).parquet(os.path.join(DEST, f"{n}.parquet"))

    def replicate(name, make):
        base = read(name)
        maxes = {}
        parts = [make(base, r, maxes) for r in range(REPLICAS)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        write(out, name)

    li = read("lineitem")
    sup_span = li.agg(F.max("l_suppkey")).first()[0] + 1
    ord_span = li.agg(F.max("l_orderkey")).first()[0] + 1

    replicate(
        "lineitem",
        lambda df, r, m: _shift(
            _shift(df, "l_suppkey", r * sup_span), "l_orderkey", r * ord_span
        ),
    )
    replicate(
        "orders",
        lambda df, r, m: _shift(df, "o_orderkey", r * ord_span),
    )
    ev = read("events")
    eid_span = ev.agg(F.max("event_id")).first()[0] + 1
    uid_span = ev.agg(F.max("user_id")).first()[0] + 1
    replicate(
        "events",
        lambda df, r, m: _shift(
            _shift(df, "event_id", r * eid_span), "user_id", r * uid_span
        ),
    )
    docs = read("documents")
    did_span = docs.agg(F.max("doc_id")).first()[0] + 1

    def mk_docs(df, r, m):
        out = _shift(df, "doc_id", r * did_span)
        if r == 0:
            return out
        # rotate the vowel alphabet per replica: every word (hence
        # every 3-shingle) differs across replicas, buckets stay sparse
        src = "aeiou"
        dst = "".join(src[(i + r) % 5] for i in range(5))
        return out.withColumn("text", F.translate("text", src, dst))

    replicate("documents", mk_docs)
    emb = read("embeddings")
    vid_span = emb.agg(F.max("vec_id")).first()[0] + 1

    def mk_emb(df, r, m):
        out = _shift(df, "vec_id", r * vid_span)
        if r == 0:
            return out
        # deterministic per-(replica, dim) offsets large enough to
        # re-draw the sign-LSH bucket bits
        return out.withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, i) -> "
                f"CAST(x + 0.2 * sin(i * 2.399 + {r}) AS FLOAT))"
            ),
        )

    replicate("embeddings", mk_emb)
    # small dimension tables pass through unscaled
    for name in ("region", "nation", "customer", "supplier", "part"):
        if os.path.exists(os.path.join(SRC, f"{name}.parquet")):
            write(read(name), name)
    with open(marker, "w") as f:
        f.write("ok")


def main() -> None:
    spark = get_spark("scaling-run")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    if "--build-only" in sys.argv:
        print(json.dumps({"built": DEST}))
        return
    qs = registry.all_queries()
    keys = [a for a in sys.argv[1:] if not a.startswith("--")] or KEYS
    timings = {}
    for key in keys:
        spark.sparkContext.setJobDescription(f"scale10x {key}")
        df = qs[key](spark, DEST)
        df.write.format("noop").mode("overwrite").save()  # warm
        walls = []
        for _ in range(3):
            t0 = time.time()
            qs[key](spark, DEST).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
        walls.sort()
        timings[key] = round(walls[1], 3)
    print(
        json.dumps(
            {
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0),
                "replicas": REPLICAS,
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
