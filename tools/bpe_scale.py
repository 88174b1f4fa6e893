"""BPE tokenization wall comparison: in-expression vocab scan vs the
broadcast longest-prefix join, at the pinned 200-entry vocab and the
5.7k-entry bigvocab fixture (r15, judge item 2).

The r14 family embeds the vocab in the fold expression — O(|vocab|)
per character step — which is fine at ~200 entries and documented as
demo-scale. The r15 `_bpe_join_walk` family ships the vocab as a
broadcast frame and probes it by hash-join equality — O(Lmax) per
step, independent of |vocab|. This tool measures all four quadrants
(implementation x vocab size) on the sf0.1 documents so PERF.md can
carry the crossover: where the in-expression scan stops being viable
and the join becomes the only plan.

Usage: python tools/bpe_scale.py [--base /root/testdata/sf0.1]
Appends/replaces a section in PERF.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from etl_stocks_with_sentiment_analysis_spark.llmdata import text as T  # noqa: E402
from etl_stocks_with_sentiment_analysis_spark.session import get_spark  # noqa: E402
from etl_stocks_with_sentiment_analysis_spark.sources import load_table  # noqa: E402


def _inexpr_counts(docs, vocab):
    """The r14 in-expression fold, parameterized by vocab (the
    registered key pins _BPE_VOCAB; this builds the same expression
    for an arbitrary list so the 5.7k quadrant is measurable)."""
    voc = ", ".join(f"'{v}'" for v in vocab)
    word = (
        "aggregate(sequence(1, length(lower(w))),"
        " named_struct('rem', lower(w), 'cnt', CAST(0 AS LONG)),"
        " (st, i) -> IF(st.rem = '', st, named_struct("
        "'rem', substring(st.rem, coalesce(array_max(transform(filter("
        f"array({voc}), p -> startswith(st.rem, p)),"
        " p -> length(p))), 1) + 1),"
        " 'cnt', st.cnt + CAST(1 AS LONG))),"
        " st -> st.cnt)"
    )
    doc = (
        "aggregate(transform(split(text, ' '), w -> "
        + word
        + "), CAST(0 AS LONG), (a, x) -> a + x)"
    )
    return docs.select("doc_id", F.expr(doc).alias("n_bpe_tokens"))


def _join_counts(spark, docs, vocab, lmax):
    """The r15 join walk, parameterized by vocab."""
    saved_v, saved_l = T._BIGVOCAB, T._BIGVOCAB_LMAX
    T._BIGVOCAB, T._BIGVOCAB_LMAX = vocab, lmax
    try:
        seg = T._bpe_join_walk(spark, docs)
        return seg.groupBy("doc_id").agg(
            F.sum(F.size("toks")).cast("long").alias("n_bpe_tokens")
        )
    finally:
        T._BIGVOCAB, T._BIGVOCAB_LMAX = saved_v, saved_l


def wall(make, reps: int = 3) -> tuple[float, str]:
    try:
        make().write.format("noop").mode("overwrite").save()  # warm
        walls = []
        for _ in range(reps):
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        walls.sort()
        return walls[len(walls) // 2], ""
    except Exception as e:  # noqa: BLE001 - a quadrant may not plan at all
        return float("nan"), f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    spark = get_spark("bpe-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.base, "documents")

    small = T._BPE_VOCAB
    big = T._BIGVOCAB
    lmax_small = max(len(p) for p in small)
    rows = []
    for label, make in [
        (f"in-expression, {len(small)} pieces (r14 key)",
         lambda: _inexpr_counts(docs, small)),
        (f"in-expression, {len(big)} pieces",
         lambda: _inexpr_counts(docs, big)),
        (f"broadcast join, {len(small)} pieces",
         lambda: _join_counts(spark, docs, small, lmax_small)),
        (f"broadcast join, {len(big)} pieces (r15 key)",
         lambda: _join_counts(spark, docs, big, T._BIGVOCAB_LMAX)),
    ]:
        w, err = wall(make)
        rows.append((label, w, err))
        print(label, "->", f"{w:.2f}s" if w == w else f"FAILED ({err})")

    lines = [
        "",
        "## BPE tokenization: in-expression scan vs broadcast prefix join (r15)",
        "",
        f"`python tools/bpe_scale.py` at {args.base} (token counts, noop sink,",
        "median of 3 after warm). The in-expression fold scans the whole vocab",
        "per character step (O(|vocab|)); the join walk probes a broadcast hash",
        "table per candidate length (O(Lmax), |vocab|-independent).",
        "",
        "| implementation x vocab | wall s |",
        "|---|---|",
    ]
    for label, w, err in rows:
        cell = f"{w:.2f}" if w == w else f"failed: {err}"
        lines.append(f"| {label} | {cell} |")
    lines.append("")

    path = os.path.join(repo, "PERF.md")
    marker = "## BPE tokenization: in-expression scan vs broadcast prefix join"
    with open(path) as f:
        text = f.read()
    if marker in text:
        head, _, rest = text.partition(marker)
        nxt = rest.find("\n## ")
        text = head.rstrip("\n") + "\n" + (rest[nxt + 1:] if nxt >= 0 else "")
    with open(path, "w") as f:
        f.write(text.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print("wrote PERF.md section")


if __name__ == "__main__":
    main()
