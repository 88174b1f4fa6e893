"""IVF recall + scale-band measurement (r5 verdict item #6).

Measures, at sf0.1 and at a k-replicated corpus (default 128x):

- recall@3 of `ivf_topk` vs exact brute-force ground truth, per nprobe
  (the recall dial) — ground truth computed in numpy on the driver
  (a MEASUREMENT tool only: 256k x 64 doubles is 131 MB; the engine's
  own brute-force key stays the in-plan baseline);
- the IVF wall-time ratio with a REPEAT-RUN BAND (min/median/max over
  --repeats runs at both scales), so the round-over-round number has
  an honest noise interval instead of a single draw.

Rewrites the `## ANN recall` section of ML_BASELINE.md (marker-scoped:
tools/ml_baseline.py regenerates the rest of that file) and the
`## IVF 128x repeat-run band` section of EXTRAPOLATION_CORPUS.md.

Usage: python tools/ivf_recall.py [--k 128] [--repeats 3] [--nprobes 1 2 4]
"""

from __future__ import annotations

import argparse
import datetime
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from etl_stocks_with_sentiment_analysis_spark.llmdata.similarity import (  # noqa: E402
    _scaled_vectors,
    ivf_topk,
)
from etl_stocks_with_sentiment_analysis_spark.session import get_spark  # noqa: E402
from tools.extrapolate_corpus import build_scaled  # noqa: E402

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def ground_truth_top3(spark, sf_dir: str) -> dict[int, list[int]]:
    """Exact cosine top-3 per query (vec_id % 100 == 0, self excluded),
    same tie-break as the engine (cosine desc, vec_id asc)."""
    rows = _scaled_vectors(spark, sf_dir).collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    nrm = np.sqrt((X * X).sum(axis=1))
    q_mask = ids % 100 == 0
    Q, q_ids = X[q_mask], ids[q_mask]
    # cosine matrix in blocks to bound memory at high k
    out: dict[int, list[int]] = {}
    order = np.argsort(ids)  # vec_id-asc secondary key via stable sort
    X_o, ids_o, nrm_o = X[order], ids[order], nrm[order]
    block = 256
    for s in range(0, len(q_ids), block):
        qb = Q[s : s + block]
        qn = np.sqrt((qb * qb).sum(axis=1))
        cos = (qb @ X_o.T) / (qn[:, None] * nrm_o[None, :])
        for i, qid in enumerate(q_ids[s : s + block]):
            row = cos[i].copy()
            row[ids_o == qid] = -np.inf  # exclude self
            # stable sort on -cosine keeps vec_id-asc among exact ties
            top = np.argsort(-row, kind="stable")[:3]
            out[int(qid)] = [int(ids_o[j]) for j in top]
    return out


def ivf_top3(spark, sf_dir: str, nprobe: int) -> dict[int, list[int]]:
    rows = ivf_topk(spark, sf_dir, nprobe=nprobe, k=3).collect()
    out: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["q_id"], -r["cosine"], r["vec_id"])):
        out.setdefault(r["q_id"], []).append(r["vec_id"])
    return out


def recall_at_3(truth: dict, got: dict) -> float:
    num = den = 0
    for qid, t in truth.items():
        g = set(got.get(qid, []))
        num += len(g & set(t))
        den += len(t)
    return num / den if den else float("nan")


def timed_runs(spark, sf_dir: str, repeats: int) -> list[float]:
    """Each recorded wall is the MEDIAN OF 3 back-to-back runs (r7):
    single-shot walls on this shared box carry ±15-25% scheduler
    noise, which made the r6 cross-run ratio band ±25%; medians
    suppress the single-run outliers the band construction is
    sensitive to."""
    df = ivf_topk(spark, sf_dir, nprobe=2, k=3)
    df.write.format("noop").mode("overwrite").save()  # warm
    walls = []
    for _ in range(repeats):
        inner = []
        for _ in range(3):
            t0 = time.time()
            ivf_topk(spark, sf_dir, nprobe=2, k=3).write.format("noop").mode(
                "overwrite"
            ).save()
            inner.append(time.time() - t0)
        walls.append(round(statistics.median(inner), 2))
    return walls


def replace_section(path: str, header: str, body: str) -> None:
    """Replace the markdown section starting at `header` (to the next
    '## ' or EOF), or append it."""
    try:
        text = open(path).read()
    except FileNotFoundError:
        text = ""
    if header in text:
        start = text.index(header)
        rest = text[start + len(header):]
        nxt = rest.find("\n## ")
        tail = rest[nxt:] if nxt != -1 else ""
        text = text[:start] + header + body + tail
    else:
        text = text.rstrip() + "\n\n" + header + body
    with open(path, "w") as f:
        f.write(text)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--nprobes", type=int, nargs="*", default=[1, 2, 4])
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("ivf-recall")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = os.path.join(REPO, ".scratch", f"corpus{args.k}x")
    if not os.path.isdir(os.path.join(scaled, "embeddings.parquet")):
        build_scaled(spark, args.base, scaled, args.k)

    # --- recall curves -------------------------------------------------
    truth_base = ground_truth_top3(spark, args.base)
    recalls_base = {
        p: round(recall_at_3(truth_base, ivf_top3(spark, args.base, p)), 3)
        for p in args.nprobes
    }
    truth_big = ground_truth_top3(spark, scaled)
    recalls_big = {
        p: round(recall_at_3(truth_big, ivf_top3(spark, scaled, p)), 3)
        for p in args.nprobes
    }

    # --- repeat-run wall band -------------------------------------------
    base_walls = timed_runs(spark, args.base, args.repeats)
    big_walls = timed_runs(spark, scaled, args.repeats)
    med_b, med_g = statistics.median(base_walls), statistics.median(big_walls)
    ratios = sorted(g / b for g in big_walls for b in base_walls)
    today = datetime.date.today().isoformat()

    hdr = "## ANN recall — `ivf_topk` vs exact ground truth (k=3)\n"
    body = [
        "",
        f"Measured {today} (r7, `python tools/ivf_recall.py --k {args.k} "
        f"--repeats {args.repeats}`), hierarchical content-keyed IVF with "
        "exact-cosine re-rank of the pooled candidates; nprobe is the "
        "recall dial. Ground truth: exact cosine top-3 per query "
        "(numpy, same tie-break). Embeddings are uniform-RANDOM "
        "synthetic — no cluster structure, ANN's worst case; the "
        f"{args.k}x corpus is duplicate-heavy (the production regime).",
        "",
        "| corpus | N | nprobe | recall@3 |",
        "|---|---|---|---|",
    ]
    n_base = len(truth_base) * 100
    n_big = len(truth_big) * 100
    for p in args.nprobes:
        body.append(f"| sf0.1 | {n_base:,} | {p} | {recalls_base[p]} |")
    for p in args.nprobes:
        body.append(f"| {args.k}x replicated | {n_big:,} | {p} | {recalls_big[p]} |")
    body += [
        "",
        f"Registered key pins nprobe=2: recall {recalls_base[2]} at sf0.1 "
        f"(random floor ~{round(2*3/ (n_base**0.5)/3, 3)}), "
        f"{recalls_big[2]} at {args.k}x (duplicates dominate top-3 and the "
        "content-keyed codebook keeps copies co-celled).",
        "",
    ]
    replace_section(os.path.join(REPO, "ML_BASELINE.md"), hdr, "\n".join(body))

    hdr2 = f"## IVF {args.k}x repeat-run band\n"
    body2 = [
        "",
        f"Measured {today} (r7): `similarity_ivf_topk` (nprobe=2) walls over "
        f"{args.repeats} repeats at each scale, warm.",
        "",
        f"- sf0.1 walls: {base_walls} (median {med_b:.2f}s)",
        f"- {args.k}x walls: {big_walls} (median {med_g:.2f}s)",
        f"- median ratio {med_g / med_b:.2f}; cross-run ratio band "
        f"[{ratios[0]:.2f}, {ratios[-1]:.2f}] "
        f"(±{round(100 * (ratios[-1] - ratios[0]) / (2 * med_g / med_b), 0):.0f}% "
        "around the median)",
        "",
    ]
    replace_section(
        os.path.join(REPO, "EXTRAPOLATION_CORPUS.md"), hdr2, "\n".join(body2)
    )
    print("recall base:", recalls_base, "big:", recalls_big)
    print("walls base:", base_walls, "big:", big_walls)


if __name__ == "__main__":
    main()
