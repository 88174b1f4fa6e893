"""Multi-writer commit throughput (r15, judge item 6).

The manifest CAS protocol is fuzz-proven SAFE (two-writer races,
SIGKILL victims, emulated object-store semantics — tests/), but was
never MEASURED under contention. This tool drives N concurrent
committers against one table and reports commits/s plus
retries-per-commit, at two layers:

1. FULL COMMITS — N separate PROCESSES, each with its own
   SparkSession, upserting 1-row frames into ONE shared manifest
   table over the POSIX-link CAS (the data write is deliberately
   tiny so the wall measures the commit protocol: resolve latest ->
   write snapshot -> merge -> CAS publish -> retry on conflict).
2. PROTOCOL-ONLY — N processes racing the bare resolve+CAS loop
   (list log dir -> next version -> create-if-absent, with the same
   jittered backoff policy the engine's retry loops use; pass
   backoff=False to _proto_writer for the r15 A/B) with NO Spark,
   on (a) the POSIX link(2) path and (b) the emulated object store
   in both conditional-PUT (S3 If-None-Match) and HDFS
   rename-semantics modes. This isolates the arbitration primitive
   from JVM/dataflow noise — the number that matters at 1000
   executors is how fast the protocol converges when k writers pile
   on one table.

Usage: python tools/commit_throughput.py [--writers 2 8 32]
       [--commits 6] [--proto-commits 120]
Appends/replaces a section in PERF.md.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)


# --- full-commit writer (own process, own SparkSession) -----------------


def _full_writer(root: str, target: str, wid: int, n_commits: int, log: str):
    sys.path.insert(0, REPO)
    # at 32 oversubscribed writer JVMs the SYSTEM commits ~0.3/s, so a
    # single fair wait can exceed the default 120 s contention budget —
    # raise it for the harness (the measurement is throughput, not
    # per-commit latency)
    os.environ.setdefault("SPARK_MANIFEST_CAS_BUDGET", "900")
    from pyspark.sql import SparkSession

    from etl_stocks_with_sentiment_analysis_spark.operators import sinks

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"commit-tp-{wid}")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", f"{root}/spark_wh_{wid}")
        .getOrCreate()
    )
    # settle JVM + first-job overhead before the timed window
    df = spark.createDataFrame([(wid, 0)], "k long, v long")
    df.count()
    t0 = time.time()
    for seq in range(n_commits):
        row = spark.createDataFrame(
            [(wid * 1000 + seq, seq)], "k long, v long"
        )
        sinks.upsert(spark, target, row, ["k"])
    t1 = time.time()
    with open(log, "a") as f:
        f.write(
            json.dumps(
                {
                    "wid": wid,
                    "start": t0,
                    "end": t1,
                    "commits": n_commits,
                    "conflicts": sinks.CAS_STATS["conflicts"],
                    "publishes": sinks.CAS_STATS["publishes"],
                }
            )
            + "\n"
        )
    spark.stop()


# --- protocol-only writer (no Spark) -------------------------------------


def _proto_writer(mode: str, store_root: str, table: str, wid: int,
                  n_commits: int, log: str, backoff: bool = False):
    import random

    sys.path.insert(0, REPO)
    from etl_stocks_with_sentiment_analysis_spark.operators import fsio

    if mode != "posix":
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from test_round14_objectstore import FakeObjectStore

        fsio.register_fake_store(
            "mock",
            FakeObjectStore(
                store_root, conditional_put=(mode == "conditional_put")
            ),
        )
    log_dir = fsio.join(table, "_manifests")
    fsio.mkdirs(log_dir)
    done = 0
    conflicts = 0
    streak = 0
    t0 = time.time()
    while done < n_commits:
        names = [fi.name for fi in fsio.list_status(log_dir)]
        vers = [
            int(n[1:6]) for n in names
            if n.startswith("v") and n.endswith(".json")
        ]
        nxt = (max(vers) + 1) if vers else 0
        try:
            fsio.create_text_if_absent(
                fsio.join(log_dir, f"v{nxt:05d}.json"),
                json.dumps({"writer": wid, "seq": done}),
            )
            done += 1
        except FileExistsError:
            conflicts += 1
            streak += 1
            if backoff:
                time.sleep(
                    min(0.2, 0.002 * streak) * (0.5 + random.random())
                )
            continue
        streak = 0
    t1 = time.time()
    with open(log, "a") as f:
        f.write(
            json.dumps(
                {
                    "wid": wid,
                    "start": t0,
                    "end": t1,
                    "commits": done,
                    "conflicts": conflicts,
                }
            )
            + "\n"
        )


def _launch(n: int, target_fn, make_args, log: str) -> list[dict]:
    if os.path.exists(log):
        os.remove(log)
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=target_fn, args=make_args(w)) for w in range(n)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    rows = []
    with open(log) as f:
        for line in f:
            rows.append(json.loads(line))
    if len(rows) < n:
        # a writer died (e.g. retry exhaustion) — the summary would
        # silently count survivors only, understating contention
        print(f"WARNING: {n - len(rows)} of {n} writers wrote no log "
              "(aborted?) — row is partial", flush=True)
    return rows


def _summarize(rows: list[dict]) -> tuple[float, float, int, int]:
    total = sum(r["commits"] for r in rows)
    conflicts = sum(r["conflicts"] for r in rows)
    wall = max(r["end"] for r in rows) - min(r["start"] for r in rows)
    return total / wall, conflicts / max(total, 1), total, conflicts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--writers", type=int, nargs="*", default=[2, 8, 32])
    ap.add_argument("--commits", type=int, default=6,
                    help="full commits per writer")
    ap.add_argument("--proto-commits", type=int, default=120,
                    help="protocol-only commits per writer")
    ap.add_argument("--layers", nargs="*", default=["proto", "full"],
                    choices=["proto", "full"],
                    help="which layers to run (PERF rows merge across runs)")
    args = ap.parse_args()

    scratch = tempfile.mkdtemp(prefix="committp_", dir=os.path.join(REPO, ".scratch"))
    # (layer, primitive, writers) -> (commits/s, retries/commit); rows
    # from previous partial runs are merged back in so `--layers proto`
    # and `--layers full` can run separately without clobbering.
    results: dict[tuple[str, str, int], tuple[str, str]] = {}

    if "proto" in args.layers:
        for n in args.writers:
            for mode, label in (
                ("posix", "POSIX link(2)"),
                ("conditional_put", "store: If-None-Match PUT"),
                ("hdfs", "store: create(overwrite=false)"),
            ):
                root = os.path.join(scratch, f"proto_{mode}_{n}")
                os.makedirs(root, exist_ok=True)
                table = (
                    f"mock://bucket/tbl_{mode}_{n}"
                    if mode != "posix"
                    else os.path.join(root, "tbl")
                )
                log = os.path.join(root, "log.jsonl")
                rows = _launch(
                    n,
                    _proto_writer,
                    lambda w: (mode, root, table, w, args.proto_commits, log, True),
                    log,
                )
                cps, rpc, total, conf = _summarize(rows)
                print(f"proto {label} x{n}: {cps:.1f} commits/s, "
                      f"{rpc:.2f} retries/commit ({total} commits, {conf} conflicts)")
                results[("protocol-only", label, n)] = (f"{cps:.1f}", f"{rpc:.2f}")

    if "full" in args.layers:
        for n in args.writers:
            root = os.path.join(scratch, f"full_{n}")
            os.makedirs(root, exist_ok=True)
            target = os.path.join(root, "wh", "tp_table")
            log = os.path.join(root, "log.jsonl")
            rows = _launch(
                n,
                _full_writer,
                lambda w: (root, target, w, args.commits, log),
                log,
            )
            cps, rpc, total, conf = _summarize(rows)
            print(f"full POSIX x{n}: {cps:.2f} commits/s, "
                  f"{rpc:.2f} retries/commit ({total} commits, {conf} conflicts)")
            results[("full commit (Spark upsert)", "POSIX link(2)", n)] = (
                f"{cps:.2f}", f"{rpc:.2f}",
            )

    path = os.path.join(REPO, "PERF.md")
    marker = "## Multi-writer commit throughput (r15)"
    with open(path) as f:
        text = f.read()
    if marker in text:
        head, _, rest = text.partition(marker)
        nxt = rest.find("\n## ")
        section, text = (
            rest[: nxt + 1] if nxt >= 0 else rest,
            head.rstrip("\n") + "\n" + (rest[nxt + 1:] if nxt >= 0 else ""),
        )
        for ln in section.splitlines():
            cells = [c.strip() for c in ln.strip().strip("|").split("|")]
            if len(cells) == 5 and cells[2].isdigit():
                key = (cells[0], cells[1], int(cells[2]))
                results.setdefault(key, (cells[3], cells[4]))
    lines = [
        "",
        marker,
        "",
        "`python tools/commit_throughput.py` — N concurrent writer",
        f"processes against ONE manifest table; {args.commits} full commits or",
        f"{args.proto_commits} protocol-only commits per writer. commits/s is",
        "total successful commits over the overlapped wall; retries/commit is",
        "CAS conflicts per successful publish (the protocol's convergence",
        "cost under contention — safety is covered by the fuzz suites).",
        "",
        "| layer | CAS primitive | writers | commits/s | retries/commit |",
        "|---|---|---|---|---|",
    ]
    for (layer, label, n), (cps, rpc) in sorted(
        results.items(), key=lambda kv: (kv[0][0], kv[0][1], kv[0][2])
    ):
        lines.append(f"| {layer} | {label} | {n} | {cps} | {rpc} |")
    lines.append("")
    with open(path, "w") as f:
        f.write(text.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    shutil.rmtree(scratch, ignore_errors=True)
    print("wrote PERF.md section")


if __name__ == "__main__":
    main()
