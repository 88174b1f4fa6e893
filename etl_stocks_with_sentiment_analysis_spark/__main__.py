"""CLI — the reference's `cli.py` surface re-expressed for Spark
(`/root/reference/cli.py:104-147`: run / ml-train / ml-predict, plus
`views` for the dashboard layer).

    python -m etl_stocks_with_sentiment_analysis_spark run-pipeline [--sf-dir D]
    python -m etl_stocks_with_sentiment_analysis_spark views [--sf-dir D] [--query SQL]
    python -m etl_stocks_with_sentiment_analysis_spark dashboard [--sf-dir D]
    python -m etl_stocks_with_sentiment_analysis_spark ml-train [--trees N] [--out PATH]
    python -m etl_stocks_with_sentiment_analysis_spark ml-predict [--out CSV_DIR]
    python -m etl_stocks_with_sentiment_analysis_spark table ACTION TARGET [...]
        ACTION: history | count | stats | compact | repartition | clone
                | show | delete | update | repair
    python -m etl_stocks_with_sentiment_analysis_spark sql "SELECT ..." \
        [--table NAME=PATH ...]   # latest-tracking manifest SQL
    python -m etl_stocks_with_sentiment_analysis_spark test [--strict]  # dbt-test analog
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF = "/root/testdata/sf0.001"


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_stocks_with_sentiment_analysis_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run-pipeline", help="build the gold fact table (dbt-run analog)")
    p_run.add_argument("--sf-dir", default=DEFAULT_SF)
    p_run.add_argument("--show", type=int, default=5)

    p_dash = sub.add_parser("dashboard", help="render the dashboard as text")
    p_dash.add_argument("--sf-dir", default=DEFAULT_SF)

    p_views = sub.add_parser("views", help="register the 12 dashboard views")
    p_views.add_argument("--sf-dir", default=DEFAULT_SF)
    p_views.add_argument("--query", default=None, help="optional SQL to run against them")

    p_train = sub.add_parser("ml-train", help="train the volatility classifier")
    p_train.add_argument("--sf-dir", default=DEFAULT_SF)
    p_train.add_argument("--trees", type=int, default=50)
    p_train.add_argument("--out", default=None, help="save model+metadata here")

    p_pred = sub.add_parser("ml-predict", help="next-day inference → upsert/CSV")
    p_pred.add_argument("--sf-dir", default=DEFAULT_SF)
    p_pred.add_argument("--out", default=None, help="CSV output dir (S7)")

    p_tbl = sub.add_parser(
        "table", help="manifest-table maintenance (history/count/stats/"
        "compact/repartition/clone/show/snapshot)"
    )
    p_tbl.add_argument(
        "action",
        choices=[
            "history", "count", "stats", "compact", "repartition",
            "clone", "show", "delete", "update", "repair", "snapshot",
        ],
    )
    p_tbl.add_argument("target", nargs="+",
                       help="manifest table path/URI (snapshot: several)")
    p_tbl.add_argument("--to", default=None, help="clone destination")
    p_tbl.add_argument("--partition-col", default=None,
                       help="repartition: new partition column ('' = none)")
    p_tbl.add_argument("--rows-per-file", type=int, default=1_000_000)
    p_tbl.add_argument(
        "--cluster-by", default=None,
        help="compact: comma-separated Z-ORDER columns (multi-column "
        "file skipping; unpartitioned tables only)",
    )
    p_tbl.add_argument(
        "--point-index", default=None,
        help="compact: comma-separated columns to build per-file "
        "equality-probe bucket sets for (id = X file skipping)",
    )
    p_tbl.add_argument("--version", type=int, default=None)
    p_tbl.add_argument("--materialize", action="store_true",
                       help="clone: copy data (sever source dependency)")
    p_tbl.add_argument("--where", default=None,
                       help="delete/update: SQL predicate selecting rows")
    p_tbl.add_argument("--set", action="append", default=None,
                       metavar="COL=EXPR",
                       help="update: column assignment (repeatable)")
    p_tbl.add_argument("--mode", default="copy_on_write",
                       choices=["copy_on_write", "merge_on_read"],
                       help="delete: rewrite touched entries, or record "
                       "the predicate as a metadata-only commit")

    p_test = sub.add_parser(
        "test", help="run the data-quality suite (dbt-test analog)"
    )
    p_test.add_argument("--sf-dir", default=DEFAULT_SF)
    p_test.add_argument(
        "--strict", action="store_true",
        help="exit 1 if any check has violations",
    )

    p_sql = sub.add_parser(
        "sql", help="run SQL over registered manifest tables "
        "(latest-tracking: views refresh before the query runs)"
    )
    p_sql.add_argument("query", nargs="?", default=None,
                       help="SQL text (DML/DDL statements route to "
                       "the manifest API — INSERT ... ON CONFLICT, "
                       "MERGE INTO, CREATE/ALTER TABLE, UPDATE/"
                       "DELETE, CREATE VIEW)")
    p_sql.add_argument(
        "--file", default=None, metavar="PATH",
        help="run a ';'-separated SQL script file (e.g. the "
        "reference's init.sql / dashboard_views.sql) instead of QUERY",
    )
    p_sql.add_argument(
        "--table", action="append", default=None, metavar="NAME=PATH",
        help="register PATH as tracked view NAME first (repeatable)",
    )
    p_sql.add_argument(
        "--param", action="append", default=None, metavar="VALUE",
        help="positional value for a %%s / ? placeholder (repeatable, "
        "in order; always passed as a string literal)",
    )
    p_sql.add_argument("--show", type=int, default=20)

    p_ann = sub.add_parser(
        "ann", help="approximate-nearest-neighbor top-k over an "
        "embeddings table (hierarchical IVF, exact re-rank)"
    )
    p_ann.add_argument("--sf-dir", default=DEFAULT_SF,
                       help="dir holding embeddings.parquet")
    p_ann.add_argument("--k", type=int, default=3)
    p_ann.add_argument(
        "--nprobe", type=int, default=2,
        help="fine cells probed per coarse cell — the primary recall "
        "dial (recall rises monotonically toward brute force; "
        "measured curve in ML_BASELINE.md)",
    )
    p_ann.add_argument(
        "--coarse-probe", type=int, default=1,
        help="coarse cells probed per query (budget coarse_probe x "
        "nprobe). Raise past 1 for LOOSE/high-noise corpora, where "
        "members of one duplicate group scatter across coarse cells "
        "and fine multi-probe alone plateaus (~0.73 recall@3 on the "
        "measured loose corpus; coarse_probe=2,nprobe=8 lifts it to "
        "0.9 at 0.4x the brute wall — see ML_BASELINE.md)",
    )
    p_ann.add_argument("--show", type=int, default=20)

    args = ap.parse_args(argv)

    from .session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "run-pipeline":
        from .plans import panel

        fct = panel.fct_prices_with_grok(spark, args.sf_dir)
        fct.show(args.show, truncate=False)
        print(f"gold rows: {fct.count()}")
    elif args.cmd == "dashboard":
        from .dashboard import render_dashboard

        print(render_dashboard(spark, args.sf_dir))
    elif args.cmd == "views":
        from .plans import views

        names = views.create_dashboard_views(spark, args.sf_dir)
        print("registered:", ", ".join(names))
        if args.query:
            spark.sql(args.query).show(20, truncate=False)
    elif args.cmd == "ml-train":
        from .ml import train as mltrain

        result = mltrain.train(spark, args.sf_dir, num_trees=args.trees)
        for k, v in sorted(result.metrics.items()):
            print(f"{k}: {v:.4f}")
        if args.out:
            mltrain.save(result, args.out)
            print(f"saved → {args.out}")
    elif args.cmd == "ml-predict":
        from .ml import predict as mlpredict
        from .ml.predict import cached_train
        from .operators import sinks

        result = cached_train(spark, args.sf_dir)
        preds = mlpredict.predict_next_day(
            spark, args.sf_dir, result.model, result.model_version
        )
        preds.show(20, truncate=False)
        if args.out:
            sinks.write_csv(preds, args.out)
            print(f"csv → {args.out}")
    elif args.cmd == "table":
        from .operators import sinks

        # `target` accepts several paths only for snapshot; every
        # other action operates on exactly one table
        if args.action != "snapshot" and len(args.target) > 1:
            print("only `snapshot` accepts several targets")
            return 1
        target = args.target[0]

        if args.action == "history":
            sinks.manifest_table_history(spark, target).show(
                50, truncate=False
            )
        elif args.action == "count":
            print(sinks.count_manifest_table(target, args.version))
        elif args.action == "stats":
            sinks.manifest_table_stats(
                spark, target, args.version
            ).show(100, truncate=False)
        elif args.action == "compact":
            n = sinks.compact_manifest_table(
                spark, target, args.rows_per_file,
                cluster_by=(
                    args.cluster_by.split(",") if args.cluster_by else None
                ),
                point_index=(
                    args.point_index.split(",") if args.point_index else None
                ),
            )
            print(f"compacted → {n} entries")
        elif args.action == "repartition":
            n = sinks.repartition_manifest_table(
                spark, target, args.partition_col or None
            )
            print(f"re-laid-out → {n} entries")
        elif args.action == "clone":
            if not args.to:
                ap.error("clone requires --to DEST")
            sinks.clone_manifest_table(
                spark, target, args.to,
                version=args.version, materialize=args.materialize,
            )
            print(f"cloned → {args.to}"
                  + (" (materialized)" if args.materialize else " (shallow)"))
        elif args.action == "delete":
            if not args.where:
                ap.error("delete requires --where SQL")
            n = sinks.delete_from_manifest_table(
                spark, target, args.where, mode=args.mode
            )
            print(f"deleted {n} rows ({args.mode})")
        elif args.action == "update":
            if not args.where or not args.set:
                ap.error("update requires --where SQL and --set COL=EXPR")
            assignments = dict(a.split("=", 1) for a in args.set)
            n = sinks.update_manifest_table(
                spark, target, assignments, args.where
            )
            print(f"updated {n} rows")
        elif args.action == "snapshot":
            pins = sinks.snapshot_tables(args.target)
            for t in args.target:
                print(f"{t} @ version {pins[t]}")
        elif args.action == "repair":
            fixed = sinks.repair_manifest_table(target)
            print(
                f"repaired versions: {fixed}" if fixed
                else "nothing to repair"
            )
        elif args.action == "show":
            df = sinks.read_manifest_table(
                spark, target, version=args.version
            )
            if df is None:
                print("no manifest table at", target)
                return 1
            df.show(20, truncate=False)
            print(f"rows: {df.count()}")
    elif args.cmd == "test":
        from .plans.quality import run_quality_suite

        rows = run_quality_suite(spark, args.sf_dir).collect()
        failed = 0
        for r in rows:
            mark = "PASS" if r["passed"] == 1 else "FAIL"
            failed += 1 - r["passed"]
            print(
                f"{mark}  {r['table_name']}.{r['target']} "
                f"[{r['check']}] violations={r['n_violations']}"
            )
        print(f"{len(rows) - failed}/{len(rows)} checks passed")
        if args.strict and failed:
            return 1
    elif args.cmd == "sql":
        from .operators import sinks

        for spec in args.table or []:
            if "=" not in spec:
                ap.error(f"--table needs NAME=PATH, got {spec!r}")
            name, path = spec.split("=", 1)
            sinks.register_manifest_view(spark, path, name,
                                         track_latest=True)
        if args.file is not None:
            with open(args.file) as fh:
                text = fh.read()
        elif args.query is not None:
            text = args.query
        else:
            ap.error("sql needs QUERY text or --file PATH")
        sinks.manifest_sql(
            spark, text, params=tuple(args.param or []) or None
        ).show(args.show, truncate=False)
    elif args.cmd == "ann":
        from pyspark.sql import functions as F

        from .llmdata.similarity import ivf_topk

        out = ivf_topk(
            spark, args.sf_dir, nprobe=args.nprobe, k=args.k,
            coarse_probe=args.coarse_probe,
        )
        out.orderBy("q_id", F.col("cosine").desc()).show(
            args.show, truncate=False
        )
        print(
            f"ann top-{args.k}: nprobe={args.nprobe} "
            f"coarse_probe={args.coarse_probe} "
            f"(recall dials; curves in ML_BASELINE.md)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
