"""CLI — the reference's `cli.py` surface re-expressed for Spark
(`/root/reference/cli.py:104-147`: run / ml-train / ml-predict, plus
`views` for the dashboard layer).

    python -m etl_stocks_with_sentiment_analysis_spark run-pipeline [--sf-dir D]
    python -m etl_stocks_with_sentiment_analysis_spark views [--sf-dir D] [--query SQL]
    python -m etl_stocks_with_sentiment_analysis_spark dashboard [--sf-dir D]
    python -m etl_stocks_with_sentiment_analysis_spark ml-train [--trees N] [--out PATH]
    python -m etl_stocks_with_sentiment_analysis_spark ml-predict [--out CSV_DIR]
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
