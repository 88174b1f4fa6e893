"""Terminal dashboard — the reference's presentation layer
(`/root/reference/dashboard.py`: Streamlit page of key metrics, top
movers, sentiment/topic breakdowns, volatility heatmap, and the 12
SQL views) rendered as text over THIS engine's verified plans.

Plotly/Streamlit are deliberately absent (not in the image, and a
query engine ships data, not pixels): every section below is a
registered, oracle-checked query — this module only formats. Any BI
tool (Superset, the reference's own Streamlit file) can sit on the
same views via `plans/views.py::create_dashboard_views`.

Usage:
    python -m etl_stocks_with_sentiment_analysis_spark dashboard [--sf-dir D]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (section title, registry key, row cap) — mirrors the reference
# page order: metrics → movers → sentiment/topic → heatmap.
SECTIONS = [
    ("Key Metrics", "agg_global_summary", 5),
    ("Top Gainers", "topk_largest", 10),
    ("Top Losers", "topk_smallest", 10),
    ("Sentiment Distribution", "agg_value_counts", 10),
    ("Topic x Sentiment", "agg_group_size_2d", 15),
    ("Volatility Heatmap (ticker x weekday)", "pivot_heatmap", 12),
    ("Model Metrics", "agg_f1_from_joined", 10),
    ("Confusion Matrix", "agg_confusion_matrix", 12),
]


def _fmt(df: DataFrame, cap: int) -> str:
    pdf = df.limit(cap + 1).toPandas()
    trunc = len(pdf) > cap
    body = pdf.head(cap).to_string(index=False)
    return body + (f"\n... ({cap} of more rows shown)" if trunc else "")


def render_dashboard(spark: SparkSession, sf_dir: str) -> str:
    """Build the full text dashboard. Each section is a registered
    query (small aggregated result) collected via Arrow; the wide
    work stays in the cluster, only the rendered rows come back."""
    from . import registry

    qs = registry.all_queries()
    out = ["=" * 64, "Stock-Grok Dashboard (batch snapshot)", "=" * 64]
    for title, key, cap in SECTIONS:
        out += ["", f"-- {title} [{key}]", _fmt(qs[key](spark, sf_dir), cap)]
    return "\n".join(out)
