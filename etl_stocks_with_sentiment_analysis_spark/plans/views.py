"""The reference's 12 dashboard views by name
(`/root/reference/sql/dashboard_views.sql:5-182`) — registered as Spark
temp views over the derived panel, so a reference user's SQL keeps
working verbatim (`SELECT * FROM accuracy_by_stock`, ...).

Each view body is one of the oracle-checked registry queries; the map
below records which key implements which view (COVERAGE.md has the
survey-ID crosswalk).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

DASHBOARD_VIEWS = {
    "actual_volatility": "case_volatility_class_sql",  # :5-16
    "prediction_accuracy": "join_inner_pred_actual",  # :19-39
    "accuracy_by_stock": "agg_accuracy_by_stock",  # :42-51
    "accuracy_by_day": "agg_accuracy_by_day",  # :54-66
    "model_performance_summary": "agg_global_summary",  # :69-78
    "volatility_dashboard": "case_emoji_label",  # :81-103
    "accuracy_by_model": "agg_by_model_version",  # :106-116
    "recent_predictions_results": "sort_desc_multi",  # :119-136
    "prediction_confusion_matrix": "agg_confusion_matrix",  # :139-146
    "model_precision": "agg_precision_per_class",  # :149-157
    "model_recall": "agg_recall_per_class",  # :160-168
    "model_metrics": "agg_f1_from_joined",  # :171-182
}


def create_dashboard_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register all 12 views; returns the view names. Views are lazy —
    nothing executes until queried, and Catalyst fuses each view's
    lineage with the consuming query."""
    from .. import registry

    qs = registry.all_queries()
    for view, key in DASHBOARD_VIEWS.items():
        qs[key](spark, sf_dir).createOrReplaceTempView(view)
    return list(DASHBOARD_VIEWS)
