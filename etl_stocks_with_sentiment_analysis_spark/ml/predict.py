"""M9/U3 — inference pipeline (`/root/reference/ml/predict.py:109-157`):
features → latest row per ticker (W10) → MLlib transform → confidence
(max class probability) → next-business-day stamp (F12) → upsert (S4).
"""

from __future__ import annotations

import os

from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import sinks
from ..registry import register
from . import tracking
from .features import LABELS, feature_matrix
from .train import TrainResult, prepare, train, train_gbt

from pyspark.ml.feature import VectorAssembler

from .features import BASE_FEATURES

# One model per sf_dir serves every registered ML key in a harness run
# (M4/M6/M7/U3/M9 all reuse it) — the iterative fit happens once.
_TRAIN_CACHE: dict[str, TrainResult] = {}


def cached_train(spark: SparkSession, sf_dir: str) -> TrainResult:
    if sf_dir not in _TRAIN_CACHE:
        _TRAIN_CACHE[sf_dir] = train(spark, sf_dir, num_trees=20, max_depth=6)
    return _TRAIN_CACHE[sf_dir]


def predict_next_day(
    spark: SparkSession, sf_dir: str, model, model_version: str
) -> DataFrame:
    """Score the latest row per ticker; returns the prediction-sink
    schema (`ml/data_loader.py:123-136`)."""
    df = prepare(feature_matrix(spark, sf_dir))
    w = Window.partitionBy("ticker").orderBy(F.desc("date"))
    latest = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    assembler = VectorAssembler(
        inputCols=BASE_FEATURES, outputCol="features", handleInvalid="keep"
    )
    pred = model.transform(assembler.transform(latest))
    # U3: class index → label string; confidence = max probability.
    label_expr = F.when(F.col("prediction") == 0, LABELS[0]).when(
        F.col("prediction") == 1, LABELS[1]
    ).otherwise(LABELS[2])
    probs = vector_to_array(F.col("probability"))
    cand_dow = (F.dayofweek(F.date_add(F.col("date"), 1)) + 5) % 7
    next_bday = (
        F.when(cand_dow == 5, F.date_add(F.col("date"), 3))
        .when(cand_dow == 6, F.date_add(F.col("date"), 2))
        .otherwise(F.date_add(F.col("date"), 1))
    )
    return pred.select(
        "ticker",
        next_bday.alias("date"),
        label_expr.alias("predicted_volatility_class"),
        F.round(F.col("volatility"), 4).alias("predicted_volatility"),
        F.round(F.array_max(probs), 4).alias("confidence"),
        F.lit(model_version).alias("model_version"),
        F.current_timestamp().alias("created_at"),
    )


def run_inference(
    spark: SparkSession,
    sf_dir: str,
    target: str,
    num_trees: int = 50,
    log_dir: str | None = None,
) -> DataFrame:
    """End-to-end M9: train → log run → predict with the PROMOTED
    model_version (registry semantics, `ml/mlflow_utils.py:178-241`)
    → upsert into the sink table."""
    result = train(spark, sf_dir, num_trees=num_trees)
    model_version = result.model_version
    if log_dir is not None:
        tracking.log_run(
            spark,
            log_dir,
            result.model_version,
            {"num_trees": num_trees, "model": "rf"},
            result.metrics,
        )
        model_version = tracking.promoted(spark, log_dir).first()["model_version"]
    preds = predict_next_day(spark, sf_dir, result.model, model_version)
    sinks.upsert(
        spark, target, preds, ["ticker", "date", "model_version"], partition_col="date"
    )
    return preds


@register("ml_infer_next_day", oracle=None)  # iterative ML → rows-only check
def ml_infer_next_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 as a registered query (small forest for harness runtime).
    Non-SQL-expressible (iterative fit) — driver rows-only check;
    invariants (classes, confidence bounds, business days) are
    asserted in tests/test_ml.py."""
    result = cached_train(spark, sf_dir)
    return predict_next_day(spark, sf_dir, result.model, result.model_version)


@register("ml_train_rf", oracle=None)  # iterative ML → rows-only check
def ml_train_rf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4+M5+M6 — RandomForest fit (balanced weight column) evaluated
    on the chronological holdout; returns the evaluator metrics as rows
    (`/root/reference/ml/train.py:52-143`)."""
    result = cached_train(spark, sf_dir)
    rows = [(k, float(v)) for k, v in sorted(result.metrics.items())]
    return spark.createDataFrame(rows, "metric STRING, value DOUBLE")


@register("ml_tracking_promote", oracle=None)  # stateful run log → rows-only
def ml_tracking_promote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 — registry round-trip as a query: log two runs into a fresh
    run-log table, return the promoted (latest) run's deterministic
    columns. Proves append-only history + latest-wins promotion
    (`ml/mlflow_utils.py:32-241`)."""
    log_dir = os.path.join(sinks.scratch_dir("mlruns_"), "runs")
    tracking.log_run(
        spark, log_dir, "rf-v1.0", {"num_trees": 20}, {"accuracy": 0.5}, "a/v1"
    )
    tracking.log_run(
        spark, log_dir, "rf-v2.0", {"num_trees": 50}, {"accuracy": 0.6}, "a/v2"
    )
    n = tracking.runs(spark, log_dir).count()
    return tracking.promoted(spark, log_dir).select(
        "model_version", "params", "metrics", F.lit(n).alias("n_runs")
    )


@register("ml_registry_lifecycle", oracle=None)  # stateful registry → rows-only
def ml_registry_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 — full registry lifecycle as a query: two logged runs, two
    registered versions, v1 promoted to Production then superseded by
    v2 (v1 must auto-archive, MLflow's single-production convention).
    Returns the final per-version stages + the best run by accuracy —
    deterministic columns only (`ml/mlflow_utils.py:141-210`)."""
    log_dir = os.path.join(sinks.scratch_dir("mlreg_"), "runs")
    r1 = tracking.log_run(
        spark, log_dir, "rf-v1.0", {"num_trees": 20}, {"accuracy": 0.5}, "a/v1"
    )
    r2 = tracking.log_run(
        spark, log_dir, "rf-v2.0", {"num_trees": 50}, {"accuracy": 0.6}, "a/v2"
    )
    v1 = tracking.register_model(spark, log_dir, r1, "vol-clf", stage="Production")
    v2 = tracking.register_model(spark, log_dir, r2, "vol-clf")
    tracking.transition_stage(spark, log_dir, "vol-clf", v2, "Production")
    best = tracking.best_run(spark, log_dir, metric="accuracy").first()["model_version"]
    live = tracking.production_model(spark, log_dir, "vol-clf").first()
    return tracking.model_versions(spark, log_dir).select(
        "model_name",
        "version",
        "stage",
        F.lit(best).alias("best_by_accuracy"),
        F.lit(live["model_version"]).alias("production_model_version"),
        F.lit(v1).alias("v_first"),
        F.lit(v2).alias("v_second"),
    )


_GBT_CACHE: dict[str, TrainResult] = {}


@register("ml_train_gbt", oracle=None)  # iterative ML → rows-only check
def ml_train_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 — gradient-boosted trainer (xgboost when present, else
    OneVsRest over MLlib GBTClassifier) evaluated on the chronological
    holdout (`/root/reference/ml/train.py:52-61`). Small boosting
    budget for harness runtime; tests/test_ml.py holds the metric
    floor."""
    if sf_dir not in _GBT_CACHE:
        _GBT_CACHE[sf_dir] = train_gbt(spark, sf_dir, max_iter=8, max_depth=5)
    result = _GBT_CACHE[sf_dir]
    rows = [(k, float(v)) for k, v in sorted(result.metrics.items())]
    return spark.createDataFrame(rows, "metric STRING, value DOUBLE")


@register("ml_feature_importance", oracle=None)  # model-derived → rows-only
def ml_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 — top-15 Gini feature importances
    (`/root/reference/ml/train.py:146-154`)."""
    result = cached_train(spark, sf_dir)
    rows = [
        (rank + 1, name, float(imp))
        for rank, (name, imp) in enumerate(result.feature_importances)
    ]
    return spark.createDataFrame(rows, "rank INT, feature STRING, importance DOUBLE")


@register("udf_model_predict", oracle=None)  # model transform → rows-only
def udf_model_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — batch model scoring (`ml/predict.py:83-91`): MLlib
    `model.transform` over the full feature matrix; confidence = max
    class probability via `vector_to_array` (JVM-side, no Python UDF)."""
    result = cached_train(spark, sf_dir)
    df = prepare(feature_matrix(spark, sf_dir))
    assembler = VectorAssembler(
        inputCols=BASE_FEATURES, outputCol="features", handleInvalid="keep"
    )
    pred = result.model.transform(assembler.transform(df))
    label_expr = (
        F.when(F.col("prediction") == 0, LABELS[0])
        .when(F.col("prediction") == 1, LABELS[1])
        .otherwise(LABELS[2])
    )
    probs = vector_to_array(F.col("probability"))
    return pred.select(
        "ticker",
        "date",
        label_expr.alias("predicted_volatility_class"),
        F.round(F.array_max(probs), 4).alias("confidence"),
    )
