"""M8 — experiment tracking: the Spark-native analog of the
reference's MLflow usage (`/root/reference/ml/mlflow_utils.py:32-241`,
`ml/train.py:302-411`): every training run logs params + metrics +
artifact path to an append-only run-log table, and a promotion view
answers "which model is live?".

Spark-first shape: the run log is a parquet table written with
`mode("append")` — one tiny file per run, no rewrite of history — and
the registry/promotion semantics are plain queries over it (latest run
wins, ties broken by run_id). At scale the log stays kilobytes per
run; reading it is a metadata-sized scan, never a shuffle of data.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RUNS_SCHEMA = (
    "run_id STRING, ts DOUBLE, model_version STRING, "
    "params STRING, metrics STRING, artifact_path STRING"
)


def log_run(
    spark: SparkSession,
    log_dir: str,
    model_version: str,
    params: dict,
    metrics: dict,
    artifact_path: str = "",
) -> str:
    """Append one run row (params/metrics as canonical JSON strings —
    the log schema never migrates when a new hyperparameter appears).
    Returns the run_id (MLflow `start_run` analog)."""
    run_id = uuid.uuid4().hex[:12]
    row = [
        (
            run_id,
            float(time.time()),
            model_version,
            json.dumps(params, sort_keys=True),
            json.dumps(metrics, sort_keys=True),
            artifact_path,
        )
    ]
    spark.createDataFrame(row, RUNS_SCHEMA).write.mode("append").parquet(log_dir)
    return run_id


def runs(spark: SparkSession, log_dir: str) -> DataFrame:
    """Full run history, newest first (MLflow `search_runs` analog)."""
    return spark.read.parquet(log_dir).orderBy(F.desc("ts"), F.desc("run_id"))


def promoted(spark: SparkSession, log_dir: str) -> DataFrame:
    """The live model: newest run wins (registry `latest version` /
    stage-promotion analog, `ml/mlflow_utils.py:178-241`)."""
    return runs(spark, log_dir).limit(1)


def create_tracking_views(spark: SparkSession, log_dir: str) -> list[str]:
    """Register `ml_runs` + `ml_latest_model` temp views so dashboards
    query the registry by name (reference's MLflow UI surface)."""
    runs(spark, log_dir).createOrReplaceTempView("ml_runs")
    promoted(spark, log_dir).createOrReplaceTempView("ml_latest_model")
    return ["ml_runs", "ml_latest_model"]
