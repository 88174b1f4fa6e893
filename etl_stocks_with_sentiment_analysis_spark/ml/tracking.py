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

from ..functions.localframe import local_rows_df
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
    local_rows_df(spark, row, RUNS_SCHEMA).write.mode("append").parquet(log_dir)
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


def best_run(
    spark: SparkSession, log_dir: str, metric: str = "f1", ascending: bool = False
) -> DataFrame:
    """Best run by a logged metric (`get_best_model`,
    `ml/mlflow_utils.py:141-172`): parse the metric out of the metrics
    JSON with a native expression, order, take 1 — all JVM-side."""
    m = F.get_json_object(F.col("metrics"), f"$.{metric}").cast("double")
    order = m.asc() if ascending else m.desc()
    return (
        runs(spark, log_dir)
        .withColumn("metric_value", m)
        .filter(F.col("metric_value").isNotNull())
        .orderBy(order, F.desc("ts"))
        .limit(1)
    )


def compare_runs(spark: SparkSession, log_dir: str, run_ids: list[str]) -> DataFrame:
    """Side-by-side params/metrics for chosen runs (`compare_runs`,
    `ml/mlflow_utils.py:211-229`) — a filtered scan of the run log."""
    return runs(spark, log_dir).filter(F.col("run_id").isin(run_ids))


# ---------------------------------------------------------------------------
# Artifact lineage (`log_artifact`/`log_dict`, ml/mlflow_utils.py:105-125)
# ---------------------------------------------------------------------------

ARTIFACTS_SCHEMA = (
    "run_id STRING, ts DOUBLE, name STRING, path STRING, "
    "sha256 STRING, n_bytes LONG"
)


def log_artifact(
    spark: SparkSession, log_dir: str, run_id: str, name: str, path: str
) -> None:
    """Record one artifact (model dir, plot, report) against a run.

    Lineage rows carry the content hash + size so a consumer can both
    FIND a run's artifacts and VERIFY them. Directories are hashed
    over sorted (relpath, bytes) pairs — stable across listing order.
    The table is append-only parquet next to the run log
    (`<log_dir>_artifacts`), kilobytes per run.
    """
    import hashlib
    import os

    h = hashlib.sha256()
    total = 0
    if os.path.isdir(path):
        for dirpath, _, files in sorted(os.walk(path)):
            for fname in sorted(files):
                p = os.path.join(dirpath, fname)
                h.update(os.path.relpath(p, path).encode())
                with open(p, "rb") as fh:
                    data = fh.read()
                h.update(data)
                total += len(data)
    else:
        with open(path, "rb") as fh:
            data = fh.read()
        h.update(data)
        total = len(data)
    row = [(run_id, float(time.time()), name, path, h.hexdigest(), total)]
    local_rows_df(spark, row, ARTIFACTS_SCHEMA).write.mode("append").parquet(
        log_dir.rstrip("/") + "_artifacts"
    )


def run_artifacts(spark: SparkSession, log_dir: str, run_id: str | None = None) -> DataFrame:
    """Artifact lineage, optionally for one run (MLflow artifact list)."""
    df = spark.read.parquet(log_dir.rstrip("/") + "_artifacts")
    if run_id is not None:
        df = df.filter(F.col("run_id") == run_id)
    return df.orderBy(F.desc("ts"))


# ---------------------------------------------------------------------------
# Model registry: versions + stage transitions
# (`register_model`/`transition_model_version_stage`/
#  `get_production_model_uri`, ml/mlflow_utils.py:174-210)
# ---------------------------------------------------------------------------

STAGES = ("None", "Staging", "Production", "Archived")

REGISTRY_SCHEMA = (
    "model_name STRING, version INT, run_id STRING, stage STRING, ts DOUBLE"
)


def _registry_path(log_dir: str) -> str:
    return log_dir.rstrip("/") + "_registry"


def register_model(
    spark: SparkSession, log_dir: str, run_id: str, model_name: str, stage: str = "None"
) -> int:
    """Register a new model VERSION for a run, optionally straight into
    a stage. Returns the assigned version number.

    Event-sourced like everything here: the registry is an append-only
    parquet log of (name, version, stage, ts) events; current state is
    a latest-event-per-version query, so registration never rewrites
    history and concurrent readers always see a consistent snapshot.
    Version assignment reads the (kilobyte-scale) log's max version —
    a metadata-sized scan, not a data shuffle.
    """
    if stage not in STAGES:
        raise ValueError(f"stage {stage!r} not in {STAGES}")
    path = _registry_path(log_dir)
    try:
        prev = (
            spark.read.parquet(path)
            .filter(F.col("model_name") == model_name)
            .agg(F.max("version"))
            .first()[0]
        )
    except Exception:  # first registration — no log yet
        prev = None
    version = (prev or 0) + 1
    row = [(model_name, version, run_id, stage, float(time.time()))]
    local_rows_df(spark, row, REGISTRY_SCHEMA).write.mode("append").parquet(path)
    return version


def transition_stage(
    spark: SparkSession, log_dir: str, model_name: str, version: int, stage: str
) -> None:
    """Move a model version to a stage (Staging/Production/Archived).
    Appends a transition event; `model_versions` resolves the latest.
    Promoting to Production also archives any OTHER version currently
    in Production (MLflow's single-production-version convention)."""
    if stage not in STAGES:
        raise ValueError(f"stage {stage!r} not in {STAGES}")
    path = _registry_path(log_dir)
    events = []
    if stage == "Production":
        current = (
            model_versions(spark, log_dir)
            .filter(
                (F.col("model_name") == model_name)
                & (F.col("stage") == "Production")
                & (F.col("version") != version)
            )
            .select("version")
            .collect()
        )  # registry state: a handful of rows, driver-safe by design
        events += [
            (model_name, int(r["version"]), "", "Archived", float(time.time()))
            for r in current
        ]
    events.append((model_name, version, "", stage, float(time.time())))
    local_rows_df(spark, events, REGISTRY_SCHEMA).write.mode("append").parquet(path)


def model_versions(spark: SparkSession, log_dir: str) -> DataFrame:
    """Current registry state: latest event per (model_name, version),
    with the run_id from the registration event (transitions carry an
    empty run_id). One window over a kilobyte-scale log."""
    from pyspark.sql import Window

    ev = spark.read.parquet(_registry_path(log_dir))
    w = Window.partitionBy("model_name", "version").orderBy(
        F.desc("ts"), F.desc("stage")
    )
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("model_name", "version", "stage", F.col("ts").alias("stage_ts"))
    )
    reg = ev.filter(F.col("run_id") != "").select(
        "model_name", "version", "run_id", F.col("ts").alias("registered_ts")
    )
    return latest.join(reg, ["model_name", "version"])


def production_model(spark: SparkSession, log_dir: str, model_name: str) -> DataFrame:
    """The Production version of a model (`models:/<name>/Production`
    URI analog) joined back to its run's params/metrics/artifact path —
    the full lineage a deployment job needs, in one row."""
    ver = model_versions(spark, log_dir).filter(
        (F.col("model_name") == model_name) & (F.col("stage") == "Production")
    )
    return ver.join(runs(spark, log_dir), "run_id", "left").select(
        "model_name",
        "version",
        "run_id",
        "model_version",
        "params",
        "metrics",
        "artifact_path",
    )
