"""M9/U3 — inference pipeline (`/root/reference/ml/predict.py:109-157`):
features → latest row per ticker (W10) → MLlib transform → confidence
(max class probability) → next-business-day stamp (F12) → upsert (S4).
"""

from __future__ import annotations

from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import sinks
from ..registry import register
from .features import LABELS, feature_matrix
from .train import prepare, train

from pyspark.ml.feature import VectorAssembler

from .features import BASE_FEATURES


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
    spark: SparkSession, sf_dir: str, target: str, num_trees: int = 50
) -> DataFrame:
    """End-to-end M9: train → predict → upsert into the sink table."""
    result = train(spark, sf_dir, num_trees=num_trees)
    preds = predict_next_day(spark, sf_dir, result.model, result.model_version)
    sinks.upsert(
        spark, target, preds, ["ticker", "date", "model_version"]
    )
    return preds


@register("ml_infer_next_day", oracle=None)  # iterative ML → rows-only check
def ml_infer_next_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 as a registered query (small forest for harness runtime).
    Non-SQL-expressible (iterative fit) — driver rows-only check;
    invariants (classes, confidence bounds, business days) are
    asserted in tests/test_ml.py."""
    result = train(spark, sf_dir, num_trees=20, max_depth=6)
    return predict_next_day(spark, sf_dir, result.model, result.model_version)
