"""Scalar-function operators (SURVEY.md §2.8, F1–F18).

All JVM-side built-in expressions — no Python UDFs — so every query
stays inside whole-stage codegen. String rendering of numbers goes
through DECIMAL casts (not raw double→string) so Spark and DuckDB
produce identical text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import panel
from ..registry import register


@register(
    "case_move_category",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="""
SELECT ticker, date, pct_change,
       CASE WHEN ABS(pct_change) > 5 THEN 'large_move'
            WHEN ABS(pct_change) > 2 THEN 'medium_move'
            ELSE 'small_move' END AS move_category
FROM changes""",
    ),
)
def case_move_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — 3-way ABS bucket (`fct_prices_with_grok.sql:16-20`)."""
    abs_pct = F.abs(F.col("pct_change"))
    return panel.changes(spark, sf_dir).select(
        "ticker",
        "date",
        "pct_change",
        F.when(abs_pct > 5, "large_move")
        .when(abs_pct > 2, "medium_move")
        .otherwise("small_move")
        .alias("move_category"),
    )


@register(
    "case_volatility_class_sql",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker, date,
       (high - low) / NULLIF(close, 0) * 100 AS daily_volatility_pct,
       CASE WHEN (high - low) / NULLIF(close, 0) * 100 < 2 THEN 'low'
            WHEN (high - low) / NULLIF(close, 0) * 100 < 5 THEN 'medium'
            ELSE 'high' END AS volatility_class
FROM prices WHERE close > 0""",
    ),
)
def case_volatility_class_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — SQL-view volatility bucketing, `<` boundaries
    (`sql/dashboard_views.sql:8-14`)."""
    v = (F.col("high") - F.col("low")) / F.nullif(F.col("close"), F.lit(0)) * 100
    return (
        panel.prices(spark, sf_dir)
        .filter(F.col("close") > 0)
        .select(
            "ticker",
            "date",
            v.alias("daily_volatility_pct"),
            F.when(v < 2, "low").when(v < 5, "medium").otherwise("high").alias(
                "volatility_class"
            ),
        )
    )


@register(
    "bucket_volatility_pd_cut",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker, date,
       (high - low) / NULLIF(close, 0) * 100 AS daily_volatility_pct,
       CASE WHEN (high - low) / NULLIF(close, 0) * 100 IS NULL THEN NULL
            WHEN (high - low) / NULLIF(close, 0) * 100 <= 2 THEN 'low'
            WHEN (high - low) / NULLIF(close, 0) * 100 <= 5 THEN 'medium'
            ELSE 'high' END AS volatility_class_cut
FROM prices WHERE close > 0""",
    ),
)
def bucket_volatility_pd_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — pd.cut right-closed semantics (`ml/feature_engineering.py:12-29`):
    boundaries 2.0/5.0 fall LEFT (differs from F2 at exactly 2/5 —
    SURVEY.md §2.8 flags the reference's internal inconsistency; both
    surfaces are implemented faithfully)."""
    v = (F.col("high") - F.col("low")) / F.nullif(F.col("close"), F.lit(0)) * 100
    cls = (
        F.when(v.isNull(), F.lit(None).cast("string"))
        .when(v <= 2, "low")
        .when(v <= 5, "medium")
        .otherwise("high")
    )
    return (
        panel.prices(spark, sf_dir)
        .filter(F.col("close") > 0)
        .select(
            "ticker",
            "date",
            v.alias("daily_volatility_pct"),
            cls.alias("volatility_class_cut"),
        )
    )


@register(
    "case_emoji_label",
    oracle=panel.sql_with(
        *panel.PANEL_SCORED,
        body="""
SELECT ticker, date,
       CASE predicted_volatility_class WHEN 'low' THEN '🟢 Low Risk'
            WHEN 'medium' THEN '🟡 Medium Risk' ELSE '🔴 High Risk' END AS risk_label,
       CASE WHEN is_correct = 1 THEN '✅ Correct' ELSE '❌ Wrong' END AS correct_label,
       CASE WHEN confidence > 0.8 THEN 'Strong' WHEN confidence > 0.6 THEN 'Moderate'
            ELSE 'Weak' END AS confidence_label
FROM scored""",
    ),
)
def case_emoji_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — CASE-valued display labels (`sql/dashboard_views.sql:28-35,85-95,123-132`)."""
    return panel.scored(spark, sf_dir).select(
        "ticker",
        "date",
        F.when(F.col("predicted_volatility_class") == "low", "🟢 Low Risk")
        .when(F.col("predicted_volatility_class") == "medium", "🟡 Medium Risk")
        .otherwise("🔴 High Risk")
        .alias("risk_label"),
        F.when(F.col("is_correct") == 1, "✅ Correct")
        .otherwise("❌ Wrong")
        .alias("correct_label"),
        F.when(F.col("confidence") > 0.8, "Strong")
        .when(F.col("confidence") > 0.6, "Moderate")
        .otherwise("Weak")
        .alias("confidence_label"),
    )


@register(
    "fn_round",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="""
SELECT ticker, date, ROUND(close, 1) AS close_r1, ROUND(pct_change, 2) AS pct_r2,
       ROUND(low, 0) AS low_r0
FROM changes""",
    ),
)
def fn_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — ROUND(x, d) (`sql/dashboard_views.sql:47-48`, pandas .round(4))."""
    return panel.changes(spark, sf_dir).select(
        "ticker",
        "date",
        F.round("close", 1).alias("close_r1"),
        F.round("pct_change", 2).alias("pct_r2"),
        F.round("low", 0).alias("low_r0"),
    )


@register(
    "fn_nullif_div",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker, date, (high - low) / NULLIF(close, 0) AS range_ratio
FROM prices""",
    ),
)
def fn_nullif_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — NULLIF-guarded division (`sql/dashboard_views.sql:9,179`)."""
    return panel.prices(spark, sf_dir).select(
        "ticker",
        "date",
        ((F.col("high") - F.col("low")) / F.nullif(F.col("close"), F.lit(0))).alias(
            "range_ratio"
        ),
    )


@register(
    "fn_concat_pct",
    oracle=panel.sql_with(
        *panel.PANEL_SCORED,
        body="""
SELECT ticker,
       CAST(CAST(ROUND(AVG(is_correct) * 100, 1) AS DECIMAL(5, 1)) AS VARCHAR) || '%' AS accuracy_str
FROM scored GROUP BY ticker""",
    ),
)
def fn_concat_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — ROUND(...)||'%' display strings (`sql/dashboard_views.sql:47-48,59`).
    Rendered via DECIMAL cast so both engines print identical text."""
    acc = F.round(F.avg("is_correct") * 100, 1).cast("decimal(5,1)").cast("string")
    return (
        panel.scored(spark, sf_dir)
        .groupBy("ticker")
        .agg(F.concat(acc, F.lit("%")).alias("accuracy_str"))
    )


@register(
    "fn_lower",
    oracle=panel.sql_with(
        panel.PRICES_CTE,
        panel.EXPLANATIONS_CTE,
        body="SELECT ticker, date, LOWER(sentiment) AS sentiment FROM explanations",
    ),
)
def fn_lower(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — LOWER (`stg_grok_explanations.sql:7-8`)."""
    return panel.explanations(spark, sf_dir).select(
        "ticker", "date", F.lower("sentiment").alias("sentiment")
    )


@register(
    "fn_abs",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="SELECT ticker, date, ABS(pct_change) AS abs_pct FROM changes",
    ),
)
def fn_abs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — ABS (`fct_prices_with_grok.sql:17-18`)."""
    return panel.changes(spark, sf_dir).select(
        "ticker", "date", F.abs("pct_change").alias("abs_pct")
    )


@register(
    "date_parts",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker, date,
       CAST(ISODOW(date) - 1 AS INT) AS day_of_week,
       CAST(MONTH(date) AS INT) AS month
FROM prices""",
    ),
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 — pandas-convention date parts (`ml/feature_engineering.py:66-71`):
    Monday=0. Spark dayofweek is Sunday=1, so (dow+5)%7."""
    return panel.prices(spark, sf_dir).select(
        "ticker",
        "date",
        ((F.dayofweek("date") + 5) % 7).cast("int").alias("day_of_week"),
        F.month("date").cast("int").alias("month"),
    )


@register(
    "date_cast",
    oracle="""
SELECT event_id, CAST(ts AS DATE) AS event_date, event_type
FROM events""",
)
def date_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — timestamp::date (`sql/dashboard_views.sql:96,113-114`)."""
    from ..sources import load_table

    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("date").alias("event_date"),
        "event_type",
    )


@register(
    "date_next_business_day",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker, date,
       CASE WHEN ISODOW(date + 1) - 1 = 5 THEN date + 3
            WHEN ISODOW(date + 1) - 1 = 6 THEN date + 2
            ELSE date + 1 END AS next_business_day
FROM prices""",
    ),
)
def date_next_business_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — next trading day, weekend roll-forward (`ml/predict.py:143-148`)."""
    cand_dow = (F.dayofweek(F.date_add(F.col("date"), 1)) + 5) % 7
    nbd = (
        F.when(cand_dow == 5, F.date_add(F.col("date"), 3))
        .when(cand_dow == 6, F.date_add(F.col("date"), 2))
        .otherwise(F.date_add(F.col("date"), 1))
    )
    return panel.prices(spark, sf_dir).select(
        "ticker", "date", nbd.alias("next_business_day")
    )


@register(
    "date_format_str",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="SELECT ticker, date, STRFTIME(date, '%Y-%m-%d') AS date_str FROM prices",
    ),
)
def date_format_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 — strftime '%Y-%m-%d' (`dashboard.py:234,241,266`)."""
    return panel.prices(spark, sf_dir).select(
        "ticker", "date", F.date_format("date", "yyyy-MM-dd").alias("date_str")
    )


@register(
    "json_extract_llm",
    oracle="""
SELECT event_id, event_type,
       CAST(REGEXP_EXTRACT(props, '"k": (-?\\d+)', 1) AS INT) AS k_value
FROM events
WHERE REGEXP_EXTRACT(props, '"k": (-?\\d+)', 1) <> ''""",
)
def json_extract_llm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 — JSON payload extraction with malformed-row skip
    (`stock_grok_pipeline.py:241-245`). Spark uses the native
    from_json path (schema'd, JVM-side); the oracle extracts the same
    field relationally."""
    from ..sources import load_table

    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        "event_type",
        F.from_json("props", "k INT").alias("j"),
    )
    return parsed.filter(F.col("j.k").isNotNull()).select(
        "event_id", "event_type", F.col("j.k").alias("k_value")
    )


@register(
    "encode_sentiment_map",
    oracle=panel.sql_with(
        *panel.PANEL_ENRICHED,
        body="""
SELECT c.ticker, c.date,
       CASE LOWER(e.sentiment) WHEN 'positive' THEN 1 WHEN 'negative' THEN -1
            ELSE 0 END AS sentiment_score
FROM changes c LEFT JOIN explanations e ON c.ticker = e.ticker AND c.date = e.date""",
    ),
)
def encode_sentiment_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 — sentiment→{1,0,-1} with fillna(0)
    (`ml/feature_engineering.py:152-155`)."""
    sent = F.lower("sentiment")
    return (
        panel.enriched(spark, sf_dir)
        .select(
            "ticker",
            "date",
            F.when(sent == "positive", 1)
            .when(sent == "negative", -1)
            .otherwise(0)
            .alias("sentiment_score"),
        )
    )


@register(
    "encode_onehot_topic",
    oracle=panel.sql_with(
        panel.PRICES_CTE,
        panel.EXPLANATIONS_CTE,
        body="""
SELECT ticker, date,
       CASE WHEN topic = 'earnings' THEN 1 ELSE 0 END AS topic_earnings,
       CASE WHEN topic = 'macro' THEN 1 ELSE 0 END AS topic_macro,
       CASE WHEN topic = 'company-specific' THEN 1 ELSE 0 END AS "topic_company-specific",
       CASE WHEN topic = 'speculation' THEN 1 ELSE 0 END AS topic_speculation
FROM explanations""",
    ),
)
def encode_onehot_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 — fixed-vocabulary one-hot (`ml/feature_engineering.py:157-160`,
    expected columns `:201-205`). Fixed vocab keeps the schema stable
    (unlike pd.get_dummies)."""
    cols = [
        F.when(F.col("topic") == v, 1).otherwise(0).alias(f"topic_{v}")
        for v in ("earnings", "macro", "company-specific", "speculation")
    ]
    return panel.explanations(spark, sf_dir).select("ticker", "date", *cols)


@register(
    "fn_format_prompt",
    oracle=panel.sql_with(
        *panel.PANEL_CHG,
        body="""
SELECT ticker, date,
       'Explain why ticker ' || CAST(ticker AS VARCHAR) || ' moved ' ||
       CAST(CAST(ROUND(pct_change, 2) AS DECIMAL(18, 2)) AS VARCHAR) ||
       '% on ' || STRFTIME(date, '%Y-%m-%d') AS prompt
FROM changes WHERE pct_change IS NOT NULL""",
    ),
)
def fn_format_prompt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 — LLM prompt string assembly (`stock_grok_pipeline.py:223-229`)."""
    prompt = F.concat(
        F.lit("Explain why ticker "),
        F.col("ticker").cast("string"),
        F.lit(" moved "),
        F.round("pct_change", 2).cast("decimal(18,2)").cast("string"),
        F.lit("% on "),
        F.date_format("date", "yyyy-MM-dd"),
    )
    return (
        panel.changes(spark, sf_dir)
        .filter(F.col("pct_change").isNotNull())
        .select("ticker", "date", prompt.alias("prompt"))
    )


@register(
    "fn_volatility",
    oracle=panel.sql_with(
        *panel.PANEL,
        body="""
SELECT ticker, date, ROUND((high - low) / close * 100, 4) AS volatility
FROM prices WHERE close > 0""",
    ),
)
def fn_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 — volatility = (high-low)/close*100 round 4
    (`ml/feature_engineering.py:7-9`)."""
    return (
        panel.prices(spark, sf_dir)
        .filter(F.col("close") > 0)
        .select(
            "ticker",
            "date",
            F.round((F.col("high") - F.col("low")) / F.col("close") * 100, 4).alias(
                "volatility"
            ),
        )
    )


_JSON_VALID_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN JSON_VALID(props)
                      AND JSON_EXTRACT(props, '$.k') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(SUM(CASE WHEN JSON_VALID(props)
                      AND JSON_EXTRACT(props, '$.k') IS NOT NULL
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
FROM events
GROUP BY event_type"""


@register("json_validity_scan", oracle=_JSON_VALID_ORACLE)
def json_validity_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-validity audit of the JSON payload column: per
    event_type, how many props blobs parse AND carry the expected
    `k` field — the data-quality gate an ingest pipeline runs before
    trusting semi-structured payloads downstream.

    `get_json_object` returns NULL for malformed JSON or a missing
    path (same semantics DuckDB's JSON_VALID + JSON_EXTRACT compose
    to), so validity is a pure per-row expression; the count rolls up
    map-side. At 100 TB this is one codegen'd scan — the alternative
    (from_json with a strict schema + corrupt-record column) costs
    the same scan but materializes parsed structs; use that when the
    payload is consumed, this when only auditing.
    """
    from ..sources import load_table

    ev = load_table(spark, sf_dir, "events")
    valid = F.get_json_object("props", "$.k").isNotNull()
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(valid, 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(valid, 0).otherwise(1)).alias("n_invalid"),
    )
