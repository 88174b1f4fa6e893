"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference stock-ETL-with-sentiment pipeline
(see SURVEY.md), re-expressed Spark-first.

Layout
------
- ``session``    SparkSession factory (AQE on, UTC, arrow).
- ``sources``    readers for the parquet test tables + csv/json.
- ``plans``      derived-layer builders: the stock-domain panel
                 (prices / explanations / predictions) expressed over
                 the TPC-H-ish testdata, plus matching DuckDB oracle
                 CTE snippets used by ``__spark_entry__.oracle_sql``.
- ``operators``  one module per SURVEY.md §2 family (windows, joins,
                 aggregations, filters, scalars, sorts, reshape,
                 sinks) — each public query is registered in
                 ``registry`` under its stable §2 key.
- ``functions``  reusable column-expression helpers (pct_change,
                 RSI, ATR, bollinger, text metrics...).
- ``ml``         feature engineering + MLlib train/predict pipeline.
- ``llmdata``    LLM-data-pipeline extensions: dedup (exact/minhash/
                 simhash), similarity search, text analysis,
                 multimodal column plumbing.
- ``streaming``  Structured Streaming incremental-ingest analogs.
"""

__version__ = "0.1.0"
