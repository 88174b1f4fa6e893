"""Sources: parquet test tables, CSV, JSON.

Reference parity (SURVEY.md §2.1): S1 ``source_market_batch`` /
S9 ``source_backup_restore`` — the reference pulls OHLCV frames from
yfinance (`/root/reference/airflow/dags/stock_grok_pipeline.py:67-74`)
and restores a CSV backup. Here every source is a Spark reader:
columnar parquet scans get predicate pushdown + column pruning from
Catalyst for free; CSV/JSON readers take explicit schemas (never
inferSchema in production — it scans the data twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType, TimestampNTZType, TimestampType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Assert the TIMESTAMP(NANOS)-parquet support flag on a session.

    Spark exposes no per-read option for nanos parquet — the legacy
    flag is session-global by design. The engine's own session factory
    (`session.get_spark`) sets it at build time; this idempotent
    re-assert exists ONLY for sessions built elsewhere (the driver's,
    bare pytest fixtures), so a table read never silently fails there.
    It never unsets or changes any other config.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-TZ TimestampType, whatever the file ships.

    The testdata generator has shipped ``ts`` as TIMESTAMP(NANOS) in
    some rounds and ``timestamp[us]`` in others, so the reader branches
    on the type it actually got instead of assuming one encoding:

    - ``LongType`` — parquet NANOS read under
      ``spark.sql.legacy.parquet.nanosAsLong``: integer-divide to
      micros (``div``, not float — ns epoch values exceed double's
      2^53 exact range) and rebuild a timestamp.
    - ``TimestampNTZType`` — micros parquet without isAdjustedToUTC:
      cast to TimestampType, which interprets the wall clock in the
      session timezone (UTC here), matching DuckDB's naive reading.
    - ``TimestampType`` — already what every consumer expects.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast(TimestampType()))
    if isinstance(dt, TimestampType):
        return df
    raise TypeError(f"events.ts arrived as unsupported type {dt}")


# (applicationId, abs path, mtime_ns, size) -> DataFrame. A reader
# construction costs ~0.15 s of driver time (file listing + footer
# schema inference) at any scale; every query key re-reads the same
# immutable testdata tables, so the built PLAN is memoized (r15, guide
# §1.2 driver-side fixed costs). This is plan reuse, NOT data caching:
# every action still scans the parquet from disk. Keyed by the file's
# identity (mtime+size) so a rewritten file — e.g. a drift-test copy —
# never serves a stale file listing, and by applicationId so a plan
# can't cross sessions.
_TABLE_PLAN_MEMO: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (columnar parquet scan).

    ``events.ts`` varies by encoding across testdata generations; see
    :func:`normalize_event_ts`. The nanos conf is asserted before the
    read because a NANOS-typed file fails schema resolution without it
    ([PARQUET_TYPE_ILLEGAL]); the flag is a no-op for micros files.
    """
    import os

    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        ident: tuple | None = (st.st_mtime_ns, st.st_size)
    except OSError:
        ident = None  # let Spark raise its own missing-path error
    key = (spark.sparkContext.applicationId, os.path.abspath(path), ident)
    got = _TABLE_PLAN_MEMO.get(key) if ident is not None else None
    if got is not None:
        return got
    if name == "events":
        ensure_nanos_conf(spark)
        df = normalize_event_ts(spark.read.parquet(path))
    else:
        df = spark.read.parquet(path)
    if ident is not None:
        if len(_TABLE_PLAN_MEMO) > 256:  # bound: sessions x sfs x tables
            _TABLE_PLAN_MEMO.clear()
        _TABLE_PLAN_MEMO[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for Spark SQL queries."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_with_retry(
    partitions: list,
    read_one,
    max_attempts: int = 3,
    on_retry=None,
) -> DataFrame:
    """S2 — fallback/retry source (`/root/reference/airflow/dags/
    stock_grok_pipeline.py:130-156`): the reference fetches per ticker
    and re-fetches ONLY the tickers that failed, then combines.

    Spark analog: `partitions` is a list of source-partition
    descriptors (ticker buckets, file groups, date ranges) and
    `read_one(p)` plans the read for one of them. Failed descriptors
    are retried up to `max_attempts` times; the result is the union of
    all per-partition frames in the original order, identical to a
    clean read. The loop is driver-side over METADATA (descriptor
    list, ~100s of entries) — the data itself never leaves executors;
    task-level transient faults below this are already covered by
    `spark.task.maxFailures`.
    """
    from functools import reduce

    frames: dict[int, DataFrame] = {}
    pending = list(range(len(partitions)))
    last_err: Exception | None = None
    for attempt in range(1, max_attempts + 1):
        failed = []
        for i in pending:
            try:
                frames[i] = read_one(partitions[i])
            except Exception as e:  # noqa: BLE001 - retry ANY source fault
                last_err = e
                failed.append(i)
        pending = failed
        if not pending:
            break
        if on_retry is not None:
            on_retry(attempt, [partitions[i] for i in pending])
    if pending:
        raise RuntimeError(
            f"source read failed after {max_attempts} attempts for "
            f"{[partitions[i] for i in pending]}"
        ) from last_err
    return reduce(DataFrame.unionByName, (frames[i] for i in range(len(partitions))))


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """CSV source with explicit schema (S9 backup-restore analog)."""
    return spark.read.csv(path, header=True, schema=schema)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.json(path, schema=schema)
