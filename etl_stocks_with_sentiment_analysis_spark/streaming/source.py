"""A REAL ``spark.readStream`` source over manifest tables (r11) —
the Delta streaming-source analog, built on Spark 4's Python Data
Source API (`pyspark.sql.datasource`): Spark owns the offsets and
checkpointing, micro-batch planning happens on the driver against the
immutable manifest log, and the DATA is read on EXECUTORS with
pyarrow — no driver-side row materialization at any table size.

    from etl_stocks_with_sentiment_analysis_spark.streaming.source import (
        register_manifest_stream_source,
    )
    register_manifest_stream_source(spark)
    df = (spark.readStream.format("manifest_stream")
          .option("path", target).load())
    q = df.writeStream...trigger(availableNow=True)...

Semantics (Delta's, deliberately):

- OFFSETS are manifest versions. A NEW stream first delivers the
  table's CURRENT SNAPSHOT as one batch, then each later micro-batch
  covers a contiguous version range and reads exactly the data
  directories those commits ADDED (Delta's initial-snapshot
  semantics). ``startingVersion=N`` instead replays commits from N
  as appends — subject to the data retention window (older versions'
  files are reclaimed; the replay fails loudly, Delta's
  failOnDataLoss).
- APPEND-ONLY contract: an upsert that REWRITES an existing entry, a
  DELETE, or a merge-on-read predicate change is not expressible as
  an append — the stream fails loudly (Delta's behavior) unless
  ``ignoreChanges=true`` (rewritten dirs are redelivered in full —
  downstream must dedup, exactly Delta's ignoreChanges caveat) /
  ``ignoreDeletes=true`` (vanished entries are skipped).
- REPLAY SAFETY: manifests are immutable and snapshot dirs are
  content-addressed, so re-planning a checkpointed range yields the
  identical partition list; data files aged out of the retention
  window fail the read loudly (Delta's failOnDataLoss) — restart
  from a fresh snapshot instead.
- The fixed stream schema is the manifest's RECORDED schema at
  stream start; later file batches are projected to it (added
  columns drop, missing columns null-fill — the manifest reader's
  schema-on-read rule). Partition columns are restored from the
  directory keys exactly like the batch reader.

For row-level CDC (updates/deletes as a change feed) use
`read_manifest_changes_stream` — change-feed semantics need the
version diff the engine computes; this source is the high-throughput
append path a training-data pipeline tails.
"""

from __future__ import annotations

import json
import urllib.parse

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class _FilesPartition(InputPartition):
    """One snapshot data directory of one commit: the files to read
    plus the partition-column values its directory key encodes."""

    def __init__(self, files: list[str], pvals: dict[str, str | None],
                 schema_json: str):
        self.files = files
        self.pvals = pvals
        self.schema_json = schema_json


def _strip_scheme(path: str) -> str:
    if path.startswith("file:"):
        # file:/x, file:///x -> /x
        rest = path[5:]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest
    return path


def _parse_key_values(key: str, pcols: list[str]) -> dict[str, str | None]:
    """'a=1/b=x' -> {a: '1', b: 'x'} with Spark's hive-style escaping
    and NULL sentinel honored."""
    out: dict[str, str | None] = {}
    if key == "__ALL__":
        return out
    levels = key.split("/")
    for col, level in zip(pcols, levels):
        _, _, raw = level.partition("=")
        val = urllib.parse.unquote(raw)
        out[col] = None if val == "__HIVE_DEFAULT_PARTITION__" else val
    return out


class ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, target: str, schema: StructType, options):
        self.target = target
        self.schema = schema
        sv = options.get("startingversion")
        self.starting_version = None if sv is None else int(sv)
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.ignore_deletes = (
            str(options.get("ignoredeletes", "false")).lower() == "true"
        ) or self.ignore_changes

    # -- offset protocol ----------------------------------------------
    def initialOffset(self) -> dict:
        if self.starting_version is not None:
            return {"version": self.starting_version - 1}
        from ..operators import sinks

        ver, man = sinks._latest_manifest(self.target)
        if man is None:
            raise ValueError(f"no manifest table at {self.target}")
        # current-snapshot start: the first batch delivers version
        # `ver`'s FULL image, later batches its successors' appends
        return {"version": ver - 1, "snapshot": ver}

    def latestOffset(self) -> dict:
        from ..operators import sinks

        ver, man = sinks._latest_manifest(self.target)
        if man is None:
            raise ValueError(f"no manifest table at {self.target}")
        return {"version": ver}

    def commit(self, end: dict) -> None:  # offsets live in Spark's log
        return

    # -- planning (driver) ----------------------------------------------
    def _preds(self, man: dict) -> list:
        return man.get("delete_predicates") or []

    def partitions(self, start: dict, end: dict):
        from ..operators import fsio, sinks

        parts: list[_FilesPartition] = []
        schema_json = self.schema.json()
        snap_at = start.get("snapshot")
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            if (snap_at is not None and v == int(snap_at)) or v == 0:
                # initial snapshot (or the table's birth commit):
                # every entry of THIS version is new rows
                man_a: dict = {"partitions": {}}
                man_b = sinks._manifest_at_version(self.target, v)
            else:
                man_a = sinks._manifest_at_version(self.target, v - 1)
                man_b = sinks._manifest_at_version(self.target, v)
            if self._preds(man_b) != self._preds(man_a) and not (
                self.ignore_changes
            ):
                raise ValueError(
                    f"commit {v} at {self.target} changed merge-on-read "
                    "delete predicates — not an append; set "
                    "ignoreChanges=true to redeliver affected data, or "
                    "consume the CDC feed (read_manifest_changes_stream)"
                )
            pa_map = man_a.get("partitions") or {}
            pb_map = man_b.get("partitions") or {}
            pcols = sinks._man_pcols(man_b)
            for key in pa_map:
                if key not in pb_map and not self.ignore_deletes:
                    raise ValueError(
                        f"commit {v} at {self.target} dropped partition "
                        f"{key!r} — not an append; set ignoreDeletes=true "
                        "to skip deletes, or consume the CDC feed"
                    )
            for key, rel in pb_map.items():
                prev_rel = pa_map.get(key)
                if prev_rel == rel:
                    continue  # carried forward by reference: no new rows
                if prev_rel is not None and not self.ignore_changes:
                    raise ValueError(
                        f"commit {v} at {self.target} REWROTE partition "
                        f"{key!r} — not an append (updates are not "
                        "expressible as new rows); set ignoreChanges=true "
                        "to redeliver the full partition, or consume the "
                        "CDC feed (read_manifest_changes_stream)"
                    )
                dirp = fsio.join(self.target, rel)
                files = [
                    fsio.join(dirp, e.name)
                    for e in fsio.list_status(dirp)
                    if e.name.endswith(".parquet")
                    and not e.name.startswith((".", "_"))
                ]
                if files:
                    parts.append(
                        _FilesPartition(
                            files,
                            _parse_key_values(key, pcols),
                            schema_json,
                        )
                    )
        return parts

    # -- execution (executors, Arrow batches) ---------------------------
    def read(self, partition: _FilesPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        schema = StructType.fromJson(json.loads(partition.schema_json))
        arrow_schema = to_arrow_schema(schema)
        for f in partition.files:
            tbl = pq.read_table(_strip_scheme(f))
            n = tbl.num_rows
            cols = []
            for field in arrow_schema:
                if field.name in partition.pvals:
                    raw = partition.pvals[field.name]
                    arr = pa.array([raw] * n, type=pa.string()).cast(
                        field.type
                    )
                elif field.name in tbl.column_names:
                    arr = tbl.column(field.name).cast(field.type)
                else:  # schema-on-read: missing column null-fills
                    arr = pa.nulls(n, type=field.type)
                cols.append(arr)
            out = pa.table(cols, schema=arrow_schema)
            yield from out.to_batches(max_chunksize=1 << 16)


class ManifestStreamDataSource(DataSource):
    """``spark.readStream.format("manifest_stream")`` — see module
    docstring. Options: ``path`` (required), ``startingVersion``,
    ``ignoreChanges``, ``ignoreDeletes``."""

    @classmethod
    def name(cls) -> str:
        return "manifest_stream"

    def _target(self) -> str:
        target = self.options.get("path")
        if not target:
            raise ValueError(
                "manifest_stream needs .option('path', <table dir>)"
            )
        return target

    def schema(self) -> StructType:
        from ..operators import sinks

        _, man = sinks._latest_manifest(self._target())
        if man is None:
            raise ValueError(
                f"no manifest table at {self._target()} — the stream "
                "schema is the table's recorded schema"
            )
        return StructType.fromJson(json.loads(man["schema"]))

    def streamReader(self, schema: StructType) -> ManifestStreamReader:
        return ManifestStreamReader(self._target(), schema, self.options)


def register_manifest_stream_source(spark) -> None:
    """Register the format with this session (idempotent)."""
    spark.dataSource.register(ManifestStreamDataSource)


# ---------------------------------------------------------------------------
# Registered query key (driver correctness gate)
# ---------------------------------------------------------------------------

_READSTREAM_ORACLE = """
SELECT CAST(user_id % 4 AS INTEGER) AS grp, event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1, 2"""


def _register(key, oracle):
    from ..registry import register

    return register(key, oracle=oracle)


@_register("streaming_manifest_readstream", _READSTREAM_ORACLE)
def streaming_manifest_readstream(spark, sf_dir: str):
    """THE real ``spark.readStream`` over a manifest table (r11): a
    custom Spark 4 Python Data Source whose offsets are manifest
    versions. The key lands commit 1 (partitions grp 0-1), starts the
    stream — the initial batch is the CURRENT SNAPSHOT — drains into
    a parquet sink with a checkpoint, lands commit 2 (FRESH
    partitions grp 2-3, append-only), and drains AGAIN from the same
    checkpoint: the second micro-batch must deliver exactly the new
    commit's rows (asserted in-key). The final aggregate of the
    sink's accumulated output equals the plain batch aggregate of all
    events — the oracle recomputes it relationally. Executor-side
    pyarrow reads; Spark-owned offsets; restart/refusal/ignoreChanges
    semantics are driven in tests/test_round11_ops.py."""
    import os as _os

    from pyspark.sql import functions as F

    from ..operators.sinks import scratch_dir, upsert
    from ..sources import load_table

    register_manifest_stream_source(spark)
    base = scratch_dir("s28_")
    target = _os.path.join(base, "rs_table")
    out = _os.path.join(base, "rs_out")
    ck = _os.path.join(base, "rs_ck")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        (F.col("user_id") % 4).cast("int").alias("grp"),
    )
    upsert(spark, target, ev.filter(F.col("grp") < 2), ["event_id", "grp"],
           partition_col="grp", commit_mode="manifest")

    stream = (
        spark.readStream.format("manifest_stream")
        .option("path", target).load()
    )

    def drain() -> None:
        q = (
            stream.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()  # initial snapshot batch: grp 0-1
    n_first = spark.read.parquet(out).count()
    # commit 2: append-only (fresh partitions)
    upsert(spark, target, ev.filter(F.col("grp") >= 2), ["event_id", "grp"],
           partition_col="grp", commit_mode="manifest")
    drain()  # resumes from the checkpoint: exactly the new rows
    got = spark.read.parquet(out)
    n_total = got.count()
    n_new = ev.filter(F.col("grp") >= 2).count()
    assert n_total == n_first + n_new, (n_first, n_new, n_total)
    return got.groupBy("grp", "event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long").alias("value_cents"),
    )
