"""Filesystem facade for commit-protocol METADATA I/O (manifests,
markers, snapshot listings), routed through Hadoop's ``FileSystem``
API so the manifest table protocol in `sinks.py` runs against any URI
scheme Spark itself can reach — ``file:///``, ``hdfs://``, ``s3a://``
— instead of being local-filesystem-only (`os.listdir`/`os.link`).

The reference's durability layer is Postgres `ON CONFLICT`
(`/root/reference/ml/data_loader.py:140-160`) and works wherever its
engine runs; this module is the Spark-lake equivalent: data files go
through Spark (URI-agnostic already), and the commit metadata goes
through the SAME Hadoop filesystem abstraction the executors use.

Every function takes a path string (plain local path, ``file://``,
``hdfs://``, ``s3a://``…) and resolves the owning ``FileSystem`` from
the live SparkSession's Hadoop configuration. Hadoop caches
FileSystem instances per (scheme, authority, ugi), so per-call
``getFileSystem`` is a map lookup after the first call.

THE VERSION-CAS (`create_text_if_absent`) is the one primitive whose
atomicity is store-specific, so it dispatches on scheme:

- ``file`` (and plain paths): write a dot-temp then ``os.link`` to
  the final name — link(2) fails with EEXIST if the name exists,
  a genuinely atomic conditional-create on POSIX. (Hadoop's
  ``RawLocalFileSystem.create(overwrite=false)`` is check-then-act —
  two racing writers can both pass the exists() check — so the JVM
  path is NOT used for local URIs; the two-writer stress test in
  tests/test_sinks.py would be a coin flip under it.)
- everything else: write the FULL bytes to a dot-temp sibling, then
  ``FileSystem.rename(temp, final)`` — atomic on HDFS-class stores
  (the namenode arbitrates; rename fails when the destination
  exists), and the destination name is never visible with partial
  bytes (r8, closing the torn-read window the direct
  create(overwrite=false)+write publish had).
  On S3A specifically, conditional create requires the store's
  If-None-Match conditional PUT (Hadoop 3.4.1+ exposes it via
  ``fs.s3a.create.conditional.enabled``); older S3A's
  create(overwrite=false) is check-then-act and needs an external
  lock or a DynamoDB-style arbiter — documented, not silently
  papered over.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from urllib.parse import urlparse

__all__ = [
    "FileInfo",
    "exists",
    "is_dir",
    "list_status",
    "read_text",
    "write_text",
    "create_text_if_absent",
    "rename",
    "delete",
    "mkdirs",
    "mtime",
    "join",
]


@dataclass(frozen=True)
class FileInfo:
    name: str  # basename, no path
    is_dir: bool
    mtime: float  # seconds since epoch


def _session():
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession() or SparkSession._instantiatedSession
    if s is None:  # pragma: no cover - protocol needs a live session
        raise RuntimeError("manifest I/O requires an active SparkSession")
    return s


def _no_session() -> bool:
    # pure attribute reads — NO py4j roundtrip (getActiveSession()
    # calls into the JVM when a context exists, which would tax every
    # fsio op on the resolver hot path); in a Python data source
    # worker neither attribute is set
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    return (
        SparkSession._instantiatedSession is None
        and SparkContext._active_spark_context is None
    )


# ---------------------------------------------------------------------------
# Pure-python READ fallback (pyarrow.fs) — Spark 4's Python Data
# Source API runs its planning methods (schema/latestOffset/
# partitions) in a plain python worker with NO py4j gateway, so the
# manifest RESOLVER (pure-JSON logic over these read primitives) must
# work without the JVM. Reads dispatch to pyarrow's filesystem layer
# (local / hdfs:// / s3:// per URI) when no SparkSession exists —
# exactly the paths that previously raised. WRITES keep requiring the
# JVM: every commit path runs on the driver where the session lives,
# and the CAS semantics are store-dispatch-audited there.
# ---------------------------------------------------------------------------


def _pafs(path: str):
    from pyarrow import fs as pafs

    p = urlparse(path)
    if p.scheme in ("", "file"):
        return pafs.LocalFileSystem(), _local_path(path)
    f, rel = pafs.FileSystem.from_uri(path)
    return f, rel


def _py_info(path: str):
    f, p = _pafs(path)
    return f.get_file_info(p)


# (session, jvm, Path class, IOUtils class, hadoopConfiguration) —
# resolved once per live SparkSession. py4j resolves a JavaPackage
# chain (`jvm.org.apache.hadoop.fs.Path`) with reflection round-trips
# per call; the manifest resolver runs several fsio ops per resolve,
# so caching the resolved JavaClass handles measurably trims the
# metadata hot path. Keyed by session IDENTITY so a stopped/restarted
# session can never serve stale JVM handles.
_jvm_cache: tuple | None = None


def _jfs(path: str):
    """(jvm, FileSystem, Path) for `path`, via the session's Hadoop
    conf. Multi-thread safe: py4j gives each Python thread its own
    gateway connection, and Hadoop's FileSystem cache is the JVM's."""
    global _jvm_cache
    spark = _session()
    c = _jvm_cache
    if c is None or c[0] is not spark:
        jvm = spark._jvm
        c = (
            spark,
            jvm,
            jvm.org.apache.hadoop.fs.Path,
            jvm.org.apache.commons.io.IOUtils,
            spark._jsc.hadoopConfiguration(),
        )
        _jvm_cache = c
    _, jvm, jpath_cls, _, conf = c
    jpath = jpath_cls(path)
    fs = jpath.getFileSystem(conf)
    return jvm, fs, jpath


def _java_exc_name(err) -> str:
    try:
        return err.java_exception.getClass().getName()
    except Exception:  # pragma: no cover
        return ""


# ---------------------------------------------------------------------------
# Object-store semantics test double (r14). Real object stores are
# unreachable from the test sandbox, so the CAS contract the module
# docstring documents (rename-fails-on-existing for HDFS-class
# stores; If-None-Match conditional PUT for S3A with
# fs.s3a.create.conditional.enabled) was dispatch-audited but never
# EXECUTED against store semantics. A registered fake store routes
# every fsio op for its scheme to a Python object implementing the
# Hadoop-FileSystem-shaped primitives, so the two-writer CAS races
# and crash-window tests run against emulated store behavior —
# including a deliberately RACY check-then-act rename mode proving
# the tests can tell correct semantics from broken ones. Empty in
# production; the JVM paths are untouched when nothing is registered.
#
# A store object provides: exists(p) -> bool, status(p) ->
# (is_dir, mtime) or None, list(p) -> [(name, is_dir, mtime)],
# open_bytes(p) -> bytes (FileNotFoundError when absent),
# create(p, data: bytes, overwrite: bool) (FileExistsError when
# overwrite=False and p exists — atomic iff the store's
# `conditional_put` attribute is true), rename(src, dst) -> bool
# (False when dst exists), delete(p, recursive) -> bool, mkdirs(p).
_FAKE_STORES: dict[str, object] = {}


def register_fake_store(scheme: str, store) -> None:
    _FAKE_STORES[scheme] = store


def unregister_fake_store(scheme: str) -> None:
    _FAKE_STORES.pop(scheme, None)


def _fake_store(path: str):
    if not _FAKE_STORES:
        return None
    return _FAKE_STORES.get(urlparse(path).scheme)


def _is_local(path: str) -> bool:
    scheme = urlparse(path).scheme
    return scheme in ("", "file")


# "is a scheme-less path LOCAL?" depends on Hadoop's fs.defaultFS —
# on a real cluster a bare path means HDFS. Resolved once per session
# (one JVM round-trip), so the local READ fast path below never
# misroutes a cluster path. Keyed by session identity like _jvm_cache.
_default_fs_local: tuple | None = None


def _local_read_path(path: str) -> str | None:
    """The filesystem path for a PROVABLY-LOCAL `path`, else None.
    `file://` URIs are always local; scheme-less paths are local only
    when the session's fs.defaultFS is the local filesystem."""
    global _default_fs_local
    p = urlparse(path)
    if p.scheme == "file":
        return p.path
    if p.scheme:
        return None
    spark = _session()
    c = _default_fs_local
    if c is None or c[0] is not spark:
        default = spark._jsc.hadoopConfiguration().get(
            "fs.defaultFS", "file:///"
        )
        c = (spark, str(default).startswith("file:"))
        _default_fs_local = c
    return path if c[1] else None


def _local_path(path: str) -> str:
    p = urlparse(path)
    return p.path if p.scheme else path


def join(path: str, *parts: str) -> str:
    """URI-preserving path join (os.path.join would also work on
    POSIX, but this never surprises on scheme'd URIs)."""
    out = path.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def exists(path: str) -> bool:
    st = _fake_store(path)
    if st is not None:
        return st.exists(path)
    if _no_session():
        from pyarrow import fs as pafs

        return _py_info(path).type != pafs.FileType.NotFound
    _, fs, jp = _jfs(path)
    return bool(fs.exists(jp))


def is_dir(path: str) -> bool:
    st = _fake_store(path)
    if st is not None:
        got = st.status(path)
        return bool(got and got[0])
    if _no_session():
        from pyarrow import fs as pafs

        return _py_info(path).type == pafs.FileType.Directory
    _, fs, jp = _jfs(path)
    try:
        return bool(fs.getFileStatus(jp).isDirectory())
    except Exception as e:
        if "FileNotFoundException" in _java_exc_name(e):
            return False
        raise


def list_status(path: str) -> list[FileInfo]:
    """Direct children with (name, is_dir, mtime) in ONE namenode/
    store roundtrip — the listing primitive every manifest resolve and
    GC sweep uses. Missing dir lists as empty (a table with no commits
    reads as empty, never as an error)."""
    st = _fake_store(path)
    if st is not None:
        return [FileInfo(*e) for e in st.list(path)]
    if _no_session():
        from pyarrow import fs as pafs

        f, p = _pafs(path)
        try:
            infos = f.get_file_info(pafs.FileSelector(p))
        except (FileNotFoundError, OSError):
            return []
        return [
            FileInfo(
                name=i.path.rsplit("/", 1)[-1],
                is_dir=i.type == pafs.FileType.Directory,
                mtime=(i.mtime.timestamp() if i.mtime else 0.0),
            )
            for i in infos
        ]
    _, fs, jp = _jfs(path)
    try:
        statuses = fs.listStatus(jp)
    except Exception as e:
        if "FileNotFoundException" in _java_exc_name(e):
            return []
        raise
    return [
        FileInfo(
            name=st.getPath().getName(),
            is_dir=bool(st.isDirectory()),
            mtime=st.getModificationTime() / 1000.0,
        )
        for st in statuses
    ]


def mtime(path: str) -> float:
    """Raises FileNotFoundError if absent."""
    st = _fake_store(path)
    if st is not None:
        got = st.status(path)
        if got is None:
            raise FileNotFoundError(path)
        return got[1]
    if _no_session():
        from pyarrow import fs as pafs

        info = _py_info(path)
        if info.type == pafs.FileType.NotFound:
            raise FileNotFoundError(path)
        return info.mtime.timestamp() if info.mtime else 0.0
    _, fs, jp = _jfs(path)
    try:
        return fs.getFileStatus(jp).getModificationTime() / 1000.0
    except Exception as e:
        if "FileNotFoundException" in _java_exc_name(e):
            raise FileNotFoundError(path) from None
        raise


def read_text(path: str) -> str:
    """Whole-file UTF-8 read; raises FileNotFoundError if absent (the
    manifest resolver's raced-GC retry depends on that mapping)."""
    st = _fake_store(path)
    if st is not None:
        return st.open_bytes(path).decode("utf-8")
    if _no_session():
        from pyarrow import fs as pafs

        f, p = _pafs(path)
        try:
            with f.open_input_stream(p) as stream:
                return stream.read().decode("utf-8")
        except (FileNotFoundError, OSError) as e:
            raise FileNotFoundError(path) from e
    # LOCAL READ FAST PATH (r13): manifest metadata resolution issues
    # several small reads per statement; through the JVM each costs a
    # py4j round-trip (~15-20 ms measured) vs ~50 µs for a direct
    # read. Only provably-local paths take it (file:// scheme, or
    # scheme-less with a local fs.defaultFS) — cluster URIs keep the
    # Hadoop FileSystem semantics untouched.
    lp = _local_read_path(path)
    if lp is not None:
        try:
            with open(lp, "rb") as fh:
                return fh.read().decode("utf-8")
        except FileNotFoundError:
            raise FileNotFoundError(path) from None
    jvm, fs, jp = _jfs(path)
    try:
        stream = fs.open(jp)
    except Exception as e:
        if "FileNotFoundException" in _java_exc_name(e):
            raise FileNotFoundError(path) from None
        raise
    try:
        data = _jvm_cache[3].toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def write_text(path: str, text: str, sync: bool = True) -> None:
    """Create-or-overwrite write (temp files, markers) — NOT the
    commit CAS; see `create_text_if_absent`. ``sync=False`` skips the
    hsync for BEST-EFFORT files whose loss costs only a fallback
    (checkpoint pointer, in-flight markers): a disk sync per marker
    touch is measurable protocol overhead at per-micro-batch commit
    rates, and durability of these files is explicitly not part of
    the commit contract."""
    st = _fake_store(path)
    if st is not None:
        st.create(path, text.encode("utf-8"), True)
        return
    _, fs, jp = _jfs(path)
    out = fs.create(jp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
        if sync:
            try:
                out.hsync()
            except Exception:
                pass  # store without sync support: close() persists
    finally:
        out.close()


def create_text_if_absent(path: str, text: str) -> None:
    """The version-CAS: publish `text` at `path` iff no object exists
    there, atomically. Raises FileExistsError when the name is taken —
    the manifest protocol's lost-race signal. Store dispatch is the
    module docstring's contract: POSIX link(2) for local, HDFS
    create(overwrite=false) elsewhere."""
    st = _fake_store(path)
    if st is not None:
        # Emulated object store (r14): exercise the documented store
        # contracts for real. A store advertising `conditional_put`
        # (the S3A If-None-Match path) publishes with ONE atomic
        # conditional create; an HDFS-class store runs the same
        # write-temp + dst-must-not-exist rename the JVM branch
        # below uses.
        if getattr(st, "conditional_put", False):
            try:
                st.create(path, text.encode("utf-8"), False)
            except FileExistsError:
                raise FileExistsError(path) from None
            return
        d, name = path.rsplit("/", 1)
        tmp = f"{d}/.{name}.tmp-{uuid.uuid4().hex[:8]}"
        st.create(tmp, text.encode("utf-8"), True)
        renamed = st.rename(tmp, path)
        if not renamed:
            st.delete(tmp, False)
            raise FileExistsError(path)
        return
    if _is_local(path):
        lp = _local_path(path)
        d, name = os.path.split(lp)
        tmp = os.path.join(d, f".{name}.tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, lp)
        except FileExistsError:
            raise
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass
        return
    # Non-local: publish via WRITE-TEMP + RENAME, not
    # create(overwrite=false)+write. The latter makes the committed
    # name visible as an empty/partial object before the bytes land,
    # so a reader racing the commit can observe a torn manifest.
    # HDFS-class stores rename atomically and the rename FAILS
    # (returns false) when the destination exists — dst-must-not-exist
    # rename IS the conditional create, with full bytes already
    # durable at the temp name before the destination ever appears.
    # (S3A's rename is a non-atomic server-side copy; true S3
    # conditional publish needs the If-None-Match conditional PUT —
    # Hadoop 3.4.1+ `fs.s3a.create.conditional.enabled` — as the
    # module docstring documents.)
    jvm, fs, jp = _jfs(path)
    d, name = path.rsplit("/", 1)
    tmp = f"{d}/.{name}.tmp-{uuid.uuid4().hex[:8]}"
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    out = fs.create(jtmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
        try:
            out.hsync()
        except Exception:
            pass  # store without sync support: close() still persists
    finally:
        out.close()
    try:
        renamed = bool(fs.rename(jtmp, jp))
    except Exception as e:
        if "FileAlreadyExists" in _java_exc_name(e):
            renamed = False
        else:
            try:
                fs.delete(jtmp, False)
            except Exception:
                pass
            raise
    if not renamed:
        try:
            fs.delete(jtmp, False)
        except Exception:
            pass
        raise FileExistsError(path)


def rename(src: str, dst: str) -> bool:
    """Move/rename within one store. False when the store refuses
    (e.g. destination exists on HDFS). Used by the OFFLINE manifest
    repair tool to archive rotted files — not by any commit path."""
    st = _fake_store(src)
    if st is not None:
        return st.rename(src, dst)
    _, fs, jsrc = _jfs(src)
    _, _, jdst = _jfs(dst)
    try:
        return bool(fs.rename(jsrc, jdst))
    except Exception as e:
        if "FileNotFoundException" in _java_exc_name(e):
            return False
        raise


def delete(path: str, recursive: bool = False) -> bool:
    """Best-effort delete; False if absent."""
    st = _fake_store(path)
    if st is not None:
        return st.delete(path, recursive)
    _, fs, jp = _jfs(path)
    try:
        return bool(fs.delete(jp, recursive))
    except Exception as e:
        if "FileNotFoundException" in _java_exc_name(e):
            return False
        raise


def mkdirs(path: str) -> None:
    st = _fake_store(path)
    if st is not None:
        st.mkdirs(path)
        return
    if _no_session():
        # session-less path (r15): the protocol tools and the
        # resolver's pre-session probes run without a JVM, like
        # list_status/read_text above
        if _is_local(path):
            os.makedirs(_local_path(path), exist_ok=True)
            return
        from pyarrow import fs as pafs  # noqa: F401

        f, p = _pafs(path)
        f.create_dir(p, recursive=True)
        return
    _, fs, jp = _jfs(path)
    fs.mkdirs(jp)
