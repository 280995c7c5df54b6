"""Shared Hadoop-FS helpers (py4j): one place for the jvm/Path/
getFileSystem dance and the tiny-JSON read/write pattern the epoch
layers use (sources/table.py, streaming/marts.py). Keeping these
together means an FS quirk fix (encoding, stream closing, atomicity)
lands once."""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession


def hadoop(spark: SparkSession, path: str):
    """(jvm, jpath, fs) for ``path`` under the session's Hadoop conf."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def local_path(spark: SparkSession, path: str) -> str | None:
    """The native local-FS path when ``path`` resolves to the LOCAL
    filesystem under the session's Hadoop conf, else None.

    Why: the epoch layers are metadata-chatty (tens of tiny exists/
    list/read-JSON probes per table operation), and every probe through
    py4j costs a driver round-trip (~0.5 s of pure py4j per versioned-
    table entry, measured round 13). READ-ONLY probes are semantically
    identical through Python's os/io on a local path, so those take
    this fast path; every MUTATION (create/rename/delete — where
    atomicity contracts live) stays on the Hadoop FS path unchanged.
    On a real cluster (hdfs:///abfs://... URIs, or schemeless paths
    under a non-file fs.defaultFS) this returns None and everything
    uses the Hadoop FS exactly as before."""
    from urllib.parse import unquote, urlparse

    parsed = urlparse(path)
    if parsed.scheme == "file":
        return unquote(parsed.path)
    if parsed.scheme == "":
        # schemeless: resolves against fs.defaultFS — cache its scheme
        # per session (one Hadoop-conf probe, not one per call)
        scheme = getattr(spark, "_graft_default_fs_scheme", None)
        if scheme is None:
            try:
                default = (
                    spark._jsc.hadoopConfiguration().get("fs.defaultFS")
                    or "file:///"
                )
            except Exception:  # pragma: no cover - defensive
                return None
            scheme = urlparse(default).scheme or "file"
            spark._graft_default_fs_scheme = scheme
        if scheme == "file":
            return path
    return None


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe with the local fast path (read-only)."""
    lp = local_path(spark, path)
    if lp is not None:
        return os.path.exists(lp)
    _, jpath, fs = hadoop(spark, path)
    return fs.exists(jpath)


def fs_list_names(spark: SparkSession, path: str) -> list[str]:
    """Child names of a directory ([] when it does not exist), with the
    local fast path (read-only). Matches Hadoop listStatus semantics
    for the epoch layers' use: plain name list, no hidden-file
    filtering (epoch dirs/markers are never dot-files)."""
    lp = local_path(spark, path)
    if lp is not None:
        try:
            return os.listdir(lp)
        except FileNotFoundError:
            return []
        except NotADirectoryError:
            return []
    _, jpath, fs = hadoop(spark, path)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def qualified(spark: SparkSession, path: str) -> str:
    """The fully-qualified form of ``path`` (scheme + authority
    resolved against the Hadoop conf) — a location identity that is
    stable across driver working directories, unlike os.path.abspath,
    and URI-safe (abspath mangles hdfs:// into <cwd>/hdfs:/...)."""
    _, jpath, fs = hadoop(spark, path)
    return fs.makeQualified(jpath).toString()


def read_json(spark: SparkSession, path: str):
    """Parse a small JSON file via the Hadoop FS; None when the file is
    missing OR unreadable/partial (callers treat both as 'absent' —
    the write side is tmp+rename so a partial final file only means a
    non-atomic legacy writer or a torn copy).

    Recovery: write_json's rename is delete-then-rename (Hadoop
    FileSystem.rename does not overwrite), so a crash in that window
    leaves the destination missing but ``<path>.tmp`` fully written.
    When the destination is absent we fall back to parsing the .tmp —
    a complete .tmp IS the newest committed content (it is written and
    closed before the delete happens), so the fallback never serves
    stale data, only rescues the torn-window case."""
    lp = local_path(spark, path)
    if lp is not None:
        # read-only local fast path (same semantics: missing OR
        # unreadable/partial -> None, .tmp rescue for the torn window)
        for p in (lp, lp + ".tmp"):
            try:
                with open(p, encoding="utf-8") as fh:
                    return json.loads(fh.read())
            except FileNotFoundError:
                continue
            except (ValueError, OSError):
                return None
        return None
    jvm, jpath, fs = hadoop(spark, path)

    def _load(p):
        try:
            return json.loads(
                jvm.org.apache.commons.io.IOUtils.toString(fs.open(p), "UTF-8")
            )
        except ValueError:
            return None

    if fs.exists(jpath):
        return _load(jpath)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    if fs.exists(tmp):
        return _load(tmp)
    return None


def write_json(spark: SparkSession, path: str, obj) -> None:
    """Write a small JSON file ATOMICALLY: create ``<path>.tmp``, then
    rename over the destination (deleting any previous version first —
    Hadoop rename does not overwrite). A concurrent reader sees the old
    file or the new one, never a torn write."""
    jvm, jpath, fs = hadoop(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    stream = fs.create(tmp, True)
    stream.write(json.dumps(obj).encode("utf-8"))
    stream.close()
    if fs.exists(jpath):
        fs.delete(jpath, False)
    fs.rename(tmp, jpath)
