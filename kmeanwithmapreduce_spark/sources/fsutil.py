"""Shared Hadoop-FS helpers (py4j): one place for the jvm/Path/
getFileSystem dance and the tiny-JSON read/write pattern the epoch
layers use (sources/table.py, streaming/marts.py). Keeping these
together means an FS quirk fix (encoding, stream closing, atomicity)
lands once."""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


def hadoop(spark: SparkSession, path: str):
    """(jvm, jpath, fs) for ``path`` under the session's Hadoop conf."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


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
