"""Small-file compaction: rewrite a parquet dataset into near-target-
size files. The 100 TB failure mode this serves: streaming sinks,
per-epoch shard exports, and fine-grained partitioned writes each leave
thousands of KB-scale files; every later scan then pays one task + one
open per file, and the driver pays listing + footer reads for all of
them. Compaction is the standard maintenance pass (what table formats
call OPTIMIZE / rewrite_data_files); over plain parquet the engine
composes it from a scan + repartition + write.

Scale shape: one distributed scan, ONE round-robin Exchange into the
computed file count, one write — no aggregation state anywhere. File
sizing derives from the dataset's actual on-disk bytes (Hadoop
FileSystem API, any scheme), so the same call works on a local dir or
an object store. The rewrite goes to a NEW directory: atomic swap is
the storage layer's business (object-store rename semantics differ);
a maintenance job renames after validation.

No reference counterpart (the reference writes one text file); this
extends SURVEY §2 Part B sources/sinks.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

_DEFAULT_TARGET = 128 * 1024 * 1024


@dataclass(frozen=True)
class CompactionStats:
    n_files_before: int
    n_files_after: int
    bytes_before: int
    bytes_after: int
    n_rows: int


def _parquet_files(spark: SparkSession, path: str):
    """(path, size) of every data file under ``path`` via the Hadoop FS
    API — works for any scheme, skips _hidden/. files (manifests,
    _SUCCESS)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append((st.getPath().toString(), st.getLen()))
    return out


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = _DEFAULT_TARGET,
    stats_columns: list[str] | str | None = "inherit",
) -> CompactionStats:
    """Rewrite ``in_path`` (parquet) into ``out_path`` with
    ceil(total_bytes / target_file_bytes) files of near-equal size.

    Round-robin repartition (not coalesce): coalesce merges whole input
    partitions without a shuffle, which preserves any size skew between
    them — a 2 GB file next to 2000 tiny ones would stay a 2 GB output
    task. The single Exchange buys even file sizes, which is what the
    next thousand scans of this dataset amortize against.

    ``stats_columns="inherit"`` (default): if the input carries a
    data-skipping sidecar (sources/stats.py), the output gets one for
    the SAME columns — compaction must not silently downgrade a table
    from pruned scans back to full scans (round-11 gap). Harvested
    from the freshly-written footers, so the inheritance costs no data
    pass. Pass a list to set columns explicitly, or None to skip.
    """
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    from .stats import read_file_stats, write_file_stats

    before = _parquet_files(spark, in_path)
    bytes_before = sum(s for _, s in before)
    n_out = max(1, -(-bytes_before // target_file_bytes))
    df = spark.read.parquet(in_path)
    df.repartition(int(n_out)).write.mode("error").parquet(out_path)
    if stats_columns == "inherit":
        src = read_file_stats(spark, in_path)
        stats_columns = sorted(src["columns"]) if src else None
    if stats_columns:
        write_file_stats(spark, out_path, list(stats_columns))
    after = _parquet_files(spark, out_path)
    n_rows = spark.read.parquet(out_path).count()
    return CompactionStats(
        n_files_before=len(before),
        n_files_after=len(after),
        bytes_before=bytes_before,
        bytes_after=sum(s for _, s in after),
        n_rows=n_rows,
    )
