"""Versioned parquet table: snapshot chain with time-travel reads and
copy-forward rollback — the streaming SCD2 ``_SUCCESS``-epoch commit
discipline (streaming/ingest.py) generalized into a reusable
table-format layer.

Commit protocol (no pointer, no crash window):

- ``write_snapshot`` writes the full snapshot to ``epoch=N/`` where N =
  highest COMMITTED epoch + 1; parquet's own ``_SUCCESS`` marker is the
  commit. A writer that died mid-write left no ``_SUCCESS``, so the
  next writer picks the same N and its overwrite redoes the epoch
  cleanly. There is deliberately NO "promote current" pointer step — a
  pointer swap adds a crash window between marking the epoch done and
  swapping (the streaming_scd2_ingest rationale).
- ``read_table`` resolves to the highest committed epoch (or an
  explicit ``as_of`` epoch) at PLAN time and reads exactly that
  subdirectory — a concurrent append never shifts a running query.
- ``rollback`` is COPY-FORWARD: it appends a new epoch whose content
  is the old snapshot (the git-revert model). History stays intact,
  readers of intermediate epochs still resolve, and the no-pointer
  invariant holds. Old epochs are trivially GC-able keep-last-K.

Scale: an epoch is a plain parquet directory — partitioned, pruned,
and pushed-down like any other scan; the chain adds one driver-side
listStatus per resolve (O(#epochs), metadata only). Snapshots are
full copies, which is the right trade for dimension/corpus-release
tables (the c14 use case); fact-scale deltas belong to the SCD2 /
epoch-sketch ingest paths that already exist.

Reference parity: no reference analog (the reference is a single
K-Means job, SURVEY §2 Part A); training-data-pipeline extension.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..streaming.ingest import _committed_epochs


def table_epochs(spark: SparkSession, table_path: str) -> list[int]:
    """Committed epochs of the table, ascending (empty if none)."""
    return _committed_epochs(spark, table_path)


def write_snapshot(df: DataFrame, table_path: str) -> int:
    """Append ``df`` as the next committed snapshot; returns its epoch.
    Mode is overwrite WITHIN the chosen epoch dir (replay/crash-redo
    semantics), never across epochs."""
    spark = df.sparkSession
    done = _committed_epochs(spark, table_path)
    epoch = (done[-1] + 1) if done else 0
    df.write.mode("overwrite").parquet(
        os.path.join(table_path, f"epoch={epoch}")
    )
    return epoch


def read_table(
    spark: SparkSession, table_path: str, as_of: int | None = None
) -> DataFrame:
    """The table at ``as_of`` (a committed epoch), or the latest
    committed snapshot. Raises on an unknown/uncommitted epoch —
    reading a half-written directory must be impossible."""
    done = _committed_epochs(spark, table_path)
    if not done:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    if as_of is None:
        as_of = done[-1]
    elif as_of not in done:
        raise ValueError(
            f"epoch {as_of} is not committed at {table_path} "
            f"(committed: {done})"
        )
    return spark.read.parquet(os.path.join(table_path, f"epoch={as_of}"))


def rollback(spark: SparkSession, table_path: str, epoch: int) -> int:
    """Make ``epoch``'s content current again by appending it as a new
    snapshot (copy-forward). Returns the new epoch id."""
    return write_snapshot(read_table(spark, table_path, as_of=epoch), table_path)
