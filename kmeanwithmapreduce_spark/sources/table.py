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
from .fsutil import hadoop, read_json, write_json

_GC_LOG = "_gc_log.json"


def table_epochs(spark: SparkSession, table_path: str) -> list[int]:
    """Committed epochs of the table, ascending (empty if none)."""
    return _committed_epochs(spark, table_path)


def _gc_log(spark: SparkSession, table_path: str) -> list[int]:
    return read_json(spark, os.path.join(table_path, _GC_LOG)) or []


def _shape(schema) -> list[tuple[str, str]]:
    """(name, type) pairs — nullability excluded: a parquet round-trip
    may legitimately relax it, and it can't silently corrupt a read."""
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def write_snapshot(
    df: DataFrame, table_path: str, allow_schema_change: bool = False
) -> int:
    """Append ``df`` as the next committed snapshot; returns its epoch.
    Mode is overwrite WITHIN the chosen epoch dir (replay/crash-redo
    semantics), never across epochs.

    Refuses silent schema drift: the snapshot's (column, type) list
    must equal the latest committed epoch's, unless the caller states
    the evolution explicitly with ``allow_schema_change=True`` (older
    epochs keep their own schema — time-travel reads return what was
    committed, not a unified view)."""
    spark = df.sparkSession
    done = _committed_epochs(spark, table_path)
    epoch = (done[-1] + 1) if done else 0
    if done and not allow_schema_change:
        prev = spark.read.parquet(
            os.path.join(table_path, f"epoch={done[-1]}")
        ).schema
        if _shape(prev) != _shape(df.schema):
            raise ValueError(
                f"write_snapshot: schema drift vs epoch {done[-1]} at "
                f"{table_path}: committed {_shape(prev)} but snapshot has "
                f"{_shape(df.schema)}. Pass allow_schema_change=True to "
                "evolve the table explicitly."
            )
    df.write.mode("overwrite").parquet(
        os.path.join(table_path, f"epoch={epoch}")
    )
    return epoch


def read_table(
    spark: SparkSession, table_path: str, as_of: int | None = None
) -> DataFrame:
    """The table at ``as_of`` (a committed epoch), or the latest
    committed snapshot. Raises on an unknown/uncommitted epoch —
    reading a half-written directory must be impossible — and names
    the cause when the epoch existed but was garbage-collected."""
    done = _committed_epochs(spark, table_path)
    if not done:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    if as_of is None:
        as_of = done[-1]
    elif as_of not in done:
        if as_of in _gc_log(spark, table_path):
            raise ValueError(
                f"epoch {as_of} at {table_path} was garbage-collected "
                f"(gc_table keep-last-K); committed epochs: {done}"
            )
        raise ValueError(
            f"epoch {as_of} is not committed at {table_path} "
            f"(committed: {done})"
        )
    return spark.read.parquet(os.path.join(table_path, f"epoch={as_of}"))


def gc_table(spark: SparkSession, table_path: str, keep: int) -> list[int]:
    """Delete all but the newest ``keep`` committed epoch dirs; returns
    the epochs removed. The latest epoch is never deletable (keep >= 1),
    uncommitted dirs (in-flight writers) are never touched, and removed
    epochs are recorded in ``_gc_log.json`` so a later time-travel read
    fails with the real cause instead of 'not committed'.

    Also valid on the streaming SCD2 dimension chain (same epoch/
    ``_SUCCESS`` layout; the ``base`` bootstrap dir is never touched) —
    but note a GC'd epoch id disappears from the ingest's replay-skip
    set, so ``keep`` must cover the replayable window: a LIVE checkpoint
    replays at most its last uncommitted batch (keep>=2 is safe), and a
    FRESH checkpoint must never reuse a committed out dir at all (the
    epoch-id-collision hazard streaming/marts.py guards with its ident
    marker)."""
    if keep < 1:
        raise ValueError("gc_table: keep must be >= 1 (the latest epoch)")
    done = _committed_epochs(spark, table_path)
    victims = done[:-keep] if len(done) > keep else []
    if not victims:
        return []
    # LOG-AHEAD, atomically (tmp+rename): the record of what is being
    # GC'd lands before any delete, so a crash mid-GC can never leave a
    # deleted epoch reporting the misleading 'not committed'. A logged
    # epoch whose dir still exists stays readable (the log is only
    # consulted for epochs that are NOT committed).
    log = sorted(set(_gc_log(spark, table_path)) | set(victims))
    write_json(spark, os.path.join(table_path, _GC_LOG), log)
    jvm, _, fs = hadoop(spark, table_path)
    for ep in victims:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(table_path, f"epoch={ep}")
            ),
            True,
        )
    return victims


def rollback(spark: SparkSession, table_path: str, epoch: int) -> int:
    """Make ``epoch``'s content current again by appending it as a new
    snapshot (copy-forward). Returns the new epoch id."""
    return write_snapshot(read_table(spark, table_path, as_of=epoch), table_path)
