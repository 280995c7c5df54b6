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


# --------------------------------------------------------------------------
# Bucketed (MERGE/upsert) variant: the full-copy snapshot model above is
# right for dimension/release tables; FACT tables need per-epoch deltas.
# This applies the streaming marts' hash-bucket rewrite discipline
# (streaming/marts.py:84) to the versioned-table layer: rows live in
# n_buckets hash buckets of the key; an upsert epoch rewrites ONLY the
# buckets containing changed keys, and a read at any epoch resolves each
# bucket to its newest rewrite at-or-before that epoch. One changed row
# costs one bucket rewrite (~1/n_buckets of the table), not a snapshot.
#
# Layout:  <path>/_table_meta.json            key, n_buckets, columns
#          <path>/epoch=N/bucket=B/*.parquet  the buckets N rewrote
#          <path>/epoch=N/_buckets.json       N's rewritten-bucket list —
#                                             the atomic COMMIT marker
#                                             (written last; an epoch
#                                             without it is invisible
#                                             and gets redone in place)
#          <path>/_gc_log.json                {"floor": E, "removed": []}
#
# A listed bucket with no dir is a committed EMPTY bucket (partitionBy
# writes no dir for zero rows — e.g. every row of the bucket deleted);
# resolution must treat it as empty, not fall through to older content.

_META_FILE = "_table_meta.json"
_BUCKETS_FILE = "_buckets.json"


def _bucket_expr(key: str, n_buckets: int):
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")


def _table_meta(spark: SparkSession, table_path: str) -> dict:
    meta = read_json(spark, os.path.join(table_path, _META_FILE))
    if meta is None or meta.get("format") != "bucketed":
        raise ValueError(
            f"{table_path} is not a bucketed table (no {_META_FILE}); "
            "create it with create_bucketed_table"
        )
    return meta


def _bucketed_epochs(spark: SparkSession, table_path: str) -> list[int]:
    """Committed epochs of a BUCKETED table, ascending: an epoch is
    committed iff its _buckets.json landed (it is written after the
    parquet data, atomically — the tmp+rename in fsutil)."""
    jvm, jpath, fs = hadoop(spark, table_path)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("epoch=") and fs.exists(
            jvm.org.apache.hadoop.fs.Path(st.getPath(), _BUCKETS_FILE)
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _epoch_listing(spark: SparkSession, table_path: str, epoch: int) -> list[int]:
    return read_json(
        spark,
        os.path.join(table_path, f"epoch={epoch}", _BUCKETS_FILE),
    )["buckets"]


def _resolve_buckets(
    spark: SparkSession, table_path: str, epochs: list[int]
) -> dict[int, tuple[int, str | None]]:
    """bucket -> (epoch of its newest rewrite among ``epochs``, dir path
    or None when that rewrite was empty). Newest-first walk over the
    per-epoch listings — driver-side metadata only."""
    resolved: dict[int, tuple[int, str | None]] = {}
    for ep in reversed(epochs):
        ep_dir = os.path.join(table_path, f"epoch={ep}")
        jvm, _, fs = hadoop(spark, ep_dir)
        for b in _epoch_listing(spark, table_path, ep):
            if b in resolved:
                continue
            bdir = os.path.join(ep_dir, f"bucket={b}")
            has_dir = fs.exists(jvm.org.apache.hadoop.fs.Path(bdir))
            resolved[b] = (ep, bdir if has_dir else None)
    return resolved


def _bucketed_gc_log(spark: SparkSession, table_path: str) -> dict:
    return read_json(spark, os.path.join(table_path, _GC_LOG)) or {
        "floor": None,
        "removed": [],
    }


def _write_epoch(
    df: DataFrame,
    table_path: str,
    epoch: int,
    meta: dict,
    buckets: list[int],
) -> int:
    """Write one epoch's bucket dirs + the _buckets.json commit marker."""
    spark = df.sparkSession
    ep_dir = os.path.join(table_path, f"epoch={epoch}")
    df.withColumn("bucket", _bucket_expr(meta["key"], meta["n_buckets"])).repartition(
        max(1, min(len(buckets), spark.sparkContext.defaultParallelism)),
        "bucket",
    ).write.partitionBy("bucket").mode("overwrite").parquet(ep_dir)
    write_json(
        spark, os.path.join(ep_dir, _BUCKETS_FILE), {"buckets": sorted(buckets)}
    )
    return epoch


def create_bucketed_table(
    df: DataFrame, table_path: str, key: str, n_buckets: int = 64
) -> int:
    """Create a bucketed upsert table from an initial snapshot; returns
    epoch 0. ``key`` must be unique per row (the MERGE identity); the
    initial epoch lists every bucket so reads always resolve."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    spark = df.sparkSession
    if read_json(spark, os.path.join(table_path, _META_FILE)) is not None:
        raise ValueError(f"bucketed table already exists at {table_path}")
    if _committed_epochs(spark, table_path):
        raise ValueError(
            f"{table_path} already holds snapshot-table epochs; refusing "
            "to create a bucketed table over them"
        )
    if _bucketed_epochs(spark, table_path) != [] and _bucketed_epochs(
        spark, table_path
    ) != [0]:
        # meta is the create commit: epoch-0-only leftovers are a crashed
        # create (redo overwrites them); anything more is a foreign table
        raise ValueError(
            f"{table_path} holds bucketed epochs but no {_META_FILE}; "
            "refusing to create over an unknown layout"
        )
    _check_keys(df, key)
    meta = {
        "format": "bucketed",
        "key": key,
        "n_buckets": int(n_buckets),
        "columns": _shape(df.schema),
    }
    _write_epoch(df, table_path, 0, meta, list(range(n_buckets)))
    # meta lands AFTER epoch 0: a crash in between leaves no meta, so the
    # table reads as nonexistent and create is cleanly re-runnable
    write_json(spark, os.path.join(table_path, _META_FILE), meta)
    return 0


def _check_keys(df: DataFrame, key: str) -> None:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(key).alias("n_keys"),
        F.sum(F.col(key).isNull().cast("int")).alias("n_null"),
    ).first()
    if row.n and row.n_null:
        raise ValueError(f"{row.n_null} row(s) with NULL {key} — the MERGE key")
    if row.n and row.n_keys != row.n:
        raise ValueError(
            f"duplicate {key} values ({row.n} rows, {row.n_keys} distinct) — "
            "upsert identity must be unique"
        )


def upsert_table(
    batch: DataFrame, table_path: str, deletes: DataFrame | None = None
) -> int:
    """MERGE ``batch`` into the bucketed table: rows whose key exists are
    replaced, new keys are inserted, and keys in ``deletes`` (a frame
    with the key column) are removed. A key appearing in BOTH loses the
    delete — the batch row wins (upsert precedence, the SQL MERGE
    WHEN-MATCHED-THEN-UPDATE ordering); pass disjoint sets if a delete
    must be unconditional. Writes a new epoch containing ONLY the
    buckets holding changed keys — each rewritten in full (prior bucket
    content minus changed keys, plus the batch rows). Returns the new
    epoch id; an empty change set is a no-op returning the current
    epoch. Schema must match the table exactly (a partial-bucket epoch
    mixing schemas would corrupt union reads — evolve by rebuilding)."""
    spark = batch.sparkSession
    meta = _table_meta(spark, table_path)
    key, n_buckets = meta["key"], meta["n_buckets"]
    if _shape(batch.schema) != [tuple(c) for c in meta["columns"]]:
        raise ValueError(
            f"upsert_table: schema mismatch at {table_path}: table has "
            f"{meta['columns']}, batch has {_shape(batch.schema)}"
        )
    done = _bucketed_epochs(spark, table_path)
    if not done:
        raise ValueError(f"no committed epochs at {table_path}")
    _check_keys(batch, key)

    from pyspark.sql import functions as F

    batch = batch.persist()
    try:
        changed = batch.select(key)
        if deletes is not None:
            n_null = deletes.where(F.col(key).isNull()).count()
            if n_null:
                raise ValueError(
                    f"{n_null} delete row(s) with NULL {key} — a NULL key "
                    "identifies no row (and would produce a NULL bucket)"
                )
            changed = changed.union(deletes.select(key)).distinct()
        bucket = _bucket_expr(key, n_buckets)
        touched = sorted(
            r[0]
            for r in changed.select(bucket.alias("b")).distinct().collect()
        )
        if not touched:
            return done[-1]
        resolved = _resolve_buckets(spark, table_path, done)
        prior_paths = [
            resolved[b][1]
            for b in touched
            if b in resolved and resolved[b][1] is not None
        ]
        schema = ", ".join(f"`{n}` {t}" for n, t in meta["columns"])
        prior = (
            spark.read.schema(schema).parquet(*prior_paths)
            if prior_paths
            else spark.createDataFrame([], schema)
        )
        merged = prior.join(
            changed.hint("broadcast"), key, "left_anti"
        ).unionByName(batch)
        return _write_epoch(merged, table_path, done[-1] + 1, meta, touched)
    finally:
        batch.unpersist()


def read_bucketed_table(
    spark: SparkSession, table_path: str, as_of: int | None = None
) -> DataFrame:
    """The bucketed table at ``as_of`` (default: latest committed epoch):
    each bucket resolves to its newest rewrite at-or-before ``as_of``.
    Reads below the GC floor are refused with the real cause."""
    meta = _table_meta(spark, table_path)
    done = _bucketed_epochs(spark, table_path)
    if not done:
        raise FileNotFoundError(f"no committed epochs at {table_path}")
    floor = _bucketed_gc_log(spark, table_path)["floor"]
    if as_of is None:
        as_of = done[-1]
    elif as_of not in done:
        if floor is not None and as_of < floor:
            raise ValueError(
                f"epoch {as_of} at {table_path} was garbage-collected "
                f"(gc_bucketed_table floor is {floor}); committed epochs: {done}"
            )
        raise ValueError(
            f"epoch {as_of} is not committed at {table_path} (committed: {done})"
        )
    if floor is not None and as_of < floor:
        raise ValueError(
            f"epoch {as_of} at {table_path} predates the GC floor {floor} "
            "(gc_bucketed_table removed content its reads depended on)"
        )
    resolved = _resolve_buckets(spark, table_path, [e for e in done if e <= as_of])
    paths = sorted(p for _, p in resolved.values() if p is not None)
    schema = ", ".join(f"`{n}` {t}" for n, t in meta["columns"])
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def rollback_bucketed(spark: SparkSession, table_path: str, epoch: int) -> int:
    """Copy-forward rollback for the bucketed table: append a FULL epoch
    (every bucket listed) whose content is the table at ``epoch`` —
    history stays intact, exactly like the snapshot table's rollback."""
    meta = _table_meta(spark, table_path)
    done = _bucketed_epochs(spark, table_path)
    content = read_bucketed_table(spark, table_path, as_of=epoch)
    return _write_epoch(
        content, table_path, done[-1] + 1, meta, list(range(meta["n_buckets"]))
    )


def gc_bucketed_table(
    spark: SparkSession, table_path: str, keep: int
) -> list[str]:
    """Bound history: keep the last ``keep`` epochs fully time-travelable
    and delete bucket dirs below that window that are superseded for the
    window's OLDEST epoch (the floor). Reads at epochs >= floor stay
    bit-exact — their newest-first resolution finds a surviving rewrite
    before it could descend to anything deleted; reads below the floor
    are refused (the floor is recorded log-ahead in ``_gc_log.json``).
    An old epoch dir is removed entirely only when no bucket of the
    floor view resolves to it. Returns the deleted paths."""
    if keep < 1:
        raise ValueError("gc_bucketed_table: keep must be >= 1")
    _table_meta(spark, table_path)
    done = _bucketed_epochs(spark, table_path)
    if len(done) <= keep:
        return []
    floor = done[-keep]
    log = _bucketed_gc_log(spark, table_path)
    # LOG-AHEAD: the floor moves before any delete, so a crash mid-GC
    # can never leave a sub-floor read serving silently partial content
    log["floor"] = floor if log["floor"] is None else max(log["floor"], floor)
    write_json(spark, os.path.join(table_path, _GC_LOG), log)

    needed = _resolve_buckets(
        spark, table_path, [e for e in done if e <= floor]
    )
    needed_by_epoch: dict[int, set[int]] = {}
    for b, (ep, _path) in needed.items():
        needed_by_epoch.setdefault(ep, set()).add(b)
    deleted: list[str] = []
    jvm, _, fs = hadoop(spark, table_path)
    for ep in done:
        if ep >= floor:
            continue
        keep_buckets = needed_by_epoch.get(ep, set())
        ep_dir = os.path.join(table_path, f"epoch={ep}")
        if not keep_buckets:
            fs.delete(jvm.org.apache.hadoop.fs.Path(ep_dir), True)
            deleted.append(ep_dir)
            continue
        for b in _epoch_listing(spark, table_path, ep):
            if b in keep_buckets:
                continue
            bdir = os.path.join(ep_dir, f"bucket={b}")
            jb = jvm.org.apache.hadoop.fs.Path(bdir)
            if fs.exists(jb):
                fs.delete(jb, True)
                deleted.append(bdir)
    if deleted:
        log["removed"] = sorted(set(log.get("removed", [])) | set(deleted))
        write_json(spark, os.path.join(table_path, _GC_LOG), log)
    return deleted
