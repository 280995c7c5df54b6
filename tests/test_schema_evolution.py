"""Additive schema evolution on the versioned tables (sources/table.py,
round 12): add-nullable-column on bucketed upsert tables and snapshot
tables, NULL backfill at read via explicit-schema parquet projection,
schema history in the meta, time travel across the boundary, and the
composition with MERGE / rebucket / rollback / GC / data skipping."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.table import (
    _schema_at,
    _table_meta,
    create_bucketed_table,
    gc_bucketed_table,
    read_bucketed_table,
    read_table,
    rebucket_table,
    rollback_bucketed,
    table_schema_history,
    upsert_table,
    write_snapshot,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("fr").alias("lang"),
    )


def _batch_with_quality(spark, docs):
    return docs.where(F.col("doc_id") % 7 == 0).withColumn(
        "quality", (F.col("doc_id") % 100) / F.lit(10.0)
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_bucketed_additive_upsert_and_time_travel(spark, tmp_path):
    tp = str(tmp_path / "tbl")
    d = _docs(spark)
    e0 = create_bucketed_table(d, tp, "doc_id", n_buckets=8)
    batch = _batch_with_quality(spark, d)
    # refused without the flag, and the error teaches the flag
    with pytest.raises(ValueError, match="allow_add_columns"):
        upsert_table(batch, tp)
    e1 = upsert_table(batch, tp, allow_add_columns=True)
    # e0 time travel: the OLD schema — added columns never leak back
    t0 = read_bucketed_table(spark, tp, as_of=e0)
    assert t0.columns == ["doc_id", "text", "lang"]
    assert _rows(t0) == _rows(d)
    # e1: evolved schema; batch rows carry values, everything else NULL
    t1 = read_bucketed_table(spark, tp, as_of=e1)
    assert t1.columns == ["doc_id", "text", "lang", "quality"]
    assert t1.count() == d.count()
    got = {r.doc_id: r.quality for r in t1.collect()}
    for doc_id, q in got.items():
        if doc_id % 7 == 0:
            assert q == (doc_id % 100) / 10.0
        else:
            assert q is None
    # meta records the evolution at exactly e1
    meta = _table_meta(spark, tp)
    assert [tuple(c) for c in meta["columns"]] == [
        ("doc_id", "bigint"), ("text", "string"),
        ("lang", "string"), ("quality", "double"),
    ]
    assert _schema_at(meta, e0) == [
        ("doc_id", "bigint"), ("text", "string"), ("lang", "string")
    ]
    assert len(meta["schema_history"]) == 2
    assert meta["schema_history"][1]["epoch"] == e1


def test_bucketed_refuses_non_additive_changes(spark, tmp_path):
    tp = str(tmp_path / "tbl")
    d = _docs(spark, 50)
    create_bucketed_table(d, tp, "doc_id", n_buckets=4)
    head = d.limit(5)
    bad = [
        head.withColumn("text", F.lit(1)),              # type change
        head.drop("lang"),                              # drop
        head.withColumnRenamed("lang", "language"),     # rename
        head.select("doc_id", "lang", "text"),          # reorder
        head.withColumn("lang2", F.col("lang")).drop("lang"),  # swap
    ]
    for b in bad:
        with pytest.raises(ValueError, match="schema mismatch"):
            upsert_table(b, tp, allow_add_columns=True)
    # adding a column that shadows an existing name refuses too
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert_table(
            head.select("doc_id", "text", "lang", F.lit(1).alias("text")),
            tp,
            allow_add_columns=True,
        )


def test_post_evolution_merge_rebucket_rollback_gc_compose(spark, tmp_path):
    tp = str(tmp_path / "tbl")
    d = _docs(spark)
    e0 = create_bucketed_table(d, tp, "doc_id", n_buckets=4)
    e1 = upsert_table(
        _batch_with_quality(spark, d), tp, allow_add_columns=True
    )
    # an OLD-shape batch is refused after the boundary (one-way)
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert_table(d.limit(3), tp)
    # a NEW-shape MERGE composes (update one, delete one)
    upd = spark.createDataFrame(
        [(3, "patched", "en", 9.9)], "doc_id bigint, text string, lang string, quality double"
    )
    dele = spark.createDataFrame([(4,)], "doc_id bigint")
    e2 = upsert_table(upd, tp, deletes=dele)
    t2 = read_bucketed_table(spark, tp, as_of=e2)
    assert t2.where("doc_id = 3").collect()[0].quality == 9.9
    assert t2.where("doc_id = 4").count() == 0
    # rebucket across the boundary: content identical, both eras read
    e3 = rebucket_table(spark, tp, 16)
    assert _rows(read_bucketed_table(spark, tp, as_of=e3)) == _rows(t2)
    assert read_bucketed_table(spark, tp, as_of=e0).columns == [
        "doc_id", "text", "lang"
    ]
    # rollback to the PRE-evolution epoch: data reverts, schema stays
    # evolved (Delta-RESTORE semantics) with the added column all NULL
    rollback_bucketed(spark, tp, e0)
    cur = read_bucketed_table(spark, tp)
    assert cur.columns == ["doc_id", "text", "lang", "quality"]
    assert cur.where(F.col("quality").isNotNull()).count() == 0
    assert _rows(cur.select("doc_id", "text", "lang")) == _rows(d)
    # GC keeps the window readable and refuses below the floor
    gc_bucketed_table(spark, tp, keep=2)
    assert read_bucketed_table(spark, tp).count() == d.count()
    with pytest.raises(ValueError, match="garbage-collected|floor"):
        read_bucketed_table(spark, tp, as_of=e0)


def test_scan_bucketed_skipping_composes_across_boundary(spark, tmp_path):
    from kmeanwithmapreduce_spark.sources.stats import scan_bucketed_table

    tp = str(tmp_path / "tbl")
    d = _docs(spark, 400)
    create_bucketed_table(d, tp, "doc_id", n_buckets=4, stats_columns=["doc_id"])
    e1 = upsert_table(
        _batch_with_quality(spark, d), tp, allow_add_columns=True
    )
    # predicate on a PRE-evolution stats column: pruning + residual
    got, report = scan_bucketed_table(spark, tp, "doc_id", 10, 50)
    want = read_bucketed_table(spark, tp).where(
        F.col("doc_id").between(10, 50)
    )
    assert _rows(got) == _rows(want) and want.count() == 41
    assert got.columns == ["doc_id", "text", "lang", "quality"]
    # predicate on the ADDED column: no sidecar stats anywhere (frozen
    # at create) -> nothing prunes, the residual filter still applies
    got2, rep2 = scan_bucketed_table(
        spark, tp, predicates={"quality": (5.0, None)}
    )
    want2 = read_bucketed_table(spark, tp).where(F.col("quality") >= 5.0)
    assert _rows(got2) == _rows(want2) and want2.count() > 0
    assert rep2["files_scanned"] == rep2["files_total"]
    # time-travel scan before the boundary: old schema
    got3, _ = scan_bucketed_table(spark, tp, "doc_id", 10, 50, as_of=0)
    assert got3.columns == ["doc_id", "text", "lang"]


def test_crash_window_meta_before_epoch(spark, tmp_path):
    """The documented order: meta (with the history entry for the
    INTENDED epoch) lands before the epoch commits. A writer dying in
    between must leave the table fully readable — the entry is simply
    dormant until some epoch >= it commits — and the data re-run
    lands it."""
    import kmeanwithmapreduce_spark.sources.table as tbl

    tp = str(tmp_path / "tbl")
    d = _docs(spark, 60)
    create_bucketed_table(d, tp, "doc_id", n_buckets=4)
    batch = _batch_with_quality(spark, d)

    real = tbl._write_epoch
    calls = {"n": 0}

    def dying(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("simulated writer death after meta write")

    tbl._write_epoch = dying
    try:
        with pytest.raises(RuntimeError, match="simulated"):
            upsert_table(batch, tp, allow_add_columns=True)
    finally:
        tbl._write_epoch = real
    assert calls["n"] == 1
    # meta evolved, epoch never landed: reads at the head still serve
    # the OLD columns (the history entry's epoch is uncommitted)
    cur = read_bucketed_table(spark, tp)
    assert cur.columns == ["doc_id", "text", "lang"]
    assert cur.count() == 60
    # round-12 ADVICE: an old-shape upsert in this window must NAME the
    # pending evolution (the bare mismatch error hid the recovery path)
    old_shape = d.where(F.col("doc_id") % 5 == 0)
    with pytest.raises(ValueError, match="recorded for epoch.*never"):
        upsert_table(old_shape, tp)
    # the re-run completes the evolution with the data in place
    e1 = upsert_table(batch, tp, allow_add_columns=True)
    t1 = read_bucketed_table(spark, tp, as_of=e1)
    assert t1.where(F.col("quality").isNotNull()).count() == batch.count()
    # exactly one LIVE history entry per boundary epoch remains
    meta = _table_meta(spark, tp)
    live = [h for h in meta["schema_history"] if h["epoch"] <= e1]
    assert [tuple(c) for c in live[-1]["columns"]][-1] == (
        "quality", "double",
    )


def test_snapshot_additive_and_unified_read(spark, tmp_path):
    tp = str(tmp_path / "tbl")
    d = _docs(spark, 80)
    e0 = write_snapshot(d, tp)
    d2 = d.withColumn("quality", (F.col("doc_id") % 10) / F.lit(2.0))
    # additive needs its flag; unrelated drift still needs the blunt one
    with pytest.raises(ValueError, match="allow_add_columns"):
        write_snapshot(d2, tp)
    with pytest.raises(ValueError, match="schema drift"):
        write_snapshot(d2.drop("lang"), tp, allow_add_columns=True)
    e1 = write_snapshot(d2, tp, allow_add_columns=True)
    # committed truth per epoch (default)
    assert read_table(spark, tp, as_of=e0).columns == [
        "doc_id", "text", "lang"
    ]
    # unified: the old epoch NULL-fills the added column and unions
    u0 = read_table(spark, tp, as_of=e0, unified=True)
    assert u0.columns == ["doc_id", "text", "lang", "quality"]
    assert u0.where(F.col("quality").isNotNull()).count() == 0
    both = u0.unionByName(read_table(spark, tp, as_of=e1, unified=True))
    assert both.count() == 160
    hist = table_schema_history(spark, tp)
    assert len(hist) == 1 and hist[0]["epoch"] == e1
