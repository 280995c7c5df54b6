"""Bucketed upsert table (sources/table.py bucketed section): MERGE
epochs rewrite only touched buckets, reads time-travel per-bucket,
GC keeps the last-K window bit-exact, crash redo is clean."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.table import (
    _bucketed_epochs,
    create_bucketed_table,
    gc_bucketed_table,
    read_bucketed_table,
    rollback_bucketed,
    upsert_table,
)

SCHEMA = "k bigint, v string"
NB = 8


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def tpath(tmp_path):
    return str(tmp_path / "btbl")


def _bucket_dirs(tpath, epoch):
    return sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(tpath, f"epoch={epoch}", "bucket=*"))
    )


def test_upsert_rewrites_exactly_the_touched_bucket(spark, tpath):
    base = _mk(spark, [(i, f"v{i}") for i in range(100)])
    assert create_bucketed_table(base, tpath, "k", n_buckets=NB) == 0
    assert len(_bucket_dirs(tpath, 0)) == NB

    e1 = upsert_table(_mk(spark, [(7, "CHANGED")]), tpath)
    assert e1 == 1
    # one changed key -> the epoch contains exactly ONE bucket dir
    assert len(_bucket_dirs(tpath, 1)) == 1
    got = {r.k: r.v for r in read_bucketed_table(spark, tpath).collect()}
    assert got[7] == "CHANGED" and got[6] == "v6" and len(got) == 100
    # time travel: epoch 0 still serves the original value
    got0 = {r.k: r.v for r in read_bucketed_table(spark, tpath, as_of=0).collect()}
    assert got0[7] == "v7" and len(got0) == 100


def test_upsert_insert_update_delete_merge_semantics(spark, tpath):
    create_bucketed_table(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]), tpath, "k", NB)
    upsert_table(
        _mk(spark, [(2, "B"), (4, "d")]),  # update 2, insert 4
        tpath,
        deletes=spark.createDataFrame([(3,)], "k bigint"),  # delete 3
    )
    assert _rows(read_bucketed_table(spark, tpath)) == [
        (1, "a"),
        (2, "B"),
        (4, "d"),
    ]
    # and the pre-merge epoch is intact
    assert _rows(read_bucketed_table(spark, tpath, as_of=0)) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]


def test_bucket_emptied_by_delete_does_not_resurrect(spark, tpath):
    """Deleting every row of a bucket commits an EMPTY bucket (listed in
    _buckets.json, no dir) — older content must not leak back in."""
    create_bucketed_table(_mk(spark, [(1, "a")]), tpath, "k", n_buckets=1)
    upsert_table(
        _mk(spark, []),
        tpath,
        deletes=spark.createDataFrame([(1,)], "k bigint"),
    )
    assert _rows(read_bucketed_table(spark, tpath)) == []
    assert _rows(read_bucketed_table(spark, tpath, as_of=0)) == [(1, "a")]


def test_upsert_equals_snapshot_diff_oracle(spark, sf_dir, tpath):
    """c14-style hash pin: bucketed reads at two epochs diff exactly as
    the mutation rules dictate (the versioning.snapshot_diff oracle)."""
    from kmeanwithmapreduce_spark.operators.versioning import (
        _mutate_v2,
        diff_summary,
        snapshot_diff,
    )
    from kmeanwithmapreduce_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    create_bucketed_table(d, tpath, "doc_id", n_buckets=NB)
    v2 = _mutate_v2(d)
    # express v1 -> v2 as a MERGE: upsert every v2 row, delete removed ids
    removed = d.join(v2, "doc_id", "left_anti").select("doc_id")
    upsert_table(v2, tpath, deletes=removed)

    t0 = read_bucketed_table(spark, tpath, as_of=0)
    t1 = read_bucketed_table(spark, tpath, as_of=1)
    got = {
        r.status: r.n
        for r in diff_summary(
            snapshot_diff(t0, t1, "doc_id", ["text", "lang"])
        ).collect()
    }
    want = {
        r.status: r.n
        for r in diff_summary(
            snapshot_diff(d, v2, "doc_id", ["text", "lang"])
        ).collect()
    }
    assert got == want
    # value-level: the merged current state IS v2
    assert _rows(t1) == _rows(v2)


def test_rollback_copy_forward(spark, tpath):
    create_bucketed_table(_mk(spark, [(1, "a"), (2, "b")]), tpath, "k", NB)
    upsert_table(_mk(spark, [(1, "A2")]), tpath)
    e = rollback_bucketed(spark, tpath, 0)
    assert e == 2
    assert _rows(read_bucketed_table(spark, tpath)) == [(1, "a"), (2, "b")]
    # history intact: the rolled-over epoch still reads
    assert _rows(read_bucketed_table(spark, tpath, as_of=1)) == [
        (1, "A2"),
        (2, "b"),
    ]


def test_gc_keeps_window_exact_and_refuses_below_floor(spark, tpath):
    create_bucketed_table(_mk(spark, [(i, f"v{i}") for i in range(50)]), tpath, "k", NB)
    for i in range(4):  # epochs 1..4, each touching one key
        upsert_table(_mk(spark, [(i, f"u{i}")]), tpath)
    want3 = _rows(read_bucketed_table(spark, tpath, as_of=3))
    want4 = _rows(read_bucketed_table(spark, tpath, as_of=4))

    deleted = gc_bucketed_table(spark, tpath, keep=2)  # floor = epoch 3
    assert deleted  # something below the floor was superseded
    # the kept window is bit-exact
    assert _rows(read_bucketed_table(spark, tpath, as_of=3)) == want3
    assert _rows(read_bucketed_table(spark, tpath, as_of=4)) == want4
    assert _rows(read_bucketed_table(spark, tpath)) == want4
    # sub-floor reads are refused with the real cause
    with pytest.raises(ValueError, match="floor|garbage-collected"):
        read_bucketed_table(spark, tpath, as_of=1)
    # epoch 0 is NOT wholly deletable: most buckets still resolve to it
    assert 0 in _bucketed_epochs(spark, tpath)
    # idempotent re-GC
    assert gc_bucketed_table(spark, tpath, keep=2) == []


def test_gc_deletes_fully_superseded_epoch(spark, tpath):
    create_bucketed_table(_mk(spark, [(1, "a")]), tpath, "k", n_buckets=1)
    upsert_table(_mk(spark, [(1, "b")]), tpath)
    upsert_table(_mk(spark, [(1, "c")]), tpath)
    deleted = gc_bucketed_table(spark, tpath, keep=1)  # floor = 2
    assert any(p.endswith("epoch=0") for p in deleted)
    assert any(p.endswith("epoch=1") for p in deleted)
    assert _bucketed_epochs(spark, tpath) == [2]
    assert _rows(read_bucketed_table(spark, tpath)) == [(1, "c")]


def test_crashed_epoch_is_invisible_and_redone(spark, tpath):
    """An epoch dir without _buckets.json (writer died before the commit
    marker) must be invisible to reads and cleanly overwritten."""
    create_bucketed_table(_mk(spark, [(1, "a")]), tpath, "k", NB)
    # fake a crashed epoch 1: parquet data present, no _buckets.json
    _mk(spark, [(1, "GARBAGE")]).withColumn(
        "bucket", F.lit(0)
    ).write.partitionBy("bucket").mode("overwrite").parquet(
        os.path.join(tpath, "epoch=1")
    )
    assert _bucketed_epochs(spark, tpath) == [0]
    assert _rows(read_bucketed_table(spark, tpath)) == [(1, "a")]
    e = upsert_table(_mk(spark, [(1, "b")]), tpath)  # redo takes epoch 1
    assert e == 1
    assert _rows(read_bucketed_table(spark, tpath)) == [(1, "b")]


def test_contract_violations(spark, tpath):
    create_bucketed_table(_mk(spark, [(1, "a")]), tpath, "k", NB)
    with pytest.raises(ValueError, match="already exists"):
        create_bucketed_table(_mk(spark, [(1, "a")]), tpath, "k", NB)
    with pytest.raises(ValueError, match="NULL k"):
        upsert_table(_mk(spark, [(None, "x")]), tpath)
    with pytest.raises(ValueError, match="duplicate k"):
        upsert_table(_mk(spark, [(2, "x"), (2, "y")]), tpath)
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert_table(
            spark.createDataFrame([(2, 3)], "k bigint, v bigint"), tpath
        )
    # empty change set: no-op returning the current epoch
    assert upsert_table(_mk(spark, []), tpath) == 0
    assert _bucketed_epochs(spark, tpath) == [0]


def test_upsert_deletes_contract(spark, tpath):
    """NULL delete keys are refused loudly; a key in both batch and
    deletes resolves as the batch row (documented MERGE precedence)."""
    create_bucketed_table(_mk(spark, [(1, "a"), (2, "b")]), tpath, "k", NB)
    with pytest.raises(ValueError, match="NULL k"):
        upsert_table(
            _mk(spark, []),
            tpath,
            deletes=spark.createDataFrame([(None,)], "k bigint"),
        )
    upsert_table(
        _mk(spark, [(2, "B2")]),
        tpath,
        deletes=spark.createDataFrame([(2,)], "k bigint"),
    )
    assert _rows(read_bucketed_table(spark, tpath)) == [(1, "a"), (2, "B2")]


# --------------------------------------------------------------------------
# Round 9: optimistic concurrency + crashed-create redo.


def _stage_bucketed(spark, tpath, rows, buckets):
    """Replicate _write_epoch's STAGING half (data + marker, no claim) —
    a writer frozen just before its commit step."""
    import uuid

    from kmeanwithmapreduce_spark.sources.fsutil import write_json
    from kmeanwithmapreduce_spark.sources.table import (
        _BUCKETS_FILE,
        _bucket_expr,
        _staged_dir,
    )

    tok = uuid.uuid4().hex
    staged = _staged_dir(tpath, tok)
    _mk(spark, rows).withColumn("bucket", _bucket_expr("k", NB)).write.partitionBy(
        "bucket"
    ).parquet(staged)
    write_json(spark, os.path.join(staged, _BUCKETS_FILE), {"buckets": buckets})
    return tok


def _bucket_of(spark, k):
    from kmeanwithmapreduce_spark.sources.table import _bucket_expr

    return (
        spark.range(1)
        .select(F.lit(k).cast("bigint").alias("k"))
        .select(_bucket_expr("k", NB).alias("b"))
        .first()
        .b
    )


def test_two_interleaved_upsert_writers_one_wins(spark, tpath):
    from kmeanwithmapreduce_spark.sources.table import (
        _BUCKETS_FILE,
        ConcurrentWriteError,
        _commit_staged,
    )

    create_bucketed_table(_mk(spark, [(i, f"v{i}") for i in range(20)]), tpath, "k", NB)
    # writer B: computed its merge for epoch 1 and finished staging
    tok_b = _stage_bucketed(spark, tpath, [(7, "B")], [_bucket_of(spark, 7)])
    # writer A: commits epoch 1 first
    assert upsert_table(_mk(spark, [(7, "A")]), tpath, writer="writer-A") == 1
    # writer B resumes: loses the claim, loudly, naming A
    with pytest.raises(ConcurrentWriteError, match="writer-A"):
        _commit_staged(spark, tpath, 1, tok_b, _BUCKETS_FILE, "writer-B")
    got = {r.k: r.v for r in read_bucketed_table(spark, tpath).collect()}
    assert got[7] == "A" and len(got) == 20
    # B re-runs against the merged state and lands as epoch 2
    assert upsert_table(_mk(spark, [(7, "B")]), tpath, writer="writer-B") == 2
    assert {r.v for r in read_bucketed_table(spark, tpath).where("k=7").collect()} == {"B"}


def test_upsert_writer_dead_after_claim_is_rolled_forward(spark, tpath):
    from kmeanwithmapreduce_spark.sources.table import _bucketed_epochs, _try_claim

    create_bucketed_table(_mk(spark, [(1, "a"), (2, "b")]), tpath, "k", NB)
    # dead writer: epoch 1 = full rewrite of k=1's bucket, staged +
    # claimed, died before the rename
    b1 = _bucket_of(spark, 1)
    rows = [(1, "DEAD-WRITER")] + ([(2, "b")] if _bucket_of(spark, 2) == b1 else [])
    tok = _stage_bucketed(spark, tpath, rows, [b1])
    assert _try_claim(spark, tpath, 1, {"writer": "dead", "staged": tok}) is None
    assert _bucketed_epochs(spark, tpath) == [0]
    assert {r.k: r.v for r in read_bucketed_table(spark, tpath).collect()}[1] == "a"
    # the next upsert's entry recovery completes epoch 1, then merges
    # ITS change against the recovered state as epoch 2
    assert upsert_table(_mk(spark, [(2, "B2")]), tpath) == 2
    got = {r.k: r.v for r in read_bucketed_table(spark, tpath).collect()}
    assert got == {1: "DEAD-WRITER", 2: "B2"}
    as_of1 = {r.k: r.v for r in read_bucketed_table(spark, tpath, as_of=1).collect()}
    assert as_of1 == {1: "DEAD-WRITER", 2: "b"}


def test_crashed_create_is_redone(spark, tmp_path):
    """ADVICE round 8: a create that crashed after the epoch-0 write but
    before the meta commit must be redoable — the epoch-0 leftovers
    carry a parquet _SUCCESS that the snapshot-table guard used to
    misread as a foreign snapshot table."""
    from kmeanwithmapreduce_spark.sources.fsutil import read_json

    # variant 1: died between epoch-0 commit and the meta write
    p1 = str(tmp_path / "crashed1")
    create_bucketed_table(_mk(spark, [(1, "a")]), p1, "k", NB)
    os.remove(os.path.join(p1, "_table_meta.json"))
    assert create_bucketed_table(_mk(spark, [(1, "REDO")]), p1, "k", NB) == 0
    assert _rows(read_bucketed_table(spark, p1)) == [(1, "REDO")]
    assert read_json(spark, os.path.join(p1, "_table_meta.json")) is not None

    # variant 2: died before the _buckets.json marker (bucket-shaped
    # epoch 0 with parquet _SUCCESS, no marker, no meta)
    p2 = str(tmp_path / "crashed2")
    _mk(spark, [(1, "GARBAGE")]).withColumn("bucket", F.lit(0)).write.partitionBy(
        "bucket"
    ).parquet(os.path.join(p2, "epoch=0"))
    assert create_bucketed_table(_mk(spark, [(1, "REDO2")]), p2, "k", NB) == 0
    assert _rows(read_bucketed_table(spark, p2)) == [(1, "REDO2")]

    # foreign layouts stay protected: a real snapshot table is refused
    p3 = str(tmp_path / "snap")
    from kmeanwithmapreduce_spark.sources.table import write_snapshot

    write_snapshot(spark.range(3), p3)
    with pytest.raises(ValueError, match="snapshot-table epochs"):
        create_bucketed_table(_mk(spark, [(1, "x")]), p3, "k", NB)


def test_bucketed_gc_then_upsert_proceeds(spark, tpath):
    """Fully-superseded epochs lose their claim markers at GC, and a
    later upsert must plan/commit cleanly over the pruned history."""
    create_bucketed_table(_mk(spark, [(1, "a")]), tpath, "k", n_buckets=1)
    upsert_table(_mk(spark, [(1, "b")]), tpath)
    upsert_table(_mk(spark, [(1, "c")]), tpath)
    gc_bucketed_table(spark, tpath, keep=1)
    assert _bucketed_epochs(spark, tpath) == [2]
    assert upsert_table(_mk(spark, [(1, "d")]), tpath) == 3
    assert _rows(read_bucketed_table(spark, tpath)) == [(1, "d")]
