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
