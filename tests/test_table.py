"""Versioned table layer (sources/table.py): time-travel reads,
_SUCCESS-commit crash semantics, copy-forward rollback."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.table import (
    read_table,
    rollback,
    table_epochs,
    write_snapshot,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def tpath(tmp_path):
    return str(tmp_path / "tbl")


def test_time_travel_reads(spark, tpath):
    v0 = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    v1 = spark.range(12).select(F.col("id"), (F.col("id") * 3).alias("v"))
    assert write_snapshot(v0, tpath) == 0
    assert write_snapshot(v1, tpath) == 1
    assert table_epochs(spark, tpath) == [0, 1]
    assert _rows(read_table(spark, tpath, as_of=0)) == _rows(v0)
    assert _rows(read_table(spark, tpath, as_of=1)) == _rows(v1)
    assert _rows(read_table(spark, tpath)) == _rows(v1)  # latest


def test_read_raises_on_missing_or_uncommitted(spark, tpath):
    with pytest.raises(FileNotFoundError):
        read_table(spark, tpath)
    write_snapshot(spark.range(3), tpath)
    with pytest.raises(ValueError):
        read_table(spark, tpath, as_of=7)


def test_crashed_write_is_redone_not_committed(spark, tpath):
    """A writer that died mid-write leaves epoch=N without _SUCCESS:
    readers must not see it, and the NEXT writer must claim the same
    epoch number and overwrite it cleanly (the replay discipline)."""
    write_snapshot(spark.range(5), tpath)  # epoch 0 committed
    # simulate the crash: full write, then remove the commit marker
    crashed = os.path.join(tpath, "epoch=1")
    spark.range(99).write.mode("overwrite").parquet(crashed)
    os.remove(os.path.join(crashed, "_SUCCESS"))
    assert table_epochs(spark, tpath) == [0]
    assert read_table(spark, tpath).count() == 5  # crashed epoch invisible
    e = write_snapshot(spark.range(7), tpath)
    assert e == 1  # same epoch reclaimed
    assert read_table(spark, tpath, as_of=1).count() == 7


def test_rollback_copy_forward_preserves_history(spark, tpath):
    v0 = spark.range(4)
    v1 = spark.range(9)
    write_snapshot(v0, tpath)
    write_snapshot(v1, tpath)
    e = rollback(spark, tpath, 0)
    assert e == 2
    assert table_epochs(spark, tpath) == [0, 1, 2]
    assert _rows(read_table(spark, tpath)) == _rows(v0)  # current is v0 again
    assert _rows(read_table(spark, tpath, as_of=1)) == _rows(v1)  # history intact


def test_rollback_of_unknown_epoch_raises(spark, tpath):
    write_snapshot(spark.range(2), tpath)
    with pytest.raises(ValueError):
        rollback(spark, tpath, 5)


# --------------------------------------------------------------------------
# Lifecycle (round 7): keep-last-K GC + schema-drift refusal


def test_gc_keeps_last_k_and_explains_gcd_reads(spark, tpath):
    from kmeanwithmapreduce_spark.sources.table import gc_table

    for n in (3, 5, 7, 9):
        write_snapshot(spark.range(n), tpath)
    assert gc_table(spark, tpath, keep=2) == [0, 1]
    assert table_epochs(spark, tpath) == [2, 3]
    assert read_table(spark, tpath).count() == 9
    assert read_table(spark, tpath, as_of=2).count() == 7
    with pytest.raises(ValueError, match="garbage-collected"):
        read_table(spark, tpath, as_of=0)
    # an epoch that never existed still gets the plain message
    with pytest.raises(ValueError, match="not committed"):
        read_table(spark, tpath, as_of=42)
    # numbering continues past GC'd history; repeat GC is a no-op at K=2
    assert write_snapshot(spark.range(11), tpath) == 4
    assert gc_table(spark, tpath, keep=3) == []
    assert gc_table(spark, tpath, keep=2) == [2]
    with pytest.raises(ValueError, match="garbage-collected"):
        read_table(spark, tpath, as_of=2)
    with pytest.raises(ValueError):
        gc_table(spark, tpath, keep=0)


def test_gc_never_touches_uncommitted_writer(spark, tpath):
    """An in-flight (no _SUCCESS) epoch dir must survive GC — it may be
    a live writer about to commit."""
    from kmeanwithmapreduce_spark.sources.table import gc_table

    write_snapshot(spark.range(1), tpath)
    write_snapshot(spark.range(2), tpath)
    crashed = os.path.join(tpath, "epoch=2")
    spark.range(99).write.mode("overwrite").parquet(crashed)
    os.remove(os.path.join(crashed, "_SUCCESS"))
    assert gc_table(spark, tpath, keep=1) == [0]
    assert os.path.isdir(crashed)  # untouched
    assert table_epochs(spark, tpath) == [1]


def test_write_snapshot_refuses_silent_schema_drift(spark, tpath):
    write_snapshot(
        spark.range(5).select("id", (F.col("id") * 2).alias("v")), tpath
    )
    # dropped column
    with pytest.raises(ValueError, match="schema drift"):
        write_snapshot(spark.range(5).select("id"), tpath)
    # same names, changed type
    with pytest.raises(ValueError, match="schema drift"):
        write_snapshot(
            spark.range(5).select(
                "id", (F.col("id") * 2).cast("string").alias("v")
            ),
            tpath,
        )
    # explicit evolution is allowed and becomes the new reference shape
    e = write_snapshot(
        spark.range(3).select("id"), tpath, allow_schema_change=True
    )
    assert e == 1
    assert read_table(spark, tpath).columns == ["id"]
    # the old epoch keeps its own schema (time-travel returns what was
    # committed)
    assert read_table(spark, tpath, as_of=0).columns == ["id", "v"]
    # and the new shape is now enforced
    with pytest.raises(ValueError, match="schema drift"):
        write_snapshot(
            spark.range(2).select("id", F.lit(1).alias("w")), tpath
        )


def test_read_json_recovers_from_tmp_in_torn_rename_window(spark, tmp_path):
    """write_json's rename is delete-then-rename (Hadoop FS rename does
    not overwrite); a crash in that window leaves only <path>.tmp. A
    reader must recover the .tmp content — for _gc_log.json, losing it
    would make GC'd epochs misreport 'not committed'."""
    import json

    from kmeanwithmapreduce_spark.sources.fsutil import read_json, write_json

    p = str(tmp_path / "meta.json")
    write_json(spark, p, {"epochs": [0, 1]})
    assert read_json(spark, p) == {"epochs": [0, 1]}

    # simulate the crash window: a NEWER complete .tmp, destination gone
    with open(p + ".tmp", "w") as f:
        json.dump({"epochs": [0, 1, 2]}, f)
    os.remove(p)
    assert read_json(spark, p) == {"epochs": [0, 1, 2]}

    # destination present again -> it wins (tmp is only a fallback)
    write_json(spark, p, {"epochs": [0]})
    assert read_json(spark, p) == {"epochs": [0]}

    # neither file -> absent
    os.remove(p)
    assert read_json(spark, p) is None


# --------------------------------------------------------------------------
# Optimistic concurrency (round 9): stage -> claim -> rename. Exactly one
# of two racing writers commits an epoch; the loser raises naming the
# winner; a writer dead between claim and rename is rolled forward.


def test_two_interleaved_snapshot_writers_one_wins(spark, tpath):
    import uuid

    from kmeanwithmapreduce_spark.sources.table import (
        ConcurrentWriteError,
        _commit_staged,
        _staged_dir,
    )

    write_snapshot(spark.range(3), tpath)  # epoch 0
    # writer B: reads the table (next epoch = 1) and finishes STAGING
    tok_b = uuid.uuid4().hex
    spark.range(30).write.parquet(_staged_dir(tpath, tok_b))
    # writer A: full commit of epoch 1 lands first
    assert write_snapshot(spark.range(10), tpath, writer="writer-A") == 1
    # writer B resumes: its claim of epoch 1 must LOSE, loudly, naming A
    with pytest.raises(ConcurrentWriteError, match="writer-A"):
        _commit_staged(spark, tpath, 1, tok_b, "_SUCCESS", "writer-B")
    # nothing of B is visible; epoch 1 is A's
    assert table_epochs(spark, tpath) == [0, 1]
    assert read_table(spark, tpath).count() == 10
    # B re-runs against the updated table and lands as epoch 2
    assert write_snapshot(spark.range(30), tpath, writer="writer-B") == 2
    assert read_table(spark, tpath).count() == 30


def test_snapshot_writer_dead_after_claim_is_rolled_forward(spark, tpath):
    import uuid

    from kmeanwithmapreduce_spark.sources.table import _staged_dir, _try_claim

    write_snapshot(spark.range(3), tpath)  # epoch 0
    # dead writer: staged epoch 1 COMPLETELY, claimed it, died pre-rename
    tok = uuid.uuid4().hex
    spark.range(77).write.parquet(_staged_dir(tpath, tok))
    assert _try_claim(spark, tpath, 1, {"writer": "dead", "staged": tok}) is None
    # the dead commit is invisible to readers until a writer recovers it
    assert table_epochs(spark, tpath) == [0]
    assert read_table(spark, tpath).count() == 3
    # the next writer's entry recovery completes the dead writer's
    # epoch 1 deterministically, then commits its own snapshot as 2
    assert write_snapshot(spark.range(5), tpath) == 2
    assert read_table(spark, tpath, as_of=1).count() == 77
    assert read_table(spark, tpath).count() == 5


def test_claim_survives_for_committed_epoch_blocks_reclaim(spark, tpath):
    """Claims are kept after commit: a straggler that lost the race can
    never re-claim the epoch after the winner finished (the delete-claim
    -after-commit variant reopens exactly the lost-update race)."""
    from kmeanwithmapreduce_spark.sources.table import (
        ConcurrentWriteError,
        _claim_file,
        _try_claim,
    )

    write_snapshot(spark.range(3), tpath, writer="writer-A")
    assert os.path.exists(_claim_file(tpath, 0))
    got = _try_claim(spark, tpath, 0, {"writer": "straggler", "staged": "x"})
    assert got is not None and got["writer"] == "writer-A"
    # and the public path raises rather than touching epoch 0
    import uuid

    from kmeanwithmapreduce_spark.sources.table import _commit_staged, _staged_dir

    tok = uuid.uuid4().hex
    spark.range(9).write.parquet(_staged_dir(tpath, tok))
    with pytest.raises(ConcurrentWriteError, match="writer-A"):
        _commit_staged(spark, tpath, 0, tok, "_SUCCESS", "straggler")
    assert read_table(spark, tpath, as_of=0).count() == 3


def test_gc_tidies_claims_and_never_wedges_later_writes(spark, tpath):
    """Claims persist per epoch; GC deletes the victims' claims, and —
    the important half — a claim whose epoch was GC'd (or whose staged
    dir is gone) is SKIPPED by recovery, never treated as a dead commit
    to roll forward. A post-GC write must proceed normally."""
    from kmeanwithmapreduce_spark.sources.table import _claim_file, gc_table

    for n in (3, 5, 7, 9):
        write_snapshot(spark.range(n), tpath)
    assert gc_table(spark, tpath, keep=2) == [0, 1]
    assert not os.path.exists(_claim_file(tpath, 0))
    assert not os.path.exists(_claim_file(tpath, 1))
    # and even a STALE leftover claim below the watermark cannot wedge:
    # fabricate one (as if GC died between epoch delete and claim tidy)
    import json

    os.makedirs(os.path.dirname(_claim_file(tpath, 1)), exist_ok=True)
    with open(_claim_file(tpath, 1), "w") as fh:
        json.dump({"writer": "ghost", "staged": "gone"}, fh)
    assert write_snapshot(spark.range(11), tpath) == 4
    assert read_table(spark, tpath).count() == 11


def test_torn_head_claim_is_unwedged(spark, tpath):
    """A torn legacy claim (created, never written) at the HEAD epoch
    must not wedge the table forever: recovery removes it and the next
    write claims the epoch fresh. (The claim write itself is now
    put-if-absent via tmp+rename, so new torn claims cannot occur.)"""
    from kmeanwithmapreduce_spark.sources.table import _claim_file

    write_snapshot(spark.range(3), tpath)  # epoch 0
    torn = _claim_file(tpath, 1)
    os.makedirs(os.path.dirname(torn), exist_ok=True)
    open(torn, "w").close()  # zero bytes: unreadable
    assert write_snapshot(spark.range(9), tpath) == 1
    assert read_table(spark, tpath, as_of=1).count() == 9


def test_put_if_absent_json_is_exclusive(spark, tmp_path):
    from kmeanwithmapreduce_spark.sources.fsutil import read_json
    from kmeanwithmapreduce_spark.sources.table import _put_if_absent_json

    p = str(tmp_path / "claim.json")
    assert _put_if_absent_json(spark, p, {"writer": "A"}) is True
    assert _put_if_absent_json(spark, p, {"writer": "B"}) is False
    assert read_json(spark, p) == {"writer": "A"}  # loser changed nothing


def test_gc_reclaims_orphan_staging_but_not_recovery_material(spark, tpath):
    import uuid

    from kmeanwithmapreduce_spark.sources.table import (
        _staged_dir,
        _try_claim,
        gc_table,
    )

    for n in (3, 5):
        write_snapshot(spark.range(n), tpath)
    # orphan: staged by a loser/crashed-pre-claim writer, unreferenced
    orphan = uuid.uuid4().hex
    spark.range(7).write.parquet(_staged_dir(tpath, orphan))
    # recovery material: staged AND claimed for the uncommitted head
    held = uuid.uuid4().hex
    spark.range(11).write.parquet(_staged_dir(tpath, held))
    assert _try_claim(spark, tpath, 2, {"writer": "w", "staged": held}) is None
    gc_table(spark, tpath, keep=5, staged_ttl_hours=0.0)
    assert not os.path.exists(_staged_dir(tpath, orphan))
    assert os.path.exists(_staged_dir(tpath, held))
    # and the held commit still rolls forward intact afterwards
    assert write_snapshot(spark.range(1), tpath) == 3
    assert read_table(spark, tpath, as_of=2).count() == 11


# --------------------------------------------------------------------------
# Round 10 (ADVICE r9): claim atomicity on the local FS, consumed-claim
# self-heal, create-race loser repair.


def test_put_if_absent_is_atomic_under_thread_hammer(spark, tmp_path):
    """On file:// the claim primitive is POSIX link(2) — genuinely
    atomic, not check-then-rename (which on a local FS OVERWRITES, so
    two racers could both report victory). 32 threads race one path;
    exactly one must win and the surviving content must be the
    winner's, repeated across rounds."""
    import threading

    from kmeanwithmapreduce_spark.sources.fsutil import read_json
    from kmeanwithmapreduce_spark.sources.table import _put_if_absent_json

    for rnd in range(8):
        p = str(tmp_path / f"claim_{rnd}.json")
        results = {}
        barrier = threading.Barrier(32)

        def run(i, p=p, results=results, barrier=barrier):
            barrier.wait()
            results[i] = _put_if_absent_json(spark, p, {"writer": i})

        ts = [threading.Thread(target=run, args=(i,)) for i in range(32)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        winners = [i for i, won in results.items() if won]
        assert len(winners) == 1
        assert read_json(spark, p) == {"writer": winners[0]}
        # no tmp litter left behind by the 31 losers
        litter = [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
        assert litter == []


def test_consumed_head_claim_is_unwedged_snapshot(spark, tpath):
    """ADVICE r9: a claim whose staged dir was consumed without the
    epoch committing (racing recoveries deleting each other's rename)
    must not wedge the table forever — recovery removes it and the
    next write claims the epoch fresh."""
    import json

    from kmeanwithmapreduce_spark.sources.table import _claim_file

    write_snapshot(spark.range(3), tpath)  # epoch 0
    consumed = _claim_file(tpath, 1)
    os.makedirs(os.path.dirname(consumed), exist_ok=True)
    with open(consumed, "w") as fh:
        json.dump({"writer": "dead", "staged": "consumed-token"}, fh)
    # no staged dir, no epoch=1 dir: previously ConcurrentWriteError forever
    assert write_snapshot(spark.range(9), tpath) == 1
    assert read_table(spark, tpath, as_of=1).count() == 9


def test_consumed_head_claim_is_unwedged_bucketed(spark, tmp_path):
    import json

    from kmeanwithmapreduce_spark.sources.table import (
        _claim_file,
        create_bucketed_table,
        read_bucketed_table,
        upsert_table,
    )

    tpath = str(tmp_path / "btbl")
    base = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    create_bucketed_table(base, tpath, key="k", n_buckets=4)
    consumed = _claim_file(tpath, 1)
    with open(consumed, "w") as fh:
        json.dump({"writer": "dead", "staged": "consumed-token"}, fh)
    batch = spark.range(2).select(F.col("id").alias("k"), F.lit(2).alias("v"))
    assert upsert_table(batch, tpath) == 1
    got = {r["k"]: r["v"] for r in read_bucketed_table(spark, tpath).collect()}
    assert got[0] == 2 and got[9] == 1


def test_create_race_loser_withdraws_its_epoch0(spark, tmp_path, monkeypatch):
    """ADVICE r9 (create_bucketed_table tail): when the meta
    put-if-absent loses, the loser's already-committed epoch 0 must
    not silently serve under the winner's meta — it is withdrawn and
    the subsequent read fails LOUDLY with no-committed-epochs."""
    from kmeanwithmapreduce_spark.sources import table as T

    tpath = str(tmp_path / "race")
    winner_meta = {
        "format": "bucketed",
        "key": "k",
        "n_buckets": 4,
        "columns": [["k", "bigint"], ["v", "int"]],
        "history": [{"epoch": 0, "n_buckets": 4}],
    }
    real = T._put_if_absent_json

    def winner_lands_first(spark_, path, payload):
        if path.endswith(T._META_FILE):
            # the racing winner's meta commits just before ours
            real(spark_, path, winner_meta)
        return real(spark_, path, payload)

    monkeypatch.setattr(T, "_put_if_absent_json", winner_lands_first)
    df = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    with pytest.raises(T.ConcurrentWriteError, match="withdrawn"):
        T.create_bucketed_table(df, tpath, key="k", n_buckets=4)
    monkeypatch.setattr(T, "_put_if_absent_json", real)
    # winner's meta intact; loser's epoch-0 data withdrawn -> loud read
    from kmeanwithmapreduce_spark.sources.fsutil import read_json

    assert read_json(spark, os.path.join(tpath, T._META_FILE)) == winner_meta
    assert not os.path.exists(os.path.join(tpath, "epoch=0"))
    with pytest.raises(FileNotFoundError, match="no committed epochs"):
        T.read_bucketed_table(spark, tpath)
