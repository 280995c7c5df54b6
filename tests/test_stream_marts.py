"""Streaming events-mart twin (streaming/marts.py): sessions + funnel
ingested over micro-batches must equal the batch operators over the
full stream — the established stream==batch pin pattern."""

from __future__ import annotations

import glob
import os
import time

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators.sessionize import sessionize_plain
from kmeanwithmapreduce_spark.operators.temporal import funnel
from kmeanwithmapreduce_spark.sources.readers import load_table
from kmeanwithmapreduce_spark.streaming.marts import (
    read_streaming_funnel,
    read_streaming_sessions,
    streaming_events_mart_ingest,
)


def _split_events(spark, sf_dir, src, order="in_order"):
    """Two time-ordered single-file micro-batches with explicit mtimes
    (the test_sequences harness)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    cut = e.agg(F.expr("percentile(unix_micros(ts), 0.5)")).first()[0]
    early = e.where(F.unix_micros("ts") <= cut)
    late = e.where(F.unix_micros("ts") > cut)
    b1, b2 = (early, late) if order == "in_order" else (late, early)
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    first = set(glob.glob(src + "/part-*.parquet"))
    b2.coalesce(1).write.mode("append").parquet(src)
    second = set(glob.glob(src + "/part-*.parquet")) - first
    assert len(first) == 1 and len(second) == 1
    now = time.time()
    os.utime(first.pop(), (now - 60, now - 60))
    os.utime(second.pop(), (now, now))
    return e


def _stream(spark, src):
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_streaming_mart_equals_batch(spark, sf_dir, tmp_path):
    """Sessions (incl. the cross-epoch session merge) and funnel from
    the 2-batch stream must equal the batch operators row-for-row."""
    src = str(tmp_path / "src")
    e = _split_events(spark, sf_dir, src)
    out = str(tmp_path / "mart")
    q = streaming_events_mart_ingest(_stream(spark, src), out, str(tmp_path / "ck"))
    q.awaitTermination(120)

    assert len(glob.glob(out + "/sessions_closed/epoch=*")) >= 2

    got_sessions = sorted(
        map(tuple, read_streaming_sessions(spark, out).collect())
    )
    want_sessions = sorted(
        map(
            tuple,
            sessionize_plain(e)
            .select(
                "user_id",
                F.col("session_id").cast("int"),
                "session_start",
                "session_end",
                F.col("n_events").cast("bigint"),
            )
            .collect(),
        )
    )
    assert got_sessions == want_sessions and len(want_sessions) > 0

    got_funnel = sorted(map(tuple, read_streaming_funnel(spark, out).collect()))
    want_funnel = sorted(map(tuple, funnel(e).collect()))
    assert got_funnel == want_funnel
    assert sum(r[2] for r in want_funnel) > 0


def test_streaming_mart_restart_exactly_once(spark, sf_dir, tmp_path):
    """Re-running over the same source + checkpoint must not duplicate
    any closed-session epoch or advance the funnel state."""
    src = str(tmp_path / "src")
    e = _split_events(spark, sf_dir, src)
    out = str(tmp_path / "mart")
    ck = str(tmp_path / "ck")
    for _ in range(2):
        q = streaming_events_mart_ingest(_stream(spark, src), out, ck)
        q.awaitTermination(120)
    got = read_streaming_sessions(spark, out).count()
    want = sessionize_plain(e).count()
    assert got == want


def test_streaming_mart_late_events_fail_loudly(spark, sf_dir, tmp_path):
    """Delivering the late half first violates the in-order contract:
    on_late='error' must fail the query; 'permissive' must finish."""
    src = str(tmp_path / "src")
    _split_events(spark, sf_dir, src, order="reversed")

    q = streaming_events_mart_ingest(
        _stream(spark, src), str(tmp_path / "m_err"), str(tmp_path / "ck_err")
    )
    with pytest.raises(Exception, match="in-order contract violated"):
        q.awaitTermination(120)

    q2 = streaming_events_mart_ingest(
        _stream(spark, src),
        str(tmp_path / "m_perm"),
        str(tmp_path / "ck_perm"),
        on_late="permissive",
    )
    assert q2.awaitTermination(120)


def _two_batches(spark, tmp_path, rows1, rows2,
                 schema="user_id long, event_id long, event_type string, ts timestamp"):
    src = str(tmp_path / "src")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    first = set(glob.glob(src + "/part-*.parquet"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    second = set(glob.glob(src + "/part-*.parquet")) - first
    now = time.time()
    os.utime(first.pop(), (now - 60, now - 60))
    os.utime(second.pop(), (now, now))
    return src


@pytest.mark.exhaustive  # twin: test_streaming_mart_equals_batch (same parity) + the unix_micros sub-second discipline pinned in test_temporal.py
def test_streaming_mart_subsecond_gap_parity(spark, tmp_path):
    """ADVICE r6 (medium): a true cross-epoch gap of 1800.2s whose
    SECOND-TRUNCATED gap is exactly 1800s. sessionize_plain merges
    (1800 <= 1800 after unix_timestamp truncation); the streaming twin
    used unix_micros and closed. Pin stream == batch on sub-second
    timestamps."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 5, 1, 12, 0, 0, 700_000)  # .7s fraction
    rows1 = [(1, 10, "click", t0), (2, 20, "click", t0)]
    rows2 = [
        # user 1: true gap 1800.2s, truncated gap 1800s -> batch MERGES
        (1, 11, "view", t0 + timedelta(seconds=1800, microseconds=200_000)),
        # user 2: truncated gap 1801s -> batch CLOSES
        (2, 21, "view", t0 + timedelta(seconds=1801, microseconds=200_000)),
    ]
    src = _two_batches(spark, tmp_path, rows1, rows2)
    out = str(tmp_path / "mart")
    q = streaming_events_mart_ingest(_stream(spark, src), out, str(tmp_path / "ck"))
    q.awaitTermination(120)

    e = spark.read.parquet(src)
    got = sorted(map(tuple, read_streaming_sessions(spark, out).collect()))
    want = sorted(
        map(
            tuple,
            sessionize_plain(e)
            .select(
                "user_id",
                F.col("session_id").cast("int"),
                "session_start",
                "session_end",
                F.col("n_events").cast("bigint"),
            )
            .collect(),
        )
    )
    assert got == want
    by_user = {}
    for u, *_ in want:
        by_user[u] = by_user.get(u, 0) + 1
    assert by_user == {1: 1, 2: 2}  # user 1 merged, user 2 split


def test_streaming_mart_epoch_rewrites_only_touched_buckets(spark, tmp_path):
    """The scale pin for the bucketed state chains: an epoch whose batch
    touches ONE user rewrites exactly ONE bucket subdir (in both
    chains), while the first epoch (8 users) wrote several — per-epoch
    cost is O(touched buckets), not O(all users ever seen)."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 5, 1, 8, 0, 0)
    rows1 = [(u, u * 10, "signup", t0 + timedelta(seconds=u)) for u in range(1, 9)]
    rows2 = [(1, 99, "view", t0 + timedelta(hours=6))]
    src = _two_batches(spark, tmp_path, rows1, rows2)
    out = str(tmp_path / "mart")
    q = streaming_events_mart_ingest(
        _stream(spark, src), out, str(tmp_path / "ck"), n_state_buckets=8
    )
    q.awaitTermination(120)

    def _buckets(chain, ep):
        return sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(out, chain, f"epoch={ep}", "bucket=*"))
        )

    assert len(_buckets("sessions_state", 0)) >= 2  # 8 users spread out
    assert len(_buckets("sessions_state", 1)) == 1  # 1 touched user
    assert len(_buckets("funnel_state", 1)) == 1

    # state GC: epoch 0's copy of user 1's bucket is superseded by the
    # epoch-1 rewrite and nothing else is — exactly two dirs go (one
    # per chain), epoch _SUCCESS markers stay (replay record)
    from kmeanwithmapreduce_spark.streaming.marts import gc_mart_state

    n0_sess = len(_buckets("sessions_state", 0))
    deleted = gc_mart_state(spark, out, keep_epochs=1)
    assert len(deleted) == 2
    assert all("epoch=0/bucket=" in p for p in deleted)
    assert len(_buckets("sessions_state", 0)) == n0_sess - 1
    assert os.path.exists(os.path.join(out, "sessions_state", "epoch=0", "_SUCCESS"))
    assert gc_mart_state(spark, out, keep_epochs=1) == []  # idempotent
    # untouched users' state still resolves from epoch 0: full parity
    e = spark.read.parquet(src)
    got = sorted(map(tuple, read_streaming_sessions(spark, out).collect()))
    want = sorted(
        map(
            tuple,
            sessionize_plain(e)
            .select(
                "user_id",
                F.col("session_id").cast("int"),
                "session_start",
                "session_end",
                F.col("n_events").cast("bigint"),
            )
            .collect(),
        )
    )
    assert got == want and len(want) == 9  # 8 first sessions + user 1's second
    got_funnel = sorted(map(tuple, read_streaming_funnel(spark, out).collect()))
    want_funnel = sorted(map(tuple, funnel(e).collect()))
    assert got_funnel == want_funnel


def test_streaming_mart_foreign_checkpoint_refused(spark, sf_dir, tmp_path):
    """ADVICE r6: a FRESH checkpoint replays epoch ids from 0, so
    pointing it at an already-committed out_path would silently discard
    its batches as committed replays. The ident marker refuses loudly;
    same-checkpoint restart and a changed bucket count are also
    pinned."""
    src = str(tmp_path / "src")
    _split_events(spark, sf_dir, src)
    out = str(tmp_path / "mart")
    ck1 = str(tmp_path / "ck1")
    q = streaming_events_mart_ingest(_stream(spark, src), out, ck1)
    q.awaitTermination(120)

    with pytest.raises(ValueError, match="checkpoint"):
        streaming_events_mart_ingest(
            _stream(spark, src), out, str(tmp_path / "ck2")
        )
    with pytest.raises(ValueError, match="n_state_buckets"):
        streaming_events_mart_ingest(
            _stream(spark, src), out, ck1, n_state_buckets=16
        )
    # the legitimate restart (same checkpoint, same config) still works
    q2 = streaming_events_mart_ingest(_stream(spark, src), out, ck1)
    assert q2.awaitTermination(120)


def test_streaming_mart_cross_epoch_session_merge(spark, tmp_path):
    """Hand-built boundary case: a user whose session SPANS the batch
    boundary (gap < gap_s across the cut) must come out as ONE merged
    session; another whose gap exceeds gap_s must close at the
    boundary."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 5, 1, 12, 0, 0)
    rows1 = [
        (1, 10, "click", t0),
        (1, 11, "view", t0 + timedelta(minutes=10)),
        (2, 20, "click", t0),
    ]
    rows2 = [
        # user 1: 20 min after their last event -> same session (gap 1800s)
        (1, 12, "purchase", t0 + timedelta(minutes=30)),
        # user 2: 2 h after -> new session
        (2, 21, "view", t0 + timedelta(hours=2)),
    ]
    schema = "user_id long, event_id long, event_type string, ts timestamp"
    src = str(tmp_path / "src")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    first = set(glob.glob(src + "/part-*.parquet"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    second = set(glob.glob(src + "/part-*.parquet")) - first
    now = time.time()
    os.utime(first.pop(), (now - 60, now - 60))
    os.utime(second.pop(), (now, now))

    out = str(tmp_path / "mart")
    q = streaming_events_mart_ingest(_stream(spark, src), out, str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in read_streaming_sessions(spark, out).collect()
    }
    assert got[(1, 1)] == (t0, t0 + timedelta(minutes=30), 3)  # merged
    assert got[(2, 1)] == (t0, t0, 1)  # closed at boundary
    assert got[(2, 2)] == (t0 + timedelta(hours=2), t0 + timedelta(hours=2), 1)
    assert len(got) == 3


def test_streaming_mart_null_user_id_fails_loudly(spark, tmp_path):
    """A NULL user_id has no session identity and no state bucket — the
    ingest must fail with a clear contract error, not a driver
    TypeError from a None bucket id."""
    rows1 = [(1, 10, "view", "2024-01-01 10:00:00")]
    rows2 = [(None, 11, "view", "2024-01-01 10:01:00")]
    src = _two_batches(
        spark,
        tmp_path,
        [(a, b, c, __import__("datetime").datetime.fromisoformat(d))
         for a, b, c, d in rows1],
        [(a, b, c, __import__("datetime").datetime.fromisoformat(d))
         for a, b, c, d in rows2],
    )
    q = streaming_events_mart_ingest(
        _stream(spark, src), str(tmp_path / "mart"), str(tmp_path / "ck")
    )
    with pytest.raises(Exception, match="NULL user_id"):
        q.awaitTermination(120)
