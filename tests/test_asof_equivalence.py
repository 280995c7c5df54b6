"""The two as-of formulations (window last_value vs grouped merge_asof)
must agree — they are the single-table and two-table scale paths for the
same operator."""

from __future__ import annotations

import datetime
import os

from kmeanwithmapreduce_spark.operators.joins_advanced import (
    j01_asof_last_purchase,
    j04_asof_merge_grouped,
    j04_asof_merge_plain,
)


def _rows(df):
    return {r["event_id"]: r["last_purchase_value"] for r in df.collect()}


def _assert_same(a, b):
    assert set(a) == set(b)
    diffs = {k for k in a if a[k] != b[k] and not (a[k] is None and b[k] is None)}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {sorted(diffs)[:3]}"


def test_asof_formulations_agree(spark, sf_dir):
    _assert_same(
        _rows(j01_asof_last_purchase(spark, sf_dir)),
        _rows(j04_asof_merge_grouped(spark, sf_dir)),
    )


def test_asof_chunked_equals_plain_real_data(spark, sf_dir):
    _assert_same(
        _rows(j04_asof_merge_plain(spark, sf_dir)),
        _rows(j04_asof_merge_grouped(spark, sf_dir, chunk_days=1)),
    )


def test_asof_chunked_boundary_fixture(spark, tmp_path):
    """Whale-safe chunking must repair chunk boundaries: clicks whose
    nearest purchase lives several chunks earlier, equal-ts purchases
    needing the highest-event_id tie-break, and purchase-free chunks in
    between."""
    t0 = datetime.datetime(2024, 1, 1)

    def ts(days, secs=0):
        return t0 + datetime.timedelta(days=days, seconds=secs)

    rows = [
        # user 1: purchase in chunk 0, clicks in chunks 2 and 9 (carry
        # across several empty chunks)
        (1, 1, ts(0), "purchase", 10.0),
        (2, 1, ts(2), "click", None),
        (3, 1, ts(9), "click", None),
        # user 2: equal-ts purchases — highest event_id (value 22.0)
        # must win, also for the next-chunk click via carry-in
        (4, 2, ts(0, 5), "purchase", 21.0),
        (6, 2, ts(0, 5), "purchase", 22.0),
        (5, 2, ts(0, 5), "purchase", 21.5),
        (7, 2, ts(0, 6), "click", None),
        (8, 2, ts(1, 1), "click", None),
        # user 3: click before any purchase -> NULL, later click after
        (9, 3, ts(0), "click", None),
        (10, 3, ts(3), "purchase", 30.0),
        (11, 3, ts(5), "click", None),
        # user 4: purchase at the exact chunk boundary instant
        (12, 4, ts(1), "purchase", 40.0),
        (13, 4, ts(2), "click", None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    fx = os.path.join(str(tmp_path), "events.parquet")
    df.write.parquet(fx)

    plain = _rows(j04_asof_merge_plain(spark, str(tmp_path)))
    chunked = _rows(j04_asof_merge_grouped(spark, str(tmp_path), chunk_days=1))
    _assert_same(plain, chunked)
    expected = {2: 10.0, 3: 10.0, 7: 22.0, 8: 22.0, 9: None, 11: 30.0, 13: 40.0}
    assert chunked == expected


# --------------------------------------------------------------------------
# Randomized sweep: chunked == plain == an independent O(n^2) Python
# reference on adversarial streams (dense ts collisions, few users, ts
# spanning several 1-day chunks). The reference recomputes the as-of
# contract from its definition — it shares no code with merge_asof or
# the carry-in window — so agreement is three-way independent.
from hypothesis import given, settings
from hypothesis import strategies as st


def _reference_asof(rows):
    out = {}
    for eid, uid, ts, etype, _val in rows:
        if etype != "click":
            continue
        cands = [
            (p_ts, p_eid, p_val)
            for p_eid, p_uid, p_ts, p_type, p_val in rows
            if p_uid == uid and p_type == "purchase" and p_ts <= ts
        ]
        out[eid] = max(cands)[2] if cands else None
    return out


_event = st.tuples(
    st.integers(min_value=1, max_value=4),          # user_id
    st.integers(min_value=0, max_value=3 * 86400),  # offset secs, 3 days
    st.sampled_from(["click", "purchase"]),
)


# no unique=: duplicate (user, ts, type) draws are exactly the equal-ts
# purchase collisions the tie-break contract exists for
@given(st.lists(_event, min_size=1, max_size=30))
@settings(max_examples=6, deadline=None, derandomize=True)
def test_asof_chunked_random_streams(spark, tmp_path_factory, events):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, uid, t0 + datetime.timedelta(seconds=secs), etype,
         float(100 * i) if etype == "purchase" else None)
        for i, (uid, secs, etype) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    d = str(tmp_path_factory.mktemp("asof_rand"))
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

    want = _reference_asof(rows)
    plain = _rows(j04_asof_merge_plain(spark, d))
    chunked = _rows(j04_asof_merge_grouped(spark, d, chunk_days=1))
    _assert_same(plain, want)
    _assert_same(chunked, want)
