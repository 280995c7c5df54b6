"""Two-level (salted) sessionization must produce exactly the sessions
of the plain single-partition form — including sessions spanning chunk
boundaries (forced via a small chunk size)."""

from __future__ import annotations

from kmeanwithmapreduce_spark.operators.sessionize import (
    sessionize_plain,
    sessionize_salted,
)
from kmeanwithmapreduce_spark.sources.readers import load_table


def _session_set(df):
    return sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in df.collect()
    )


def test_salted_equals_plain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    plain = _session_set(sessionize_plain(e))
    salted = _session_set(sessionize_salted(e))
    assert salted == plain


def test_salted_equals_plain_tiny_chunks(spark, sf_dir):
    """10-minute chunks < 30-minute gap: nearly every session spans
    multiple chunks, exercising the merge pass hard."""
    e = load_table(spark, sf_dir, "events")
    plain = _session_set(sessionize_plain(e))
    salted = _session_set(sessionize_salted(e, chunk_s=600))
    assert salted == plain
