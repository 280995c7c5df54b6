"""Two-level (salted) sessionization — the whale-user scale variant
promised in SCALE.md.

Plain sessionization windows over ``partition by user_id`` put ALL of a
user's events in one task; a single whale user with billions of events
stalls the stage. The two-level form:

1. split each user's timeline into coarse time chunks (the salt);
2. sessionize WITHIN each (user, chunk) in parallel;
3. merge sessions that span a chunk boundary (an adjacent-chunk
   session pair merges when the gap across the boundary <= the session
   gap) with a second, tiny window over per-session summaries.

Step 3 operates on one row per session (not per event), so the whale's
billions of events reduce to thousands of session rows before any
single-task work happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_GAP_S = 1800

# seconds-since-epoch via unix_timestamp, NOT cast("long"): works on
# TIMESTAMP and TIMESTAMP_NTZ alike (Spark 4 refuses NTZ -> BIGINT),
# so these operators accept an events frame in either type.
def _ts_s(col: str):
    return F.unix_timestamp(F.col(col))


def sessionize_plain(events: DataFrame, gap_s: int = _GAP_S) -> DataFrame:
    """Baseline: lag+cumsum over (user_id) — one partition per user.
    Returns one row per session: user_id, session_start, session_end,
    n_events."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = _ts_s("ts") - F.lag(_ts_s("ts")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    sess = events.select(
        "user_id",
        "ts",
        F.sum(is_new)
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize_salted(
    events: DataFrame, gap_s: int = _GAP_S, chunk_s: int = 6 * 3600
) -> DataFrame:
    """Two-level sessionization; result rows equal sessionize_plain's
    (same sessions, same bounds, same counts)."""
    chunk = (_ts_s("ts") / chunk_s).cast("long").alias("chunk")
    w = Window.partitionBy("user_id", "chunk").orderBy("ts", "event_id")
    gap = _ts_s("ts") - F.lag(_ts_s("ts")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    local = (
        events.select("user_id", "ts", "event_id", chunk)
        .withColumn(
            "local_sid",
            F.sum(is_new).over(
                Window.partitionBy("user_id", "chunk")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "chunk", "local_sid")
        .agg(
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_end"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # merge pass over per-session rows (tiny): a session merges with the
    # previous one (any chunk) when the cross gap <= gap_s
    wm = Window.partitionBy("user_id").orderBy("s_start", "s_end")
    cross_gap = _ts_s("s_start") - F.lag(_ts_s("s_end")).over(wm)
    starts_new = F.when(cross_gap.isNull() | (cross_gap > gap_s), 1).otherwise(0)
    merged = local.withColumn(
        "merged_sid",
        F.sum(starts_new).over(
            Window.partitionBy("user_id")
            .orderBy("s_start", "s_end")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return merged.groupBy("user_id", F.col("merged_sid").alias("session_id")).agg(
        F.min("s_start").alias("session_start"),
        F.max("s_end").alias("session_end"),
        F.sum("n").alias("n_events"),
    )
