"""Streaming twin of the events-mart builder: sessions + funnel as
continuous foreachBatch ingest, the streaming_transition_ingest epoch
discipline (streaming/ingest.py) applied to the two history-dependent
marts.

Correctness contract (same as the transition ingest): per-user
IN-ORDER delivery across micro-batches — the property a user-keyed
Kafka topic gives. Under it, both marts fold incrementally with
bounded per-user state:

- **Sessions**: state is each user's OPEN session summary
  (session_start, session_end, n_events). Per epoch the batch is
  sessionized by the engine's own batch operator; a user's FIRST batch
  session merges into their open session iff the gap between the open
  session's end and the first batch event is <= gap_s (exactly the
  sessionizer's boundary rule); everything except each user's LAST
  (possibly merged) session is CLOSED and appended to the epoch's
  increment dir; the last session becomes the new open state.
- **Funnel**: state is each user's stage-time row (t1..t4). The state
  row replays as SYNTHETIC events (signup@t1, view@t2, click@t3,
  purchase@t4) unioned with the batch through the engine's own
  funnel_user_stages — the state∪batch-through-the-batch-operator
  recipe: correct because stage times are chain-mins and in-order
  delivery puts every new event at or after the recorded times.

Exactly-once: session increments land in epoch-keyed subdirs; the
funnel state chain writes next; the SESSIONS state chain writes LAST
and its parquet ``_SUCCESS`` is the whole epoch's commit marker — a
replayed committed epoch is skipped, a crashed epoch recomputes
deterministically into the same subdirs (SCD2 recipe; no pointer).

Readers: ``read_streaming_sessions`` = closed increments ∪ open state,
re-ranked per user by session_start to reproduce the batch operator's
session_id numbering; ``read_streaming_funnel`` = the stage-count
rollup of the latest funnel state. Both pinned equal to their batch
twins in tests/test_stream_marts.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sessionize import sessionize_plain
from ..operators.temporal import funnel_user_stages
from .ingest import _committed_epochs

_SESS_STATE_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
_FUNNEL_STATE_SCHEMA = (
    "user_id bigint, t1 timestamp, t2 timestamp, t3 timestamp, t4 timestamp"
)
_STAGES = [(1, "signup", "t1"), (2, "view", "t2"), (3, "click", "t3"),
           (4, "purchase", "t4")]


def _synthetic_stage_events(state: DataFrame) -> DataFrame:
    """Replay a funnel state row as the minimal event set that
    regenerates it through the batch operator."""
    pairs = F.array(
        *[
            F.struct(F.lit(et).alias("event_type"), F.col(tc).alias("ts"))
            for _, et, tc in _STAGES
        ]
    )
    return (
        state.select(
            "user_id", F.explode(pairs).alias("s")
        )
        .where(F.col("s.ts").isNotNull())
        .select("user_id", "s.event_type", "s.ts")
    )


def streaming_events_mart_ingest(
    stream_events: DataFrame,
    out_path: str,
    checkpoint_path: str,
    gap_s: int = 1800,
    on_late: str = "error",
):
    """foreachBatch ingest maintaining
    ``<out_path>/sessions_closed`` (epoch increments),
    ``<out_path>/funnel_state`` and ``<out_path>/sessions_state``
    (snapshot chains; the sessions chain's _SUCCESS commits the epoch).

    ``on_late`` enforces the per-user in-order contract: an event
    strictly before a user's open-session end would silently corrupt
    the session merge, so ``"error"`` fails the query loudly;
    ``"permissive"`` skips the check."""
    if on_late not in ("error", "permissive"):
        raise ValueError(f"on_late must be 'error' or 'permissive', got {on_late!r}")

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        sess_state_path = os.path.join(out_path, "sessions_state")
        funnel_state_path = os.path.join(out_path, "funnel_state")
        done = _committed_epochs(spark, sess_state_path)
        if epoch_id in done:  # replayed, already committed
            return
        prior = [ep for ep in done if ep < epoch_id]
        if prior:
            sess_state = spark.read.schema(_SESS_STATE_SCHEMA).parquet(
                os.path.join(sess_state_path, f"epoch={prior[-1]}")
            )
            fun_state = spark.read.schema(_FUNNEL_STATE_SCHEMA).parquet(
                os.path.join(funnel_state_path, f"epoch={prior[-1]}")
            )
        else:
            sess_state = spark.createDataFrame([], _SESS_STATE_SCHEMA)
            fun_state = spark.createDataFrame([], _FUNNEL_STATE_SCHEMA)

        batch = batch_df.select(
            "user_id", "event_id", "event_type", "ts"
        ).persist()
        batch_users = batch.select("user_id").distinct()
        open_pruned = sess_state.join(batch_users, "user_id", "semi").persist()
        try:
            if on_late == "error":
                n_late = (
                    batch.groupBy("user_id")
                    .agg(F.min("ts").alias("_first_ts"))
                    .join(open_pruned, "user_id")
                    .where(F.col("_first_ts") < F.col("session_end"))
                    .count()
                )
                if n_late:
                    raise RuntimeError(
                        f"streaming_events_mart_ingest epoch {epoch_id}: "
                        f"{n_late} user(s) delivered events before their "
                        "open session's end — per-user in-order contract "
                        "violated (on_late='error')"
                    )

            # ---- sessions: sessionize the batch, merge across the
            # epoch boundary, close everything but each user's last
            b_sess = sessionize_plain(batch, gap_s=gap_s).select(
                "user_id",
                "session_id",
                "session_start",
                "session_end",
                F.col("n_events").cast("bigint").alias("n_events"),
            )
            last_id = Window.partitionBy("user_id")
            b_sess = b_sess.withColumn(
                "_max_id", F.max("session_id").over(last_id)
            )
            st = open_pruned.select(
                "user_id",
                F.col("session_start").alias("_st_start"),
                F.col("session_end").alias("_st_end"),
                F.col("n_events").alias("_st_n"),
            )
            j = b_sess.join(st, "user_id", "left")
            merges = (F.col("session_id") == 1) & F.col("_st_end").isNotNull() & (
                (F.unix_micros("session_start") - F.unix_micros("_st_end"))
                <= gap_s * 1_000_000
            )
            adjusted = j.select(
                "user_id",
                "session_id",
                "_max_id",
                F.when(merges, F.col("_st_start"))
                .otherwise(F.col("session_start"))
                .alias("session_start"),
                "session_end",
                F.when(merges, F.col("n_events") + F.col("_st_n"))
                .otherwise(F.col("n_events"))
                .alias("n_events"),
            )
            # a state session that did NOT merge closes now
            nonmerge_closed = (
                j.where((F.col("session_id") == 1) & F.col("_st_end").isNotNull())
                .where(~(
                    (F.unix_micros("session_start") - F.unix_micros("_st_end"))
                    <= gap_s * 1_000_000
                ))
                .select(
                    "user_id",
                    F.col("_st_start").alias("session_start"),
                    F.col("_st_end").alias("session_end"),
                    F.col("_st_n").alias("n_events"),
                )
            )
            closed = (
                adjusted.where(F.col("session_id") != F.col("_max_id"))
                .select("user_id", "session_start", "session_end", "n_events")
                .unionByName(nonmerge_closed)
            )
            closed.write.mode("overwrite").parquet(
                os.path.join(out_path, "sessions_closed", f"epoch={epoch_id}")
            )

            # ---- funnel: state replayed as synthetic events through
            # the batch operator
            new_fun_touched = funnel_user_stages(
                _synthetic_stage_events(
                    fun_state.join(batch_users, "user_id", "semi")
                ).unionByName(batch.select("user_id", "event_type", "ts"))
            )
            new_fun = fun_state.join(batch_users, "user_id", "anti").unionByName(
                new_fun_touched
            )
            new_fun.write.mode("overwrite").parquet(
                os.path.join(funnel_state_path, f"epoch={epoch_id}")
            )

            # ---- sessions state LAST: its _SUCCESS commits the epoch
            new_open = (
                adjusted.where(F.col("session_id") == F.col("_max_id"))
                .select("user_id", "session_start", "session_end", "n_events")
            )
            carried = sess_state.join(batch_users, "user_id", "anti")
            carried.unionByName(new_open).write.mode("overwrite").parquet(
                os.path.join(sess_state_path, f"epoch={epoch_id}")
            )
        finally:
            open_pruned.unpersist()
            batch.unpersist()

    return (
        stream_events.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_streaming_sessions(spark: SparkSession, out_path: str) -> DataFrame:
    """Closed sessions from every committed increment epoch plus the
    current open sessions, re-ranked per user by session_start —
    row-for-row the batch sessionizer's output over the full stream."""
    sess_state_path = os.path.join(out_path, "sessions_state")
    done = _committed_epochs(spark, sess_state_path)
    open_s = (
        spark.read.schema(_SESS_STATE_SCHEMA).parquet(
            os.path.join(sess_state_path, f"epoch={done[-1]}")
        )
        if done
        else spark.createDataFrame([], _SESS_STATE_SCHEMA)
    )
    closed_root = os.path.join(out_path, "sessions_closed")
    paths = [
        os.path.join(closed_root, f"epoch={ep}")
        for ep in done
    ]
    closed = (
        spark.read.schema(_SESS_STATE_SCHEMA).parquet(*paths)
        if paths
        else spark.createDataFrame([], _SESS_STATE_SCHEMA)
    )
    allsess = closed.unionByName(open_s)
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("session_start")
    )
    return allsess.select(
        "user_id",
        rn.alias("session_id"),
        "session_start",
        "session_end",
        "n_events",
    )


def read_streaming_funnel(spark: SparkSession, out_path: str) -> DataFrame:
    """Stage-count rollup of the latest funnel state — the batch
    funnel() output shape (stage, event_type, n_users)."""
    path = os.path.join(out_path, "funnel_state")
    done = _committed_epochs(spark, path)
    state = (
        spark.read.schema(_FUNNEL_STATE_SCHEMA).parquet(
            os.path.join(path, f"epoch={done[-1]}")
        )
        if done
        else spark.createDataFrame([], _FUNNEL_STATE_SCHEMA)
    )
    rows = [
        state.agg(
            F.lit(stage).cast("int").alias("stage"),
            F.lit(et).alias("event_type"),
            F.coalesce(F.count(F.col(tc)), F.lit(0))
            .cast("bigint")
            .alias("n_users"),
        )
        for stage, et, tc in _STAGES
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out
