"""Product-analytics mart builder — the events-side counterpart of
``corpus.prepare_training_corpus``: ONE pass over the events table
fans out into the six standard marts (sessions, funnel, cohort
retention, rolling features, transition matrix, leading paths),
written as parquet with the same
reproducibility manifest the corpus pipeline uses. Reference parity:
the reference engine (a single K-Means job) has no analytics surface;
this composes the engine's own q19/q34/q36/q35/q37/q38 operators, each of
which is individually oracle-verified in the registry.

Scale notes:
- the input projection is pruned to the five columns every mart needs
  BEFORE the optional persist — caching the full events table at
  100 TB would be the mistake; caching the pruned projection is the
  standard multi-consumer trade, and ``persist=False`` (the cluster
  default for very large inputs) simply lets each mart re-scan the
  pruned parquet columns.
- every mart's own shape is the one pinned by its registry twin: all
  windows and aggregations hash user_id, per-user state is bounded
  (one timestamp for the funnel chain, the 7-day span for the rolling
  frame, a session's own rows for sessionize).
- mart row counts for the manifest come from reading BACK the written
  parquet footers' count (a metadata-only count job), not from
  re-running the mart's full plan a second time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .corpus import _write_manifest, read_corpus_manifest
from .sequences import leading_paths, transition_matrix
from .sessionize import sessionize_plain
from .temporal import cohort_retention, funnel, gapfill_locf, rolling_7day

MART_NAMES = (
    "sessions", "funnel", "retention", "rolling_7d", "transitions", "paths"
)


def session_stats(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Per-session rows from the engine's sessionizer with the derived
    duration in exact seconds (unix_timestamp delta, q19's ts rule)."""
    s = sessionize_plain(events, gap_s=gap_s)
    dur = F.unix_timestamp("session_end") - F.unix_timestamp("session_start")
    return s.select(
        "user_id",
        "session_id",
        "session_start",
        "session_end",
        F.col("n_events").cast("bigint").alias("n_events"),
        dur.cast("bigint").alias("duration_s"),
    )


def build_events_mart(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    session_gap_s: int = 1800,
    persist: bool = True,
    include_gapfill: bool = False,
) -> dict:
    """Build and write the six marts; returns {mart: row_count}.

    ``include_gapfill=True`` adds the q33 LOCF daily series as a
    seventh mart (off by default: its row count is users x days, an
    order larger than the others). A ``_mart_manifest.json`` with the
    counts and every knob lands in ``out_dir`` (read back with
    ``read_events_manifest``)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    if persist:
        e = e.persist()
    try:
        marts: dict[str, DataFrame] = {
            "sessions": session_stats(e, gap_s=session_gap_s),
            "funnel": funnel(e),
            "retention": cohort_retention(e),
            "rolling_7d": rolling_7day(e),
            "transitions": transition_matrix(e),
            "paths": leading_paths(e, k=3),
        }
        if include_gapfill:
            marts["daily_locf"] = gapfill_locf(e)
        stats: dict[str, int] = {}
        for name, df in marts.items():
            path = f"{out_dir}/{name}"
            df.write.mode("overwrite").parquet(path)
            stats[name] = spark.read.parquet(path).count()
        _write_manifest(
            spark,
            out_dir,
            stats,
            {
                "sf_dir": sf_dir,
                "session_gap_s": session_gap_s,
                "include_gapfill": include_gapfill,
                "marts": sorted(marts),
            },
            stats_key="counts",
            filename="_mart_manifest.json",
        )
        return stats
    finally:
        if persist:
            e.unpersist()


def read_events_manifest(spark: SparkSession, out_dir: str) -> dict:
    """Manifest reader (same Hadoop-FS path rules as the corpus one,
    mart-specific filename and a 'counts' stats key — an events-mart
    directory must not masquerade as a training corpus)."""
    return read_corpus_manifest(spark, out_dir, filename="_mart_manifest.json")
