"""Events-mart composition (operators/analytics.py): each written mart
must equal its individually-oracle-verified registry twin, the manifest
must round-trip counts + config, and the pruned-projection persist must
be released (the corpus pipeline's no-leak contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators.analytics import (
    MART_NAMES,
    build_events_mart,
    read_events_manifest,
    session_stats,
)
from kmeanwithmapreduce_spark.sources.readers import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def mart(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_mart"))
    stats = build_events_mart(spark, sf_dir, out)
    return out, stats


def test_marts_equal_registry_twins(spark, sf_dir, mart):
    """The composition must not drift from the oracle-verified
    registry entries it is built from."""
    import __spark_entry__ as entry

    out, _stats = mart
    qs = entry.queries()
    twins = {
        "funnel": "q34_funnel",
        "retention": "q36_cohort_retention",
        "rolling_7d": "q35_rolling_7day",
        "transitions": "q37_transition_matrix",
        "paths": "q38_leading_paths",
    }
    for mart_name, qname in twins.items():
        got = _rows(spark.read.parquet(f"{out}/{mart_name}"))
        want = _rows(qs[qname](spark, sf_dir))
        assert got == want, mart_name


def test_sessions_mart_consistency(spark, sf_dir, mart):
    """Sessions partition the event stream: n_events sums to the event
    count, durations are non-negative, and bounds are ordered."""
    out, stats = mart
    s = spark.read.parquet(f"{out}/sessions")
    n_events = load_table(spark, sf_dir, "events").count()
    agg = s.agg(
        F.sum("n_events").alias("tot"),
        F.min("duration_s").alias("min_dur"),
        F.sum((F.col("session_end") < F.col("session_start")).cast("int")).alias(
            "bad"
        ),
    ).collect()[0]
    assert agg.tot == n_events
    assert agg.min_dur >= 0 and agg.bad == 0
    assert stats["sessions"] == s.count()


def test_manifest_round_trip(spark, sf_dir, mart):
    out, stats = mart
    m = read_events_manifest(spark, out)
    assert m["counts"] == stats
    assert m["config"]["session_gap_s"] == 1800
    assert m["config"]["marts"] == sorted(MART_NAMES)
    assert set(stats) == set(MART_NAMES)


def test_no_leaked_persist(spark, sf_dir, tmp_path):
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    build_events_mart(spark, sf_dir, str(tmp_path / "m"))
    assert jsc.getPersistentRDDs().size() <= before


def test_persist_off_identical(spark, sf_dir, tmp_path, mart):
    """persist is a cost knob, never a semantics knob."""
    out_ref, _ = mart
    out2 = str(tmp_path / "nopersist")
    build_events_mart(spark, sf_dir, out2, persist=False)
    for name in MART_NAMES:
        assert _rows(spark.read.parquet(f"{out2}/{name}")) == _rows(
            spark.read.parquet(f"{out_ref}/{name}")
        ), name


def test_session_stats_gap_knob(spark, sf_dir):
    """A tighter gap can only split sessions further (count is
    monotone non-increasing in gap_s)."""
    e = load_table(spark, sf_dir, "events")
    tight = session_stats(e, gap_s=300).count()
    loose = session_stats(e, gap_s=7200).count()
    assert tight >= loose > 0


def test_include_gapfill_adds_fifth_mart(spark, sf_dir, tmp_path):
    import __spark_entry__ as entry

    out = str(tmp_path / "with_locf")
    stats = build_events_mart(spark, sf_dir, out, include_gapfill=True)
    assert "daily_locf" in stats
    got = _rows(spark.read.parquet(f"{out}/daily_locf"))
    want = _rows(entry.queries()["q33_gapfill_locf"](spark, sf_dir))
    assert got == want
