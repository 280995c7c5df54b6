"""Profiling operators (operators/profiling.py): exact hand-computed
histogram buckets and MAD fences, boundary rules, and plan shapes.
DuckDB value parity for q42/q43 is covered by the ORACLE_CASES sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators import profiling as P


def test_histogram_hand_computed(spark):
    """Values 0.00..0.19 in cents (0..19), 4 bins over span 20 ->
    width 5: buckets are exactly [0..4],[5..9],[10..14],[15..19],
    5 rows each; the max value lands in the LAST bucket (least-clamp)."""
    df = spark.createDataFrame([(i / 100.0,) for i in range(20)], "v double")
    got = sorted(
        tuple(r) for r in P.histogram_cents(df, "v", n_bins=4).collect()
    )
    assert got == [
        (0, 0, 4, 5),
        (1, 5, 9, 5),
        (2, 10, 14, 5),
        (3, 15, 19, 5),
    ]


def test_histogram_single_value_and_guards(spark):
    df = spark.createDataFrame([(2.5,), (2.5,)], "v double")
    got = [tuple(r) for r in P.histogram_cents(df, "v", n_bins=8).collect()]
    # span 1: every row in bucket 0
    assert got == [(0, 250, 250, 2)]
    with pytest.raises(ValueError, match="n_bins"):
        P.histogram_cents(df, "v", n_bins=0)
    empty = df.where("v < 0")
    with pytest.raises(ValueError, match="no non-null"):
        P.histogram_cents(empty, "v")


def test_histogram_buckets_partition_all_rows(spark, sf_dir):
    from kmeanwithmapreduce_spark.sources.readers import load_table

    o = load_table(spark, sf_dir, "orders")
    h = P.histogram_cents(o, "o_totalprice").collect()
    assert sum(r.n for r in h) == o.where("o_totalprice IS NOT NULL").count()
    assert all(0 <= r.bucket < 20 for r in h)


def test_mad_hand_computed(spark):
    """Group a: cents [100,100,100,100,1000] -> med 100, deviations
    [0,0,0,0,900] -> mad 0 -> the whale is an outlier (900 > 0). Group
    b: symmetric spread with a known fence: [10,20,30,40,50] -> med 30,
    devs [20,10,0,10,20] -> mad 10 -> fence 30; all |c-30| <= 20, zero
    outliers."""
    rows = [("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 10.0)] + [
        ("b", 0.10), ("b", 0.20), ("b", 0.30), ("b", 0.40), ("b", 0.50)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.g: (r.n_rows, r.n_outliers, r.med_cents, r.mad_cents)
        for r in P.mad_outlier_profile(df, "g", "v").collect()
    }
    assert got == {"a": (5, 1, 100.0, 0.0), "b": (5, 0, 30.0, 10.0)}


def test_mad_boundary_is_not_outlier(spark):
    """|c - med| == k*mad must NOT flag (strict >): [10,20,30] -> med
    20, mad 10, fence 30 -> 10 and 30 sit exactly ON it."""
    df = spark.createDataFrame(
        [("a", 0.10), ("a", 0.20), ("a", 0.30)], "g string, v double"
    )
    r = P.mad_outlier_profile(df, "g", "v").collect()[0]
    assert (r.n_rows, r.n_outliers) == (3, 0)


def test_profiling_plan_shapes(spark, sf_dir):
    from kmeanwithmapreduce_spark.plans import explain_str
    from kmeanwithmapreduce_spark.plans.inspect import count_nodes

    # the scalar min/max pre-pass is collected into literals, so the
    # returned plan is scan -> bucket project -> hash groupBy only
    p42 = explain_str(P.q42_histogram_cents(spark, sf_dir))
    assert "SinglePartition" not in p42, p42
    assert "Join" not in p42, p42
    assert "Window" not in p42, p42

    # 3 broadcast joins: base⋈med appears twice (once under the mad
    # aggregate, once in the flag pass) plus the mad join — three
    # narrow scans, tiny build sides, zero wide shuffles
    p43 = explain_str(P.q43_mad_outliers(spark, sf_dir))
    assert count_nodes(p43, "BroadcastHashJoin") == 3, p43
    assert "Window" not in p43, p43
    assert "CartesianProduct" not in p43, p43
