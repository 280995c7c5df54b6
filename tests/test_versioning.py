"""Snapshot diff (operators/versioning.py): hand-computed statuses,
null-vs-empty digest separation, summary rollup, and the full-outer
join plan shape. DuckDB value parity for c14 is covered by the
ORACLE_CASES sweep."""

from __future__ import annotations

import pytest

from kmeanwithmapreduce_spark.operators import versioning as V


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_snapshot_diff_hand_computed(spark):
    old = _snap(
        spark,
        [
            (1, "a", "en"),   # unchanged
            (2, "b", "en"),   # changed text
            (3, "c", "en"),   # removed
            (5, "e", "en"),   # changed lang
        ],
    )
    new = _snap(
        spark,
        [
            (1, "a", "en"),
            (2, "B", "en"),
            (4, "d", "en"),   # added
            (5, "e", "de"),
        ],
    )
    got = {r.doc_id: r.status for r in V.snapshot_diff(old, new, "doc_id", ["text", "lang"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added", 5: "changed"}


def test_snapshot_diff_null_vs_empty(spark):
    """NULL -> '' must be a CHANGE: the digest null-tags every column."""
    old = _snap(spark, [(1, None, "en"), (2, "", "en")])
    new = _snap(spark, [(1, "", "en"), (2, "", "en")])
    got = {r.doc_id: r.status for r in V.snapshot_diff(old, new, "doc_id", ["text"]).collect()}
    assert got == {1: "changed", 2: "unchanged"}


def test_snapshot_diff_empty_cols_raises(spark):
    old = _snap(spark, [(1, "a", "en")])
    with pytest.raises(ValueError, match="compare_cols"):
        V.snapshot_diff(old, old, "doc_id", [])


def test_diff_summary_counts(spark, sf_dir):
    """The c14 mutation rules give exact counts derivable from the
    corpus: removed = |id%17==3|, changed = |id%17==5|, added =
    |id%17==7|, unchanged = rest."""
    from kmeanwithmapreduce_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    import pyspark.sql.functions as F

    by_mod = {
        m: d.where(F.col("doc_id") % 17 == m).count() for m in (3, 5, 7)
    }
    got = {r.status: r.n for r in V.c14_snapshot_diff(spark, sf_dir).collect()}
    assert got.get("removed", 0) == by_mod[3]
    assert got.get("changed", 0) == by_mod[5]
    assert got.get("added", 0) == by_mod[7]
    assert got.get("unchanged", 0) == n - by_mod[3] - by_mod[5]


def test_c14_plan_full_outer_smj(spark, sf_dir):
    """A snapshot diff at 100 TB must be a key-partitioned merge join —
    FullOuter SortMergeJoin — never a broadcast (both sides are
    corpus-sized) and never a nested loop."""
    from kmeanwithmapreduce_spark.plans import explain_str

    plan = explain_str(V.c14_snapshot_diff(spark, sf_dir))
    assert "SortMergeJoin" in plan and "FullOuter" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_v02_refuses_foreign_base_path(spark, sf_dir, tmp_path):
    """The v02 rebuild clears base_path each call — it must refuse a
    dir that holds anything other than its own epoch layout instead of
    rmtree'ing a shared directory."""
    import pytest

    base = tmp_path / "shared"
    base.mkdir()
    (base / "precious.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing to clear"):
        V.v02_table_time_travel(spark, sf_dir, base_path=str(base))
    assert (base / "precious.txt").read_text() == "do not delete"
