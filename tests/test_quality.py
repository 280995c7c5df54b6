"""Constraint audit (operators/quality.py): each check must actually
FIRE on corrupted data (an audit that always passes is decoration),
the clean corpus must pass, and the report shape is pinned. DuckDB
value parity for v01 runs in the ORACLE_CASES sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators import quality as Q


def test_checks_fire_on_corrupted_data(spark):
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f")],
        "k long, v string",
    )
    r = Q.check_unique(dup, ["k"]).first()
    assert r.n_violations == 5  # keys 1 (2 rows) and 3 (3 rows)

    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = Q.check_fk(child, "fk", parent, "pk").first()
    assert r.n_violations == 2  # both orphaned 9s count

    nn = spark.createDataFrame([(1,), (None,), (None,)], "x int")
    assert Q.check_not_null(nn, "x").first().n_violations == 2

    rng = spark.createDataFrame([(0,), (24,), (25,), (-1,), (None,)], "x int")
    assert Q.check_range(rng, "x", 0, 24).first().n_violations == 3


def test_audit_report_shape_and_clean_corpus_passes(spark, sf_dir):
    rows = Q.v01_data_audit(spark, sf_dir).collect()
    assert len(rows) == 8
    names = {r.check_name for r in rows}
    assert len(names) == 8
    for r in rows:
        assert r.passed and r.n_violations == 0, r


def test_empty_relation_passes_all_checks(spark):
    """Zero rows = zero violations for every check type (the coalesce
    guards: an empty aggregate must not report NULL violations)."""
    empty = spark.createDataFrame([], "k long, x int")
    parent = spark.createDataFrame([(1,)], "pk long")
    for df in (
        Q.check_unique(empty, ["k"]),
        Q.check_not_null(empty, "x"),
        Q.check_range(empty, "x", 0, 10),
        Q.check_fk(empty, "k", parent, "pk"),
    ):
        r = df.first()
        assert r.n_violations == 0, r


def test_audit_composes_to_one_row_per_check(spark):
    a = spark.createDataFrame([(1,), (1,)], "k long")
    rep = Q.audit([Q.check_unique(a, ["k"]), Q.check_not_null(a, "k")])
    got = {r.check_name: (r.n_violations, r.passed) for r in rep.collect()}
    assert got == {"unique:k": (2, False), "not_null:k": (0, True)}
