"""Smoke the driver contract exactly as the driver will: entry() runs
with >=0 rows and a stable schema; every queries() key resolves; every
oracle_sql() key exists in queries() and parses in DuckDB."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert [f.name for f in df.schema.fields] == [
        "cluster",
        "n_points",
        "c_quantity",
        "c_price_k",
        "c_discount",
        "c_tax",
    ]


def test_entry_deterministic(spark):
    a = sorted(map(tuple, entry_mod.entry(spark).collect()))
    b = sorted(map(tuple, entry_mod.entry(spark).collect()))
    assert a == b


def test_queries_and_oracles_consistent(spark, sf_dir):
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 35
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, sql in osql.items():
        con.execute(f"SELECT * FROM ({sql}) LIMIT 0")  # parses + binds


def test_kmeans_queries_run(spark, sf_dir):
    qs = entry_mod.queries()
    k01 = qs["k01_kmeans_lineitem"](spark, sf_dir)
    assert k01.count() == 4
    k02 = qs["k02_kmeans_compat"](spark, sf_dir)
    assert k02.count() >= 1


def test_k02_golden_row_oracle(spark, duck, sf_dir):
    """k02 is deterministic (injected init + compat mode), so its
    literal VALUES oracle must match value-for-value — the driver-side
    hash check for the flagship K-Means surface."""
    import math

    got = sorted(
        map(tuple, entry_mod.queries()["k02_kmeans_compat"](spark, sf_dir).collect())
    )
    want = sorted(map(tuple, duck.execute(entry_mod.K02_SQL).fetchall()))
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert (math.isnan(g[3]) and math.isnan(w[3])) or g[3] == w[3]


def test_k03_invariant_oracle(spark, duck, sf_dir):
    """k03 reports layout-invariant derived facts of the MLlib fit
    (total labeled rows == corpus count, 4 non-empty clusters, banded
    WSSE vs the engine's deterministic Lloyd), so since round 6 it
    carries a real VALUES-style oracle — the last driver row goes from
    rows-only to value-checked (50/50)."""
    got = entry_mod.queries()["k03_kmeans_mllib"](spark, sf_dir).collect()
    want = duck.execute(entry_mod.K03_SQL).fetchall()
    assert len(got) == len(want) == 1
    assert tuple(got[0]) == tuple(want[0])


def test_k01_golden_row_oracle(spark, duck, sf_dir):
    """k01 is deterministic since round 5 (partitioning-invariant
    hash-ordered init), so its VALUES oracle must match value-for-value
    at whatever sf the suite runs — the same gate the driver applies."""
    got = sorted(
        map(tuple, entry_mod.queries()["k01_kmeans_lineitem"](spark, sf_dir).collect())
    )
    want = sorted(map(tuple, duck.execute(entry_mod.K01_SQL).fetchall()))
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        assert g[:2] == w[:2]
        for gv, wv in zip(g[2:], w[2:]):
            assert gv == pytest.approx(wv, abs=1e-9)
