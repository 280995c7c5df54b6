"""Seeded randomized differential testing vs the DuckDB oracle
(fuzz_gen.py): N generated queries per run, each built as a DataFrame
chain AND rendered to SQL, value-compared with the same discipline as
the 50-query registry gate (test_oracle_parity._compare).

The registry is a regression floor; this sweep is the frontier — the
test class that catches the next NTZ-style cross-engine semantic drift
anywhere in the composed surface before the driver does.

Reproduction: every query's identity is (SPARK_GRAFT_FUZZ_SEED, index);
a failure prints both plus the SQL text. Re-run just that query with
  SPARK_GRAFT_FUZZ_SEED=<seed> SPARK_GRAFT_FUZZ_ONLY=<index> pytest ...
Env knobs: SPARK_GRAFT_FUZZ_N (default 200), SPARK_GRAFT_FUZZ_SEED
(default 20260814 — fixed so CI is reproducible run-to-run).
"""

from __future__ import annotations

import os

import pytest

from fuzz_gen import FuzzGen, load_domains
from test_oracle_parity import _compare

N = int(os.environ.get("SPARK_GRAFT_FUZZ_N", "200"))
SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260814"))
ONLY = os.environ.get("SPARK_GRAFT_FUZZ_ONLY")


@pytest.fixture(scope="module")
def domains(duck):
    return load_domains(duck)


def _run_one(spark, duck, sf_dir, domains, idx: int) -> str:
    # one generator per query, seeded by (SEED, idx): any query replays
    # alone without generating its predecessors
    gen = FuzzGen(SEED * 1_000_003 + idx, domains)
    build, sql = gen.query()
    try:
        got = build(spark, sf_dir).toPandas()
        want = duck.execute(sql).fetchdf()
        _compare(got, want, f"fuzz[{idx}]")
    except AssertionError as exc:
        raise AssertionError(
            f"fuzz query #{idx} (seed {SEED}) diverged:\n  SQL: {sql}\n  {exc}"
        ) from exc
    except Exception as exc:
        raise RuntimeError(
            f"fuzz query #{idx} (seed {SEED}) failed to execute:\n  SQL: {sql}"
        ) from exc
    return sql


def test_fuzz_parity_sweep(spark, duck, sf_dir, domains):
    """N seeded random queries, every one value-equal across engines.
    Runs as ONE test so Spark job overhead amortizes; failures identify
    the exact query for solo replay."""
    if ONLY is not None:
        _run_one(spark, duck, sf_dir, domains, int(ONLY))
        return
    shapes: dict[str, int] = {}
    for idx in range(N):
        sql = _run_one(spark, duck, sf_dir, domains, idx)
        head = sql.split(" ", 2)[1] if sql.startswith("SELECT DISTINCT") else (
            "window" if " OVER (" in sql
            else "setop" if any(k in sql for k in (" UNION ", " INTERSECT ", " EXCEPT "))
            else "agg" if " GROUP BY " in sql or "count(*)" in sql
            else "projection"
        )
        shapes[head] = shapes.get(head, 0) + 1
    # the sweep must actually exercise every shape class, not collapse
    # into one corner of the grammar
    assert len(shapes) >= 3, shapes


def test_fuzz_generator_is_deterministic(duck, domains):
    """Same (seed, idx) → same SQL text: reproduction contract."""
    for idx in (0, 7, 123):
        a = FuzzGen(SEED * 1_000_003 + idx, domains).query()[1]
        b = FuzzGen(SEED * 1_000_003 + idx, domains).query()[1]
        assert a == b


def test_duckdb_rollup_join_equivalence_divergence(spark, duck):
    """Characterized divergence (seed 95959, idx 125): DuckDB 1.0.0
    propagates a join equality INTO grouping-set NULL-extension —
    ROLLUP(x, y) over `a JOIN b ON x = y` fills the rolled-away y with
    x's value in subtotal rows, where the standard (PostgreSQL, Spark's
    Expand) emits NULL. Pinned on a minimal case so a future DuckDB
    upgrade that fixes it fails HERE (then re-allow join-equated rollup
    keys in the grammar, fuzz_gen._q_aggregation)."""
    sql = """
    WITH a(x) AS (VALUES (1), (2)), b(y) AS (VALUES (1), (2))
    SELECT x, y, count(*) AS c FROM a JOIN b ON x = y
    GROUP BY ROLLUP (x, y)
    """
    duck_rows = sorted(
        duck.execute(sql).fetchall(), key=lambda r: (r[0] is None, r)
    )
    # DuckDB: subtotal rows carry y = x (no NULL-extended y at all)
    assert duck_rows == [(1, 1, 1), (1, 1, 1), (2, 2, 1), (2, 2, 1), (None, None, 2)]
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(1,), (2,)], "x int")
    b = spark.createDataFrame([(1,), (2,)], "y int")
    got = sorted(
        map(
            tuple,
            a.join(b, F.col("x") == F.col("y"))
            .rollup("x", "y")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect(),
        ),
        key=lambda r: (r[0] is None, r[0] or 0, r[1] is None, r[1] or 0),
    )
    # Spark: standard NULL-extension — the (x, NULL) subtotals exist
    assert got == [
        (1, 1, 1), (1, None, 1), (2, 2, 1), (2, None, 1), (None, None, 2)
    ]
