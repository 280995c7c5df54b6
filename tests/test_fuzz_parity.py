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
