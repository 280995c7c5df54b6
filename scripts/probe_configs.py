"""Full-registry configuration-robustness probe: every oracle-backed
queries() entry, full-value canon compare vs DuckDB, under one hostile
session config per invocation. The protocol behind COVERAGE.md's
"6 x 79/79 clean" claim — reproducible by anyone:

  python scripts/probe_configs.py <axis> [sf_dir]

Axes (each a distinct execution path the external driver, a cluster
default, or a future Spark version could put the engine on):
  ansi_off      spark.sql.ansi.enabled=false (Spark 4 default is ON)
  aqe_off       adaptive execution disabled (static plans)
  tiny          local[3] + shuffle.partitions=1 (degenerate layout)
  no_broadcast  autoBroadcastJoinThreshold=-1 (all joins SMJ/hash)
  no_codegen    wholeStage codegen off (interpreted expressions)
  tiny_arrow    arrow.maxRecordsPerBatch=7 (pandas-UDF kernels see
                many tiny batches — batch-boundary behavior)

Float compare uses 9-significant-digit formatting: tolerates the
merge-order ulp noise the registry's grid discipline already bounds,
catches anything larger.
"""

from __future__ import annotations

import os
import sys

import duckdb
from pyspark.sql import SparkSession

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

AXES = {
    "ansi_off": {"spark.sql.ansi.enabled": "false"},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "tiny": {"spark.sql.shuffle.partitions": "1"},
    "no_broadcast": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    "no_codegen": {"spark.sql.codegen.wholeStage": "false"},
    "tiny_arrow": {"spark.sql.execution.arrow.maxRecordsPerBatch": "7"},
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
)


def canon(rows) -> list[tuple]:
    out = []
    for r in rows:
        t = []
        for v in r:
            if isinstance(v, float):
                t.append("nan" if v != v else f"{v:.9g}")
            elif isinstance(v, int):
                t.append(repr(int(v)))
            else:
                t.append(repr(v))
        out.append(tuple(t))
    return sorted(out)


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in AXES:
        print(
            f"usage: python {sys.argv[0]} <axis> [sf_dir]\n"
            f"axes: {' '.join(sorted(AXES))}"
        )
        return 2
    cfg = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    master = "local[3]" if cfg == "tiny" else "local[8]"
    b = SparkSession.builder.appName(f"probe-{cfg}").master(master)
    for k, v in AXES[cfg].items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, REPO_ROOT)
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    bad = []
    for name in qs:
        if name not in osql:
            continue
        try:
            df = qs[name](spark, sf)
            got = canon(df.select(*sorted(df.columns)).collect())
            cols = df.columns
            want = canon(
                con.execute(
                    "SELECT " + ", ".join(sorted(cols)) + " FROM (" + osql[name] + ")"
                ).fetchall()
            )
            ok = got == want
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            ok = False
            print(f"{cfg} {name}: ERROR {ex}", flush=True)
        if not ok:
            bad.append(name)
    n_ok = len([n for n in qs if n in osql]) - len(bad)
    print(f"{cfg}: {n_ok} ok, bad={bad}")
    if bad:
        return 1
    print(f"PROBE-{cfg}-FULL-OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
