"""Strict oracle parity for round-13 optimization: run named registry
entries on Spark AND their DuckDB oracle at sf0.001/0.01/0.1 and compare
sorted rows EXACTLY (repr-level, no float tolerance) — the local
equivalent of the driver's rows+schema+hash gate. Any ulp drift a plan
change introduces shows up here as a FAIL.

Usage: python scripts/r13_oracle_check.py c01_decontamination c02_... [--sf 0.1]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _canon(v):
    import datetime
    import math

    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, bool):
        return str(int(v))
    return repr(v)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfs = SFS
    if "--sf" in sys.argv:
        want = sys.argv[sys.argv.index("--sf") + 1]
        sfs = [s for s in SFS if s.endswith("sf" + want)]

    import duckdb

    from kmeanwithmapreduce_spark.session import get_spark

    spark = get_spark("r13oracle")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()

    fails = 0
    for sf_dir in sfs:
        con = duckdb.connect()
        for t in os.listdir(sf_dir):
            if t.endswith(".parquet"):
                name = t[: -len(".parquet")]
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{t}'"
                )
        for name in args:
            sdf = queries[name](spark, sf_dir)
            srows = sorted(
                tuple(_canon(v) for v in row) for row in sdf.collect()
            )
            orows = sorted(
                tuple(_canon(v) for v in row)
                for row in con.execute(oracles[name]).fetchall()
            )
            ok = srows == orows
            if not ok:
                fails += 1
                print(f"FAIL {sf_dir} {name}: spark {len(srows)} rows vs "
                      f"oracle {len(orows)} rows")
                for a, b in list(zip(srows, orows))[:5]:
                    if a != b:
                        print(f"  spark  {a}\n  oracle {b}")
            else:
                print(f"ok   {sf_dir} {name} ({len(srows)} rows)")
        con.close()
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
