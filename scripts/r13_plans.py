"""Capture .explain("formatted") output for named registry entries into
plans/r13/<entry>_<tag>.txt — the before/after evidence files for the
round-13 optimization report.

Usage: python scripts/r13_plans.py <tag> [entry ...]
e.g.   python scripts/r13_plans.py before c01_decontamination d02_ngram_jaccard_pairs
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    from kmeanwithmapreduce_spark.plans.inspect import explain_str
    from kmeanwithmapreduce_spark.session import get_spark

    spark = get_spark("r13plans")
    spark.sparkContext.setLogLevel("ERROR")

    from kmeanwithmapreduce_spark.operators import ALL_QUERIES, EXTRA_QUERIES

    Q = {**ALL_QUERIES, **EXTRA_QUERIES}
    for name in names:
        df = Q[name][0](spark, sf_dir)
        plan = explain_str(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
