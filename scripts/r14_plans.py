"""Dump .explain('formatted') for the round-14 touched entries.

Usage: python scripts/r14_plans.py <outdir> <suffix> [entry ...]
Writes <outdir>/<entry>_<suffix>.txt for each entry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "d02_ngram_jaccard_pairs",
    "d03_minhash_lsh_pairs",
    "d04_simhash",
    "c04_chunking",
    "j02_range_join_campaigns",
    "v07_schema_evolution",
]


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kmeanwithmapreduce_spark.session import get_spark

    spark = get_spark("r14_plans")
    spark.sparkContext.setLogLevel("ERROR")

    from kmeanwithmapreduce_spark.operators import ALL_QUERIES, EXTRA_QUERIES

    Q = {**ALL_QUERIES, **EXTRA_QUERIES}
    for name in names:
        df = Q[name][0](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(path, len(txt.splitlines()), "lines")
    return 0


if __name__ == "__main__":
    sys.exit(main())
