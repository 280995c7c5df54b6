"""Regenerate t14's golden-VALUES oracle rows (the t13/k01 recipe).

Runs t14_unigram_subword_stats at sf0.001/sf0.01/sf0.1 under BOTH the
engine session and a hostile vanilla session (America/New_York,
local[4], no engine confs) — the rows must agree pair-wise, else the
entry is session-dependent and must not be frozen. Prints the VALUES
rows to paste into operators/subword.py (T14_SQL).

Usage:  python scripts/gen_t14_golden.py [t14|t15]

t15 (round 13) is the same surface with prune_by='loss' — the rows
paste into T15_SQL instead.
"""

from __future__ import annotations

import os
import subprocess
import sys

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

_CHILD = r"""
import json, sys
mode, sf, entry = sys.argv[1], sys.argv[2], sys.argv[3]
if mode == "engine":
    from kmeanwithmapreduce_spark.session import get_spark
    spark = get_spark("t14golden")
else:
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("t14vanilla")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=America/New_York")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
from kmeanwithmapreduce_spark.operators import subword
fn = {"t14": subword.t14_unigram_subword_stats,
      "t15": subword.t15_unigram_loss_prune_stats}[entry]
rows = sorted(map(tuple, fn(spark, sf).collect()))
print("ROWS:" + json.dumps(rows))
"""


def _run(mode: str, sf: str, entry: str) -> list:
    import json

    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, mode, sf, entry],
        capture_output=True, text=True, env=env, check=True,
    ).stdout
    for line in out.splitlines():
        if line.startswith("ROWS:"):
            return json.loads(line[5:])
    raise RuntimeError(f"no ROWS line for {mode} {sf}")


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    entry = sys.argv[1] if len(sys.argv) > 1 else "t14"
    for sf in SFS:
        eng = _run("engine", sf, entry)
        van = _run("vanilla", sf, entry)
        ok = eng == van
        print(f"\n== {sf} agree={ok}")
        if not ok:
            print(" engine :", eng)
            print(" vanilla:", van)
            return 1
        rows = ",\n    ".join(
            "(" + ", ".join(
                repr(v) if isinstance(v, str) else str(v) for v in r
            ) + ")"
            for r in eng
        )
        print("    " + rows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
