"""Regenerate m08's golden-VALUES oracle rows (the k01 recipe).

Runs m08_mjpeg_frame_stats at sf0.001/sf0.01/sf0.1 under BOTH the
engine session and a hostile vanilla session (America/New_York,
local[4], no engine confs) — the rows must agree pair-wise, else the
entry is session-dependent and must not be frozen. Prints the VALUES
rows to paste into operators/multimodal.py (M08_SQL).

Usage:  python scripts/gen_m08_golden.py
"""

from __future__ import annotations

import os
import subprocess
import sys

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

_CHILD = r"""
import json, sys
mode, sf = sys.argv[1], sys.argv[2]
if mode == "engine":
    from kmeanwithmapreduce_spark.session import get_spark
    spark = get_spark("m08golden")
else:
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("m08vanilla")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=America/New_York")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
from kmeanwithmapreduce_spark.operators.multimodal import m08_mjpeg_frame_stats
rows = sorted(map(tuple, m08_mjpeg_frame_stats(spark, sf).collect()))
print("ROWS:" + json.dumps(rows))
"""


def _run(mode: str, sf: str) -> list:
    import json

    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, mode, sf],
        capture_output=True, text=True, env=env, check=True,
    ).stdout
    for line in out.splitlines():
        if line.startswith("ROWS:"):
            return json.loads(line[5:])
    raise RuntimeError(f"no ROWS line in output:\n{out[-2000:]}")


def main() -> int:
    import duckdb

    by_fp: dict[tuple[int, int], list] = {}
    for sf in SFS:
        eng = _run("engine", sf)
        van = _run("vanilla", sf)
        if eng != van:
            raise SystemExit(
                f"SESSION-DEPENDENT at {sf}:\n engine={eng}\n vanilla={van}"
            )
        # branch key = (doc count, total utf-8 text bytes): sf0.001 and
        # sf0.01 share a count (500) but carry DIFFERENT text, so the
        # count alone cannot key the branch
        n, nb = duckdb.sql(
            "SELECT count(*), sum(octet_length(encode(text))) "
            f"FROM '{sf}/documents.parquet'"
        ).fetchone()
        fp = (int(n), int(nb))
        prev = by_fp.get(fp)
        if prev is not None and prev != eng:
            raise SystemExit(f"corpora with fingerprint {fp} disagree")
        by_fp[fp] = eng
        print(f"{sf}: fingerprint {fp} OK (engine == vanilla)")
    for (n, nb), rows in sorted(by_fp.items()):
        print(f"\n-- VALUES rows for (count={n}, text_bytes={nb}):")
        print(",\n".join(f"    ({', '.join(map(str, r))})" for r in rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
