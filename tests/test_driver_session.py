"""The external driver builds its own SparkSession with default configs;
the engine must self-heal (nanos timestamps, UTC timezone). Simulated in
a subprocess with a vanilla session."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

# vanilla session: no engine configs, hostile timezone
spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-driver")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as e

df = e.entry(spark)
assert df.count() > 0

sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

qs, osql = e.queries(), e.oracle_sql()
# the events-based, timestamp-emitting queries are the ones a hostile
# session breaks; check full values on one of each shape
for name in ["w01_tumbling", "q17_monthly_trend", "q19_sessionization",
             "j02_range_join_campaigns", "j01_asof_last_purchase", "w03_session"]:
    got = sorted(map(str, qs[name](spark, sf).collect()))
    n_want = len(con.execute(osql[name]).fetchall())
    assert len(got) == n_want, (name, len(got), n_want)
got = {(r[0].isoformat(), r[1]): r[2] for r in qs["w01_tumbling"](spark, sf).select("window_start","event_type","n").collect()}
want = {(r[0].isoformat(), r[1]): r[2] for r in con.execute("SELECT window_start, event_type, n FROM (" + osql["w01_tumbling"] + ")").fetchall()}
assert got == want, "timestamp values diverge under hostile timezone"
print("DRIVER-SESSION-OK")
"""


def test_vanilla_driver_session(tmp_path):
    p = tmp_path / "driver_sim.py"
    p.write_text(SCRIPT)
    res = subprocess.run(
        [sys.executable, str(p)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )
    assert "DRIVER-SESSION-OK" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]
