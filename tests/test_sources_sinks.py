"""Sources & sinks: format round-trips (parquet/csv/json/orc),
partitioned writes with partition pruning, and the SQL catalog surface."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.plans import explain_str
from kmeanwithmapreduce_spark.sources.readers import load_table
from kmeanwithmapreduce_spark.sql import Q01_SPARK_SQL, run_sql


@pytest.fixture(scope="module")
def nation_df(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_formats(spark, nation_df, tmp_path_factory, fmt):
    out = str(tmp_path_factory.mktemp(f"rt_{fmt}"))
    nation_df.write.mode("overwrite").format(fmt).option("header", "true").save(out)
    reader = spark.read.format(fmt).option("header", "true")
    if fmt in ("json", "csv"):
        reader = reader.schema(nation_df.schema)
    back = reader.load(out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation_df.collect())
    )


def test_partitioned_write_prunes(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part"))
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)
    back = spark.read.parquet(out).where(F.col("o_year") == 1996)
    plan = explain_str(back)
    # partition pruning: only the 1996 directory is scanned
    assert "PartitionFilters: [isnotnull(o_year" in plan
    assert back.count() == o.where(F.col("o_year") == 1996).count()


def test_sql_surface_matches_dataframe(spark, sf_dir):
    from kmeanwithmapreduce_spark.operators.relational import q01_pricing_summary

    via_sql = run_sql(spark, sf_dir, Q01_SPARK_SQL)
    via_df = q01_pricing_summary(spark, sf_dir)
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_csv_points_reader_failfast_on_malformed(spark, tmp_path_factory):
    """Reference parity: a malformed field kills the job (the reference
    throws NumberFormatException, SURVEY §1.2); FAILFAST reproduces
    fail-on-malformed rather than silently nulling."""
    from kmeanwithmapreduce_spark.sources.readers import load_points_csv

    d = tmp_path_factory.mktemp("badpts")
    p = d / "bad.csv"
    p.write_text("1.0,2.0\nnot_a_number,4.0\n")
    df = load_points_csv(spark, str(p), dim=2)
    with pytest.raises(Exception, match="(?i)malformed|failfast|cannot"):
        df.collect()


def test_csv_points_reader(spark, tmp_path_factory):
    from kmeanwithmapreduce_spark.sources.readers import load_points_csv

    d = tmp_path_factory.mktemp("pts")
    p = d / "pts.csv"
    p.write_text("1.0,2.0,3.0\n4.0,5.0,6.0\n")
    df = load_points_csv(spark, str(p), dim=3)
    rows = sorted(r[0] for r in df.collect())
    assert rows == [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
    assert df.schema["features"].dataType.simpleString() == "array<float>"


def test_load_table_via_formats_roundtrip(spark, sf_dir):
    """The format-routed loader (q12's driver-level ORC/JSON check rides
    it) must reproduce the parquet rows exactly for every format."""
    from kmeanwithmapreduce_spark.sources.readers import load_table, load_table_via

    base = load_table(spark, sf_dir, "nation")
    want = sorted(map(tuple, base.collect()))
    for fmt in ("orc", "json", "csv"):
        got_df = load_table_via(spark, sf_dir, "nation", fmt)
        assert got_df.schema == base.schema, fmt
        assert sorted(map(tuple, got_df.collect())) == want, fmt


def test_load_table_via_cache_invalidates_on_source_change(spark, sf_dir, tmp_path):
    """The /tmp format cache must key on the SOURCE file's identity:
    upstream testdata is regenerated between driver rounds, and a stale
    cached copy would silently diverge from the fresh parquet."""
    import shutil

    from kmeanwithmapreduce_spark.sources.readers import load_table_via

    d = tmp_path / "sfx"
    d.mkdir()
    src = str(d / "nation.parquet")
    shutil.copyfile(f"{sf_dir}/nation.parquet", src)
    n1 = load_table_via(spark, str(d), "nation", "json").count()
    # simulate a driver regeneration: same path, new mtime
    os.utime(src, (os.path.getmtime(src) + 1000, os.path.getmtime(src) + 1000))
    import glob as _glob

    from kmeanwithmapreduce_spark.sources.readers import _FMT_CACHE_ROOT

    before = set(_glob.glob(os.path.join(_FMT_CACHE_ROOT, "sfx_nation_json_*")))
    n2 = load_table_via(spark, str(d), "nation", "json").count()
    after = set(_glob.glob(os.path.join(_FMT_CACHE_ROOT, "sfx_nation_json_*")))
    assert n1 == n2
    assert len(after) > len(before)  # a fresh cache entry was materialized


def test_load_table_via_dates_and_doubles(spark, sf_dir):
    """orders carries DATE + DOUBLE columns — the types JSON text
    round-trips can silently corrupt; schema'd read must be exact."""
    from kmeanwithmapreduce_spark.sources.readers import load_table, load_table_via

    base = load_table(spark, sf_dir, "orders")
    got = load_table_via(spark, sf_dir, "orders", "json")
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b


def test_avro_probe_and_roundtrip(spark, sf_dir, tmp_path):
    """Real round-trip when the spark-avro jar is present; without it,
    ONE clear error (not Spark's data-source-not-found stack). Stops
    skipping the moment the jar resolves — the Kafka-probe pattern."""
    from kmeanwithmapreduce_spark.sources.avro import (
        avro_available,
        read_avro,
        write_avro,
    )

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_avro")
    if avro_available(spark):
        write_avro(nation, path)
        back = read_avro(spark, path)
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, nation.collect())
        )
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            write_avro(nation, path)
        pytest.skip("spark-avro jar absent; clear-error path verified")
