from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_001 = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "exhaustive(twin): cross-surface duplicate of a contract that a "
        "named surviving test still pins — skipped by default so the "
        "driver's verify finishes inside its time budget (round-14 "
        "VERDICT item 2); set SPARK_GRAFT_FULL_SUITE=1 to run them "
        "(the builder's round-close sweep does)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_SUITE"):
        return
    skip = pytest.mark.skip(
        reason="duplicate-contract test (see its exhaustive marker for "
        "the surviving twin); SPARK_GRAFT_FULL_SUITE=1 runs it"
    )
    for item in items:
        if item.get_closest_marker("exhaustive") is not None:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from kmeanwithmapreduce_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()
