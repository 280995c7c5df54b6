"""Round-14 optimization internals: the fsutil local read-only fast
paths (local_path / fs_exists / fs_list_names / read_json), the shared
SQL-identifier quoting helper, and the upsert_table one-job
touched-buckets + NULL-delete fold.

These guard behavior equivalence, not speed: every fast path must
answer exactly what the Hadoop-FS path answers."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.fsutil import (
    fs_exists,
    fs_list_names,
    local_path,
    read_json,
    write_json,
)


def test_local_path_schemes(spark, tmp_path):
    # bare local path and file: URI resolve; remote schemes do not
    p = str(tmp_path / "x")
    assert local_path(spark, p) == p
    assert local_path(spark, f"file://{p}") == p
    assert local_path(spark, "hdfs://nn/x") is None
    assert local_path(spark, "s3a://bucket/x") is None


def test_fs_probes_match_hadoop(spark, tmp_path):
    d = tmp_path / "t"
    d.mkdir()
    (d / "epoch=0").mkdir()
    (d / "epoch=0" / "_SUCCESS").write_text("")
    (d / "stray.txt").write_text("x")
    assert fs_exists(spark, str(d / "epoch=0" / "_SUCCESS"))
    assert not fs_exists(spark, str(d / "epoch=1"))
    assert sorted(fs_list_names(spark, str(d))) == ["epoch=0", "stray.txt"]
    assert fs_list_names(spark, str(tmp_path / "missing")) == []


def test_read_json_fastpath_and_tmp_rescue(spark, tmp_path):
    p = str(tmp_path / "meta.json")
    write_json(spark, p, {"a": 1})
    assert read_json(spark, p) == {"a": 1}
    # torn-window rescue: destination gone, .tmp complete
    os.rename(p, p + ".tmp")
    assert read_json(spark, p) == {"a": 1}
    # unreadable/partial main file -> None (both backends agree)
    os.rename(p + ".tmp", p)
    with open(p, "w") as fh:
        fh.write('{"a": 1')  # truncated
    assert read_json(spark, p) is None
    assert read_json(spark, str(tmp_path / "absent.json")) is None


def test_quote_ident_escapes_backticks():
    from kmeanwithmapreduce_spark.functions.vector import quote_ident

    assert quote_ident("features") == "`features`"
    assert quote_ident("we`ird") == "`we``ird`"


def test_quoted_feature_col_parses(spark):
    # a backticked column name must survive the SQL-twin path end to end
    from kmeanwithmapreduce_spark.kmeans.core import _assign_expr_path

    df = spark.createDataFrame(
        [([1.0, 2.0],), ([5.0, 5.0],)], "`fe``at` array<float>"
    )
    got = _assign_expr_path(df, [[1.0, 2.0], [5.0, 5.0]], "fe`at")
    assert [r.cluster for r in got.orderBy("cluster").collect()] == [0, 1]


def test_upsert_null_delete_still_refuses(spark, tmp_path):
    # the NULL-delete guard now rides the touched-buckets job; the
    # refusal contract is unchanged
    from kmeanwithmapreduce_spark.sources.table import (
        create_bucketed_table,
        upsert_table,
    )

    base = str(tmp_path / "tbl")
    d = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    create_bucketed_table(d, base, "k", n_buckets=4)
    bad = spark.createDataFrame([(None,), (1,)], "k long")
    with pytest.raises(ValueError, match="NULL k"):
        upsert_table(
            spark.createDataFrame([(2, "b2")], "k long, v string"),
            base,
            deletes=bad,
        )
    # and a clean merge still lands: delete 1, update 2
    ep = upsert_table(
        spark.createDataFrame([(2, "b2")], "k long, v string"),
        base,
        deletes=spark.createDataFrame([(1,)], "k long"),
    )
    from kmeanwithmapreduce_spark.sources.table import read_bucketed_table

    rows = sorted(
        (r.k, r.v) for r in read_bucketed_table(spark, base, as_of=ep).collect()
    )
    assert rows == [(2, "b2")]


def test_merge_changeset_guard(spark):
    from kmeanwithmapreduce_spark.operators.versioning import merge_changeset

    old = spark.createDataFrame([(1, "a", "x")], "k long, v string, w string")
    new = spark.createDataFrame([(1, "a", "y")], "k long, v string, w string")
    # covered: fine
    changed, removed = merge_changeset(old, new, "k", ["v", "w"])
    assert [r.k for r in changed.collect()] == [1]
    # uncovered column: loud refusal, not silent wrong MERGE inputs
    with pytest.raises(ValueError, match="uncovered"):
        merge_changeset(old, new, "k", ["v"])


def test_cc_observe_signature_matches_standalone(spark):
    # the observed convergence signature must equal the standalone
    # one-pass signature on the same edge set
    from kmeanwithmapreduce_spark.operators.corpus import (
        _edge_signature,
        _signature_aggs,
    )
    from pyspark.sql import Observation

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (2, 1)], "u long, v long"
    )
    obs = Observation()
    e.observe(obs, *_signature_aggs()).localCheckpoint(eager=True)
    m = obs.get
    assert (m["n"], m["h"], m["h2"], m["su"], m["sv"]) == _edge_signature(e)
