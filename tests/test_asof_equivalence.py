"""The two as-of formulations (window last_value vs grouped merge_asof)
must agree — they are the single-table and two-table scale paths for the
same operator."""

from __future__ import annotations

from kmeanwithmapreduce_spark.operators.joins_advanced import (
    j01_asof_last_purchase,
    j04_asof_merge_grouped,
)


def test_asof_formulations_agree(spark, sf_dir):
    a = {
        r["event_id"]: r["last_purchase_value"]
        for r in j01_asof_last_purchase(spark, sf_dir).collect()
    }
    b = {
        r["event_id"]: r["last_purchase_value"]
        for r in j04_asof_merge_grouped(spark, sf_dir).collect()
    }
    assert set(a) == set(b)
    diffs = {k for k in a if a[k] != b[k] and not (a[k] is None and b[k] is None)}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {sorted(diffs)[:3]}"
