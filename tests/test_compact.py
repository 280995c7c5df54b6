"""Small-file compaction (sources/compact.py): data-lossless rewrite,
file-count math from real on-disk bytes, and even output sizing."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.compact import compact_parquet


def _fragmented(spark, path: str, n_files: int = 200):
    """Write a deliberately fragmented dataset: n_files tiny parquet
    files of 30 rows each."""
    df = spark.range(n_files * 30).select(
        F.col("id"), (F.col("id") * 2).alias("v"), F.md5(F.col("id").cast("string")).alias("h")
    )
    df.repartition(n_files).write.parquet(path)
    return df


def test_compact_reduces_file_count_losslessly(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = _fragmented(spark, src)
    stats = compact_parquet(spark, src, dst, target_file_bytes=512 * 1024)
    assert stats.n_files_before == 200
    assert stats.n_files_after < stats.n_files_before / 10
    assert stats.n_rows == 200 * 30
    # lossless: identical row multiset
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b


def test_compact_file_count_follows_target(spark, tmp_path):
    """Halving the target must not reduce the output file count, and the
    count equals ceil(bytes/target) exactly."""
    src = str(tmp_path / "frag")
    _fragmented(spark, src, n_files=60)
    sizes = {}
    for i, target in enumerate((1 << 20, 64 * 1024)):
        dst = str(tmp_path / f"out{i}")
        st = compact_parquet(spark, src, dst, target_file_bytes=target)
        want = max(1, -(-st.bytes_before // target))
        assert st.n_files_after == want, (target, st)
        sizes[target] = st.n_files_after
    assert sizes[64 * 1024] >= sizes[1 << 20]


def test_compact_output_sizes_are_even(spark, tmp_path):
    """Round-robin repartition (vs coalesce) is there to even out skew:
    max output file must be < 2x the min (tiny-row tolerance)."""
    src = str(tmp_path / "frag")
    _fragmented(spark, src)
    dst = str(tmp_path / "out")
    st = compact_parquet(spark, src, dst, target_file_bytes=256 * 1024)
    files = [
        os.path.getsize(p)
        for p in glob.glob(dst + "/part-*.parquet")
    ]
    assert len(files) == st.n_files_after and len(files) >= 2
    assert max(files) < 2 * min(files), files


def test_compact_refuses_overwrite_and_bad_target(spark, tmp_path):
    src = str(tmp_path / "frag")
    _fragmented(spark, src, n_files=5)
    dst = str(tmp_path / "out")
    compact_parquet(spark, src, dst, target_file_bytes=1 << 20)
    with pytest.raises(Exception):
        compact_parquet(spark, src, dst, target_file_bytes=1 << 20)  # exists
    with pytest.raises(ValueError):
        compact_parquet(spark, src, str(tmp_path / "x"), target_file_bytes=0)


def test_compact_inherits_stats_sidecar(spark, tmp_path):
    """Compaction must not downgrade a skipping-enabled dataset to
    full scans: an input sidecar's columns re-harvest onto the output
    (from the fresh footers — no extra data pass), and the compacted
    sidecar prunes correctly."""
    from kmeanwithmapreduce_spark.sources.stats import (
        collect_file_stats,
        pruned_files,
        read_file_stats,
        write_file_stats,
    )

    src = str(tmp_path / "frag")
    _fragmented(spark, src, n_files=6)
    write_file_stats(spark, src, ["id"])
    dst = str(tmp_path / "out")
    compact_parquet(spark, src, dst, target_file_bytes=256 * 1024)
    st = read_file_stats(spark, dst)
    assert st is not None and list(st["columns"]) == ["id"]
    assert st == collect_file_stats(spark, dst, ["id"])  # exact harvest
    keep, total = pruned_files(spark, dst, "id", lower=-10, upper=-1)
    assert total >= 1 and keep == []  # all-negative range prunes all
    # no input sidecar -> no output sidecar (inherit finds nothing)
    src2 = str(tmp_path / "frag2")
    _fragmented(spark, src2, n_files=3)
    dst2 = str(tmp_path / "out2")
    compact_parquet(spark, src2, dst2, target_file_bytes=1 << 20)
    assert read_file_stats(spark, dst2) is None
    # explicit columns override
    dst3 = str(tmp_path / "out3")
    compact_parquet(
        spark, src2, dst3, target_file_bytes=1 << 20, stats_columns=["id"]
    )
    assert read_file_stats(spark, dst3) is not None
