"""Compaction + clustering maintenance: file-count normalization, data
integrity, and min/max pruning evidence from parquet footers."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from inspectadb_spark.operators.maintenance import (
    compact,
    input_file_sizes,
    parquet_column_ranges,
)
from tests.conftest import SF_DIR


def _fragment(spark, tmp_path, n=48):
    frag = str(tmp_path / "frag")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").repartition(n) \
        .write.mode("overwrite").parquet(frag)
    return frag


def _n_files(path):
    return len(glob.glob(os.path.join(path, "*.parquet")))


def test_compact_normalizes_file_count_and_preserves_data(spark, tmp_path):
    frag = _fragment(spark, tmp_path)
    out = str(tmp_path / "compacted")
    total = sum(input_file_sizes(spark, spark.read.parquet(frag)))
    stats = compact(spark, frag, out, target_file_bytes=total)  # -> 1 file
    assert stats["files_in"] == 48 and stats["files_out"] == 1
    assert _n_files(out) == 1
    a = spark.read.parquet(frag).agg(
        F.count("*"), F.sum("o_orderkey")).collect()[0]
    b = spark.read.parquet(out).agg(
        F.count("*"), F.sum("o_orderkey")).collect()[0]
    assert tuple(a) == tuple(b)


def test_cluster_by_yields_disjoint_file_ranges(spark, tmp_path):
    frag = _fragment(spark, tmp_path)
    out = str(tmp_path / "clustered")
    total = sum(input_file_sizes(spark, spark.read.parquet(frag)))
    stats = compact(spark, frag, out, target_file_bytes=max(1, total // 8),
                    cluster_cols=["o_custkey"])
    assert stats["files_out"] >= 4
    ranges = sorted(parquet_column_ranges(out, "o_custkey"))
    assert len(ranges) >= 4
    # range clustering => pairwise disjoint key ranges => min/max pruning works
    for (_, prev_hi), (cur_lo, _) in zip(ranges, ranges[1:]):
        assert prev_hi < cur_lo, ranges
    # whereas the fragmented input files all straddle ~the full key range
    frag_ranges = sorted(parquet_column_ranges(frag, "o_custkey"))
    overlapping = sum(
        1 for (_, ph), (cl, _) in zip(frag_ranges, frag_ranges[1:]) if ph >= cl)
    assert overlapping == len(frag_ranges) - 1
