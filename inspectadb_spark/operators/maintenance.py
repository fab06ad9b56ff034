"""Table maintenance for 100 TB parquet estates: small-file compaction and
range clustering (the OPTIMIZE / CLUSTER BY counterpart of the reference's
storage maintenance; see SURVEY.md §2.2a sinks + §4 scale notes).

Small files are the classic large-cluster failure mode: a 100 TB table
written by 10k reducers in daily increments becomes millions of sub-MB
files, and every downstream scan pays listing + open + footer overhead per
file. Compaction rewrites a prefix-stable directory to ~target-sized files;
clustering additionally range-partitions and sorts on the query columns so
parquet row-group min/max statistics prune scans (the engine-side analog of
a coarse index).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def input_file_sizes(spark: SparkSession, df: DataFrame) -> list[int]:
    """Byte sizes of the files backing ``df``'s scan, via the Hadoop FS API
    (works for file://, hdfs://, s3a:// alike — driver-side metadata only,
    no data read)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    sizes = []
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(conf)
        sizes.append(fs.getFileStatus(p).getLen())
    return sizes


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    cluster_cols: list[str] | None = None,
) -> dict:
    """Rewrite a parquet directory to ~``target_file_bytes`` files.

    Without ``cluster_cols`` the rewrite is a plain round-robin repartition
    (pure size normalization). With them, rows are range-partitioned AND
    sorted on those columns, so each output file covers a tight, disjoint
    key range — parquet min/max stats then let any engine skip files whose
    range misses the predicate.

    Returns {files_in, bytes_in, files_out, target} for audit logging.
    """
    df = spark.read.parquet(in_path)
    sizes = input_file_sizes(spark, df)
    total = sum(sizes)
    n = max(1, math.ceil(total / target_file_bytes))
    if cluster_cols:
        out = df.repartitionByRange(n, *cluster_cols) \
            .sortWithinPartitions(*cluster_cols)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(out_path)
    return {
        "files_in": len(sizes),
        "bytes_in": total,
        "files_out": n,
        "target": target_file_bytes,
    }


def parquet_column_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` from parquet footer statistics —
    the metadata a scan planner uses for file/row-group pruning. Pure
    pyarrow, no Spark job."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(_glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(
                next(i for i in range(md.num_columns)
                     if md.row_group(rg).column(i).path_in_schema == column))
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            ranges.append((lo, hi))
    return ranges


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16):
    """Morton (Z-order) key over numeric columns: each column is scaled to a
    ``bits``-wide integer rank of its [min, max] span, then the bit planes
    are interleaved. Files clustered by this key get tight min/max ranges on
    EVERY participating column simultaneously (vs. linear sort: tight on the
    first column only) — the multi-column data-skipping trade.

    Column spans come from one tiny min/max aggregation; the key itself is a
    pure codegen expression (shifts and ORs), so the rewrite adds no Python
    and no extra shuffle beyond the range repartition.
    """
    from pyspark.sql import functions as F

    span = df.agg(*[f for c in cols for f in
                    (F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}"))]).collect()[0]
    z = F.lit(0).cast("bigint")
    for ci, c in enumerate(cols):
        lo, hi = float(span[f"_lo_{c}"]), float(span[f"_hi_{c}"])
        width = (hi - lo) or 1.0
        scaled = F.least(
            F.lit((1 << bits) - 1),
            ((F.col(c).cast("double") - F.lit(lo)) / F.lit(width)
             * F.lit((1 << bits) - 1)).cast("bigint"),
        )
        for b in range(bits):
            # bit b of column ci lands at interleaved position b*len(cols)+ci
            z = z + F.shiftleft(
                F.shiftright(scaled, b).bitwiseAND(F.lit(1)),
                b * len(cols) + ci,
            )
    return z


def compact_zorder(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    zorder_cols: list[str],
    target_file_bytes: int = 128 << 20,
    bits: int = 16,
) -> dict:
    """Size-targeted rewrite clustered on a Morton key of ``zorder_cols`` —
    every output file covers a tight range of EACH column, so predicates on
    any of them prune files. Same audit dict as ``compact``."""
    import math

    df = spark.read.parquet(in_path)
    sizes = input_file_sizes(spark, df)
    n = max(1, math.ceil(sum(sizes) / target_file_bytes))
    z = zorder_value(df, zorder_cols, bits)
    (df.withColumn("_z", z)
       .repartitionByRange(n, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(out_path))
    return {"files_in": len(sizes), "bytes_in": sum(sizes),
            "files_out": n, "target": target_file_bytes}
