"""File-format sources & sinks beyond parquet: CSV / JSON / ORC, partitioned
layouts, and schema-drift-tolerant reads (SURVEY.md §2.2a, §2.2j).

Engine rule (§1 data model): production paths always pass an explicit
``StructType``; inference is a dev convenience only — at 100 TB a schema
inference pass is a full extra scan of the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


# -- schema-explicit readers --------------------------------------------------

def read_csv(spark: SparkSession, path: str, schema: StructType,
             header: bool = True, **options: str) -> DataFrame:
    return spark.read.options(header=str(header).lower(), **options).schema(
        schema
    ).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType,
              **options: str) -> DataFrame:
    return spark.read.options(**options).schema(schema).json(path)


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    # ORC embeds its schema; no explicit StructType needed
    return spark.read.options(**options).orc(path)


def read_xml(spark: SparkSession, path: str, schema: StructType,
             row_tag: str = "row", **options: str) -> DataFrame:
    """Spark 4's built-in XML source (schema-explicit, per the engine rule).
    ``rowTag`` picks the repeated element that becomes one row."""
    return (
        spark.read.format("xml")
        .options(rowTag=row_tag, **options)
        .schema(schema)
        .load(path)
    )


# -- sinks --------------------------------------------------------------------

def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str],
    fmt: str = "parquet", mode: str = "overwrite",
) -> None:
    """Partition-pruned layout: Catalyst turns filters on ``partition_cols``
    into directory pruning (zero I/O for skipped partitions). At 100 TB pick
    columns with bounded cardinality (date, region) — thousands of
    partitions, not millions — and pair with sorted-within-partition writes
    for rowgroup skipping."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def roundtrip(df: DataFrame, path: str, fmt: str) -> DataFrame:
    """Write ``df`` then read it back with the SAME explicit schema — the
    ETL identity check (q51/q55 family). CSV needs timestamp/format pinning
    to survive the text roundtrip; we write ISO-µs explicitly."""
    spark = df.sparkSession
    if fmt == "csv":
        (
            df.write.mode("overwrite")
            .options(header="true", timestampNTZFormat="yyyy-MM-dd HH:mm:ss.SSSSSS")
            .csv(path)
        )
        return read_csv(
            spark, path, df.schema,
            **{"timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
        )
    if fmt == "json":
        (
            df.write.mode("overwrite")
            .options(timestampNTZFormat="yyyy-MM-dd HH:mm:ss.SSSSSS")
            .json(path)
        )
        return read_json(
            spark, path, df.schema,
            **{"timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
        )
    if fmt == "orc":
        df.write.mode("overwrite").orc(path)
        return read_orc(spark, path)
    if fmt == "xml":
        (
            df.write.mode("overwrite").format("xml")
            .options(rowTag="row", rootTag="rows",
                     timestampNTZFormat="yyyy-MM-dd HH:mm:ss.SSSSSS")
            .save(path)
        )
        return read_xml(
            spark, path, df.schema,
            **{"timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"},
        )
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
    raise ValueError(f"unsupported format: {fmt}")


# -- schema drift (CDC "automation" requirement, §2.2j) -----------------------

def read_with_drift(
    spark: SparkSession, paths: Sequence[str], target_schema: StructType
) -> DataFrame:
    """Read parquet written under evolving (additive) schemas and present
    exactly ``target_schema``: union-merge the file schemas (``mergeSchema``),
    then a cast layer fills absent columns with typed NULLs and casts
    drifted-but-compatible types. Columns unknown to the target are dropped.

    This is the batch half of CDC schema-drift tolerance: upstream adds a
    column mid-stream, downstream keeps a stable contract."""
    merged = spark.read.option("mergeSchema", "true").parquet(*paths)
    cols = []
    have = {f.name for f in merged.schema.fields}
    for f in target_schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return merged.select(*cols)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None,
                      max_bytes: int | None = None) -> DataFrame:
    """Multimodal raw-asset ingest via the built-in ``binaryFile`` source:
    (path, modificationTime, length, content BINARY).

    This is the 100 TB image/audio ingest front door: each file becomes one
    row with its bytes as an opaque binary column, ready for
    ``operators.multimodal`` decode/feature UDFs. Listing is distributed by
    the source; ``glob`` prunes at listing time (never read-then-filter) and
    ``max_bytes`` guards executors against pathological oversized assets —
    the length predicate is evaluated from file metadata, before content is
    fetched.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        from pyspark.sql import functions as F

        df = df.filter(F.col("length") <= max_bytes)
    return df


# -- corrupt-record quarantine ingest ----------------------------------------
#
# At 100 TB malformed lines are routine (truncated uploads, mixed encodings,
# producer bugs); dropping them silently corrupts accounting and FAILFAST
# kills a day-long job on one bad byte. The quarantine readers keep the
# pipeline TOTAL-PRESERVING: every input line lands in exactly one of
# (good, quarantined), the quarantined side keeps the raw bytes for replay,
# and both sides are plain scans — no cache, no second parse of good rows.
# Implementation note: the line source is read as text and parsed with
# from_json / from_csv carrying a corrupt-record column; this sidesteps
# Spark's restriction on querying only the internal corrupt column of a
# raw JSON/CSV scan, and keeps the split a single codegen projection.
# Contract: line-delimited sources (JSON Lines / one CSV record per line).

def quarantine_split_lines(
    lines: DataFrame,
    schema: StructType,
    fmt: str = "json",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """The quarantine split as a PURE transformation over a ``value``
    line DataFrame — shared by the batch readers below and streaming
    foreachBatch (S54): the split works identically on a micro-batch, so
    batch ≡ stream holds by construction."""
    from pyspark.sql.types import StringType

    qschema = StructType(schema.fields[:]).add("_corrupt_record", StringType())
    opts = {"mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": "_corrupt_record", **options}
    if fmt == "json":
        parsed = F.from_json("value", qschema, opts)
    elif fmt == "csv":
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in qschema.fields)
        parsed = F.from_csv("value", F.lit(ddl), opts)
    else:
        raise ValueError(f"unsupported line format: {fmt!r}")
    tagged = lines.select(F.col("value"), parsed.alias("_j"))
    # blank/whitespace-only lines are malformed records, not invisible:
    # they QUARANTINE (dropping them would break the total-preserving
    # contract, and from_csv('') even parses to a silent all-null "good"
    # row with no corrupt marker)
    bad_pred = (F.col("_j").isNull()
                | F.col("_j._corrupt_record").isNotNull()
                | (F.length(F.trim("value")) == 0))
    good = (tagged.filter(~bad_pred)
            .select("_j.*").drop("_corrupt_record"))
    bad = tagged.filter(bad_pred).select("value")
    return good, bad


def _quarantine_read(spark, path, schema, fmt, quarantine_path, options):
    good, bad = quarantine_split_lines(
        spark.read.text(path), schema, fmt, **options)
    if quarantine_path:
        bad.write.mode("overwrite").text(quarantine_path)
        bad = spark.read.text(quarantine_path)
    return good, bad


def read_json_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine_path: str | None = None,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """JSON-Lines ingest split into (good, quarantined-raw-lines).

    STRICT schema contract: a good row conforms to the declared schema
    completely; any line the parser flags — malformed JSON, a non-object,
    or a wrong-typed field — goes to quarantine whole, so the good side
    never carries silently-nulled fields (the plain PERMISSIVE reader
    keeps such rows, which is exactly how type rot sneaks into a corpus).
    With ``quarantine_path`` the raw lines are written there (text,
    byte-for-byte) and the returned bad side re-reads that sink, so
    downstream replay consumes the durable copy."""
    return _quarantine_read(spark, path, schema, "json", quarantine_path,
                            options)


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine_path: str | None = None,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """CSV ingest split into (good, quarantined-raw-lines) — one record per
    line (the splittable-at-scale layout; embedded newlines need the
    non-splittable multiLine reader instead). Same STRICT contract as the
    JSON form: wrong arity or a wrong-typed field quarantines the line."""
    return _quarantine_read(spark, path, schema, "csv", quarantine_path,
                            options)
