"""Table registry over the driver corpus (TESTDATA.md / FIXTURES.md §A).

Loads the ten corpus tables from a scale-factor directory and registers them
as temp views so both the DataFrame API and ``spark.sql`` can reach them.

The only per-table shim lives here: ``events.ts`` is parquet
INT64 TIMESTAMP(NANOS) which Spark reads as ``bigint`` nanoseconds under
``spark.sql.legacy.parquet.nanosAsLong=true``; we derive a µs-truncated
TIMESTAMP_NTZ identical to what DuckDB produces for the same file
(SURVEY.md §1.3.1 — verified equal truncation).

Scale note: these are plain parquet scans — columnar vectorized reads with
predicate pushdown and column pruning handled by Catalyst. At 100 TB the same
code path works over partitioned directories; nothing here materializes data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one corpus table as a lazy DataFrame (ns-timestamp shim applied)."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-encoded corpus: ts arrives as bigint nanos (nanosAsLong conf);
        # truncate to µs and present as TIMESTAMP_NTZ — wall-clock semantics,
        # no session-TZ shift, byte-identical to DuckDB's read of the same
        # file. µs-encoded corpora (current driver data) read natively as
        # TIMESTAMP_NTZ and skip the shim — the dtype check keys off what the
        # footer actually declares, so both generations of the corpus work.
        # NB: integer `div`, not `/` — float division of epoch-nanos (~1.7e18)
        # exceeds double's 53-bit mantissa and would corrupt low microseconds.
        df = df.withColumn(
            "ts",
            F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every corpus table as a temp view; returns the DataFrames."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
