"""Debezium-style CDC change-log fixture over ``orders`` (FIXTURES.md §B1).

Deterministic pure function of the orders table (no RNG), so the DuckDB
oracle derives the *identical* relation from the same parquet via
``CDC_ORDERS_CTE``:

- every order emits op='c' at lsn = key*10, ts_ms = epoch_ms(o_orderdate);
- keys % 3 == 0 emit op='u' at lsn = key*10+1 with price := round(price*1.1, 2)
  (computed in exact DECIMAL so both engines round identically);
- keys % 10 == 7 emit op='d' at lsn = key*10+2 with NULL payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Exact-decimal 10% bump, identical in Spark SQL and DuckDB.
_BUMP = "CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,6)) * CAST(1.10 AS DECIMAL(4,2)), 2) AS DOUBLE)"

PAYLOAD_COLS = ("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

CDC_ORDERS_CTE = f"""
cdc_orders AS (
  SELECT o_orderkey * 10 AS lsn, 'c' AS op, epoch_ms(o_orderdate) AS ts_ms,
         o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders
  UNION ALL
  SELECT o_orderkey * 10 + 1, 'u', epoch_ms(o_orderdate) + 3600000,
         o_orderkey, o_custkey, o_orderstatus, {_BUMP}, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey * 10 + 2, 'd', epoch_ms(o_orderdate) + 7200000,
         o_orderkey, NULL, NULL, NULL, NULL, NULL
  FROM orders WHERE o_orderkey % 10 = 7
)
"""


def derive_cdc_orders(orders: DataFrame) -> DataFrame:
    """Spark-side derivation, expression-for-expression the CTE above."""
    ts_ms = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    creates = orders.select(
        (F.col("o_orderkey") * 10).alias("lsn"),
        F.lit("c").alias("op"),
        ts_ms.alias("ts_ms"),
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            (F.col("o_orderkey") * 10 + 1).alias("lsn"),
            F.lit("u").alias("op"),
            (ts_ms + 3600000).alias("ts_ms"),
            "o_orderkey", "o_custkey", "o_orderstatus",
            F.expr(_BUMP).alias("o_totalprice"),
            "o_orderdate", "o_orderpriority",
        )
    )
    deletes = (
        orders.filter(F.col("o_orderkey") % 10 == 7)
        .select(
            (F.col("o_orderkey") * 10 + 2).alias("lsn"),
            F.lit("d").alias("op"),
            (ts_ms + 7200000).alias("ts_ms"),
            "o_orderkey",
            F.lit(None).cast("bigint").alias("o_custkey"),
            F.lit(None).cast("string").alias("o_orderstatus"),
            F.lit(None).cast("double").alias("o_totalprice"),
            F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
            F.lit(None).cast("string").alias("o_orderpriority"),
        )
    )
    return creates.unionByName(updates).unionByName(deletes)
