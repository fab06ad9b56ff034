"""Streaming state observability: read any stateful streaming query's
internal state store as a DataFrame, straight from its checkpoint.

Why this exists: at 100 TB the question "why is this streaming job's state
growing / why did this key stop updating" cannot be answered by adding
printfs to a running query. Spark ships first-class readers for exactly
this — ``spark.read.format("statestore")`` (the keyed state of any
stateful operator: aggregations, dedup, stream-stream joins) and
``format("state-metadata")`` (which operators exist in the checkpoint,
their store names, partition counts, and batch id range). These wrappers
flatten the (key struct, value struct) encoding into plain columns and
pair the two readers, so a state audit is one DataFrame expression — the
S60 scenario pins that the audited state equals what the query itself
outputs, making the reader trustworthy as a debugging oracle.

Scale shape: the reader loads the state snapshot for the LAST committed
batch by default — O(|state|), never O(stream history); per-partition
files are read in parallel like any other source. Options (batchId,
operatorId, storeName, joinSide) narrow it further.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["query_state", "state_metadata", "state_size_by_partition"]


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """The checkpoint's stateful-operator inventory: one row per operator
    (operatorId, operatorName, stateStoreName, numPartitions, minBatchId,
    maxBatchId). Read this first — it tells you what ``query_state`` can
    target and how far the checkpoint has committed."""
    return spark.read.format("state-metadata").load(checkpoint)


def query_state(spark: SparkSession, checkpoint: str,
                batch_id: int | None = None,
                operator_id: int = 0,
                store_name: str | None = None,
                join_side: str | None = None) -> DataFrame:
    """The keyed state of a stateful streaming operator as a flat
    DataFrame: key-struct fields then value-struct fields (names
    preserved; dedup's void ``__dummy__`` payload is dropped), plus
    ``partition_id``. Defaults to the operator 0 store at the last
    committed batch; pass ``batch_id`` to time-travel a state audit to an
    earlier micro-batch (bounded by the checkpoint's retained versions).
    Covers all three stateful operator classes: aggregations and
    dropDuplicates read directly; a stream-stream join's buffered side
    reads via ``join_side='left'|'right'`` (Spark assembles the four
    internal join stores into the buffered rows)."""
    r = spark.read.format("statestore")
    if batch_id is not None:
        r = r.option("batchId", int(batch_id))
    if operator_id:
        r = r.option("operatorId", int(operator_id))
    if store_name:
        r = r.option("storeName", store_name)
    if join_side:
        r = r.option("joinSide", join_side)
    st = r.load(checkpoint)
    from pyspark.sql.types import NullType

    key_names = {f.name for f in st.schema["key"].dataType.fields}
    cols = ([F.col(f"key.{f.name}").alias(f.name)
             for f in st.schema["key"].dataType.fields]
            + [F.col(f"value.{f.name}").alias(
                f"value_{f.name}" if f.name in key_names else f.name)
               for f in st.schema["value"].dataType.fields
               if not isinstance(f.dataType, NullType)]
            + [F.col("partition_id")])
    return st.select(*cols)


def state_size_by_partition(spark: SparkSession,
                            checkpoint: str,
                            operator_id: int = 0) -> DataFrame:
    """State-skew audit: keys per state-store partition. A hot partition
    here is the streaming analog of a skewed shuffle key — the signal to
    re-key or salt the stateful operator before it OOMs an executor."""
    st = spark.read.format("statestore")
    if operator_id:
        st = st.option("operatorId", int(operator_id))
    return (st.load(checkpoint)
            .groupBy("partition_id")
            .agg(F.count(F.lit(1)).alias("n_keys"))
            .orderBy("partition_id"))
