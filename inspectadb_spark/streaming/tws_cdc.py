"""Streaming CDC apply on the transformWithStateInPandas API
(SURVEY.md §2.2k "arbitrary stateful"; the typed-state successor to
applyInPandasWithState).

Per-key ValueState holds the latest-applied (lsn, op, payload); each
micro-batch folds its changes with latest-wins-by-lsn and emits the key's
new current row (op='d' emits a tombstone marker row so downstream sinks can
delete). Unlike the foreachBatch variant (cdc_stream.py) state lives in the
engine's per-key state store — RocksDB on clusters — so the operator scales
with key cardinality across executors and recovers from the checkpoint, no
hand-rolled state versioning.

Retaining tombstones in state (not just dropping deleted keys) is what makes
late lower-lsn redeliveries idempotent: a stale 'u' arriving after a newer
'd' compares lsn against the tombstone and is discarded.

Runtime requirements (absent in this dev container, present on real
clusters): the ``protobuf`` package (the TWS Python worker's state-transfer
wire format) and the RocksDB state store provider::

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

``HAVE_TWS_DEPS`` reports availability; the S8 test runs the full
stream-vs-batch equivalence when it can and skips (not fakes) otherwise.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

try:
    import google.protobuf  # noqa: F401

    HAVE_TWS_DEPS = True
except ImportError:
    HAVE_TWS_DEPS = False


def cdc_state_schema(value_cols: list[str]) -> str:
    return ", ".join(["lsn bigint", "op string"] + [f"{c} string" for c in value_cols])


class CdcLatestProcessor(StatefulProcessor):
    """Keeps max-lsn row per key; emits the key's state after each batch.

    Payload columns ride as strings in state (simple, type-agnostic); the
    caller casts back on the way out. ``out_schema`` = key + lsn + op +
    payload strings.
    """

    def __init__(self, key_col: str, value_cols: list[str]):
        self.key_col = key_col
        self.value_cols = value_cols

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.latest = handle.getValueState(
            "latest", cdc_state_schema(self.value_cols)
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        best = self.latest.get() if self.latest.exists() else None  # (lsn, op, *vals)
        for pdf in rows:
            for r in pdf.itertuples(index=False):
                lsn = int(getattr(r, "lsn"))
                if best is None or lsn > int(best[0]):
                    best = tuple(
                        [lsn, getattr(r, "op")]
                        + [
                            None if pd.isna(getattr(r, c)) else str(getattr(r, c))
                            for c in self.value_cols
                        ]
                    )
        self.latest.update(best)
        yield pd.DataFrame(
            [(key[0],) + tuple(best)],
            columns=[self.key_col, "lsn", "op"] + self.value_cols,
        )

    def close(self) -> None:
        pass


def streaming_cdc_latest(
    changes: DataFrame,
    key_col: str,
    value_cols: list[str],
    output_mode: str = "update",
    order_col: str = "lsn",
) -> DataFrame:
    """Wire a change stream through the CDC state machine. Output rows carry
    op so consumers can MERGE (op != 'd') / DELETE (op == 'd').

    The output key column carries ``key_col``'s own type from the input
    schema (a hardcoded bigint would break string/decimal keys at Arrow
    conversion), and ``order_col`` names the change-ordering column of
    feeds that don't call theirs ``lsn``."""
    key_type = changes.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, " + cdc_state_schema(value_cols)
    str_changes = changes.selectExpr(
        key_col,
        f"CAST({order_col} AS BIGINT) AS lsn",
        "op",
        *[f"CAST({c} AS STRING) AS {c}" for c in value_cols],
    )
    return str_changes.groupBy(key_col).transformWithStateInPandas(
        CdcLatestProcessor(key_col, value_cols),
        out_schema,
        output_mode,
        "None",
    )
