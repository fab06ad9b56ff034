"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``inspectadb_spark`` (SURVEY.md §2 contract).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from inspectadb_spark import queries as _corpus  # noqa: E402
from inspectadb_spark.session import SEMANTIC_CONFS  # noqa: E402


def _pin_confs(spark: SparkSession) -> None:
    """The driver owns the session; re-pin semantic confs defensively
    (notably the parquet-nanos shim, without which events is unreadable)."""
    for k, v in SEMANTIC_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    _pin_confs(spark)
    return _corpus.queries()["q15_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = _corpus.queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL-expressible)."""
    return _corpus.oracle_sql()
