"""Declared query corpus (SURVEY.md §2.3) — the engine's testable contract.

Each query has a Spark *builder* ``(spark, sf_dir) -> DataFrame`` and, where
SQL-expressible, a DuckDB *oracle* SQL string the driver runs side-by-side.
Column names are aliased identically on both sides (the driver's compare sorts
columns by name before hashing).
"""

from inspectadb_spark.queries.registry import REGISTRY, Query, query, tables

# Import for registration side effects (order = SURVEY build order).
from inspectadb_spark.queries import relational  # noqa: F401  Q01–Q35
from inspectadb_spark.queries import scalar      # noqa: F401  Q36–Q42
from inspectadb_spark.queries import llm         # noqa: F401  Q43–Q45, dedup/similarity/text
from inspectadb_spark.queries import cdc_time    # noqa: F401  Q13, Q46–Q51
from inspectadb_spark.queries import extensions  # noqa: F401  Q43c–Q56: neardup, langid, UDF, multimodal, DQ, formats, drift
from inspectadb_spark.queries import tpch        # noqa: F401  adapted TPC-H Q3–Q22
from inspectadb_spark.queries import training    # noqa: F401  Q63–Q68 training-pipeline ops
from inspectadb_spark.queries import stats       # noqa: F401  Q89–Q94 stat moments, sketches, window values
from inspectadb_spark.queries import linkage     # noqa: F401  Q142–Q144 fuzzy join, entity resolution, PageRank


def queries():
    """Driver contract: name -> callable(spark, sf_dir) -> DataFrame."""
    return {name: q.builder for name, q in REGISTRY.items()}


def oracle_sql():
    """Driver contract: name -> DuckDB SQL (omitted for non-SQL-expressible)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
