"""Query registry + cross-engine determinism helpers (SURVEY.md §5.3).

The helpers below emit SQL fragments that are valid in BOTH Spark SQL and
DuckDB and — critically — deterministic in both:

- Floating-point SUM/AVG are order-dependent and Spark's partial-aggregation
  order is nondeterministic, so every money/measure aggregate routes through
  DECIMAL(18,6) (exact, associative) and is only converted to DOUBLE at the
  end (``dsum``/``davg``).
- ROUND on raw doubles is dialect-fragile at scale boundaries (BigDecimal
  half-up vs FP-scaled rounding), so ``r4`` rounds via an exact DECIMAL cast
  in both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from inspectadb_spark.catalog import load_tables


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL-expressible)
    doc: str = ""
    # Declared verification class for NON-oracled ids (oracled ids leave it
    # empty — the oracle IS the check). Format "<class>: <reason + covering
    # test>", class ∈ {S (streaming ≡ batch), P (property/parity/recall),
    # A (approximation bound), rows-only}. tests/test_registry_lint.py
    # asserts the marking is total over non-oracled ids and absent on
    # oracled ones, the degeneracy-lint set-equality discipline.
    check: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = "",
          check: str = ""):
    """Decorator: register a builder under ``name`` with its oracle SQL
    (or, for non-SQL-expressible ids, its declared verification class)."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle,
                               doc=doc or (fn.__doc__ or ""), check=check)
        return fn

    return wrap


# -- table cache: DataFrames are lazy plans; reuse them across queries --------
_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = load_tables(spark, sf_dir)
    return _TABLE_CACHE[key]


# -- Spark-SQL entry point over registered corpus views -----------------------
_VIEW_STATE: dict[int, str] = {}


def sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    """Run Spark SQL over the corpus tables registered as temp views.

    Views are (re)registered whenever the sf_dir changes for this session;
    resolution happens at plan-construction time, so the returned DataFrame is
    pinned to the current sf_dir even if views are later re-pointed.
    """
    if _VIEW_STATE.get(id(spark)) != sf_dir:
        for name, df in tables(spark, sf_dir).items():
            df.createOrReplaceTempView(name)
        _VIEW_STATE[id(spark)] = sf_dir
    return spark.sql(text)


# -- cross-dialect deterministic fragments ------------------------------------

def dec(expr: str) -> str:
    """Exact decimal cast for money math (SURVEY §5.3 global convention)."""
    return f"CAST({expr} AS DECIMAL(18,6))"


def dsum(expr: str, alias: str | None = None) -> str:
    """Order-independent SUM of a double measure, emitted as DOUBLE."""
    e = f"CAST(SUM({dec(expr)}) AS DOUBLE)"
    return f"{e} AS {alias}" if alias else e


def r4(expr: str) -> str:
    """Round to 4 decimals via exact decimal (identical in both dialects)."""
    return f"CAST(ROUND({dec(expr)}, 4) AS DOUBLE)"


def r4c(col):
    """Column-side r4: same semantics as ``r4`` for DataFrame-API builders."""
    from pyspark.sql import functions as F

    return F.round(col.cast("decimal(18,6)"), 4).cast("double")


def davg(expr: str, alias: str | None = None) -> str:
    """Deterministic 4-dp average: decimal SUM, IEEE double division, r4."""
    e = r4(f"CAST(SUM({dec(expr)}) AS DOUBLE) / COUNT({expr})")
    return f"{e} AS {alias}" if alias else e
