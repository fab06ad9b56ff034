"""Registry lint: every oracled query must be *driver-canonicalizable*.

The driver compares Spark and DuckDB results through pandas
(``toPandas()`` / ``.df()``), sorts cells with ``sort_values`` and hashes
the rendered values. Two output-type classes break that path even when
the values are identical (VERDICT r04 "What's wrong" #1–#3):

- DuckDB HUGEINT (``SUM(integer)``, ``x * 1000000 // y``) — pandas turns
  it into float64, rendering ``123.0`` against Spark's bigint ``123``.
  DECIMAL is the same trap in reverse: DuckDB DECIMAL → float64 while
  Spark Decimal → ``decimal.Decimal`` objects.
- list/struct/map cells — pandas ``sort_values`` raises
  "unhashable type: 'list'", crashing the driver's canonicalizer.

This test fails on ANY oracled query whose DuckDB output schema or Spark
output schema contains one of those types, so the class is structurally
impossible to reintroduce. Fix pattern: ``CAST(... AS BIGINT)`` for
integer aggregates, render exact wide decimals as strings, and
``array_to_string`` / ``concat_ws`` for array payloads (both sides).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

from inspectadb_spark.queries import REGISTRY
from tests.conftest import SF_DIR, TABLES

# r14 driver fast lane (pytest.ini): whole-registry render/type inventory —
# builder-run each round with -m ""
pytestmark = pytest.mark.slow

ORACLED = [n for n, q in sorted(REGISTRY.items()) if q.oracle is not None]

# DuckDB types pandas cannot round-trip losslessly / sort safely.
_BANNED_DUCK = ("HUGEINT", "DECIMAL", "STRUCT(", "MAP(", "UNION(")


@pytest.fixture(scope="module")
def lint_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_output_types_driver_safe(lint_con, name):
    """DESCRIBE the oracle (no execution) and ban pandas-hostile types."""
    rows = lint_con.execute(f"DESCRIBE ({REGISTRY[name].oracle})").fetchall()
    offenders = [
        (col, typ)
        for col, typ, *_ in rows
        if typ.upper().endswith("[]")
        or any(b in typ.upper() for b in _BANNED_DUCK)
    ]
    assert not offenders, (
        f"{name}: oracle emits driver-unsafe column types {offenders} — "
        "CAST integer aggregates to BIGINT, render decimals/arrays as "
        "strings (see module docstring)"
    )


# -- non-oracled ids must declare their verification class -------------------
#
# VERDICT r11 item 6: the oracle gap must be a conscious, documented choice,
# never an accident of growth. Set-equality both ways (the degeneracy-lint
# discipline): every non-oracled id carries a `check` marker naming its
# class and covering test, and no oracled id carries one (the oracle IS the
# check — a stale marker there would mislead).

_CHECK_CLASSES = ("S:", "P:", "A:", "rows-only:")


def test_every_non_oracled_id_declares_a_verification_class():
    missing = {
        n: q.check
        for n, q in sorted(REGISTRY.items())
        if q.oracle is None
        and not (q.check and q.check.startswith(_CHECK_CLASSES))
    }
    assert not missing, (
        f"non-oracled ids without a declared verification class {missing} — "
        "mark check='<S|P|A|rows-only>: <reason + covering test>' or add "
        "an oracle"
    )
    # reasons must name where the evidence lives
    thin = {
        n: q.check
        for n, q in sorted(REGISTRY.items())
        if q.oracle is None and "tests/" not in q.check
    }
    assert not thin, (
        f"verification-class markers that cite no covering test: {thin}"
    )


def test_no_oracled_id_carries_a_check_marker():
    stale = {n for n, q in sorted(REGISTRY.items())
             if q.oracle is not None and q.check}
    assert not stale, (
        f"oracled ids carrying a check marker (the oracle IS the check; "
        f"drop the marker): {stale}"
    )


@pytest.mark.parametrize("name", ORACLED)
def test_spark_output_types_driver_safe(spark, name):
    """Build the Spark plan (no execution) and ban pandas-hostile types."""
    df = REGISTRY[name].builder(spark, SF_DIR)
    offenders = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType, DecimalType))
    ]
    assert not offenders, (
        f"{name}: Spark output has driver-unsafe column types {offenders} — "
        "stringify arrays (concat_ws) and cast decimals to bigint/double/"
        "string to match the oracle rendering"
    )
