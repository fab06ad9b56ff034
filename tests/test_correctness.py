"""t2-style correctness: every declared query vs its DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from inspectadb_spark.queries import REGISTRY
from tests.conftest import SF_DIR
from tests.util import assert_matches

ORACLED = [name for name, q in sorted(REGISTRY.items()) if q.oracle is not None]
ROWS_ONLY = [name for name, q in sorted(REGISTRY.items()) if q.oracle is None]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, oracle, name):
    q = REGISTRY[name]
    df = q.builder(spark, SF_DIR)
    assert_matches(df, oracle, q.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.builder(spark, SF_DIR)
    assert df.count() >= 0
