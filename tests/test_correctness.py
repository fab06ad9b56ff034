"""t2-style correctness: every declared query vs its DuckDB oracle.

Two tiers: SF_DIR (sf0.001 default, env-overridable) AND the driver's own
judging tier sf0.01 (VERDICT r3 item 2 — the repo's CI signal should match
the tier the driver grades at). Set INSPECTADB_TEST_SF_DIR2="" to skip the
second tier for a fast local loop.
"""

from __future__ import annotations

import os
from pathlib import Path

import duckdb
import pytest

from inspectadb_spark.queries import REGISTRY
from tests.conftest import SF_DIR, TABLES
from tests.util import assert_matches

ORACLED = [name for name, q in sorted(REGISTRY.items()) if q.oracle is not None]
ROWS_ONLY = [name for name, q in sorted(REGISTRY.items()) if q.oracle is None]

_SF2 = os.environ.get("INSPECTADB_TEST_SF_DIR2", "/root/testdata/sf0.01")
# r14 driver fast lane (pytest.ini): the sf0.001 sweep (every declared
# query vs DuckDB) stays in the default lane; the sf0.01 tier doubles the
# wall-clock and is builder-lane (-m "") evidence
TIERS = [pytest.param(SF_DIR, id=Path(SF_DIR).name)]
if _SF2 and _SF2 != SF_DIR and Path(_SF2).exists():
    TIERS.append(pytest.param(_SF2, id=Path(_SF2).name,
                              marks=pytest.mark.slow))


@pytest.fixture(scope="module", params=TIERS)
def tier(request):
    return request.param


@pytest.fixture(scope="module")
def tier_oracle(tier):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tier}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, tier, tier_oracle, name):
    q = REGISTRY[name]
    df = q.builder(spark, tier)
    assert_matches(df, tier_oracle, q.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, tier, name):
    q = REGISTRY[name]
    df = q.builder(spark, tier)
    assert df.count() >= 0
