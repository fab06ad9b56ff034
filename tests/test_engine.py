"""Engine facade (engine.py): layered serving provenance (cache -> MV ->
base), value agreement across every layer, and CDC-style invalidation
through the whole stack. Each layer's own correctness is tested in
test_mv.py / test_result_cache.py; this asserts the COMPOSITION.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inspectadb_spark.engine import Engine
from inspectadb_spark.operators.mv import AggRequest, MVDef
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    eng = Engine(spark, SF_DIR, str(tmp_path_factory.mktemp("engine")))
    eng.register_mv(
        MVDef(
            name="mv_orders_daily",
            keys=("o_orderdate", "o_orderstatus"),
            measures={"sum_price": ("sum", "o_totalprice"),
                      "cnt": ("count", "*")},
        ),
        "orders",
    )
    return eng


REQ = AggRequest(
    keys={"o_orderstatus": None},
    measures={"total": ("sum", "o_totalprice"), "n": ("count", "*"),
              "avg_price": ("avg", "o_totalprice")},
)


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_layers_agree_and_provenance_progresses(engine):
    r1, p1 = engine.aggregate("orders", REQ)
    assert p1 == "mv:mv_orders_daily"
    r2, p2 = engine.aggregate("orders", REQ)
    assert p2 == "cache"
    r3, p3 = engine.aggregate("orders", REQ, use_cache=False)
    assert p3 == "mv:mv_orders_daily"
    # unroutable request (distinct grain column not in the MV) -> base
    other = AggRequest(keys={"o_custkey": None},
                       measures={"n": ("count", "*")})
    r4, p4 = engine.aggregate("orders", other, use_cache=False)
    assert p4 == "base"
    direct = engine.sql(
        "SELECT o_orderstatus, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total, "
        "COUNT(*) AS n, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*) "
        "AS avg_price FROM orders GROUP BY o_orderstatus")
    assert _rows(r1) == _rows(r2) == _rows(r3) == _rows(direct)
    assert r4.count() > 0


def test_sql_and_table_entry_points(engine):
    n_sql = engine.sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"]
    n_df = engine.table("orders").count()
    assert n_sql == n_df > 0


def test_cache_hit_plan_touches_neither_base_nor_mv(engine):
    r, p = engine.aggregate("orders", REQ)
    assert p == "cache"
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "result_cache" in plan
    assert "orders.parquet" not in plan and "mv_orders_daily" not in plan


def test_sql_routed_parses_and_routes(engine):
    df, prov = engine.aggregate("orders", REQ, use_cache=False)
    sdf, sprov = engine.sql_routed(
        "SELECT o_orderstatus, SUM(o_totalprice) AS total, COUNT(*) AS n, "
        "AVG(o_totalprice) AS avg_price FROM orders GROUP BY o_orderstatus")
    assert sprov in ("mv:mv_orders_daily", "cache")
    assert _rows(sdf) == _rows(df)


def test_sql_routed_falls_back_to_full_sql(engine):
    # joins / expressions are outside the grammar -> plain Spark SQL
    df, prov = engine.sql_routed(
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "WHERE o_totalprice > 0 GROUP BY o_orderstatus")
    assert prov == "sql" and df.count() > 0
    df2, prov2 = engine.sql_routed("SELECT COUNT(*) AS n FROM orders")
    assert prov2 == "sql"


def test_parse_agg_sql_rejects_untrusted_shapes():
    from inspectadb_spark.engine import parse_agg_sql

    assert parse_agg_sql("SELECT a, SUM(b) AS s FROM t GROUP BY a") is not None
    # key listed in SELECT but not GROUP BY (and vice versa)
    assert parse_agg_sql("SELECT a, b, SUM(c) AS s FROM t GROUP BY a") is None
    # expression keys, DISTINCT, missing alias, non-count star
    assert parse_agg_sql(
        "SELECT trunc(a), SUM(b) AS s FROM t GROUP BY trunc(a)") is None
    assert parse_agg_sql(
        "SELECT a, COUNT(DISTINCT b) AS s FROM t GROUP BY a") is None
    assert parse_agg_sql("SELECT a, SUM(b) FROM t GROUP BY a") is None
    assert parse_agg_sql("SELECT a, SUM(*) AS s FROM t GROUP BY a") is None
