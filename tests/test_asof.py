"""asof_join operator tests: hand-computed fixtures + DuckDB ASOF JOIN
cross-check (the oracle's native operator vs our union-merge formulation)."""

from __future__ import annotations

import duckdb

from inspectadb_spark.operators.asof import asof_join


def _fixture(spark):
    prices = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0), ("B", 4, 100.0)],
        "k string, ts int, price double",
    )
    trades = spark.createDataFrame(
        [("A", 0, "t0"), ("A", 5, "t1"), ("A", 7, "t2"), ("B", 3, "t3"), ("B", 9, "t4")],
        "k string, ts int, trade string",
    )
    return prices, trades


def test_asof_inclusive(spark):
    prices, trades = _fixture(spark)
    out = asof_join(
        prices, trades, on=["k"], left_ts="ts", right_ts="ts",
        payload_cols=["price"],
    )
    got = {(r["k"], r["trade"]): r["price"] for r in out.collect()}
    assert got == {
        ("A", "t0"): None,     # no price at or before ts=0
        ("A", "t1"): 11.0,     # inclusive: price at ts=5 matches trade at ts=5
        ("A", "t2"): 11.0,
        ("B", "t3"): None,
        ("B", "t4"): 100.0,
    }


def test_asof_strict(spark):
    prices, trades = _fixture(spark)
    out = asof_join(
        prices, trades, on=["k"], left_ts="ts", right_ts="ts",
        payload_cols=["price"], inclusive=False,
    )
    got = {(r["k"], r["trade"]): r["price"] for r in out.collect()}
    assert got[("A", "t1")] == 10.0  # strict: ts=5 price excluded at ts=5


def test_asof_matches_duckdb_native(spark):
    """Cross-check the union-merge plan against DuckDB's built-in ASOF JOIN
    on the events table (purchases pick up the latest prior click value)."""
    from tests.conftest import SF_DIR
    from inspectadb_spark.queries.registry import tables

    ev = tables(spark, SF_DIR)["events"]
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", "ts", "value"
    )
    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts",
        payload_cols=["value"],
    )
    got = sorted(
        (r["event_id"], round(r["value"], 6) if r["value"] is not None else None)
        for r in out.collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = sorted(
        (eid, round(v, 6) if v is not None else None)
        for eid, v in con.execute("""
            SELECT p.event_id, c.value
            FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND c.ts <= p.ts
        """).fetchall()
    )
    assert got == want
