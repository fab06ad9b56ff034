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


def test_nearest_join_picks_min_distance_and_breaks_ties_earlier(spark):
    import datetime as dt

    def ts(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    clicks = spark.createDataFrame(
        [("A", ts(10), 100), ("A", ts(20), 101), ("B", ts(5), 102)],
        "k string, ts timestamp, click_id bigint",
    )
    # purchases: before-all, equidistant tie, nearer-next, exact-equal ts,
    # and a key with no clicks
    purchases = spark.createDataFrame(
        [("A", ts(1), 1),    # prev none -> next 100
         ("A", ts(15), 2),   # |15-10|=5 == |20-15|=5 -> tie -> earlier: 100
         ("A", ts(19), 3),   # nearer next (20) -> 101
         ("A", ts(20), 4),   # exact match -> 101 (distance 0 via prev)
         ("C", ts(7), 5)],   # no clicks -> NULL
        "k string, ts timestamp, event_id bigint",
    )
    from inspectadb_spark.operators.asof import nearest_join

    out = nearest_join(clicks, purchases, ["k"], "ts", "ts",
                       ["click_id"], tiebreak="click_id")
    got = {r.event_id: r.click_id for r in out.collect()}
    assert got == {1: 100, 2: 100, 3: 101, 4: 101, 5: None}


def test_nearest_join_equal_ts_clicks_break_on_tiebreak_col(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    clicks = spark.createDataFrame(
        [("A", t0, 7), ("A", t0, 3)], "k string, ts timestamp, click_id bigint"
    )
    purchases = spark.createDataFrame(
        [("A", t0, 1)], "k string, ts timestamp, event_id bigint"
    )
    from inspectadb_spark.operators.asof import nearest_join

    out = nearest_join(clicks, purchases, ["k"], "ts", "ts",
                       ["click_id"], tiebreak="click_id")
    # last over (ts, side, click_id asc) -> the larger click_id wins,
    # deterministically
    assert out.collect()[0].click_id == 7


def test_asof_forward_inclusive(spark):
    prices, trades = _fixture(spark)
    out = asof_join(
        prices, trades, on=["k"], left_ts="ts", right_ts="ts",
        payload_cols=["price"], direction="forward",
    )
    got = {(r["k"], r["trade"]): r["price"] for r in out.collect()}
    assert got == {
        ("A", "t0"): 10.0,     # earliest price at/after ts=0 is ts=1
        ("A", "t1"): 11.0,     # inclusive: price at ts=5 matches
        ("A", "t2"): 12.0,     # next price after ts=7 is ts=9
        ("B", "t3"): 100.0,
        ("B", "t4"): None,     # no price at/after ts=9 for B
    }


def test_asof_forward_strict(spark):
    prices, trades = _fixture(spark)
    out = asof_join(
        prices, trades, on=["k"], left_ts="ts", right_ts="ts",
        payload_cols=["price"], direction="forward", inclusive=False,
    )
    got = {(r["k"], r["trade"]): r["price"] for r in out.collect()}
    assert got[("A", "t1")] == 12.0  # strict: ts=5 price excluded, next is ts=9


def test_asof_backward_tolerance(spark):
    prices, trades = _fixture(spark)
    out = asof_join(
        prices, trades, on=["k"], left_ts="ts", right_ts="ts",
        payload_cols=["price"], tolerance_us=2_000_000,  # 2 s
    )
    got = {(r["k"], r["trade"]): r["price"] for r in out.collect()}
    assert got[("A", "t2")] == 11.0   # ts=7 matches ts=5 at distance 2 s
    assert got[("B", "t4")] is None   # ts=9 vs ts=4: beyond tolerance
    assert got[("A", "t1")] == 11.0   # distance 0 always inside tolerance


def test_asof_forward_tolerance(spark):
    prices, trades = _fixture(spark)
    out = asof_join(
        prices, trades, on=["k"], left_ts="ts", right_ts="ts",
        payload_cols=["price"], direction="forward", tolerance_us=1_000_000,
    )
    got = {(r["k"], r["trade"]): r["price"] for r in out.collect()}
    assert got[("A", "t0")] == 10.0   # ts=0 → price ts=1, distance 1 s
    assert got[("A", "t2")] is None   # ts=7 → price ts=9, distance 2 s > tol
    assert got[("B", "t3")] == 100.0  # ts=3 → price ts=4
