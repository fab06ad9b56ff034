"""Independent-reference property tests for round-4 operators: the Spark
implementations are checked against a DIFFERENT implementation of the same
semantics (pandas merge_asof, the naive CUSUM recursion, a pure-Python
integer PageRank), not just hand cases — so a shared misunderstanding of
the spec can't hide in both sides.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from inspectadb_spark.operators.asof import asof_join
from inspectadb_spark.operators.linkage import pagerank
from inspectadb_spark.operators.timeseries import cusum_alerts

import pytest

# r14 driver fast lane (pytest.ini): property simulations vs python references —
# builder-run each round with -m ""
pytestmark = pytest.mark.slow

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# distinct-second timestamps per key (merge_asof needs sorted, unique times
# per key for a deterministic comparison)
_series = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 400),
              st.integers(-50, 50)),
    min_size=1, max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


def _frames(spark, left_rows, right_rows):
    base = dt.datetime(2024, 1, 1)
    lrows = [(k, base + dt.timedelta(seconds=s), float(v))
             for k, s, v in left_rows]
    rrows = [(k, base + dt.timedelta(seconds=s), i)
             for i, (k, s, _) in enumerate(right_rows)]
    left = spark.createDataFrame(lrows, "k string, ts timestamp, price double")
    right = spark.createDataFrame(rrows, "k string, ts timestamp, rid int")
    lpd = pd.DataFrame(lrows, columns=["k", "ts", "price"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["k", "ts", "rid"]).sort_values("ts")
    return left, right, lpd, rpd


@settings(**_SETTINGS)
@given(left_rows=_series, right_rows=_series)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    left, right, lpd, rpd = _frames(spark, left_rows, right_rows)
    for direction, tol in [("backward", None), ("forward", None),
                           ("backward", 60), ("forward", 60)]:
        got = {
            r.rid: r.price
            for r in asof_join(
                left, right, ["k"], "ts", "ts", ["price"],
                direction=direction,
                tolerance_us=None if tol is None else tol * 1_000_000,
            ).collect()
        }
        want_df = pd.merge_asof(
            rpd, lpd, on="ts", by="k", direction=direction,
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        )
        want = {
            int(r.rid): (None if pd.isna(r.price) else float(r.price))
            for r in want_df.itertuples()
        }
        assert got == want, f"direction={direction} tol={tol}"


@settings(**_SETTINGS)
@given(values=st.lists(st.integers(-30, 60), min_size=1, max_size=40),
       k=st.integers(0, 20), h=st.integers(1, 50))
def test_cusum_closed_form_matches_recursion(spark, values, k, h):
    base = dt.datetime(2024, 1, 1)
    rows = [("g", base + dt.timedelta(seconds=i), i, float(v))
            for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, id int, v double")
    got = cusum_alerts(df, "g", "ts", "v", "id", k=float(k), h=float(h)).collect()[0]
    s, n_alerts, max_s = 0.0, 0, 0.0
    for v in values:
        s = max(0.0, s + (v - k))
        if s > h:
            n_alerts += 1
        max_s = max(max_s, s)
    assert got["n_alerts"] == n_alerts
    assert abs(got["max_cusum"] - max_s) < 1e-9


@settings(**_SETTINGS)
@given(edges=st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(1, 9)),
    min_size=1, max_size=12, unique_by=lambda t: (t[0], t[1])))
def test_pagerank_matches_python_simulation(spark, edges):
    df = spark.createDataFrame(edges, "src int, dst int, w int")
    got = {r.node: r.rank_ppb for r in pagerank(df, iterations=3).collect()}

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    out = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0) + w
    p_ppm = {(s, d): (w * 1_000_000) // out[s] for s, d, w in edges}
    n = len(nodes)
    teleport = (1_000_000_000 * 15) // (100 * n)
    r = {v: 1_000_000_000 // n for v in nodes}
    for _ in range(3):
        nxt = {v: teleport for v in nodes}
        for (s, d), p in p_ppm.items():
            nxt[d] += (r[s] * p * 85) // 100_000_000
        r = nxt
    assert got == r
