"""Units/properties for the stats family (queries/stats.py): Count-Min
sketch guarantees + mergeability, truncated EWMA vs a NumPy reference.
Oracle hash-matching for q89–q94 is covered by the driver contract."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from inspectadb_spark.operators.sketches import cms_estimate, cms_merge, cms_sketch
from inspectadb_spark.operators.timeseries import ewma
from tests.conftest import SF_DIR


def _events(spark):
    from inspectadb_spark.catalog import load_table

    return load_table(spark, "events", SF_DIR)


def _grid(df):
    return {(r["d"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_cms_never_underestimates_and_bounds_error(spark):
    ev = _events(spark)
    sketch = cms_sketch(ev, "user_id")
    probes = ev.select("user_id").distinct()
    est = {r["user_id"]: r["est"] for r in
           cms_estimate(sketch, probes, "user_id").collect()}
    exact = {r["user_id"]: r["n"] for r in
             ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    total = sum(exact.values())
    assert set(est) == set(exact)
    for u, n in exact.items():
        # CMS invariant: min over depth rows counts every true occurrence.
        assert est[u] >= n, f"user {u}: est {est[u]} < exact {n}"
        # Error bound e*N/width holds w.p. 1-(1/e)^depth per key; with the
        # fixed md5 grid it is deterministic — allow 2x slack over eN/w.
        bound = 2 * 2.718281828 * total / 256
        assert est[u] - n <= bound, f"user {u}: overshoot {est[u] - n}"


def test_cms_merge_of_daily_sketches_equals_global(spark):
    ev = _events(spark)
    direct = _grid(cms_sketch(ev, "user_id"))
    from functools import reduce

    from pyspark.sql import DataFrame

    daily = [
        cms_sketch(ev.filter(F.dayofmonth("ts") == d), "user_id")
        for d in range(1, 32)
    ]
    merged = _grid(cms_merge(reduce(DataFrame.unionByName, daily)))
    assert merged == direct


def test_cms_unseen_key_estimates_from_grid_only(spark):
    ev = _events(spark)
    sketch = cms_sketch(ev, "user_id")
    probes = spark.createDataFrame([(10_000_001,), (10_000_002,)], "user_id bigint")
    rows = cms_estimate(sketch, probes, "user_id").collect()
    # Unseen keys may collide into occupied buckets but never error and
    # never exceed the collision mass of a single bucket row.
    assert {r["user_id"] for r in rows} == {10_000_001, 10_000_002}
    assert all(r["est"] >= 0 for r in rows)


def test_ewma_matches_numpy_reference(spark):
    alpha, k = 0.3, 10
    vals = [5.0, 1.0, 8.0, 2.0, 9.0, 4.0, 7.5, 0.25, 3.0, 6.0, 1.5, 2.5]
    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, value double")
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma(df, order_cols=("event_id",), alpha=alpha, k=k).collect()
    }
    w = np.array([(1 - alpha) ** j for j in range(k)])
    for i in range(len(vals)):
        window = np.array(vals[max(0, i - k + 1): i + 1][::-1])
        expect = float((window * w[: len(window)]).sum() / w[: len(window)].sum())
        assert abs(got[i] - expect) < 1e-12, (i, got[i], expect)


def test_ewma_truncation_tail_is_bounded(spark):
    # Constant series: truncated EWMA is exactly the constant at every row,
    # so truncation introduces zero error where the series is stable.
    df = spark.createDataFrame(
        [(1, i, 42.0) for i in range(30)], "user_id int, event_id int, value double"
    )
    rows = ewma(df, order_cols=("event_id",)).collect()
    assert all(abs(r["ewma"] - 42.0) < 1e-12 for r in rows)
