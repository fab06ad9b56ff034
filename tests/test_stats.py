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


def test_interval_concurrency_two_level_sweep(spark):
    import datetime as dt

    from inspectadb_spark.operators.timeseries import interval_concurrency

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    iv = spark.createDataFrame(
        [
            (ts(0, 0), ts(0, 30)),   # hour 0
            (ts(0, 10), ts(2, 10)),  # spans hours 0-2 (carry into 1 and 2)
            (ts(0, 30), ts(0, 40)),  # starts exactly when #1 ends: concurrent
            (ts(2, 10), ts(2, 20)),  # starts exactly when #2 ends: concurrent
        ],
        "st timestamp, en timestamp",
    )
    out = {r.bucket.hour: r.peak
           for r in interval_concurrency(iv, "st", "en", "hour").collect()}
    # hour 0: at 0:30 sessions 1 (inclusive end), 2, and 3 (start) are all
    # active (+1 orders before -1) -> peak 3
    # hour 1: no boundaries -> NO row (level is flat at 1 there)
    # hour 2: carry-in 1, session 4 starts at 2's inclusive end -> peak 2
    assert out == {0: 3, 2: 2}


def test_sign_blocked_neardup_subset_of_exact_and_finds_planted(spark):
    import random

    from pyspark.sql import functions as F

    from inspectadb_spark.operators.similarity import (
        cosine_pairs_exact,
        sign_blocked_near_dup_pairs,
    )

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    # planted exact duplicates: identical vectors share every sign -> must
    # land in the same block and be found
    rows.append((100, list(rows[0][1])))
    rows.append((101, list(rows[5][1])))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    blocked = {(r.v1, r.v2): r.sim
               for r in sign_blocked_near_dup_pairs(df, 0.5, 8).collect()}
    exact = {(r.v1, r.v2): r.sim
             for r in cosine_pairs_exact(df, 0.5).collect()}
    assert set(blocked) <= set(exact)
    assert (0, 100) in blocked and blocked[(0, 100)] == 1.0
    assert (5, 101) in blocked and blocked[(5, 101)] == 1.0
    assert all(blocked[p] == exact[p] for p in blocked)


# -- q185 AUC: tie-exact rank-sum identity ---------------------------------

def test_auc_matches_naive_pair_count(spark):
    """The windowed U2 identity equals the O(n^2) definition
    (wins + half-ties over all pos x neg pairs) on the real sf data."""
    from inspectadb_spark.queries.stats import q185

    rows = _events(spark).select("event_type", "value").collect()
    got = {r["event_type"]: (r["n_pos"], r["n_neg"], r["auc"])
           for r in q185(spark, SF_DIR).collect()}
    types = {r["event_type"] for r in rows}
    for t in types:
        pos = [r["value"] for r in rows if r["event_type"] == t]
        neg = [r["value"] for r in rows if r["event_type"] != t]
        u2 = sum(2 if p > n else (1 if p == n else 0)
                 for p in pos for n in neg)
        auc = u2 / (2.0 * len(pos) * len(neg))
        np_, nn_, got_auc = got[t]
        assert (np_, nn_) == (len(pos), len(neg))
        assert abs(got_auc - auc) < 1e-4, f"{t}: {got_auc} vs {auc}"


# -- q186 KS: exact sup-distance vs a naive Python ECDF --------------------

def test_ks_matches_naive_ecdf_sup(spark):
    from inspectadb_spark.queries.stats import q186

    rows = _events(spark).select("event_id", "event_type", "value").collect()
    mid = max(r["event_id"] for r in rows) // 2
    got = {r["event_type"]: (r["n_first"], r["n_second"], r["ks"])
           for r in q186(spark, SF_DIR).collect()}
    for t in {r["event_type"] for r in rows}:
        a = sorted(r["value"] for r in rows
                   if r["event_type"] == t and r["event_id"] <= mid)
        b = sorted(r["value"] for r in rows
                   if r["event_type"] == t and r["event_id"] > mid)
        pts = sorted(set(a) | set(b))
        import bisect
        d = max(abs(bisect.bisect_right(a, v) / len(a)
                    - bisect.bisect_right(b, v) / len(b)) for v in pts)
        n0, n1, ks = got[t]
        assert (n0, n1) == (len(a), len(b))
        assert abs(ks - d) < 1e-4, f"{t}: {ks} vs {d}"


# -- q187 Poisson bootstrap: CI brackets the mean; weights are Poisson(1) --

def test_poisson_bootstrap_ci_brackets_point_mean(spark):
    from inspectadb_spark.queries.stats import q187

    for r in q187(spark, SF_DIR).collect():
        assert r["n_replicas"] == 64
        assert r["ci_lo"] <= r["point_mean"] <= r["ci_hi"], r
        # CI half-width should look like ~2 s.e. (sd/sqrt(n) scale), i.e.
        # nonzero but far below the data's full range.
        assert 0 < r["ci_hi"] - r["ci_lo"] < 100


def test_poisson_bootstrap_weights_mean_near_one(spark):
    """Per-replica total weight ~ Poisson(n): mean weight within 15% of 1
    (sd of the total is sqrt(n) ~ 3%; 15% is a ~5-sigma sanity band)."""
    from pyspark.sql import functions as F
    from inspectadb_spark.queries.stats import _BS_THRESH, _BS_U, _BS_W

    ev = _events(spark)
    n = ev.count()
    rep = (
        ev.select("event_id")
        .withColumn("r", F.expr("explode(sequence(0, 7))"))
        .withColumn("u", F.expr(_BS_U))
        .withColumn("w", F.expr(_BS_W))
    )
    per = rep.groupBy("r").agg(F.sum("w").alias("sw")).collect()
    assert len(_BS_THRESH) == 9
    for row in per:
        assert 0.85 * n <= row["sw"] <= 1.15 * n, row


# -- q190 Kaplan–Meier vs a naive Python reference --------------------------

def test_kaplan_meier_matches_naive_reference(spark):
    from inspectadb_spark.queries.stats import q190

    # literally the query's 3-day observation window (round-9 degeneracy
    # fix: the full horizon censors nobody — see q190's doc)
    rows = (_events(spark).select("user_id", "ts", "event_type")
            .filter("ts < TIMESTAMP '2024-01-04'").collect())
    by_user = {}
    for r in rows:
        u = by_user.setdefault(r["user_id"], {"t0": r["ts"], "tp": None,
                                              "tmax": r["ts"]})
        u["t0"] = min(u["t0"], r["ts"])
        u["tmax"] = max(u["tmax"], r["ts"])
        if r["event_type"] == "purchase":
            u["tp"] = r["ts"] if u["tp"] is None else min(u["tp"], r["ts"])
    durs = []
    for u in by_user.values():
        end = u["tp"] if u["tp"] is not None else u["tmax"]
        durs.append(((end.date() - u["t0"].date()).days,
                     u["tp"] is not None))
    got = q190(spark, SF_DIR).collect()
    # independent KM recursion
    s, at_risk = 1.0, len(durs)
    exp = {}
    for d in sorted({d for d, _ in durs}):
        d_i = sum(1 for x, e in durs if x == d and e)
        c_i = sum(1 for x, e in durs if x == d and not e)
        s *= (1.0 - d_i / at_risk) if at_risk else 0.0
        exp[d] = (at_risk, d_i, c_i, s)
        at_risk -= d_i + c_i
    assert len(got) == len(exp)
    for r in got:
        n_risk, d_i, c_i, s = exp[r["dur_days"]]
        assert (r["n_risk"], r["n_events"], r["n_censored"]) == (n_risk, d_i, c_i)
        assert abs(r["survival"] - s) < 5e-4, (r, s)
    # survival is monotone non-increasing
    surv = [r["survival"] for r in sorted(got, key=lambda r: r["dur_days"])]
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))


# -- q191 Wilson CI vs the closed form ---------------------------------------

def test_wilson_ci_matches_closed_form_and_bounds(spark):
    import math

    from inspectadb_spark.queries.stats import q191

    for r in q191(spark, SF_DIR).collect():
        n, k = r["n"], r["k"]
        p = k / n
        z2 = 1.96 * 1.96
        den = 1 + z2 / n
        ctr = p + z2 / (2 * n)
        rad = 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        assert abs(r["ci_lo"] - (ctr - rad) / den) < 1e-3
        assert abs(r["ci_hi"] - (ctr + rad) / den) < 1e-3
        assert 0.0 <= r["ci_lo"] <= r["rate"] <= r["ci_hi"] <= 1.0


# -- q193 hard negatives vs numpy argmax -------------------------------------

def test_hard_negatives_matches_numpy_argmax(spark):
    from inspectadb_spark.catalog import load_table
    from inspectadb_spark.operators.similarity import hard_negatives

    emb = load_table(spark, "embeddings", SF_DIR)
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    got = {r["q_id"]: r for r in
           hard_negatives(emb, emb.filter("vec_id < 20")).collect()}
    for qi in np.where(ids < 20)[0]:
        sims = (mat @ mat[qi]) / (norms * norms[qi])
        sims = np.round(sims, 4)
        mask = labels != labels[qi]
        # best sim among different-label; ties -> lowest id
        best = max(zip(sims[mask], -ids[mask]))
        r = got[int(ids[qi])]
        assert r["neg_label"] != r["q_label"]
        assert abs(r["sim"] - best[0]) < 2e-4
        assert r["neg_id"] == -best[1] or abs(r["sim"] - best[0]) < 2e-4


# -- q195 PCA projection vs numpy --------------------------------------------

def test_pca_projection_matches_numpy(spark):
    from inspectadb_spark.catalog import load_table
    from inspectadb_spark.operators.similarity import pca_project

    emb = load_table(spark, "embeddings", SF_DIR)
    rows = emb.orderBy("vec_id").collect()
    dims = 16
    X = np.array([r["embedding"][:dims] for r in rows], dtype=np.float64)
    # reference: same quantized sufficient stats -> eigh -> sign fix
    Q = np.round(X * 10_000)
    n = len(Q)
    mu_q = Q.mean(axis=0)
    cov = (Q.T @ Q - np.outer(Q.sum(0), Q.sum(0)) / n) / (n - 1) / 1e8
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:2]
    comps = []
    for idx in order:
        vec = v[:, idx]
        top = int(np.argmax(np.abs(vec)))
        comps.append(-vec if vec[top] < 0 else vec)
    ref = (X - (mu_q / 10_000)) @ np.array(comps).T
    got = pca_project(emb, k=2, dims=dims).orderBy("vec_id").collect()
    G = np.array([[r["pc1"], r["pc2"]] for r in got])
    assert np.allclose(G, ref, atol=1e-6)
    # variance ordering: pc1 explains >= pc2
    assert G[:, 0].var() >= G[:, 1].var() - 1e-12


def test_pca_projection_partition_invariant(spark):
    from inspectadb_spark.catalog import load_table
    from inspectadb_spark.operators.similarity import pca_project

    emb = load_table(spark, "embeddings", SF_DIR)
    a = pca_project(emb, k=2, dims=16).orderBy("vec_id").collect()
    b = pca_project(emb.repartition(17), k=2, dims=16).orderBy("vec_id").collect()
    assert [(r["pc1"], r["pc2"]) for r in a] == [(r["pc1"], r["pc2"]) for r in b]


# -- q197 isotonic fit vs the max-min closed form -----------------------------

def test_isotonic_fit_matches_maxmin_closed_form(spark):
    """PAVA output must equal the independent O(n^3) characterization:
    iso_i = max_{j<=i} min_{k>=j} weighted_avg(y_j..y_k)."""
    from inspectadb_spark.queries.stats import q197

    got = q197(spark, SF_DIR).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["event_type"], []).append(r)
    assert by_g
    for g, rows in by_g.items():
        rows.sort(key=lambda r: r["bin"])
        y = [float(r["obs_rate_ppm"]) for r in rows]
        w = [float(r["n"]) for r in rows]
        n = len(y)

        def wavg(j, k):
            num = sum(w[t] * y[t] for t in range(j, k + 1))
            den = sum(w[t] for t in range(j, k + 1))
            return num / den

        for i, r in enumerate(rows):
            # the classical minimax characterization:
            # iso_i = max_{j<=i} min_{k>=i} weighted_avg(y_j..y_k)
            ref = max(min(wavg(j, k) for k in range(i, n))
                      for j in range(i + 1))
            assert abs(r["iso"] - ref) < 1e-3, (g, i, r["iso"], ref)
        iso = [r["iso"] for r in rows]
        assert iso == sorted(iso)  # monotone non-decreasing


def test_isotonic_fit_preserves_weighted_mean(spark):
    """PAVA block means preserve the total weighted mass (projection
    property): sum(w*iso) == sum(w*y) up to rounding."""
    from inspectadb_spark.queries.stats import q197

    rows = q197(spark, SF_DIR).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["event_type"], []).append(r)
    for g, rs in by_g.items():
        a = sum(r["n"] * r["iso"] for r in rs)
        b = sum(r["n"] * r["obs_rate_ppm"] for r in rs)
        assert abs(a - b) / max(b, 1) < 1e-3, g


def test_ks_one_sided_type_yields_null_not_error(spark):
    """A type whose events all fall in one half (t0=0 or t1=0) must report
    ks = NULL, not abort the whole query under ANSI DIVIDE_BY_ZERO."""
    import datetime as dt

    from inspectadb_spark.queries.registry import _TABLE_CACHE
    from inspectadb_spark.queries.stats import q186

    rows = [(i, dt.datetime(2024, 1, 1, i % 24), i, "steady", float(i))
            for i in range(1, 9)]
    # 'late_only' appears strictly after the midpoint (mid = 10//2 = 5)
    rows += [(9, dt.datetime(2024, 1, 2), 9, "late_only", 1.0),
             (10, dt.datetime(2024, 1, 2), 10, "late_only", 2.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double")
    key = (id(spark), "_ks_null_probe")
    _TABLE_CACHE[key] = {"events": df}
    try:
        out = {r["event_type"]: r for r in
               q186(spark, "_ks_null_probe").collect()}
    finally:
        del _TABLE_CACHE[key]
    assert out["late_only"]["n_first"] == 0
    assert out["late_only"]["ks"] is None
    assert out["steady"]["ks"] is not None


def test_hard_negatives_skips_zero_norm_vectors(spark):
    from inspectadb_spark.operators.similarity import hard_negatives

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 0.0], 1), (3, [0.0, 1.0], 1)],
        "vec_id long, embedding array<double>, label int")
    out = hard_negatives(df, df)
    rows = {r["q_id"]: r for r in out.collect()}
    # the zero vector is neither a query nor a candidate
    assert set(rows) == {1, 3}
    assert rows[1]["neg_id"] == 3 and rows[3]["neg_id"] == 1


# --- heavy hitters (Misra–Gries pruning + exact verify) ---------------------
def test_heavy_hitters_exact_vs_plain_groupby(spark):
    """Output equals the exact GROUP BY ... HAVING answer on a skewed
    synthetic stream, independent of partitioning."""
    from inspectadb_spark.operators.sketches import heavy_hitters

    # Zipf-ish stream: item i repeated (400 // (i + 1)) times + a long tail
    rows = []
    for i in range(50):
        rows += [(f"hot{i:02d}",)] * (400 // (i + 1))
    rows += [(f"tail{j:05d}",) for j in range(3000)]
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "item string").repartition(parts)
        got = {(r["item"], r["cnt"], r["tot"], r["freq_ppm"])
               for r in heavy_hitters(df, col="item", denom=100).collect()}
        total = len(rows)
        from collections import Counter
        c = Counter(r[0] for r in rows)
        want = {(k, v, total, v * 1_000_000 // total)
                for k, v in c.items() if v * 100 >= total}
        assert got == want and len(want) > 0


def test_heavy_hitters_mg_candidates_are_superset(spark):
    """No false negatives from the pruning pass even at the minimal summary
    size m == denom, with heavy mass split evenly across many partitions
    (the adversarial case for per-partition pruning)."""
    from inspectadb_spark.operators.sketches import heavy_hitters

    rows = [("heavy",)] * 500 + [(f"t{j:05d}",) for j in range(5000)]
    df = spark.createDataFrame(rows, "item string").repartition(11)
    out = heavy_hitters(df, col="item", denom=12, m=12).collect()
    assert [r["item"] for r in out] == ["heavy"]
    assert out[0]["cnt"] == 500 and out[0]["tot"] == 5500


def test_theil_sen_ignores_planted_outlier(spark):
    """q244's estimator contract: on a perfectly linear series y = 5x + 3
    with ONE wild outlier, the pairwise-slope median still recovers slope 5
    and intercept 3 exactly, while OLS on the same data does not (the
    robustness that justifies the O(n^2)-pairs cost)."""
    rows = [(x, 5.0 * x + 3.0) for x in range(21)]
    rows[20] = (20, 100000.0)  # wild day at the end, where OLS leverage peaks
    df = spark.createDataFrame(rows, "d int, r double")
    a = df.select(F.col("d").alias("d1"), F.col("r").alias("r1"))
    b = df.select(F.col("d").alias("d2"), F.col("r").alias("r2"))
    slopes = (a.join(b, F.col("d1") < F.col("d2"))
              .select(((F.col("r2") - F.col("r1"))
                       / (F.col("d2") - F.col("d1"))).alias("s")))
    slope = slopes.agg(F.expr("percentile(s, 0.5D)").alias("m")).collect()[0]["m"]
    assert slope == 5.0
    ic = df.select((F.col("r") - slope * F.col("d")).alias("i"))
    intercept = ic.agg(F.expr("percentile(i, 0.5D)").alias("m")).collect()[0]["m"]
    assert intercept == 3.0
    # OLS is dragged by the outlier
    ols = df.agg(F.expr("regr_slope(r, d)").alias("b")).collect()[0]["b"]
    assert abs(ols - 5.0) > 10


def test_join_cardinality_estimate_exact_on_uniform_fk(spark):
    """On a perfectly uniform FK (every parent key appears exactly k times)
    the System-R estimate is EXACT — q245's audit must report err 0."""
    parent = spark.range(0, 10).select(F.col("id").alias("pk"))
    child = spark.range(0, 40).select((F.col("id") % 10).alias("fk"))
    n_l, ndv_l = 40, 10
    n_r, ndv_r = 10, 10
    est = n_l * n_r / max(ndv_l, ndv_r)
    actual = child.join(parent, F.col("fk") == F.col("pk")).count()
    assert est == actual == 40
