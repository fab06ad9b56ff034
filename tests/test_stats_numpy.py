"""Independent numpy references for the round-7 statistical operators.

The DuckDB oracle catches engine-divergence bugs, but NOT the failure
mode where BOTH engines implement the same wrong formula (the oracle is
written alongside the Spark plan). These tests recompute each statistic
from first principles in pure numpy/python directly off the parquet
files and compare to the Spark output at the query's own 4dp contract.
Pattern follows q281's in-review numpy contingency check, promoted to a
permanent suite.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from inspectadb_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def _orders():
    t = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
    t["cents"] = np.round(t["o_totalprice"] * 100).astype(np.int64)
    return t


def _events():
    return pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()


def _one(spark, name):
    row = REGISTRY[name].builder(spark, SF_DIR).collect()
    assert len(row) == 1
    return row[0].asDict()


def test_q285_anova_f_matches_numpy(spark):
    t = _orders()
    groups = [g["cents"].to_numpy(dtype=np.float64)
              for _, g in t.groupby("o_orderpriority")]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = sum(g.sum() for g in groups) / n
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = _one(spark, "q285_anova_f")
    assert got["n"] == n and got["k"] == k
    assert got["f_stat"] == pytest.approx(f, abs=2e-4)
    assert got["eta_sq"] == pytest.approx(ssb / (ssb + ssw), abs=2e-4)


def test_q286_jarque_bera_matches_numpy(spark):
    ev = _events()
    rows = {r["event_type"]: r
            for r in (x.asDict() for x in
                      REGISTRY["q286_jarque_bera"].builder(
                          spark, SF_DIR).collect())}
    for et, g in ev.groupby("event_type"):
        v = g["value"].to_numpy(dtype=np.float64)
        nn = len(v)
        m = v.mean()
        m2 = ((v - m) ** 2).mean()
        g1 = ((v - m) ** 3).mean() / m2 ** 1.5
        g2 = ((v - m) ** 4).mean() / m2 ** 2 - 3
        jb = nn / 6 * (g1 * g1 + g2 * g2 / 4)
        assert rows[et]["n"] == nn
        assert rows[et]["skew"] == pytest.approx(g1, abs=2e-4)
        assert rows[et]["kurt"] == pytest.approx(g2, abs=2e-4)
        assert rows[et]["jb"] == pytest.approx(jb, abs=2e-3)


def test_q288_wilcoxon_matches_numpy(spark):
    t = _orders()
    t["year"] = t["o_orderdate"].dt.year
    t = t[t["year"].isin((1996, 1997))]
    per = t.pivot_table(index="o_custkey", columns="year",
                        values="cents", aggfunc="sum")
    per = per.dropna()
    d = (per[1996] - per[1997]).to_numpy(dtype=np.int64)
    d = d[d != 0]
    ad = np.abs(d)
    # tie-averaged ranks of |d|
    order = np.argsort(ad, kind="stable")
    ranks = np.empty(len(ad), dtype=np.float64)
    sorted_ad = ad[order]
    i = 0
    while i < len(ad):
        j = i
        while j + 1 < len(ad) and sorted_ad[j + 1] == sorted_ad[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2 + 1
        i = j + 1
    n = len(d)
    w_plus = ranks[d > 0].sum()
    _, t_counts = np.unique(ad, return_counts=True)
    tie3 = float((t_counts.astype(np.float64) ** 3 - t_counts).sum())
    mean = n * (n + 1) / 4
    var = n * (n + 1) * (2 * n + 1) / 24 - tie3 / 48
    z = (w_plus - mean) / math.sqrt(var)
    got = _one(spark, "q288_wilcoxon_signed_rank")
    assert got["n"] == n
    assert got["w_plus"] == pytest.approx(w_plus, abs=1e-3)
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_q293_kappa_mcc_matches_numpy(spark):
    t = _orders()
    med = np.median(t["cents"])
    ra = (t["cents"] > med).to_numpy()
    rb = t["o_orderpriority"].isin(("1-URGENT", "2-HIGH")).to_numpy()
    n11 = int(np.sum(ra & rb)); n10 = int(np.sum(ra & ~rb))
    n01 = int(np.sum(~ra & rb)); n00 = int(np.sum(~ra & ~rb))
    n = n11 + n10 + n01 + n00
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n / n
    kappa = (po - pe) / (1 - pe)
    mcc = (n11 * n00 - n10 * n01) / math.sqrt(
        (n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00))
    got = _one(spark, "q293_cohens_kappa")
    assert (got["n11"], got["n10"], got["n01"], got["n00"]) == (
        n11, n10, n01, n00)
    assert got["kappa"] == pytest.approx(kappa, abs=2e-4)
    assert got["mcc"] == pytest.approx(mcc, abs=2e-4)


def _daily_revenue():
    ev = _events()
    p = ev[ev["event_type"] == "purchase"].copy()
    p["day"] = p["ts"].dt.date
    p["cents"] = np.round(p["value"] * 100).astype(np.int64)
    by = p.groupby("day")["cents"].sum().sort_index()
    # calendar-complete (q176 convention): fill missing days with 0
    idx = by.index
    import pandas as pd
    full = pd.date_range(ev["ts"].min().date(), ev["ts"].max().date(),
                         freq="D").date
    return by.reindex(full, fill_value=0).to_numpy(dtype=np.float64), by


def test_q297_ljung_box_matches_numpy(spark):
    y, _ = _daily_revenue()
    n = len(y)
    u = y - y.mean()
    den = (u * u).sum()
    rows = {r["lag"]: r.asDict() for r in
            REGISTRY["q297_ljung_box"].builder(spark, SF_DIR).collect()}
    q = 0.0
    for k in range(1, 8):
        r_k = (u[:-k] * u[k:]).sum() / den
        q += n * (n + 2) * r_k * r_k / (n - k)
        assert rows[k]["acf"] == pytest.approx(r_k, abs=2e-4)
        assert rows[k]["q_lb"] == pytest.approx(q, abs=2e-3)


def test_q311_mann_kendall_matches_numpy(spark):
    # q311 uses the non-gap-filled day-grain series (purchase days only)
    _, by = _daily_revenue()
    y = by.to_numpy(dtype=np.int64)
    n = len(y)
    s = 0
    for i in range(n):
        s += int(np.sign(y[i + 1:] - y[i]).sum())
    _, t_counts = np.unique(y, return_counts=True)
    tie = float(sum(t * (t - 1) * (2 * t + 5)
                    for t in t_counts if t > 1))
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    got = _one(spark, "q311_mann_kendall")
    assert got["n"] == n and got["s_stat"] == s
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_q318_delta_method_matches_numpy(spark):
    ev = _events()
    ev["cents"] = np.where(ev["event_type"] == "purchase",
                           np.round(ev["value"] * 100), 0).astype(np.int64)
    g = ev.groupby("user_id").agg(y=("cents", "sum"),
                                  m=("event_id", "count"))
    y = g["y"].to_numpy(dtype=np.float64)
    m = g["m"].to_numpy(dtype=np.float64)
    u = len(g)
    r = y.sum() / m.sum()
    d = y - r * m
    se = math.sqrt((d * d).sum() / (u - 1) / u) / m.mean()
    got = _one(spark, "q318_delta_method")
    assert got["n_users"] == u
    assert got["ratio"] == pytest.approx(r, abs=2e-4)
    assert got["se"] == pytest.approx(se, abs=2e-4)
    assert got["ci_lo"] == pytest.approx(r - 1.96 * se, abs=2e-3)
    assert got["ci_hi"] == pytest.approx(r + 1.96 * se, abs=2e-3)


def test_q319_cuped_matches_numpy(spark):
    import hashlib

    ev = _events()
    ev["day"] = ev["ts"].dt.day
    ev["cents"] = np.where(ev["event_type"] == "purchase",
                           np.round(ev["value"] * 100), 0).astype(np.int64)
    ev["x"] = np.where(ev["day"] <= 15, ev["cents"], 0)
    ev["y"] = np.where(ev["day"] > 15, ev["cents"], 0)
    g = ev.groupby("user_id").agg(x=("x", "sum"), y=("y", "sum"))
    arm = np.array([
        int(hashlib.md5(f"{uid}:arm".encode()).hexdigest()[0], 16) < 8
        for uid in g.index])
    x = g["x"].to_numpy(dtype=np.float64)
    y = g["y"].to_numpy(dtype=np.float64)
    theta = np.cov(x, y)[0, 1] / np.var(x, ddof=1)
    yc = y - theta * (x - x.mean())
    diff_raw = y[arm].mean() - y[~arm].mean()
    diff_cuped = yc[arm].mean() - yc[~arm].mean()
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    got = _one(spark, "q319_cuped")
    assert got["na"] == int(arm.sum()) and got["nb"] == int((~arm).sum())
    assert got["theta"] == pytest.approx(theta, abs=2e-4)
    assert got["diff_raw"] == pytest.approx(diff_raw, abs=2e-3)
    assert got["diff_cuped"] == pytest.approx(diff_cuped, abs=2e-3)
    assert got["var_reduction"] == pytest.approx(r2, abs=2e-4)


def test_q321_two_proportion_matches_numpy(spark):
    import hashlib

    ev = _events()
    ev["day"] = ev["ts"].dt.day
    conv = (ev.assign(c=((ev["event_type"] == "purchase")
                         & (ev["day"] > 15)
                         & (ev["value"] > 150)).astype(int))
            .groupby("user_id")["c"].max())
    arm = np.array([
        int(hashlib.md5(f"{uid}:arm".encode()).hexdigest()[0], 16) < 8
        for uid in conv.index])
    na, ca = int(arm.sum()), int(conv[arm].sum())
    nb, cb = int((~arm).sum()), int(conv[~arm].sum())
    p1, p2 = ca / na, cb / nb
    pp = (ca + cb) / (na + nb)
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
    got = _one(spark, "q321_two_proportion_z")
    assert (got["na"], got["ca"], got["nb"], got["cb"]) == (na, ca, nb, cb)
    assert got["z"] == pytest.approx(z, abs=2e-4)
    assert got["mde_80"] == pytest.approx(
        (1.96 + 0.8416) * math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb)),
        abs=2e-4)


def test_q322_cmh_matches_numpy(spark):
    t = _orders()
    k = t["o_orderdate"].dt.dayofweek + 1  # pandas Monday=0 -> ISO 1..7
    treat = t["o_orderpriority"].isin(("1-URGENT", "2-HIGH")).to_numpy()
    y = (t["o_orderstatus"] == "F").to_numpy()
    sa = se = sv = snum = sden = 0.0
    for kk in sorted(k.unique()):
        s = (k == kk).to_numpy()
        a = int(np.sum(s & treat & y)); b = int(np.sum(s & treat & ~y))
        c = int(np.sum(s & ~treat & y)); d = int(np.sum(s & ~treat & ~y))
        n = a + b + c + d
        sa += a
        se += (a + b) * (a + c) / n
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        snum += a * d / n
        sden += b * c / n
    chi2 = (abs(sa - se) - 0.5) ** 2 / sv
    got = _one(spark, "q322_cmh_test")
    assert got["sum_a"] == int(sa)
    assert got["cmh_chi2"] == pytest.approx(chi2, abs=2e-3)
    assert got["mh_odds_ratio"] == pytest.approx(snum / sden, abs=2e-4)


def test_q323_stump_matches_numpy(spark):
    ev = _events()
    hr = ev["ts"].dt.hour.to_numpy()
    y = (ev["event_type"] == "purchase").to_numpy().astype(int)
    nt, pt = len(y), int(y.sum())
    best = None
    for h in range(24):
        left = hr <= h
        nl, pl = int(left.sum()), int(y[left].sum())
        if nl == 0 or nl == nt:
            continue
        gl = 2 * (pl / nl) * (1 - pl / nl)
        gr = 2 * ((pt - pl) / (nt - nl)) * (1 - (pt - pl) / (nt - nl))
        ga = nl / nt * gl + (nt - nl) / nt * gr
        if best is None or ga < best[1] - 1e-15:
            best = (h, ga)
    got = _one(spark, "q323_decision_stump")
    assert got["split_hour_le"] == best[0]
    assert got["gini_after"] == pytest.approx(best[1], abs=2e-4)


def _capture_flags():
    """q326's capture occasions: purchase events on days 1-2 / 29-30."""
    ev = _events()
    day = ev["ts"].dt.day
    pur = ev["event_type"] == "purchase"
    c1 = (ev.assign(c=(pur & (day <= 2)).astype(int))
          .groupby("user_id")["c"].max())
    # literally the oracle's day(ts) BETWEEN 29 AND 30 — NOT day >= 29,
    # which would silently diverge on a regenerated fixture with day-31
    # events (ADVICE r8 low item)
    c2 = (ev.assign(c=(pur & day.between(29, 30)).astype(int))
          .groupby("user_id")["c"].max())
    return c1, c2


def test_q326_chapman_matches_numpy(spark):
    c1, c2 = _capture_flags()
    n1, n2 = int(c1.sum()), int(c2.sum())
    m = int((c1 & c2).sum())
    obs = len(c1)
    n_hat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    se = math.sqrt((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
                   / ((m + 1) ** 2 * (m + 2)))
    got = _one(spark, "q326_capture_recapture")
    assert (got["n1"], got["n2"], got["m"], got["observed"]) == (
        n1, n2, m, obs)
    assert got["n_chapman"] == pytest.approx(n_hat, abs=2e-4)
    assert got["se"] == pytest.approx(se, abs=2e-4)


def test_fixture_degeneracy_audit():
    """VERDICT r7 items 3-4: the panel statistics must be arithmetically
    EXERCISED on the fixture, not collapsing to trivial identities (the
    r7 q326 failure mode: capture ≡ census, se ≡ 0). Pure pandas/numpy
    off the parquet — fails loudly if a future fixture regeneration (or
    predicate edit) re-degenerates any of these inputs."""
    import hashlib

    # q326: narrow purchase surveys must leave escapees on BOTH occasions
    c1, c2 = _capture_flags()
    n1, n2, m = int(c1.sum()), int(c2.sum()), int((c1 & c2).sum())
    obs = len(c1)
    assert 0 < m < min(n1, n2), (n1, n2, m)
    assert max(n1, n2) < obs, "capture occasion saturates: estimate≡census"

    # q322 CMH: every weekday stratum needs all four contingency cells
    t = _orders()
    k = t["o_orderdate"].dt.dayofweek
    treat = t["o_orderpriority"].isin(("1-URGENT", "2-HIGH")).to_numpy()
    y = (t["o_orderstatus"] == "F").to_numpy()
    for kk in sorted(k.unique()):
        s = (k == kk).to_numpy()
        cells = (np.sum(s & treat & y), np.sum(s & treat & ~y),
                 np.sum(s & ~treat & y), np.sum(s & ~treat & ~y))
        assert all(c > 0 for c in cells), (kk, cells)

    # q289 Cochran Q: denominator k·N − ΣL² must be positive (some
    # subject misses some quarter) and the column sums must differ
    p = (t[t["o_orderdate"].dt.year == 1996]
         .assign(trt=lambda d: d["o_orderdate"].dt.quarter)
         [["o_custkey", "trt"]].drop_duplicates())
    li = p.groupby("o_custkey")["trt"].count().to_numpy()
    gj = p.groupby("trt")["o_custkey"].count().to_numpy()
    kq = len(gj)
    assert kq * li.sum() - (li * li).sum() > 0, "every subject saturated"
    assert len(np.unique(gj)) > 1, "all column sums equal: Q≡0"

    # q325 Fleiss: the three pseudo-raters must actually disagree
    med = np.median(t["cents"])
    x = ((t["cents"] > med).astype(int)
         + t["o_orderpriority"].isin(("1-URGENT", "2-HIGH")).astype(int)
         + (t["o_orderstatus"] == "F").astype(int)).to_numpy()
    assert len(np.unique(x)) > 1, "raters unanimous on every subject"
    pr = x.sum() / (3 * len(x))
    assert 0.0 < pr < 1.0

    # q321 two-proportion z / q319 CUPED: both arms non-empty with
    # non-saturated conversion, and a usable (nondegenerate) covariate
    ev = _events()
    ev["day"] = ev["ts"].dt.day
    conv = (ev.assign(c=((ev["event_type"] == "purchase")
                         & (ev["day"] > 15)
                         & (ev["value"] > 150)).astype(int))
            .groupby("user_id")["c"].max())
    arm = np.array([
        int(hashlib.md5(f"{uid}:arm".encode()).hexdigest()[0], 16) < 8
        for uid in conv.index])
    for a in (arm, ~arm):
        assert 0 < int(conv[a].sum()) < int(a.sum()), "saturated arm"
    ev["cents"] = np.where(ev["event_type"] == "purchase",
                           np.round(ev["value"] * 100), 0).astype(np.int64)
    ev["x"] = np.where(ev["day"] <= 15, ev["cents"], 0)
    ev["y"] = np.where(ev["day"] > 15, ev["cents"], 0)
    g = ev.groupby("user_id").agg(x=("x", "sum"), y=("y", "sum"))
    assert np.var(g["x"].to_numpy(dtype=np.float64), ddof=1) > 0
    r2 = np.corrcoef(g["x"], g["y"])[0, 1] ** 2
    assert 0.0 < r2 < 0.999, "covariate collinear or useless"

    # q246 disorder (r8 fix): the multiplexed (day, user, ts) arrival
    # order must produce real lateness — the raw event_id order is
    # perfectly ts-sorted on this corpus and gave all-zero profiles
    arr = _events().assign(day=lambda d: d["ts"].dt.date)
    arr = arr.sort_values(["day", "user_id", "ts", "event_id"])
    hwm = arr["ts"].cummax().shift(1)
    late = (hwm - arr["ts"]).dt.total_seconds().clip(lower=0).fillna(0)
    assert (late > 0).sum() > 0, "multiplexed arrival never disordered"

    # q86 affinity (r8 fix): the high-value cut must leave at least one
    # type pair with Jaccard < 1 (unfiltered, every user touched every
    # type and all pairs sat at exactly 1.0)
    hv = _events()
    hv = hv[hv["value"] > 150]
    sets = hv.groupby("event_type")["user_id"].agg(set)
    types = sorted(sets.index)
    jac = [len(sets[a] & sets[b]) / len(sets[a] | sets[b])
           for i, a in enumerate(types) for b in types[i + 1:]]
    assert min(jac) < 1.0, "all high-value type pairs saturated"


def test_q325_fleiss_matches_numpy(spark):
    t = _orders()
    med = np.median(t["cents"])
    x = ((t["cents"] > med).astype(int)
         + t["o_orderpriority"].isin(("1-URGENT", "2-HIGH")).astype(int)
         + (t["o_orderstatus"] == "F").astype(int)).to_numpy()
    n = len(x)
    p_i = (x * x - 3 * x + 3) / 3
    pbar = p_i.mean()
    p = x.sum() / (3 * n)
    pe = p * p + (1 - p) * (1 - p)
    kappa = (pbar - pe) / (1 - pe)
    got = _one(spark, "q325_fleiss_kappa")
    assert got["n"] == n
    assert got["p_obs"] == pytest.approx(pbar, abs=2e-4)
    assert got["fleiss_kappa"] == pytest.approx(kappa, abs=2e-4)


def test_q305_isotropy_matches_numpy(spark):
    """Guards the ADVICE-r7 widening fix: the ssd / s2 sufficient
    statistics recomputed in exact Python integers off the parquet."""
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    q = np.stack([
        np.round(np.asarray(v, dtype=np.float64) * 10000).astype(np.int64)
        for v in emb["embedding"]])
    n, n_dims = q.shape
    sd = [int(x) for x in q.sum(axis=0)]
    ssd = sum(x * x for x in sd)                 # exact int
    s2 = int((q.astype(object) * q.astype(object)).sum())  # exact int
    centroid_norm = math.sqrt(ssd) / n / 10000
    rms_norm = math.sqrt(s2 / n) / 10000
    anisotropy = (ssd / (n * n)) / (s2 / n)
    got = _one(spark, "q305_isotropy")
    assert got["n"] == n and got["n_dims"] == n_dims
    assert got["centroid_norm"] == pytest.approx(centroid_norm, abs=2e-4)
    assert got["rms_norm"] == pytest.approx(rms_norm, abs=2e-4)
    assert got["anisotropy"] == pytest.approx(anisotropy, abs=2e-4)
    # non-degenerate fixture: the cloud is neither centered nor collapsed
    assert 0.0 < anisotropy < 1.0


def test_q306_mutual_information_matches_numpy(spark):
    t = _orders()
    c = (t.groupby(["o_orderpriority", "o_orderstatus"])
         .size().reset_index(name="n"))
    nn = int(c["n"].sum())
    na = c.groupby("o_orderpriority")["n"].sum()
    nb = c.groupby("o_orderstatus")["n"].sum()
    mi = sum(round(float(r["n"] / nn)
                   * math.log(r["n"] * nn
                              / (na[r["o_orderpriority"]]
                                 * nb[r["o_orderstatus"]])), 6)
             for _, r in c.iterrows())
    ha = sum(round(-(v / nn) * math.log(v / nn), 6) for v in na)
    hb = sum(round(-(v / nn) * math.log(v / nn), 6) for v in nb)
    got = _one(spark, "q306_mutual_information")
    assert got["n"] == nn
    assert got["mi_nats"] == pytest.approx(mi, abs=2e-4)
    assert got["nmi"] == pytest.approx(2 * mi / (ha + hb), abs=2e-4)
    assert got["u_a_given_b"] == pytest.approx(mi / ha, abs=2e-4)
    assert got["u_b_given_a"] == pytest.approx(mi / hb, abs=2e-4)
    assert mi > 0  # fixture non-degenerate: attributes actually associate


def test_q316_embedding_mmd_matches_numpy(spark):
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    q = np.stack([
        np.round(np.asarray(v, dtype=np.float64) * 10000).astype(np.int64)
        for v in emb["embedding"]])
    even = (emb["label"].to_numpy() % 2 == 0)
    na, nb = int(even.sum()), int((~even).sum())
    sa, sb = q[even].sum(axis=0), q[~even].sum(axis=0)
    shift = (sa / na - sb / nb) / 10000
    mmd2 = sum(round(1e4 * s * s, 6) for s in shift)
    top = min(range(len(shift)), key=lambda d: (-abs(shift[d]), d))
    got = _one(spark, "q316_embedding_mmd")
    assert (got["na"], got["nb"]) == (na, nb)
    assert got["mmd2_x1e4"] == pytest.approx(mmd2, abs=2e-4)
    assert got["top_dim"] == top
    assert got["top_shift"] == pytest.approx(shift[top], abs=2e-4)


def test_q329_gumbel_matches_numpy(spark):
    ev = _events()
    p = ev[ev["event_type"] == "purchase"].copy()
    p["cents"] = np.round(p["value"] * 100).astype(np.int64)
    mx = p.groupby(p["ts"].dt.date)["cents"].max().to_numpy(np.float64)
    n = len(mx)
    mean, peak = mx.mean(), mx.max()
    beta = mx.std(ddof=1) * math.sqrt(6) / math.pi
    mu = mean - 0.5772156649015329 * beta
    p_ex = 1 - math.exp(-math.exp(-(peak - mu) / beta))
    got = _one(spark, "q329_gumbel_maxima")
    assert got["n"] == n and got["peak"] == peak
    assert got["mu_dollars"] == pytest.approx(mu / 100, abs=2e-4)
    assert got["beta_dollars"] == pytest.approx(beta / 100, abs=2e-4)
    assert got["p_exceed_peak"] == pytest.approx(p_ex, abs=2e-4)
    assert got["return_period_days"] == pytest.approx(1 / p_ex, abs=2e-3)
    assert 0.0 < p_ex < 1.0  # the peak is neither certain nor impossible


def test_q330_theil_matches_numpy(spark):
    t = _orders()
    cust = pq.read_table(f"{SF_DIR}/customer.parquet").to_pandas()
    nk = cust.set_index("c_custkey")["c_nationkey"]
    y = t.groupby("o_custkey")["cents"].sum()
    n, yt = len(y), int(y.sum())
    t_all = sum(round((yi / yt) * math.log(yi * n / yt), 6)
                for yi in y.astype(object))
    g = y.groupby(y.index.map(nk))
    tb = sum(round((yg / yt) * math.log((yg / yt) / (ng / n)), 6)
             for ng, yg in zip(g.size(), g.sum().astype(object)))
    got = _one(spark, "q330_theil_decomposition")
    assert got["n_customers"] == n and got["n_groups"] == g.ngroups
    assert got["theil_t"] == pytest.approx(t_all, abs=2e-4)
    assert got["theil_between"] == pytest.approx(tb, abs=2e-4)
    assert got["theil_within"] == pytest.approx(t_all - tb, abs=2e-4)
    # decomposition sane on the fixture: inequality exists, both parts
    assert t_all > 0 and 0 <= tb < t_all


def test_q331_atkinson_matches_numpy(spark):
    t = _orders()
    y = t.groupby("o_custkey")["cents"].sum().to_numpy(np.float64)
    n, yt = len(y), y.sum()
    sln = sum(round(math.log(v), 6) for v in y)
    geo = math.exp(sln / n)
    got = _one(spark, "q331_atkinson")
    assert got["n"] == n
    assert got["geo_mean_dollars"] == pytest.approx(geo / 100, abs=2e-4)
    assert got["mean_dollars"] == pytest.approx(yt / n / 100, abs=2e-4)
    assert got["atkinson_e1"] == pytest.approx(1 - geo / (yt / n), abs=2e-4)
    assert 0.0 < 1 - geo / (yt / n) < 1.0  # spend is actually unequal


def test_q291_ndcg_matches_numpy(spark):
    ev = _events()
    ev["s"] = (ev["ts"].dt.day <= 15).astype(int)
    ev["r"] = (ev["ts"].dt.day > 15).astype(int)
    c = (ev.groupby(["user_id", "event_type"])[["s", "r"]]
         .sum().reset_index())
    n3, n1 = [], []
    for _, g in c.groupby("user_id"):
        by_model = g.sort_values(["s", "event_type"],
                                 ascending=[False, True])["r"].to_numpy()
        ideal = g.sort_values(["r", "event_type"],
                              ascending=[False, True])["r"].to_numpy()
        dcg3 = sum(round(by_model[i] / math.log2(i + 2), 6)
                   for i in range(min(3, len(by_model))))
        idcg3 = sum(round(ideal[i] / math.log2(i + 2), 6)
                    for i in range(min(3, len(ideal))))
        if idcg3 > 0:
            n3.append(round(dcg3 / idcg3, 6))
            n1.append(round(by_model[0] / ideal[0], 6))
    got = _one(spark, "q291_ndcg")
    assert got["n_users"] == len(n3)
    assert got["avg_ndcg3"] == pytest.approx(sum(n3) / len(n3), abs=2e-4)
    assert got["avg_ndcg1"] == pytest.approx(sum(n1) / len(n1), abs=2e-4)
    # non-degenerate: the first-half ranking is neither perfect nor useless
    assert 0.0 < sum(n3) / len(n3) < 1.0


def _hour_predictor():
    """q294/q295's shared train-half predictor: P(purchase | hour) on
    days 1-15, 6dp-quantized."""
    ev = _events()
    tr = ev[ev["ts"].dt.day <= 15]
    pos = tr.groupby(tr["ts"].dt.hour).apply(
        lambda g: round(float((g["event_type"] == "purchase").sum())
                        / len(g), 6), include_groups=False)
    return ev, pos


def test_q294_brier_murphy_matches_numpy(spark):
    ev, p_hr = _hour_predictor()
    te = ev[ev["ts"].dt.day > 15].copy()
    te["y"] = (te["event_type"] == "purchase").astype(int)
    te["hr"] = te["ts"].dt.hour
    te["dow"] = te["ts"].dt.weekday
    cells = (te.groupby(["dow", "hr"])
             .agg(n=("y", "size"), pos=("y", "sum")).reset_index())
    nn, post = int(cells["n"].sum()), int(cells["pos"].sum())
    ybar = post / nn
    tb = tr_ = tres = 0.0
    for _, r in cells.iterrows():
        p, n, pos = p_hr[r["hr"]], int(r["n"]), int(r["pos"])
        tb += round(n * p * p - 2 * p * pos + pos, 6)
        tr_ += round(n * (p - pos / n) ** 2, 6)
        tres += round(n * (pos / n - ybar) ** 2, 6)
    got = _one(spark, "q294_brier_murphy")
    assert got["n"] == nn
    assert got["brier"] == pytest.approx(tb / nn, abs=2e-4)
    assert got["reliability"] == pytest.approx(tr_ / nn, abs=2e-4)
    assert got["resolution"] == pytest.approx(tres / nn, abs=2e-4)
    assert got["uncertainty"] == pytest.approx(ybar * (1 - ybar), abs=2e-4)
    # Murphy identity holds because the predictor is constant per cell
    assert tb / nn == pytest.approx(
        tr_ / nn - tres / nn + ybar * (1 - ybar), abs=1e-3)


def test_q295_ece_matches_numpy(spark):
    ev, p_hr = _hour_predictor()
    te = ev[ev["ts"].dt.day > 15].copy()
    te["y"] = (te["event_type"] == "purchase").astype(int)
    te["p"] = te["ts"].dt.hour.map(p_hr)
    te = te.dropna(subset=["p"])
    te["bin"] = np.minimum(np.floor(te["p"] * 10), 9).astype(int)
    b = te.groupby("bin").agg(n=("y", "size"), sp=("p", "sum"),
                              pos=("y", "sum"))
    nn = int(b["n"].sum())
    ece = float(np.abs(b["sp"] - b["pos"]).sum()) / nn
    mce = float((np.abs(b["sp"] - b["pos"]) / b["n"]).max())
    got = _one(spark, "q295_ece")
    assert got["n"] == nn and got["n_bins"] == len(b)
    assert got["ece"] == pytest.approx(ece, abs=2e-4)
    assert got["mce"] == pytest.approx(mce, abs=2e-4)


def test_q300_grubbs_matches_numpy(spark):
    _, by = _daily_revenue()  # observed purchase days, NOT gap-filled
    y = by.to_numpy(dtype=np.float64)
    n = len(y)
    g = float(np.max(np.abs(y - y.mean())) / y.std(ddof=1))
    u = np.abs(n * y - y.sum())
    day = min((d for d, uu in zip(by.index, u) if uu == u.max()))
    got = _one(spark, "q300_grubbs")
    assert got["n"] == n
    assert got["g_stat"] == pytest.approx(g, abs=2e-4)
    assert str(got["outlier_day"]) == str(day)


def test_q292_mrr_matches_numpy(spark):
    ev = _events()
    ev["s"] = (ev["ts"].dt.day <= 15).astype(int)
    # high-value relevance (the r8 de-saturation fix: plain second-half
    # activity made every user's top-ranked type relevant -> MRR == 1.0)
    ev["r"] = ((ev["ts"].dt.day > 15) & (ev["value"] > 150)).astype(int)
    c = (ev.groupby(["user_id", "event_type"])[["s", "r"]]
         .sum().reset_index())
    frps = []
    for _, g in c.groupby("user_id"):
        g = g.sort_values(["s", "event_type"], ascending=[False, True])
        rel = g["r"].to_numpy()
        hits = np.nonzero(rel > 0)[0]
        if len(hits):
            frps.append(int(hits[0]) + 1)
    got = _one(spark, "q292_mrr")
    assert got["n_users"] == len(frps)
    assert got["mrr"] == pytest.approx(
        sum(round(1.0 / f, 6) for f in frps) / len(frps), abs=2e-4)
    assert got["hit1_ppm"] == sum(f == 1 for f in frps) * 1000000 // len(frps)
    assert got["hit3_ppm"] == sum(f <= 3 for f in frps) * 1000000 // len(frps)
    # non-degenerate: the first relevant position actually varies
    assert 0.0 < sum(round(1.0 / f, 6) for f in frps) / len(frps) < 1.0


def test_q296_multiclass_prf_matches_numpy(spark):
    ev = _events()
    ev["dow"] = ev["ts"].dt.weekday  # any consistent labeling
    ev["hr"] = ev["ts"].dt.hour
    tr = ev[ev["ts"].dt.day <= 15]
    cnt = (tr.groupby(["dow", "hr", "event_type"]).size()
           .reset_index(name="n"))
    pred = {}
    for (dow, hr), g in cnt.groupby(["dow", "hr"]):
        g = g.sort_values(["n", "event_type"], ascending=[False, True])
        pred[(dow, hr)] = g.iloc[0]["event_type"]
    glob = (cnt.groupby("event_type")["n"].sum()
            .sort_index().sort_values(ascending=False, kind="stable"))
    fallback = min(glob[glob == glob.max()].index)
    te = ev[ev["ts"].dt.day > 15]
    actual = te["event_type"].to_numpy()
    predicted = np.array([pred.get((d, h), fallback)
                          for d, h in zip(te["dow"], te["hr"])])
    classes = sorted(set(actual) | set(predicted))
    got = {r["cls"]: r.asDict() for r in
           REGISTRY["q296_multiclass_prf"].builder(spark, SF_DIR).collect()}
    assert sorted(got) == classes
    for cls in classes:
        act_n = int((actual == cls).sum())
        pred_n = int((predicted == cls).sum())
        tp = int(((actual == cls) & (predicted == cls)).sum())
        row = got[cls]
        assert (row["act_n"], row["pred_n"], row["tp"]) == \
            (act_n, pred_n, tp)
        if pred_n:
            assert row["precision_ppm"] == tp * 1000000 // pred_n
        if act_n:
            assert row["recall_ppm"] == tp * 1000000 // act_n
        assert row["f1"] == pytest.approx(2.0 * tp / (act_n + pred_n),
                                          abs=2e-4)


def test_q298_durbin_watson_matches_numpy(spark):
    _, by = _daily_revenue()  # observed purchase days
    y = by.to_numpy(dtype=np.float64)
    t = np.arange(1, len(y) + 1, dtype=np.float64)
    b, a = np.polyfit(t, y, 1)
    e = y - (a + b * t)
    dw = float(np.sum(np.diff(e) ** 2) / np.sum(e * e))
    got = _one(spark, "q298_durbin_watson")
    assert got["n"] == len(y)
    assert got["dw"] == pytest.approx(dw, abs=2e-4)
    assert got["rho_approx"] == pytest.approx(1 - dw / 2, abs=2e-4)


def test_q299_runs_test_matches_numpy(spark):
    _, by = _daily_revenue()
    cents = by.to_numpy(dtype=np.int64)
    m2 = int(round(2 * float(np.median(cents))))
    s = np.array([1 if 2 * c > m2 else -1 for c in cents if 2 * c != m2])
    runs = int(1 + (np.diff(s) != 0).sum())
    n1, n2 = int((s == 1).sum()), int((s == -1).sum())
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
           / ((n1 + n2) ** 2 * (n1 + n2 - 1)))
    got = _one(spark, "q299_runs_test")
    assert (got["runs"], got["n1"], got["n2"]) == (runs, n1, n2)
    assert got["mu"] == pytest.approx(mu, abs=2e-4)
    assert got["z"] == pytest.approx((runs - mu) / math.sqrt(var), abs=2e-4)
    assert n1 > 0 and n2 > 0  # both sign classes occur on the fixture


def test_q301_good_turing_matches_numpy(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    from collections import Counter
    vc = Counter(w for t in docs["text"] for w in t.split(" ") if w)
    cc = Counter(vc.values())            # r -> N_r
    n = sum(vc.values())
    rows = {r["r"]: r.asDict() for r in
            REGISTRY["q301_good_turing"].builder(spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(cc)[:10]
    for r in rows:
        n_r, n_r1 = cc[r], cc.get(r + 1, 0)
        assert rows[r]["n_r"] == n_r and rows[r]["n_r1"] == n_r1
        assert rows[r]["r_star"] == pytest.approx(
            (r + 1.0) * n_r1 / n_r, abs=2e-4)
        assert rows[r]["mass_ppm"] == (r + 1) * n_r1 * 1000000 // n


def test_q287_levene_matches_numpy(spark):
    t = _orders()
    z = t.groupby("o_orderpriority")["cents"].transform(
        lambda g: np.abs(g - g.mean()))
    g = z.groupby(t["o_orderpriority"])
    n, k = len(z), g.ngroups
    sb = float((g.sum() ** 2 / g.size()).sum())
    st, qt = float(z.sum()), float((z ** 2).sum())
    w = ((sb - st * st / n) / (k - 1)) / ((qt - sb) / (n - k))
    got = _one(spark, "q287_levene_mean")
    assert (got["n"], got["k"]) == (n, k)
    assert got["w_stat"] == pytest.approx(w, abs=2e-4)
    assert got["eta_sq"] == pytest.approx(
        (sb - st * st / n) / (qt - st * st / n), abs=2e-4)


def test_q289_cochran_q_matches_numpy(spark):
    t = _orders()
    p = (t[t["o_orderdate"].dt.year == 1996]
         .assign(trt=lambda d: d["o_orderdate"].dt.quarter)
         [["o_custkey", "trt"]].drop_duplicates())
    li = p.groupby("o_custkey").size().to_numpy()
    gj = p.groupby("trt").size().to_numpy()
    k, nn = len(gj), int(li.sum())
    q = ((k - 1.0) * (k * float((gj.astype(np.int64) ** 2).sum())
                      - float(nn) * nn)
         / (k * float(nn) - float((li.astype(np.int64) ** 2).sum())))
    got = _one(spark, "q289_cochran_q")
    assert (got["n_subj"], got["k"]) == (len(li), k)
    assert got["q_stat"] == pytest.approx(q, abs=2e-4)


def test_q290_bartlett_matches_numpy(spark):
    t = _orders()
    g = t.groupby("o_orderpriority")["cents"]
    n, k = len(t), g.ngroups
    ns = g.size().to_numpy(np.float64)
    # the query computes ss as q - s^2/n in doubles; recompute that way
    ss = np.array([float((x.astype(object) ** 2).sum())
                   - float(x.astype(object).sum()) ** 2 / len(x)
                   for _, x in g])
    ssw = ss.sum()
    sum_ln = float(((ns - 1) * np.log(ss / (ns - 1))).sum())
    sum_inv = float((1.0 / (ns - 1)).sum())
    ln_pooled = math.log(ssw / (n - k))
    x2 = ((n - k) * ln_pooled - sum_ln) \
        / (1 + (sum_inv - 1.0 / (n - k)) / (3.0 * (k - 1)))
    got = _one(spark, "q290_bartlett")
    assert (got["n"], got["k"]) == (n, k)
    assert got["ln_pooled_var"] == pytest.approx(ln_pooled, abs=2e-4)
    assert got["bartlett_x2"] == pytest.approx(x2, abs=2e-3)


def test_q328_jackknife_matches_numpy(spark):
    ev = _events()
    ev["k"] = ev["ts"].dt.weekday + 1  # isodow
    ev["pc"] = np.where(ev["event_type"] == "purchase",
                        np.round(ev["value"] * 100), 0).astype(np.int64)
    s = ev.groupby("k").agg(y=("pc", "sum"), m=("pc", "size"))
    sy, sm, kk = int(s["y"].sum()), int(s["m"].sum()), len(s)
    reps = [round((sy - yi) / (sm - mi), 6)
            for yi, mi in zip(s["y"], s["m"])]
    rbar = sum(reps) / kk
    srr = sum(r * r for r in reps)
    se = math.sqrt((kk - 1.0) / kk * (srr - kk * rbar * rbar))
    got = _one(spark, "q328_jackknife_ratio_se")
    assert got["n_strata"] == kk
    assert got["ratio"] == pytest.approx(sy / sm, abs=2e-4)
    assert got["se_jack"] == pytest.approx(se, abs=2e-4)
    assert se > 0  # strata genuinely differ on the fixture


def test_q334_icc_matches_numpy(spark):
    ev = _events()
    ev["cents"] = np.round(ev["value"] * 100).astype(np.int64)
    u = ev.groupby("user_id")["cents"].agg(["count", "sum"])
    q_by = ev.groupby("user_id")["cents"].apply(
        lambda x: int((x.astype(object) ** 2).sum()))
    uu, n = len(u), int(u["count"].sum())
    st = int(u["sum"].sum())
    qt = float(q_by.sum())
    sb = float((u["sum"].astype(np.float64) ** 2 / u["count"]).sum())
    smm = float((u["count"].astype(np.float64) ** 2).sum())
    msb = (sb - float(st) * st / n) / (uu - 1)
    msw = (qt - sb) / (n - uu)
    m0 = (n - smm / n) / (uu - 1)
    icc = (msb - msw) / (msb + (m0 - 1) * msw)
    deff = 1 + (n / uu - 1) * icc
    got = _one(spark, "q334_icc_design_effect")
    assert (got["n_events"], got["n_users"]) == (n, uu)
    assert got["icc"] == pytest.approx(icc, abs=2e-4)
    assert got["deff"] == pytest.approx(deff, abs=2e-4)
    assert got["eff_sample_size"] == pytest.approx(n / deff, abs=2e-2)
    # non-degenerate: msb != msw so the estimator is exercised (negative
    # ICC is a legitimate ANOVA estimate — within-user variance can
    # exceed between-user)
    assert icc != 0 and -1 < icc < 1


def test_q335_winsorized_matches_numpy(spark):
    import hashlib

    ev = _events()
    ev["pc"] = np.where(ev["event_type"] == "purchase",
                        np.round(ev["value"] * 100), 0).astype(np.int64)
    y = ev.groupby("user_id")["pc"].sum()
    arm_a = np.array([
        int(hashlib.md5(f"{uid}:arm".encode()).hexdigest()[0], 16) < 8
        for uid in y.index])
    yv = y.to_numpy(np.float64)
    p_lo, p_hi = np.percentile(yv, 5), np.percentile(yv, 95)
    yw = np.clip(yv, p_lo, p_hi)
    keep = (yv >= p_lo) & (yv <= p_hi)
    na, nb = int(arm_a.sum()), int((~arm_a).sum())
    swa = sum(round(v, 6) for v in yw[arm_a])
    swb = sum(round(v, 6) for v in yw[~arm_a])
    ka, kb = int((arm_a & keep).sum()), int((~arm_a & keep).sum())
    sta, stb = float(yv[arm_a & keep].sum()), float(yv[~arm_a & keep].sum())
    got = _one(spark, "q335_winsorized_ab")
    assert (got["na"], got["nb"], got["ka"], got["kb"]) == (na, nb, ka, kb)
    assert got["win_diff_dollars"] == pytest.approx(
        (swa / na - swb / nb) / 100, abs=2e-3)
    assert got["trim_diff_dollars"] == pytest.approx(
        (sta / ka - stb / kb) / 100, abs=2e-3)
    # the pooled clamp actually trims someone (per-arm can be all-in
    # at sf0.001's 15-user population)
    assert ka + kb < na + nb


def test_q324_calibration_fit_matches_numpy(spark):
    ev, p_hr = _hour_predictor()
    te = ev[ev["ts"].dt.day > 15].copy()
    te["p"] = te["ts"].dt.hour.map(p_hr)
    te = te.dropna(subset=["p"])
    yv = (te["event_type"] == "purchase").astype(int).to_numpy()
    p = te["p"].to_numpy(np.float64)
    n, sp, spp = len(p), p.sum(), (p * p).sum()
    sy, spy = int(yv.sum()), (p * yv).sum()
    slope = (n * spy - sp * sy) / (n * spp - sp * sp)
    intercept = (sy - slope * sp) / n
    got = _one(spark, "q324_calibration_fit")
    assert (got["n"], got["n_pos"]) == (n, sy)
    assert got["slope"] == pytest.approx(slope, abs=2e-4)
    assert got["intercept"] == pytest.approx(intercept, abs=2e-4)


def test_q313_page_trend_matches_numpy(spark):
    t = _orders()
    t["blk"] = t["o_orderdate"].dt.strftime("%Y-%m")
    t["trt"] = t["o_orderpriority"].str[0].astype(int)
    cell = (t.groupby(["blk", "trt"])["cents"].sum().reset_index(name="v"))
    k = cell["trt"].nunique()
    full = cell.groupby("blk").size()
    full = set(full[full == k].index)
    l2 = 0
    n_blocks = 0
    for blk, g in cell[cell["blk"].isin(full)].groupby("blk"):
        n_blocks += 1
        vs = g["v"].to_numpy()
        # doubled tie-averaged rank: 2*rank + tiecount - 1
        for trt, v in zip(g["trt"], vs):
            rank = 1 + int((vs < v).sum())
            tie = int((vs == v).sum())
            l2 += trt * (2 * rank + tie - 1)
    nb = n_blocks
    l_stat = l2 / 2.0
    mu = nb * k * (k + 1) ** 2 / 4
    sd = math.sqrt(nb * k * k * (k + 1) * (k * k - 1) / 144)
    got = _one(spark, "q313_page_trend")
    assert (got["n"], got["k"]) == (nb, k)
    assert got["l_stat"] == pytest.approx(l_stat, abs=1e-3)
    assert got["z"] == pytest.approx((l_stat - mu) / sd, abs=2e-4)


def test_q302_kn_bigram_xent_matches_numpy(spark):
    """The interpolated Kneser-Ney model rebuilt in pure Python off the
    parquet: five exact-integer model tables, the 0.75 absolute
    discount, continuation backoff with the add-1 floor, 6dp-quantized
    per-token logprobs — the most formula-dense query in the corpus."""
    import hashlib
    from collections import Counter, defaultdict

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    split = docs["doc_id"].map(
        lambda i: "train"
        if int(hashlib.md5(f"{i}:split".encode()).hexdigest()[0], 16) < 13
        else "test")
    # model vocabulary: top-25 train unigrams (count DESC, token)
    uni = Counter()
    for text, sp in zip(docs["text"], split):
        if sp == "train":
            uni.update(t for t in text.split(" ") if t)
    voc = {t for t, _ in sorted(uni.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:25]}
    big = Counter()
    test_bgs = []  # (source, w1, w2)
    for text, src, sp in zip(docs["text"], docs["source"], split):
        w = [t for t in text.split(" ") if t]
        for a, bch in zip(w, w[1:]):
            if sp == "train":
                if a in voc and bch in voc:
                    big[(a, bch)] += 1
            else:
                test_bgs.append((src, a, bch))
    c1, t1 = Counter(), Counter()
    t2 = Counter()
    for (a, bch), c in big.items():
        c1[a] += c
        t1[a] += 1
        t2[bch] += 1
    b = len(big)
    v = len({a for a, _ in big} | {bch for _, bch in big})
    per = defaultdict(lambda: [0, 0, 0, 0.0])  # n, oov, unseen, sum_lp
    for src, a, bch in test_bgs:
        pc = (t2.get(bch, 0) + 1.0) / (b + v + 1)
        if a not in c1:
            p = pc
            per[src][1] += 1
        else:
            p = (max(big.get((a, bch), 0) - 0.75, 0)
                 + 0.75 * t1[a] * pc) / c1[a]
        if (a, bch) not in big:
            per[src][2] += 1
        per[src][0] += 1
        per[src][3] += round(math.log(p), 6)
    rows = {r["source"]: r.asDict() for r in
            REGISTRY["q302_kn_bigram_xent"].builder(
                spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(per)
    for src, (n, oov, unseen, slp) in per.items():
        r = rows[src]
        assert r["n_bigrams"] == n
        assert r["hist_oov_ppm"] == oov * 1000000 // n
        assert r["bg_unseen_ppm"] == unseen * 1000000 // n
        assert r["xent_nats"] == pytest.approx(-slp / n, abs=2e-4)
    # non-degenerate: BOTH backoff paths actually exercised (the
    # truncated vocabulary makes hist-OOV real; pre-truncation it was
    # identically zero — q326 class)
    assert any(p[1] > 0 for p in per.values())
    assert any(p[2] > 0 for p in per.values())


def test_q310_permutation_entropy_matches_numpy(spark):
    _, by = _daily_revenue()
    y = by.to_numpy(np.int64)
    from collections import Counter
    pats = Counter()
    for a, bv, c in zip(y, y[1:], y[2:]):
        pats[(a < bv) * 4 + (bv < c) * 2 + (a < c) * 1] += 1
    n = sum(pats.values())
    h = sum(round(-(np_ / n) * math.log(np_ / n), 6)
            for np_ in pats.values())
    got = _one(spark, "q310_permutation_entropy")
    assert (got["n"], got["n_patterns"]) == (n, len(pats))
    assert got["pe_nats"] == pytest.approx(h, abs=2e-4)
    assert got["pe_norm"] == pytest.approx(h / math.log(6), abs=2e-4)
    assert len(pats) > 1  # the series is not monotone on the fixture


def test_q312_cochran_armitage_matches_numpy(spark):
    t = _orders()
    x = t["o_orderpriority"].str[0].astype(int).to_numpy()
    y = (t["o_orderstatus"] == "F").astype(int).to_numpy()
    nn, rr = len(x), int(y.sum())
    pbar = rr / nn
    sx = float(x.sum())
    sxx = float((x.astype(np.int64) ** 2).sum())
    sxr = float((x * y).sum())
    z = (sxr - pbar * sx) / math.sqrt(
        pbar * (1 - pbar) * (sxx - sx * sx / nn))
    got = _one(spark, "q312_cochran_armitage")
    assert (got["n"], got["n_pos"]) == (nn, rr)
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_q317_seasonal_mann_kendall_matches_numpy(spark):
    ev = _events()
    p = ev[ev["event_type"] == "purchase"].copy()
    p["cents"] = np.round(p["value"] * 100).astype(np.int64)
    p["day"] = p["ts"].dt.date
    p["dow"] = p["ts"].dt.weekday + 1
    rev = p.groupby(["day", "dow"])["cents"].sum().reset_index()
    s = 0
    var = 0.0
    n_days = 0
    for _, g in rev.groupby("dow"):
        g = g.sort_values("day")
        v = g["cents"].to_numpy(np.int64)
        nd = len(v)
        n_days += nd
        for i in range(nd):
            s += int(np.sign(v[i + 1:] - v[i]).sum())
        _, tc = np.unique(v, return_counts=True)
        tt = float(sum(t * (t - 1) * (2 * t + 5) for t in tc if t > 1))
        var += (nd * (nd - 1.0) * (2 * nd + 5) - tt) / 18
    z = ((s - 1) / math.sqrt(var) if s > 0
         else (s + 1) / math.sqrt(var) if s < 0 else 0.0)
    got = _one(spark, "q317_seasonal_mann_kendall")
    assert (got["n_days"], got["s_stat"]) == (n_days, s)
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_q327_diversity_matches_numpy(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    c = docs.groupby(["lang", "source"]).size().reset_index(name="n")
    rows = {r["lang"]: r.asDict() for r in
            REGISTRY["q327_diversity_index"].builder(
                spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(c["lang"].unique())
    for lang, g in c.groupby("lang"):
        n = g["n"].to_numpy(np.int64)
        nt = int(n.sum())
        h = sum(round(-(ni / nt) * math.log(ni / nt), 6) for ni in n)
        snn = float((n.astype(object) ** 2).sum())
        r = rows[lang]
        assert r["n_sources"] == len(n)
        assert r["shannon_nats"] == pytest.approx(h, abs=2e-4)
        assert r["eff_sources_q1"] == pytest.approx(math.exp(h), abs=2e-3)
        assert r["simpson"] == pytest.approx(1 - snn / (nt * nt), abs=2e-4)
        assert r["eff_sources_q2"] == pytest.approx(nt * nt / snn, abs=2e-3)
        assert len(n) > 1  # every language actually mixes sources


def test_q303_flesch_matches_numpy(spark):
    import re as _re

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    rows = {r["source"]: r.asDict() for r in
            REGISTRY["q303_flesch"].builder(spark, SF_DIR).collect()}
    for src, g in docs.groupby("source"):
        words = sum(len([w for w in t.split(" ") if w]) for t in g["text"])
        sents = sum(max(len(_re.findall(r"[.!?]+", t)), 1)
                    for t in g["text"])
        syll = sum(len(_re.findall(r"[aeiouy]+", t.lower()))
                   for t in g["text"])
        r = rows[src]
        assert (r["n_docs"], r["words"], r["sents"], r["syll"]) == \
            (len(g), words, sents, syll)
        assert r["flesch_ease"] == pytest.approx(
            206.835 - 1.015 * words / sents - 84.6 * syll / words,
            abs=2e-3)
        assert r["fk_grade"] == pytest.approx(
            0.39 * words / sents + 11.8 * syll / words - 15.59, abs=2e-3)


def test_q304_hapax_matches_numpy(spark):
    from collections import Counter

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    rows = {r["source"]: r.asDict() for r in
            REGISTRY["q304_hapax"].builder(spark, SF_DIR).collect()}
    for src, g in docs.groupby("source"):
        vc = Counter(w for t in g["text"] for w in t.split(" ") if w)
        vocab, tokens = len(vc), sum(vc.values())
        hapax = sum(1 for c in vc.values() if c == 1)
        dis = sum(1 for c in vc.values() if c == 2)
        r = rows[src]
        assert (r["vocab"], r["tokens"], r["hapax"], r["dis"]) == \
            (vocab, tokens, hapax, dis)
        assert r["ttr_ppm"] == vocab * 1000000 // tokens
        assert r["hapax_share_ppm"] == hapax * 1000000 // vocab
        assert r["sichel_s_ppm"] == dis * 1000000 // vocab


def _source_bigrams():
    from collections import Counter

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    c = Counter()
    for src, t in zip(docs["source"], docs["text"]):
        w = [x for x in t.split(" ") if x]
        for a, b in zip(w, w[1:]):
            c[(src, a, b)] += 1
    return c


def test_q307_entropy_rate_matches_numpy(spark):
    from collections import Counter, defaultdict

    c = _source_bigrams()
    c1, nb = Counter(), Counter()
    for (src, a, _), n in c.items():
        c1[(src, a)] += n
        nb[src] += n
    h = defaultdict(float)
    for (src, a, _), n in c.items():
        h[src] += round(-(n / nb[src]) * math.log(n / c1[(src, a)]), 6)
    rows = {r["source"]: r.asDict() for r in
            REGISTRY["q307_entropy_rate"].builder(spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(h)
    for src in h:
        assert rows[src]["h_rate_nats"] == pytest.approx(h[src], abs=2e-4)


def test_q308_hellinger_matches_numpy(spark):
    from collections import Counter, defaultdict

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    gt = defaultdict(Counter)
    for src, t in zip(docs["source"], docs["text"]):
        gt[src].update(w for w in t.split(" ") if w)
    tot = {g: sum(c.values()) for g, c in gt.items()}
    rows = {(r["source_a"], r["source_b"]): r.asDict() for r in
            REGISTRY["q308_hellinger"].builder(spark, SF_DIR).collect()}
    srcs = sorted(gt)
    for i, ga in enumerate(srcs):
        for gb in srcs[i + 1:]:
            shared = set(gt[ga]) & set(gt[gb])
            if not shared:
                assert (ga, gb) not in rows
                continue
            bc = sum(round(math.sqrt((gt[ga][tk] / tot[ga])
                                     * (gt[gb][tk] / tot[gb])), 6)
                     for tk in shared)
            r = rows[(ga, gb)]
            assert r["n_shared"] == len(shared)
            assert r["bc"] == pytest.approx(bc, abs=2e-4)
            assert r["hellinger"] == pytest.approx(
                math.sqrt(max(1 - bc, 0)), abs=2e-4)


def test_q315_markov_entropy_matches_numpy(spark):
    from collections import Counter

    ev = _events().sort_values(["user_id", "ts", "event_id"])
    trans = Counter()
    for _, g in ev.groupby("user_id"):
        et = g["event_type"].to_list()
        for a, b in zip(et, et[1:]):
            trans[(a, b)] += 1
    na = Counter()
    for (a, _), n in trans.items():
        na[a] += n
    nn = sum(trans.values())
    h = sum(round(-(n / nn) * math.log(n / na[a]), 6)
            for (a, _), n in trans.items())
    got = _one(spark, "q315_markov_entropy")
    assert got["n_transitions"] == nn
    assert got["h_rate_nats"] == pytest.approx(h, abs=2e-4)
    assert got["h_rate_norm"] == pytest.approx(h / math.log(5), abs=2e-4)


def test_q332_decayed_ltv_matches_numpy(spark):
    t = _orders()
    mx = t["o_orderdate"].max()
    lam = 0.007701635339554948
    t["decay"] = [round(c * math.exp(-lam * (mx - d).days), 6)
                  for c, d in zip(t["cents"], t["o_orderdate"])]
    g = t.groupby("o_custkey").agg(raw=("cents", "sum"),
                                   ltv=("decay", "sum"))
    raw_total, decayed = int(g["raw"].sum()), float(g["ltv"].sum())
    top = g.sort_index().sort_values("ltv", ascending=False,
                                     kind="stable").iloc[0]
    got = _one(spark, "q332_decayed_ltv")
    assert got["n_customers"] == len(g)
    assert got["raw_total_dollars"] == pytest.approx(raw_total / 100,
                                                     abs=2e-2)
    assert got["decayed_total_dollars"] == pytest.approx(decayed / 100,
                                                         abs=2e-2)
    assert got["retention_ppm"] == math.floor(decayed * 1000000 / raw_total)
    assert got["top_cust"] == top.name
    assert got["top_ltv_dollars"] == pytest.approx(
        float(top["ltv"]) / 100, abs=2e-3)
    assert 0 < got["retention_ppm"] < 1000000  # decay genuinely bites


def test_q333_cold_start_matches_numpy(spark):
    ev = _events()
    ev["day"] = ev["ts"].dt.date
    first = ev.groupby("user_id")["day"].min()
    ev["is_first"] = (ev["day"] == ev["user_id"].map(first)).astype(int)
    d = ev.groupby("day").agg(n=("is_first", "size"),
                              nf=("is_first", "sum"))
    rows = {str(r["day"]): r.asDict() for r in
            REGISTRY["q333_cold_start_rate"].builder(
                spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(str(d_) for d_ in d.index)
    for day, r in d.iterrows():
        row = rows[str(day)]
        assert (row["n_events"], row["n_first_day"]) == \
            (int(r["n"]), int(r["nf"]))
        assert row["cold_start_ppm"] == int(r["nf"]) * 1000000 // int(r["n"])


def test_q309_vocab_jaccard_matches_numpy(spark):
    from collections import defaultdict

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    vocab = defaultdict(set)
    for src, t in zip(docs["source"], docs["text"]):
        vocab[src].update(w for w in t.split(" ") if w)
    rows = {(r["source_a"], r["source_b"]): r.asDict() for r in
            REGISTRY["q309_vocab_jaccard"].builder(
                spark, SF_DIR).collect()}
    srcs = sorted(vocab)
    for i, ga in enumerate(srcs):
        for gb in srcs[i + 1:]:
            ni = len(vocab[ga] & vocab[gb])
            if ni == 0:
                assert (ga, gb) not in rows
                continue
            nu = len(vocab[ga] | vocab[gb])
            r = rows[(ga, gb)]
            assert (r["n_inter"], r["n_union"]) == (ni, nu)
            assert r["jaccard_ppm"] == ni * 1000000 // nu
            assert r["overlap_coef_ppm"] == \
                ni * 1000000 // min(len(vocab[ga]), len(vocab[gb]))


def test_q314_rbo_matches_numpy(spark):
    ev = _events()
    ev["s1"] = (ev["ts"].dt.day <= 15).astype(int)
    ev["s2"] = (ev["ts"].dt.day > 15).astype(int)
    c = ev.groupby("event_type")[["s1", "s2"]].sum()
    ra = {t: i + 1 for i, t in enumerate(
        sorted(c.index, key=lambda t: (-c.loc[t, "s1"], t)))}
    rb = {t: i + 1 for i, t in enumerate(
        sorted(c.index, key=lambda t: (-c.loc[t, "s2"], t)))}
    k = len(c)
    total = sum(
        round(0.9 ** (d - 1)
              * sum(1 for t in c.index if ra[t] <= d and rb[t] <= d) / d,
              6)
        for d in range(1, k + 1))
    got = _one(spark, "q314_rbo")
    assert got["k"] == k
    assert got["rbo_trunc"] == pytest.approx(0.1 * total, abs=2e-4)


def test_q320_srm_matches_numpy(spark):
    import hashlib

    ev = _events()
    users = ev["user_id"].unique()
    na = sum(int(hashlib.md5(f"{u}:arm".encode()).hexdigest()[0], 16) < 8
             for u in users)
    nb = len(users) - na
    got = _one(spark, "q320_srm_check")
    assert (got["na"], got["nb"]) == (na, nb)
    assert got["share_a_ppm"] == na * 1000000 // (na + nb)
    assert got["chi2"] == pytest.approx(
        (na - nb) ** 2 / (na + nb), abs=2e-4)
    assert got["z"] == pytest.approx(
        (na - nb) / math.sqrt(na + nb), abs=2e-4)


def _lineitem():
    return pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()


def test_q273_spearman_matches_numpy(spark):
    import pandas as pd

    li = _lineitem()
    x = np.round(li["l_quantity"]).astype(np.int64)
    y = np.round(li["l_extendedprice"] * 100).astype(np.int64)
    rx = (pd.Series(x).rank(method="average") * 2).astype(int)
    ry = (pd.Series(y).rank(method="average") * 2).astype(int)
    n = len(x)
    sx, sy = int(rx.sum()), int(ry.sum())
    sxy = int((rx.astype(object) * ry.astype(object)).sum())
    sxx = int((rx.astype(object) ** 2).sum())
    syy = int((ry.astype(object) ** 2).sum())
    rho = float(n * sxy - sx * sy) / math.sqrt(
        float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    got = _one(spark, "q273_spearman")
    assert got["n"] == n
    assert got["pearson_r"] == pytest.approx(
        float(np.corrcoef(x, y)[0, 1]), abs=2e-4)
    assert got["spearman_rho"] == pytest.approx(rho, abs=2e-4)


def test_q274_mann_whitney_matches_numpy(spark):
    import pandas as pd

    t = _orders()
    grp = t["o_orderpriority"].isin(("1-URGENT", "2-HIGH")).to_numpy()
    rank2 = (pd.Series(t["cents"]).rank(method="average") * 2).astype(int)
    n, n1 = len(t), int(grp.sum())
    n2 = n - n1
    r1x2 = int(rank2[grp].sum())
    _, tc = np.unique(t["cents"], return_counts=True)
    t3t = float((tc.astype(np.float64) ** 3 - tc).sum())
    u1 = (r1x2 - n1 * (n1 + 1)) / 2
    z = (r1x2 - n1 * (n1 + 1) - n1 * n2) / (
        2 * math.sqrt(n1 * n2 * ((n + 1) - t3t / (n * (n - 1))) / 12))
    got = _one(spark, "q274_mann_whitney")
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert got["u1"] == pytest.approx(u1, abs=1e-3)
    assert got["auc"] == pytest.approx(u1 / (n1 * n2), abs=2e-4)
    assert got["z"] == pytest.approx(z, abs=2e-4)


def test_q275_kruskal_wallis_matches_numpy(spark):
    import pandas as pd

    t = _orders()
    rank2 = (pd.Series(t["cents"]).rank(method="average") * 2).astype(int)
    g = rank2.groupby(t["o_orderpriority"])
    n, k = len(t), g.ngroups
    q = float((g.sum().astype(np.float64) ** 2 / g.size()).sum())
    _, tc = np.unique(t["cents"], return_counts=True)
    t3t = float((tc.astype(np.float64) ** 3 - tc).sum())
    h_raw = 3 * q / (n * (n + 1.0)) - 3 * (n + 1.0)
    h_tie = h_raw / (1 - t3t / (float(n) * n * n - n))
    got = _one(spark, "q275_kruskal_wallis")
    assert (got["n"], got["k"]) == (n, k)
    assert got["h"] == pytest.approx(h_raw, abs=2e-3)
    assert got["h_tie"] == pytest.approx(h_tie, abs=2e-3)
    assert got["eps2"] == pytest.approx(h_tie / (n - 1), abs=2e-4)


def test_q276_kendall_tau_matches_numpy(spark):
    from collections import Counter

    li = _lineitem()
    x = np.round(li["l_quantity"]).astype(np.int64)
    y = np.round(li["l_discount"] * 100).astype(np.int64)
    cells = Counter(zip(x, y))
    items = list(cells.items())
    nn = sum(cells.values())
    tx, ty = Counter(), Counter()
    for (cx, cy), n in items:
        tx[cx] += n
        ty[cy] += n
    sxx = sum(v * v for v in tx.values())
    syy = sum(v * v for v in ty.values())
    C = D = 0
    for (x1, y1), n1 in items:
        for (x2, y2), n2 in items:
            if x2 > x1 and y2 > y1:
                C += n1 * n2
            elif x2 > x1 and y2 < y1:
                D += n1 * n2
    tau = (C - D) / math.sqrt((nn * nn - sxx) / 2 * ((nn * nn - syy) / 2))
    got = _one(spark, "q276_kendall_tau")
    assert got["n"] == nn
    assert (got["concordant"], got["discordant"]) == (C, D)
    assert got["tau_b"] == pytest.approx(tau, abs=2e-4)
    assert got["gamma"] == pytest.approx((C - D) / (C + D), abs=2e-4)


def test_q277_friedman_matches_numpy(spark):
    t = _orders()
    t["blk"] = t["o_orderdate"].dt.strftime("%Y-%m")
    cell = (t.groupby(["blk", "o_orderpriority"])["cents"]
            .sum().reset_index(name="v"))
    k = cell["o_orderpriority"].nunique()
    sizes = cell.groupby("blk").size()
    full = set(sizes[sizes == k].index)
    from collections import Counter
    r2j = Counter()
    nb = 0
    for blk, g in cell[cell["blk"].isin(full)].groupby("blk"):
        nb += 1
        vs = g["v"].to_numpy()
        for trt, v in zip(g["o_orderpriority"], vs):
            r2j[trt] += 2 * (1 + int((vs < v).sum())) + int((vs == v).sum()) - 1
    q2 = sum(float(r) ** 2 for r in r2j.values())
    q_stat = 3 * q2 / (nb * k * (k + 1.0)) - 3 * nb * (k + 1.0)
    got = _one(spark, "q277_friedman")
    assert (got["n"], got["k"]) == (nb, k)
    assert got["q_stat"] == pytest.approx(q_stat, abs=2e-3)
    assert got["kendall_w"] == pytest.approx(q_stat / (nb * (k - 1.0)),
                                             abs=2e-4)


def test_q278_brown_forsythe_matches_numpy(spark):
    t = _orders()
    m2 = t.groupby("o_orderpriority")["cents"].median() * 2
    z2 = np.abs(2 * t["cents"]
                - t["o_orderpriority"].map(m2).astype(np.int64))
    g = z2.groupby(t["o_orderpriority"])
    n, k = len(t), g.ngroups
    sb = float((g.sum().astype(np.float64) ** 2 / g.size()).sum())
    st, qt = float(z2.sum()), float((z2.astype(object) ** 2).sum())
    f = ((sb - st * st / n) / (k - 1)) / ((qt - sb) / (n - k))
    got = _one(spark, "q278_brown_forsythe")
    assert (got["n"], got["k"]) == (n, k)
    assert got["f_stat"] == pytest.approx(f, abs=2e-4)
    assert got["eta_sq"] == pytest.approx(
        (sb - st * st / n) / (qt - st * st / n), abs=2e-4)


def test_q279_welch_matches_numpy(spark):
    t = _orders()
    grp = t["o_orderpriority"].isin(("1-URGENT", "2-HIGH")).to_numpy()
    a = t["cents"].to_numpy(np.float64)[grp]
    b = t["cents"].to_numpy(np.float64)[~grp]
    n1, n2 = len(a), len(b)
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    md = a.mean() - b.mean()
    se2 = v1 / n1 + v2 / n2
    df = se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    d = md / math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
    got = _one(spark, "q279_welch_ttest")
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert got["mean_diff"] == pytest.approx(md / 100, abs=2e-2)
    assert got["t_stat"] == pytest.approx(md / math.sqrt(se2), abs=2e-4)
    assert got["df_welch"] == pytest.approx(df, abs=2e-2)
    assert got["cohens_d"] == pytest.approx(d, abs=2e-4)


def test_q280_avg_precision_matches_numpy(spark):
    ev = _events()
    all_v = np.sort(ev["value"].to_numpy(np.float64))
    n_all = len(all_v)
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q280_avg_precision"].builder(
                spark, SF_DIR).collect()}
    for et, g in ev.groupby("event_type"):
        tv = np.sort(g["value"].to_numpy(np.float64))
        n_pos = len(tv)
        vals, counts = np.unique(tv, return_counts=True)
        total = 0.0
        for v, n in zip(vals, counts):
            pos_ge = n_pos - int(np.searchsorted(tv, v, side="left"))
            all_ge = n_all - int(np.searchsorted(all_v, v, side="left"))
            total += round(n * pos_ge / all_ge, 6)
        r = rows[et]
        assert r["n_pos"] == n_pos
        assert r["ap"] == pytest.approx(total / n_pos, abs=2e-4)


def test_q281_cramers_v_matches_numpy(spark):
    t = _orders()
    c = (t.groupby(["o_orderpriority", "o_orderstatus"])
         .size().reset_index(name="obs"))
    n = int(c["obs"].sum())
    rt = c.groupby("o_orderpriority")["obs"].sum()
    ct = c.groupby("o_orderstatus")["obs"].sum()
    ra, cb = len(rt), len(ct)
    chi2 = sum(round((r["obs"] - rt[r["o_orderpriority"]]
                      * ct[r["o_orderstatus"]] / n) ** 2
                     / (rt[r["o_orderpriority"]]
                        * ct[r["o_orderstatus"]] / n), 6)
               for _, r in c.iterrows())
    v = math.sqrt(chi2 / (n * (min(ra, cb) - 1)))
    phi2c = max(chi2 / n - (ra - 1) * (cb - 1) / (n - 1), 0)
    rc = ra - (ra - 1) ** 2 / (n - 1)
    cc = cb - (cb - 1) ** 2 / (n - 1)
    vc = math.sqrt(phi2c / (min(rc, cc) - 1))
    got = _one(spark, "q281_cramers_v")
    assert (got["n"], got["ra"], got["cb"]) == (n, ra, cb)
    assert got["chi2"] == pytest.approx(chi2, abs=2e-3)
    assert got["dof"] == (ra - 1) * (cb - 1)
    assert got["cramers_v"] == pytest.approx(v, abs=2e-4)
    assert got["cramers_v_corrected"] == pytest.approx(vc, abs=2e-4)


def test_q282_mcnemar_matches_numpy(spark):
    t = _orders()
    cust = pq.read_table(f"{SF_DIR}/customer.parquet").to_pandas()
    yr = t["o_orderdate"].dt.year
    y1 = set(t.loc[yr == 1996, "o_custkey"])
    y2 = set(t.loc[yr == 1997, "o_custkey"])
    ks = cust["c_custkey"]
    a = ks.isin(y1).to_numpy()
    b = ks.isin(y2).to_numpy()
    n11 = int((a & b).sum()); n10 = int((a & ~b).sum())
    n01 = int((~a & b).sum()); n00 = int((~a & ~b).sum())
    got = _one(spark, "q282_mcnemar")
    assert (got["n11"], got["n10"], got["n01"], got["n00"]) == \
        (n11, n10, n01, n00)
    assert got["chi2"] == pytest.approx(
        (n10 - n01) ** 2 / (n10 + n01), abs=2e-4)
    assert got["chi2_cc"] == pytest.approx(
        (abs(n10 - n01) - 1) ** 2 / (n10 + n01), abs=2e-4)
    assert got["odds_ratio"] == pytest.approx(n10 / n01, abs=2e-4)


def test_q283_jsd_matches_numpy(spark):
    from collections import Counter, defaultdict

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    gt = defaultdict(Counter)
    for src, t in zip(docs["source"], docs["text"]):
        if src is not None:
            gt[src].update(t.split(" "))  # oracle does NOT drop empties
    tot = {g: sum(c.values()) for g, c in gt.items()}
    rows = {(r["source_a"], r["source_b"]): r.asDict() for r in
            REGISTRY["q283_js_divergence"].builder(
                spark, SF_DIR).collect()}
    srcs = sorted(gt)
    for i, ga in enumerate(srcs):
        for gb in srcs[i + 1:]:
            shared = set(gt[ga]) & set(gt[gb])
            na, nb = tot[ga], tot[gb]
            s = sca = scb = 0.0
            for tk in shared:
                ca, cb = gt[ga][tk], gt[gb][tk]
                pa, pb = ca / na, cb / nb
                s += pa * math.log(2 * pa / (pa + pb)) \
                    + pb * math.log(2 * pb / (pa + pb))
                sca += ca
                scb += cb
            jsd = 0.5 * (s + (1 - sca / na) * math.log(2)
                         + (1 - scb / nb) * math.log(2))
            r = rows[(ga, gb)]
            assert r["n_shared_vocab"] == len(shared)
            assert r["jsd"] == pytest.approx(jsd, abs=2e-3)
            assert r["jsd_norm"] == pytest.approx(jsd / math.log(2),
                                                  abs=2e-3)


def test_q185_auc_matches_numpy(spark):
    ev = _events()
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q185_auc"].builder(spark, SF_DIR).collect()}
    for et, g in ev.groupby("event_type"):
        pos = np.sort(g["value"].to_numpy(np.float64))
        neg = np.sort(ev.loc[ev["event_type"] != et,
                             "value"].to_numpy(np.float64))
        # tie-exact rank AUC: P(pos > neg) + 0.5 P(pos == neg)
        lt = np.searchsorted(neg, pos, side="left")
        le = np.searchsorted(neg, pos, side="right")
        auc = float((lt + 0.5 * (le - lt)).sum()) / (len(pos) * len(neg))
        r = rows[et]
        assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
        assert r["auc"] == pytest.approx(auc, abs=2e-4)


def test_q186_ks_matches_numpy(spark):
    ev = _events()
    mid = int(ev["event_id"].max()) // 2
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q186_ks_drift"].builder(spark, SF_DIR).collect()}
    for et, g in ev.groupby("event_type"):
        a = np.sort(g.loc[g["event_id"] <= mid,
                          "value"].to_numpy(np.float64))
        b = np.sort(g.loc[g["event_id"] > mid,
                          "value"].to_numpy(np.float64))
        r = rows[et]
        assert (r["n_first"], r["n_second"]) == (len(a), len(b))
        if len(a) == 0 or len(b) == 0:
            assert r["ks"] is None
            continue
        vs = np.unique(np.concatenate([a, b]))
        cum0 = np.searchsorted(a, vs, side="right")
        cum1 = np.searchsorted(b, vs, side="right")
        ks = float(np.max(np.abs(cum0 * len(b) - cum1 * len(a)))) \
            / (len(a) * len(b))
        assert r["ks"] == pytest.approx(ks, abs=2e-4)


def test_q190_kaplan_meier_matches_numpy(spark):
    import pandas as pd

    # literally the query's observation window (ts < Jan 4): the full
    # horizon censors nobody (q326 class — see q190's doc)
    ev = _events()
    ev = ev[ev["ts"] < pd.Timestamp("2024-01-04")]
    rows = [r.asDict() for r in
            REGISTRY["q190_kaplan_meier"].builder(spark, SF_DIR).collect()]
    per = []
    for _, g in ev.groupby("user_id"):
        t0 = g["ts"].min()
        p = g.loc[g["event_type"] == "purchase", "ts"]
        end = p.min() if len(p) else g["ts"].max()
        per.append(((end.date() - t0.date()).days, int(len(p) > 0)))
    import pandas as pd
    d = pd.DataFrame(per, columns=["dur", "ev"])
    g = (d.groupby("dur").agg(cnt=("ev", "size"), d_i=("ev", "sum"))
         .sort_index())
    n_total = int(g["cnt"].sum())
    at_risk = n_total - (g["cnt"].cumsum() - g["cnt"])
    surv = 1.0
    want = {}
    for dur, cnt, d_i, n_risk in zip(g.index, g["cnt"], g["d_i"], at_risk):
        surv *= 1.0 - d_i / n_risk
        want[dur] = (int(n_risk), int(d_i), int(cnt - d_i), surv)
    assert sorted(r["dur_days"] for r in rows) == sorted(want)
    for r in rows:
        n_risk, d_i, cens, surv = want[r["dur_days"]]
        assert (r["n_risk"], r["n_events"], r["n_censored"]) == \
            (n_risk, d_i, cens)
        assert r["survival"] == pytest.approx(surv, abs=2e-3)
    # non-degenerate: the censoring arm is real inside the window
    assert sum(c for _, _, c, _ in want.values()) > 0


def test_q244_theil_sen_matches_numpy(spark):
    import datetime

    t = _orders()
    t["d"] = (t["o_orderdate"]
              - datetime.datetime(1992, 1, 1)).dt.days.astype(int)
    daily = t.groupby("d")["cents"].sum()
    ds = daily.index.to_numpy(np.float64)
    rs = daily.to_numpy(np.float64)
    slopes = []
    for i in range(len(ds)):
        slopes.extend((rs[i + 1:] - rs[i]) / (ds[i + 1:] - ds[i]))
    slope = float(np.percentile(slopes, 50))
    intercept = float(np.percentile(rs - slope * ds, 50))
    got = _one(spark, "q244_theil_sen")
    assert (got["n_days"], got["n_pairs"]) == \
        (len(ds), len(ds) * (len(ds) - 1) // 2)
    assert got["sen_slope"] == pytest.approx(slope, abs=2e-3)
    assert got["sen_intercept"] == pytest.approx(intercept, abs=2e-2)


def test_q89_stat_moments_matches_numpy(spark):
    ev = _events()
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q89_stat_moments"].builder(spark, SF_DIR).collect()}
    for et, g in ev.groupby("event_type"):
        v = g["value"].to_numpy(np.float64)
        h = g["ts"].dt.hour.to_numpy(np.float64)
        n = len(v)
        m = v.mean()
        m2 = ((v - m) ** 2).mean()
        r = rows[et]
        assert r["corr_hv"] == pytest.approx(
            float(np.corrcoef(h, v)[0, 1]), abs=2e-4)
        assert r["cov_pop"] == pytest.approx(
            float(((h - h.mean()) * (v - m)).mean()), abs=2e-3)
        assert r["cov_samp"] == pytest.approx(
            float(((h - h.mean()) * (v - m)).sum() / (n - 1)), abs=2e-3)
        assert r["sd"] == pytest.approx(v.std(ddof=1), abs=2e-3)
        assert r["vr"] == pytest.approx(v.var(ddof=1), abs=2e-2)
        assert r["sk"] == pytest.approx(
            ((v - m) ** 3).mean() / m2 ** 1.5, abs=2e-4)
        assert r["ku"] == pytest.approx(
            ((v - m) ** 4).mean() / m2 ** 2 - 3, abs=2e-4)


def test_q89b_regression_matches_numpy(spark):
    ev = _events()
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q89b_regression"].builder(spark, SF_DIR).collect()}
    for et, g in ev.groupby("event_type"):
        y = g["value"].to_numpy(np.float64)
        x = g["ts"].dt.hour.to_numpy(np.float64)
        n = len(y)
        sxx = float(((x - x.mean()) ** 2).sum())
        syy = float(((y - y.mean()) ** 2).sum())
        sxy = float(((x - x.mean()) * (y - y.mean())).sum())
        slope = sxy / sxx
        r = rows[et]
        assert r["n"] == n
        assert r["slope"] == pytest.approx(slope, abs=2e-4)
        assert r["icept"] == pytest.approx(
            y.mean() - slope * x.mean(), abs=2e-3)
        assert r["r2"] == pytest.approx(sxy * sxy / (sxx * syy), abs=2e-4)
        assert r["avgx"] == pytest.approx(x.mean(), abs=2e-4)
        assert r["avgy"] == pytest.approx(y.mean(), abs=2e-3)
        assert r["sxx"] == pytest.approx(sxx, abs=2e-2)
        assert r["syy"] == pytest.approx(syy, rel=1e-6)
        assert r["sxy"] == pytest.approx(sxy, abs=2e-2)


def test_q166_chi_square_matches_numpy(spark):
    ev = _events()
    ev["dow"] = ev["ts"].dt.weekday  # any consistent labeling
    o = ev.groupby(["event_type", "dow"]).size().reset_index(name="obs")
    n = int(o["obs"].sum())
    rt = o.groupby("event_type")["obs"].sum()
    ct = o.groupby("dow")["obs"].sum()
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q166_chi_square"].builder(spark, SF_DIR).collect()}
    for et, g in o.groupby("event_type"):
        chi2 = sum(round((r["obs"] - rt[et] * ct[r["dow"]] / n) ** 2
                         / (rt[et] * ct[r["dow"]] / n), 4)
                   for _, r in g.iterrows())
        r = rows[et]
        assert r["n_cells"] == len(g)
        assert r["chi2_contrib"] == pytest.approx(chi2, abs=2e-3)


def test_q175_gini_matches_numpy(spark):
    t = _orders()
    cust = pq.read_table(f"{SF_DIR}/customer.parquet").to_pandas()
    nation = pq.read_table(f"{SF_DIR}/nation.parquet").to_pandas()
    nk = cust.set_index("c_custkey")["c_nationkey"]
    nname = nation.set_index("n_nationkey")["n_name"]
    rev = t.groupby("o_custkey")["cents"].sum().reset_index()
    rev["nk"] = rev["o_custkey"].map(nk)
    rows = {r["n_name"]: r.asDict() for r in
            REGISTRY["q175_gini"].builder(spark, SF_DIR).collect()}
    for k, g in rev.groupby("nk"):
        g = g.sort_values(["cents", "o_custkey"])
        n = len(g)
        i = np.arange(1, n + 1)
        num = int(((2 * i - n - 1) * g["cents"].to_numpy(object)).sum())
        tot = int(g["cents"].sum())
        r = rows[nname[k]]
        assert r["n_firms"] == n
        assert r["gini_ppm"] == num * 1000000 // (n * tot)
        assert 0 < r["gini_ppm"] < 1000000  # spend is unequal, not total


def test_q167_hhi_matches_numpy(spark):
    t = _orders()
    cust = pq.read_table(f"{SF_DIR}/customer.parquet").to_pandas()
    nation = pq.read_table(f"{SF_DIR}/nation.parquet").to_pandas()
    nk = cust.set_index("c_custkey")["c_nationkey"]
    nname = nation.set_index("n_nationkey")["n_name"]
    rev = t.groupby("o_custkey")["cents"].sum().reset_index()
    rev["nk"] = rev["o_custkey"].map(nk)
    rows = {r["n_name"]: r.asDict() for r in
            REGISTRY["q167_hhi"].builder(spark, SF_DIR).collect()}
    for k, g in rev.groupby("nk"):
        tot = int(g["cents"].sum())
        ppm = [int(c) * 1000000 // tot for c in g["cents"]]
        r = rows[nname[k]]
        assert r["n_firms"] == len(g)
        assert r["hhi_ppm2"] == sum(p * p for p in ppm)


def test_q214_lorenz_matches_numpy(spark):
    t = _orders()
    c = (t.groupby("o_custkey")["cents"].sum().reset_index()
         .sort_values(["cents", "o_custkey"]).reset_index(drop=True))
    n, tot = len(c), int(c["cents"].sum())
    c["decile"] = (c.index * 10) // n
    rows = {r["decile"]: r.asDict() for r in
            REGISTRY["q214_lorenz_deciles"].builder(
                spark, SF_DIR).collect()}
    cum = 0
    for dec, g in c.groupby("decile"):
        cents = int(g["cents"].sum())
        cum += cents
        r = rows[dec]
        assert (r["n_customers"], r["cents"]) == (len(g), cents)
        assert r["share_ppm"] == cents * 1000000 // tot
        assert r["cum_share_ppm"] == cum * 1000000 // tot
    # Lorenz curve is convex-ish on the fixture: top decile > bottom
    assert rows[9]["share_ppm"] > rows[0]["share_ppm"]


def test_q272_seasonal_decompose_matches_numpy(spark):
    import pandas as pd

    t = _orders()
    d = (t.groupby(t["o_orderdate"].dt.date)["cents"].sum()
         .sort_index())
    trend = (d.astype(np.float64)
             .rolling(window=7, center=True, min_periods=1).mean()
             .round(4))
    det = d.astype(np.float64) - trend
    dow = pd.Series([dd.isoweekday() for dd in d.index], index=d.index)
    seasonal = det.groupby(dow).mean().round(4)
    rows = {str(r["day"]): r.asDict() for r in
            REGISTRY["q272_seasonal_decompose"].builder(
                spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(str(dd) for dd in d.index)
    for dd in d.index:
        r = rows[str(dd)]
        assert r["cents"] == int(d[dd])
        assert r["trend"] == pytest.approx(trend[dd], abs=2e-3)
        assert r["seasonal"] == pytest.approx(seasonal[dow[dd]], abs=2e-3)
        assert r["resid"] == pytest.approx(
            d[dd] - trend[dd] - seasonal[dow[dd]], abs=2e-3)


def test_q161_benford_matches_numpy(spark):
    from collections import Counter

    ev = _events()
    ev = ev[ev["value"] >= 0.01]
    cents = np.round(ev["value"] * 100).astype(np.int64)
    digits = np.array([int(str(c)[0]) for c in cents])
    benford = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
               6: 66947, 7: 57992, 8: 51153, 9: 45757}
    rows = {(r["event_type"], r["digit"]): r.asDict() for r in
            REGISTRY["q161_benford"].builder(spark, SF_DIR).collect()}
    for et, g in ev.groupby("event_type"):
        dg = Counter(digits[ev["event_type"].to_numpy() == et])
        tot = sum(dg.values())
        for digit, n in dg.items():
            r = rows[(et, digit)]
            assert r["n"] == n
            assert r["obs_ppm"] == n * 1000000 // tot
            assert r["benford_ppm"] == benford[digit]
            assert r["diff_ppm"] == n * 1000000 // tot - benford[digit]


def test_q238_zipf_matches_numpy(spark):
    from collections import Counter

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    rows = {r["lang"]: r.asDict() for r in
            REGISTRY["q238_zipf_fit"].builder(spark, SF_DIR).collect()}
    for lang, g in docs.groupby("lang"):
        vc = Counter(w for t in g["text"] for w in t.split(" "))
        ranked = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))
        x = np.array([round(math.log(i + 1), 6)
                      for i in range(len(ranked))])
        y = np.array([round(math.log(c), 6) for _, c in ranked])
        nt = len(ranked)
        sx, sy = x.sum(), y.sum()
        sxy, sxx = (x * y).sum(), (x * x).sum()
        slope = (nt * sxy - sx * sy) / (nt * sxx - sx * sx)
        r = rows[lang]
        assert (r["n_types"], r["n_tokens"]) == (nt, sum(vc.values()))
        assert r["zipf_slope"] == pytest.approx(slope, abs=2e-3)
        assert r["zipf_intercept"] == pytest.approx(
            (sy - slope * sx) / nt, abs=2e-3)
        assert slope < 0  # a Zipf head exists: frequency falls with rank


def test_q187_poisson_bootstrap_matches_numpy(spark):
    """Replays the deterministic md5 inverse-CDF Poisson(1) weights in
    pure Python — the no-RNG bootstrap machinery itself is the thing
    under test here, not just the arithmetic."""
    import hashlib

    thresh = [6171992, 12343985, 15429982, 16458647, 16715813,
              16767247, 16775819, 16777044, 16777197]
    ev = _events()
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q187_poisson_bootstrap"].builder(
                spark, SF_DIR).collect()}
    for et, g in ev.groupby("event_type"):
        ids = g["event_id"].to_numpy()
        vals = [round(float(v), 6) for v in g["value"]]
        means = []
        for r in range(64):
            sw = swv = 0
            for eid, v in zip(ids, vals):
                u = int(hashlib.md5(
                    f"{eid}:{r}:bs".encode()).hexdigest()[:6], 16)
                w = sum(1 for t in thresh if u >= t)
                sw += w
                swv += w * v
            if sw > 0:
                means.append(round(swv / sw, 4))
        row = rows[et]
        assert row["n"] == len(g)
        assert row["n_replicas"] == len(means)
        assert row["point_mean"] == pytest.approx(
            sum(vals) / len(vals), abs=2e-3)
        assert row["ci_lo"] == pytest.approx(
            float(np.percentile(means, 2.5)), abs=2e-3)
        assert row["ci_hi"] == pytest.approx(
            float(np.percentile(means, 97.5)), abs=2e-3)
        assert row["ci_lo"] < row["point_mean"] < row["ci_hi"]


def test_q138_winsorized_matches_numpy(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    rows = {r["source"]: r.asDict() for r in
            REGISTRY["q138_winsorized_stats"].builder(
                spark, SF_DIR).collect()}
    for src, g in docs.groupby("source"):
        x = g["n_chars"].to_numpy(np.float64)
        p_lo = round(float(np.percentile(x, 5)), 4)
        p_hi = round(float(np.percentile(x, 95)), 4)
        wm = float(np.clip(x, p_lo, p_hi).mean())
        r = rows[src]
        assert r["n"] == len(x)
        assert r["p_lo"] == pytest.approx(p_lo, abs=2e-3)
        assert r["p_hi"] == pytest.approx(p_hi, abs=2e-3)
        assert r["win_mean"] == pytest.approx(wm, abs=2e-2)


def test_q138b_mad_matches_numpy(spark):
    ev = _events()
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q138b_mad"].builder(spark, SF_DIR).collect()}
    for et, g in ev.groupby("event_type"):
        v = g["value"].to_numpy(np.float64)
        med = round(float(np.percentile(v, 50)), 4)
        mad = float(np.percentile(np.abs(v - med), 50))
        r = rows[et]
        assert r["n"] == len(v)
        assert r["med"] == pytest.approx(med, abs=2e-3)
        assert r["mad"] == pytest.approx(mad, abs=2e-3)


def test_q149_covariance_matches_numpy(spark):
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    q = np.stack([
        np.round(np.asarray(v[:16], dtype=np.float64) * 10000)
        .astype(np.int64) for v in emb["embedding"]])
    n = len(q)
    rows = {(r["i"], r["j"]): r.asDict() for r in
            REGISTRY["q149_embedding_covariance"].builder(
                spark, SF_DIR).collect()}
    assert len(rows) == 15 * 16 // 2
    for (i, j), r in rows.items():
        sxy = int((q[:, i].astype(object) * q[:, j].astype(object)).sum())
        sx, sy = int(q[:, i].sum()), int(q[:, j].sum())
        assert r["n"] == n
        assert r["cov_q"] == pytest.approx(
            float(n * sxy - sx * sy) / n / n, abs=2e-3)


def test_q215_weighted_median_matches_numpy(spark):
    li = _lineitem()
    li["cents"] = np.round(li["l_extendedprice"] * 100).astype(np.int64)
    li["w"] = np.round(li["l_quantity"]).astype(np.int64)
    rows = {r["flag"]: r.asDict() for r in
            REGISTRY["q215_weighted_median"].builder(
                spark, SF_DIR).collect()}
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values("cents")
        cw = g["w"].cumsum()
        tw = int(g["w"].sum())
        wmed = int(g.loc[cw * 2 >= tw, "cents"].iloc[0])
        r = rows[flag]
        assert (r["wmedian_cents"], r["total_weight"]) == (wmed, tw)


def test_q257_drawdown_matches_numpy(spark):
    t = _orders()
    d = (t.groupby(t["o_orderdate"].dt.date)["cents"].sum()
         .sort_index().to_numpy(np.int64))
    peak = np.maximum.accumulate(d)
    got = _one(spark, "q257_revenue_drawdown")
    assert got["n_days"] == len(d)
    assert got["final_peak_cents"] == int(peak[-1])
    assert got["max_drawdown_cents"] == int((peak - d).max())
    # non-degenerate: the level series actually dips below its peak (the
    # old cumulative-curve form was monotone -> drawdown identically 0)
    assert (peak - d).max() > 0


# ---------------------------------------------------------------------------
# Mergeable-sketch family (VERDICT r8 item 6): the statistics block's
# same-author-formula risk exists equally for the sketch estimators and
# their error-bound CLAIMS. Each reference rebuilds the sketch from the
# parquet in pure python (hashlib md5 — independent of both engines' SQL
# md5 paths), matches the query's exact integer outputs, and then checks
# the estimator's guarantee against ground truth computed WITHOUT the
# sketch.


def test_q94_cms_matches_python_and_never_underestimates(spark):
    import hashlib
    from collections import Counter

    ev = _events()

    def bucket(v, d):
        return int(hashlib.md5(
            f"{v}:cms:{d}".encode()).hexdigest()[:2], 16) % 256

    grid = Counter()
    for v in ev["user_id"]:
        for d in range(4):
            grid[(d, bucket(v, d))] += 1
    true = Counter(ev["user_id"])
    n_total = len(ev)
    rows = {r["user_id"]: r["est"] for r in
            REGISTRY["q94_cms_estimates"].builder(spark, SF_DIR).collect()}
    probes = sorted({int(u) for u in ev["user_id"] if u < 40})
    assert sorted(rows) == probes
    for u in probes:
        est = min(grid[(d, bucket(u, d))] for d in range(4))
        assert rows[u] == est
        # CMS guarantees: never underestimates; excess bounded by the
        # classic eps*N with eps = e/width (deterministic on this corpus)
        assert est >= true[u]
        assert est - true[u] <= math.ceil(math.e * n_total / 256)


def test_q181_bloom_matches_python_and_no_false_negatives(spark):
    import hashlib

    cust = pq.read_table(f"{SF_DIR}/customer.parquet").to_pandas()

    def bits(v):
        return [int(hashlib.md5(
            f"{v}:bl{i}".encode()).hexdigest()[2:6], 16) % 4096
            for i in range(4)]

    member = [int(v) for v in
              cust.loc[cust["c_acctbal"] > 9000, "c_custkey"]]
    bitset = {b for v in member for b in bits(v)}
    per = {}
    for seg, g in cust.groupby("c_mktsegment"):
        fn = fp = flagged = 0
        for v, bal in zip(g["c_custkey"], g["c_acctbal"]):
            flag = all(b in bitset for b in bits(int(v)))
            flagged += flag
            if bal > 9000 and not flag:
                fn += 1
            if bal <= 9000 and flag:
                fp += 1
        per[seg] = (len(g), flagged, int((g["c_acctbal"] > 9000).sum()),
                    fn, fp)
    rows = {r["c_mktsegment"]: r.asDict() for r in
            REGISTRY["q181_bloom_membership"].builder(
                spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(per)
    n, m, k = len(member), 4096, 4
    exp_fpr = (1 - math.exp(-k * n / m)) ** k
    for seg, (n_probed, flagged, n_true, fn, fp) in per.items():
        r = rows[seg]
        assert (r["n_probed"], r["n_flagged"], r["n_true"]) == \
            (n_probed, flagged, n_true)
        # Bloom guarantee: NO false negatives, ever
        assert fn == 0
        # false positives bounded by the (1-e^{-kn/m})^k rate with slack
        assert fp <= max(2, int(10 * exp_fpr * n_probed))


def test_q184_quantile_sketch_matches_python_within_bin_width(spark):
    ev = _events()
    v = ev["value"].to_numpy(np.float64)
    bins = np.minimum(np.floor(v / 25.0), 19).astype(int)
    cnt = np.bincount(bins, minlength=20)
    cum = np.cumsum(cnt)
    tot = int(cum[-1])
    rows = {r["p"]: r.asDict() for r in
            REGISTRY["q184_quantile_sketch"].builder(
                spark, SF_DIR).collect()}
    assert sorted(rows) == [50, 95]
    for p in (50, 95):
        b = int(np.argmax(cum * 100 >= p * tot))
        est = (b + 1) * 25.0
        exact = float(np.percentile(v, p, method="linear"))
        assert rows[p]["est"] == est
        assert rows[p]["exact_v"] == pytest.approx(exact, abs=2e-4)
        # the query's claimed error contract: estimate within one bin
        # width of the true (interpolated) percentile
        assert abs(est - exact) <= 25.0


def test_q189_kmv_matches_python_and_jaccard_bound(spark):
    import hashlib

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()

    def shingles(text):
        tk = text.split(" ")
        return {hashlib.md5(" ".join(tk[i:i + 5]).encode()).hexdigest()
                for i in range(len(tk) - 4)}

    full = {}
    for src, g in docs.groupby("source"):
        s = set()
        for t in g["text"]:
            s |= shingles(t)
        full[src] = s
    sig = {src: sorted(s)[:128] for src, s in full.items()}
    rows = {(r["src_a"], r["src_b"]): r.asDict() for r in
            REGISTRY["q189_kmv_overlap"].builder(spark, SF_DIR).collect()}
    srcs = sorted(full)
    pairs = [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]]
    assert sorted(rows) == pairs
    for a, b in pairs:
        sa, sb = set(sig[a]), set(sig[b])
        u = sorted(sa | sb)[:128]
        kk = len(u)
        n_common = sum(1 for h in u if h in sa and h in sb)
        r = rows[(a, b)]
        assert (r["kk"], r["n_common"]) == (kk, n_common)
        assert r["jaccard_ppm"] == n_common * 1000000 // kk
        # estimator quality vs TRUE shingle-set Jaccard (computed from
        # the full sets, no sketch): within the 4-sigma KMV error band
        true_j = len(full[a] & full[b]) / len(full[a] | full[b])
        band = 4 * math.sqrt(max(true_j * (1 - true_j), 1e-9) / 128) \
            + 1 / 128
        assert abs(n_common / kk - true_j) <= band


def test_q270_heldout_xent_matches_numpy(spark):
    """The truncated-vocab add-1 unigram LM rebuilt in pure python: md5
    doc split, top-25 train vocabulary (count DESC, token), per-token
    lp = ln((c+1)/(N+V+1)) quantized at 4dp, OOV when outside the
    vocabulary — the unigram companion of the q302 KN reference."""
    import hashlib
    from collections import Counter, defaultdict

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    split = docs["doc_id"].map(
        lambda i: "train"
        if int(hashlib.md5(f"{i}:split".encode()).hexdigest()[0], 16) < 13
        else "test")
    uni = Counter()
    for text, sp in zip(docs["text"], split):
        if sp == "train":
            uni.update(text.split(" "))
    vocab = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:25])
    nt, v = sum(vocab.values()), len(vocab)
    per = defaultdict(lambda: [0, 0, 0.0])  # n, oov, sum_lp
    for text, src, sp in zip(docs["text"], docs["source"], split):
        if sp != "test":
            continue
        for tok in text.split(" "):
            c = vocab.get(tok, 0)
            per[src][0] += 1
            per[src][1] += c == 0 and tok not in vocab
            per[src][2] += round(math.log((c + 1) / (nt + v + 1)), 4)
    rows = {r["source"]: r.asDict() for r in
            REGISTRY["q270_heldout_xent"].builder(spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(per)
    for src, (n, oov, slp) in per.items():
        r = rows[src]
        assert r["n_test_tokens"] == n
        assert r["n_oov"] == oov
        assert r["oov_ppm"] == oov * 1000000 // n
        assert r["xent_nats"] == pytest.approx(-slp / n, abs=2e-4)
    # non-degenerate: the truncation makes OOV real (q326 class)
    assert any(p[1] > 0 for p in per.values())


def test_q269_dedup_weighted_tokens_matches_python(spark):
    """The dup-overlay dedup weighting rebuilt in pure python: the
    corpus plus every doc_id % 50 == 0 document again, per-doc tokens
    discounted by the md5(text) cluster size in integer millionths."""
    import hashlib
    from collections import Counter, defaultdict

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    rows_in = list(zip(docs["doc_id"], docs["source"], docs["text"]))
    corpus = rows_in + [r for r in rows_in if r[0] % 50 == 0]
    csize = Counter(hashlib.md5(t.encode()).hexdigest()
                    for _, _, t in corpus)
    per = defaultdict(lambda: [0, 0, 0])  # n_docs, raw, eff_millionths
    for _, src, t in corpus:
        tok = len([w for w in t.split(" ") if w])
        cs = csize[hashlib.md5(t.encode()).hexdigest()]
        per[src][0] += 1
        per[src][1] += tok
        per[src][2] += tok * 1000000 // cs
    rows = {r["source"]: r.asDict() for r in
            REGISTRY["q269_dedup_weighted_tokens"].builder(
                spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(per)
    dup_seen = False
    for src, (nd, raw, eff) in per.items():
        r = rows[src]
        assert (r["n_docs"], r["raw_tokens"], r["eff_token_millionths"]) \
            == (nd, raw, eff)
        assert r["dup_ppm"] == (raw * 1000000 - eff) // raw
        dup_seen = dup_seen or r["dup_ppm"] > 0
    # non-degenerate: the overlay plants real clusters (q326 class)
    assert dup_seen


def test_q174_group_mode_matches_python(spark):
    """The deterministic modal-hour rule rebuilt in pure python: count
    per (type, hour), winner by (count DESC, hour ASC)."""
    from collections import Counter

    ev = _events()
    cnt = Counter(zip(ev["event_type"], ev["ts"].dt.hour))
    want = {}
    for (et, hr), n in cnt.items():
        cur = want.get(et)
        if cur is None or (n, -hr) > (cur[1], -cur[0]):
            want[et] = (int(hr), n)
    rows = {r["event_type"]: (r["mode_bin"], r["mode_n"]) for r in
            REGISTRY["q174_group_mode"].builder(spark, SF_DIR).collect()}
    assert rows == want
    # non-degenerate: the modal hour varies across types (q326 class)
    assert len({b for b, _ in rows.values()}) > 1


# ---------------------------------------------------------------------------
# Round-13 additions: first-principles references for the round-12 stats
# family (VERDICT r12 item 2). Each statistic is recomputed from its
# textbook definition straight off the parquet, carrying only the query's
# declared quantization contract (DECIMAL(18,6)->R4 half-up, integer ppm)
# so exact-integer outputs compare exactly and R4 doubles compare at the
# 4dp contract.

from decimal import ROUND_HALF_UP, Decimal

_D6 = Decimal("1e-6")
_D4 = Decimal("1e-4")


def _q4i(x: float) -> int:
    """ROUND(CAST(x AS DECIMAL(18,6)), 4) as an exact integer in 1e-4
    units (half-up at 6dp then 4dp, on the exact binary value — the
    corpus's standard value-quantization contract)."""
    return int(Decimal(float(x)).quantize(_D6, ROUND_HALF_UP)
               .quantize(_D4, ROUND_HALF_UP).scaleb(4))


def _cents(x: float) -> int:
    """ROUND(CAST(x AS DECIMAL(18,6)) * 100) as an exact integer."""
    return int((Decimal(float(x)).quantize(_D6, ROUND_HALF_UP) * 100)
               .quantize(Decimal("1"), ROUND_HALF_UP))


def test_q353_sprt_matches_python(spark):
    """Wald's SPRT rebuilt from the 1945 definition: per-observation LLR
    for a Bernoulli H0 p0=0.1 vs H1 p1=0.2 is ln(p1/p0) on success and
    ln((1-p1)/(1-p0)) on failure; decide at the first n where the
    cumulative LLR leaves (ln(b/(1-a)), ln((1-b)/a)) = +/-2.9444 at
    a = b = 0.05. Per-term R4 quantization (the query's contract) makes
    the whole path exact in 1e-4 integer units."""
    ev = _events().sort_values(["ts", "event_id"], kind="stable")
    step_h1 = _q4i(math.log(0.2 / 0.1))      # success: ln(p1/p0)
    step_h0 = _q4i(math.log(0.8 / 0.9))      # failure: ln((1-p1)/(1-p0))
    assert (step_h1, step_h0) == (6931, -1178)
    bound = 29444                            # ln((1-b)/a) = ln(19) ~ 2.9444
    assert _q4i(math.log(0.95 / 0.05)) == bound
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q353_sprt"].builder(spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(ev["event_type"].unique())
    for et, g in ev.groupby("event_type"):
        llr, hit = 0, None
        for i, v in enumerate(g["value"], start=1):
            llr += step_h1 if v > 100 else step_h0
            if hit is None and abs(llr) >= bound:
                hit = (i, llr)
        r = rows[et]
        assert r["n_events"] == len(g)
        if hit is None:
            assert r["n_at_decision"] == 0 and r["decision"] == "continue"
            assert r["llr_readout"] == pytest.approx(llr / 1e4, abs=1e-9)
        else:
            assert r["n_at_decision"] == hit[0]
            assert r["decision"] == (
                "accept_h1" if hit[1] > 0 else "accept_h0")
            assert r["llr_readout"] == pytest.approx(hit[1] / 1e4, abs=1e-9)
    # non-degenerate: the fixture produces at least two distinct decisions
    assert len({r["decision"] for r in rows.values()}) > 1


def test_q358_conformal_matches_python(spark):
    """Split conformal from the Vovk/Lei definition: with calibration
    scores s_i = |y_i - mu|, the radius is the ceil((n+1)(1-alpha))-th
    smallest score and the test-split coverage is then >= 1-alpha in
    expectation. All comparisons run in exact *n_train integer space."""
    ev = _events()
    ev["v4"] = [_q4i(v) for v in ev["value"]]
    ev["sp"] = ev["event_id"] % 3
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q358_conformal_interval"].builder(
                spark, SF_DIR).collect()}
    for et, g in ev.groupby("event_type"):
        tr = g[g["sp"] == 0]
        nt, s4 = len(tr), int(tr["v4"].sum())
        cal = g[g["sp"] == 1].copy()
        cal["ar"] = (nt * cal["v4"] - s4).abs()
        nc = len(cal)
        k = math.ceil(0.9 * (nc + 1))
        assert k == (9 * (nc + 1) + 9) // 10  # the query's DIV form
        qhat_s = int(cal.sort_values(["ar", "event_id"],
                                     kind="stable")["ar"].iloc[k - 1])
        tst = g[g["sp"] == 2]
        cov = int(((nt * tst["v4"] - s4).abs() <= qhat_s).sum())
        r = rows[et]
        assert (r["n_train"], r["n_cal"], r["n_test"]) == (nt, nc, len(tst))
        assert r["mu"] == pytest.approx(s4 / 1e4 / nt, abs=1.1e-4)
        assert r["qhat"] == pytest.approx(qhat_s / 1e4 / nt, abs=1.1e-4)
        assert r["coverage_ppm"] == cov * 1000000 // len(tst)
        # the distribution-free guarantee, loose finite-sample band
        assert 800000 <= r["coverage_ppm"] <= 990000


def test_q359_xmr_matches_python(spark):
    """Wheeler's XmR individuals chart from the definition: natural
    process limits xbar +/- 2.66*MRbar where MRbar is the mean of
    consecutive absolute moving ranges in arrival order and
    2.66 = 3/d2(2). Limit comparisons run exactly in 1e-6 units."""
    ev = _events().sort_values(["ts", "event_id"], kind="stable")
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q359_xmr_control_chart"].builder(
                spark, SF_DIR).collect()}
    for et, g in ev.groupby("event_type"):
        v4 = [_q4i(v) for v in g["value"]]
        n = len(v4)
        mrs = [abs(a - b) for a, b in zip(v4[1:], v4[:-1])]
        xq4 = _q4i((sum(v4) / 1e4) / n)
        mrq4 = _q4i((sum(mrs) / 1e4) / (n - 1))
        ucl6 = xq4 * 100 + 266 * mrq4
        lcl6 = xq4 * 100 - 266 * mrq4
        flags = [i for i, v in enumerate(v4, start=1)
                 if v * 100 > ucl6 or v * 100 < lcl6]
        r = rows[et]
        assert r["n"] == n
        assert r["xbar"] == pytest.approx(xq4 / 1e4, abs=1e-9)
        assert r["mr_bar"] == pytest.approx(mrq4 / 1e4, abs=1e-9)
        assert r["ucl"] == pytest.approx(ucl6 / 1e6, abs=1e-9)
        assert r["lcl"] == pytest.approx(lcl6 / 1e6, abs=1e-9)
        assert r["n_ooc"] == len(flags)
        assert r["first_ooc_rn"] == (flags[0] if flags else 0)
    # non-degenerate: the heavy-tailed fixture flags real points
    assert any(r["n_ooc"] > 0 for r in rows.values())


def test_q360_neyman_matches_python(spark):
    """Neyman 1934 from the definition: n_h proportional to N_h*S_h with
    S_h the per-stratum sample sd. Shares/allocations are recomputed
    both through the exact quantized-integer contract AND from pure
    float N_h*S_h weights (the formula check)."""
    cust = pq.read_table(f"{SF_DIR}/customer.parquet").to_pandas()
    cust["xq"] = [_cents(v) for v in cust["c_acctbal"]]
    per = {}
    for nation, g in cust.groupby("c_nationkey"):
        n_h = len(g)
        if n_h <= 1:
            continue
        sx = int(g["xq"].sum())
        sxx = int((g["xq"].astype(object) ** 2).sum())
        sd = math.sqrt(float(n_h * sxx - sx * sx)
                       / float(n_h * (n_h - 1))) / 100.0
        per[int(nation)] = (n_h, sd, _q4i(sd))
    tw = sum(n_h * sd4 for n_h, _, sd4 in per.values())
    rows = {r["nation"]: r.asDict() for r in
            REGISTRY["q360_neyman_allocation"].builder(
                spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(per)
    ftot = sum(n_h * sd for n_h, sd, _ in per.values())
    for nation, (n_h, sd, sd4) in per.items():
        r = rows[nation]
        assert r["n_h"] == n_h
        assert r["sd"] == pytest.approx(sd, abs=1.1e-4)
        w4 = n_h * sd4
        assert r["share_ppm"] == w4 * 1000000 // tw
        assert r["alloc_n"] == w4 * 1000 // tw
        # formula check: share really is N_h*S_h / sum, float path
        assert r["share_ppm"] == pytest.approx(
            n_h * sd / ftot * 1e6, abs=5)
    assert sum(r["alloc_n"] for r in rows.values()) <= 1000
    assert 1000 - sum(r["alloc_n"] for r in rows.values()) <= len(rows)


def test_q361_nzv_matches_python(spark):
    """The caret nearZeroVar diagnostics from the definition: freqRatio =
    top count / runner-up count, percentUnique = distinct/n — both in
    exact integer ppm over cents-quantized values."""
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()
    melted = {
        "l_quantity": [_cents(v) for v in li["l_quantity"]],
        "l_discount": [_cents(v) for v in li["l_discount"]],
        "l_tax": [_cents(v) for v in li["l_tax"]],
        "l_linenumber": [int(v) * 100 for v in li["l_linenumber"]],
    }
    rows = {r["metric"]: r.asDict() for r in
            REGISTRY["q361_nzv_screen"].builder(spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(melted)
    from collections import Counter

    for metric, vals in melted.items():
        cnt = Counter(vals)
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        (v1, c1), (_, c2) = ranked[0], ranked[1]
        r = rows[metric]
        assert (r["n"], r["n_distinct"]) == (len(vals), len(cnt))
        assert r["top_value"] == pytest.approx(v1 / 100, abs=1e-9)
        assert (r["top1_cnt"], r["top2_cnt"]) == (c1, c2)
        assert r["freq_ratio_ppm"] == c1 * 1000000 // c2
        assert r["distinct_ppm"] == len(cnt) * 1000000 // len(vals)
    # non-degenerate: the screen separates the metrics (q326 class)
    assert len({r["freq_ratio_ppm"] for r in rows.values()}) > 1


def test_q362_hill_matches_python(spark):
    """Hill 1975 from the definition: 1/alpha = (1/k) * sum_{i<=k}
    ln(x_(i) / x_(k+1)) over the k=50 largest order statistics, ties
    broken by event_id; alpha the reciprocal."""
    ev = _events()
    ev = ev[ev["value"] > 0]
    rows = {r["event_type"]: r.asDict() for r in
            REGISTRY["q362_hill_tail_index"].builder(
                spark, SF_DIR).collect()}
    for et, g in ev.groupby("event_type"):
        top = g.sort_values(["value", "event_id"],
                            ascending=[False, True],
                            kind="stable").head(51)
        xk1_4 = _q4i(top["value"].iloc[50])
        s4 = sum(_q4i(math.log(_q4i(v) / xk1_4))
                 for v in top["value"].iloc[:50])
        r = rows[et]
        assert r["n_pos"] == len(g)
        assert r["tail_cutoff"] == pytest.approx(xk1_4 / 1e4, abs=1e-9)
        assert r["hill_inv"] == pytest.approx(s4 / 1e4 / 50, abs=1e-4)
        assert r["alpha"] == pytest.approx(50 / (s4 / 1e4), abs=1e-3)
        # formula check: pure-float Hill estimator agrees at the
        # quantization-error scale (50 R4 terms => <= 2.5e-3 on the sum)
        f = sum(math.log(v / top["value"].iloc[50])
                for v in top["value"].iloc[:50]) / 50
        assert r["hill_inv"] == pytest.approx(f, abs=1e-3)


def test_q363_did_matches_python(spark):
    """Difference-in-differences from the 2x2 definition: DiD =
    (treated_post - treated_pre) - (control_post - control_pre) on cell
    means, each segment treated vs the leave-one-out rest, pre/post at
    1998-01-01. Cell means carry the R4 contract; a pure-float DiD
    recomputation bounds the quantization error."""
    orders = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
    cust = pq.read_table(f"{SF_DIR}/customer.parquet").to_pandas()
    t = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    t["post"] = (t["o_orderdate"] >= np.datetime64("1998-01-01")).astype(int)
    t["p6"] = [int(Decimal(float(v)).quantize(_D6, ROUND_HALF_UP)
                   .scaleb(6)) for v in t["o_totalprice"]]
    cells = {(seg, post): (len(g), int(g["p6"].sum()))
             for (seg, post), g in t.groupby(["c_mktsegment", "post"])}
    gtot = {post: (sum(n for (s, p), (n, _) in cells.items() if p == post),
                   sum(s6 for (s, p), (_, s6) in cells.items() if p == post))
            for post in (0, 1)}
    rows = {r["segment"]: r.asDict() for r in
            REGISTRY["q363_diff_in_differences"].builder(
                spark, SF_DIR).collect()}
    segs = sorted({s for s, _ in cells})
    assert sorted(rows) == segs
    for seg in segs:
        mt, mc, mtf, mcf = {}, {}, {}, {}
        for post in (0, 1):
            n, s6 = cells[(seg, post)]
            gn, gs6 = gtot[post]
            mt[post] = _q4i((s6 / 1e6) / n)
            mc[post] = _q4i(((gs6 - s6) / 1e6) / (gn - n))
            mtf[post] = s6 / 1e6 / n
            mcf[post] = (gs6 - s6) / 1e6 / (gn - n)
        r = rows[seg]
        assert (r["n_t_pre"], r["n_t_post"]) == \
            (cells[(seg, 0)][0], cells[(seg, 1)][0])
        assert r["m_t_pre"] == pytest.approx(mt[0] / 1e4, abs=1e-9)
        assert r["m_t_post"] == pytest.approx(mt[1] / 1e4, abs=1e-9)
        assert r["m_c_pre"] == pytest.approx(mc[0] / 1e4, abs=1e-9)
        assert r["m_c_post"] == pytest.approx(mc[1] / 1e4, abs=1e-9)
        did4 = (mt[1] - mt[0]) - (mc[1] - mc[0])
        assert r["did"] == pytest.approx(did4 / 1e4, abs=1e-9)
        # formula check: pure-float DiD within 4 R4 roundings
        didf = (mtf[1] - mtf[0]) - (mcf[1] - mcf[0])
        assert r["did"] == pytest.approx(didf, abs=3e-4)
