"""k-anonymity / l-diversity audit invariants (q343, operators/privacy.py):
planted-fixture exactness vs a pure-python re-implementation, monoculture
detection, integer-ppm arithmetic, and the conservation identities that
make the readout trustworthy as a release gate."""

from __future__ import annotations

import pytest

from inspectadb_spark.operators.privacy import k_anonymity_readout, qi_group_stats
from tests.conftest import SF_DIR

# (qi, sensitive) planted rows: group sizes 1, 2, 5; one monoculture of 2
_ROWS = (
    [("a", 1, "x")]                         # singleton, trivially l=1
    + [("b", 1, "x"), ("b", 1, "x")]        # size 2, monoculture (l=1)
    + [("c", 2, s) for s in "xyxyz"]        # size 5, l=3
)


def _groups(spark, rows=_ROWS):
    df = spark.createDataFrame(rows, "qi string, band int, s string")
    return qi_group_stats(df, ["qi", "band"], "s")


def _expect(rows, thresholds=(2, 5, 10, 20)):
    from collections import Counter, defaultdict

    n = Counter((r[0], r[1]) for r in rows)
    sv = defaultdict(set)
    for r in rows:
        sv[(r[0], r[1])].add(r[2])
    total = sum(n.values())
    out = []
    for k in thresholds:
        small = [g for g in n if n[g] < k]
        mono = [g for g in n if len(sv[g]) < 2]
        out.append((k, len(n), len(small), sum(n[g] for g in small),
                    sum(n[g] for g in small) * 1000000 // total,
                    len(mono), sum(n[g] for g in mono)))
    return out


def test_readout_matches_pure_python_on_planted_groups(spark):
    got = [tuple(r) for r in k_anonymity_readout(_groups(spark)).collect()]
    assert got == _expect(_ROWS)


def test_group_stats_sets_are_sorted_and_exact(spark):
    g = {(r.qi, r.band): (r.n, r.svals) for r in _groups(spark).collect()}
    assert g[("a", 1)] == (1, ["x"])
    assert g[("b", 1)] == (2, ["x"])          # duplicates collapse
    assert g[("c", 2)] == (5, ["x", "y", "z"])  # sorted canonical state


def test_monoculture_detected_independently_of_k(spark):
    out = {r.k: r for r in k_anonymity_readout(_groups(spark)).collect()}
    # 'a' (1 row) and 'b' (2 rows) are monocultures at EVERY k — l-diversity
    # risk is orthogonal to group size
    for k in (2, 5, 10, 20):
        assert out[k].groups_l_lt_2 == 2
        assert out[k].rows_l_lt_2 == 3
    # at k=2 only the singleton is sub-k; at k=5 'a' and 'b'; at k=10 all
    assert (out[2].groups_lt_k, out[2].rows_lt_k) == (1, 1)
    assert (out[5].groups_lt_k, out[5].rows_lt_k) == (2, 3)
    assert (out[10].groups_lt_k, out[10].rows_lt_k) == (3, 8)


def test_ppm_is_exact_integer_floor(spark):
    out = {r.k: r for r in k_anonymity_readout(_groups(spark)).collect()}
    assert out[2].rows_lt_k_ppm == 1 * 1000000 // 8
    assert out[10].rows_lt_k_ppm == 1000000  # everything below k=10


def test_fully_anonymous_table_reports_zero_risk(spark):
    rows = [("g", 0, s) for s in "xy" * 10]  # one group, size 20, l=2
    out = {r.k: r for r in k_anonymity_readout(_groups(spark, rows)).collect()}
    for k in (2, 5, 10, 20):
        assert out[k].rows_lt_k == 0 and out[k].groups_l_lt_2 == 0
        assert out[k].rows_lt_k_ppm == 0


@pytest.mark.parametrize("sf", [SF_DIR])
def test_q343_conservation_identities(spark, sf):
    from inspectadb_spark.queries import REGISTRY

    rows = REGISTRY["q343_k_anonymity"].builder(spark, sf).collect()
    assert [r.k for r in rows] == [2, 5, 10, 20]
    for a, b in zip(rows, rows[1:]):
        # risk mass is monotone in k, group census is k-invariant
        assert b.groups_lt_k >= a.groups_lt_k
        assert b.rows_lt_k >= a.rows_lt_k
        assert b.n_groups == a.n_groups
        assert (b.groups_l_lt_2, b.rows_l_lt_2) == (a.groups_l_lt_2,
                                                    a.rows_l_lt_2)


# -- enforcement: generalize + suppress ------------------------------------------

def _cust(spark):
    import pyspark.sql.functions as F
    return (spark.read.parquet(f"{SF_DIR}/customer.parquet")
            .select(F.col("c_nationkey").alias("nation"), "c_acctbal",
                    "c_custkey"))


def test_floor_nesting_law_re_aggregation_equals_direct_binning(spark):
    # the sweep derives coarser widths from the base-width group table;
    # the law floor(v/(w*m)) == floor(floor(v/w)/m) makes that exact.
    # Compare against direct re-binning from raw values at every width.
    from pyspark.sql import functions as F

    from inspectadb_spark.operators.privacy import anonymize_sweep

    c = _cust(spark)
    got = {r.width: (r.n_groups, r.rows_lt_k)
           for r in anonymize_sweep(c, ["nation"], "c_acctbal").collect()}
    for m in (1, 2, 4, 8):
        direct = (c.select("nation",
                           F.floor(F.col("c_acctbal") / (2000.0 * m))
                           .cast("int").alias("band"))
                  .groupBy("nation", "band").count())
        n_groups = direct.count()
        rows_lt_k = (direct.filter("count < 5")
                     .agg(F.coalesce(F.sum("count"), F.lit(0))).first()[0])
        assert got[2000 * m] == (n_groups, rows_lt_k)


def test_k_anonymize_postconditions(spark):
    from pyspark.sql import functions as F

    from inspectadb_spark.operators.privacy import anonymize_sweep, k_anonymize

    c = _cust(spark)
    kept, sup = k_anonymize(c, ["nation"], "c_acctbal", k=5)
    n_kept, n_sup = kept.count(), sup.count()
    # total-preserving split
    assert n_kept + n_sup == c.count()
    # every surviving (nation, interval) group has >= k rows
    sizes = kept.groupBy("nation", "band_lo").count()
    assert sizes.filter("count < 5").count() == 0
    # the raw value is gone from the kept half, interval bounds are sane
    assert "c_acctbal" not in kept.columns
    assert kept.filter("band_hi <= band_lo").count() == 0
    # suppressed mass equals the chosen sweep row's residue
    chosen = (anonymize_sweep(c, ["nation"], "c_acctbal", k=5)
              .filter("is_chosen = 1").first())
    assert n_sup == chosen.rows_lt_k
    # suppressed rows keep full columns for review
    assert "c_acctbal" in sup.columns


def test_sweep_chooses_smallest_width_within_budget(spark):
    from inspectadb_spark.operators.privacy import anonymize_sweep

    # generous budget: the first width already qualifies
    c = _cust(spark)
    rows = anonymize_sweep(c, ["nation"], "c_acctbal", k=5,
                           budget_ppm=1000000).collect()
    assert [r.is_chosen for r in rows] == [1, 0, 0, 0]
    # impossible budget: falls back to the widest rung
    rows = anonymize_sweep(c, ["nation"], "c_acctbal", k=5,
                           budget_ppm=0).collect()
    chosen = [r for r in rows if r.is_chosen == 1]
    if rows[-1].rows_lt_k_ppm > 0:
        assert chosen == [rows[-1]]
    else:  # a width with zero residue satisfies even budget 0
        assert chosen[0].rows_lt_k_ppm == 0


def test_k_anonymize_planted_exact_split(spark):
    from inspectadb_spark.operators.privacy import k_anonymize

    # one nation: 6 rows near 100 and 2 rows near 6100. Widths 2000 and
    # 4000 leave the small cluster in its own sub-5 band (residue 2 rows,
    # above budget 0); width 8000 merges both clusters into band 0 (size
    # 8 >= 5, zero residue) and is the smallest width meeting the budget —
    # so generalization alone succeeds and nothing is suppressed.
    rows = ([(1, 100.0 + i) for i in range(6)]
            + [(1, 6100.0), (1, 6200.0)])
    df = spark.createDataFrame(rows, "nation int, c_acctbal double")
    kept, sup = k_anonymize(df, ["nation"], "c_acctbal", k=5,
                            budget_ppm=0)
    assert sup.count() == 0
    assert kept.count() == 8
    assert kept.select("band_lo").distinct().collect()[0][0] == 0.0


def test_sweep_plan_scans_the_corpus_exactly_once(spark):
    # the whole ladder re-aggregates the base-width group table: a naive
    # implementation scans the source once per width (4 scans here), and
    # a two-pass selection (separate one-row aggregate joined back) scans
    # twice. The floor-nesting form with the window-based selection must
    # show exactly ONE file scan; its one unpartitioned window rides the
    # |multipliers|-row ladder table (bounded by construction, inventoried
    # in tests/test_window_lint.py), never the corpus.
    from inspectadb_spark.operators.privacy import anonymize_sweep

    c = _cust(spark)
    plan = (anonymize_sweep(c, ["nation"], "c_acctbal")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Window") == 1, plan


# -- t-closeness (q345): TVD identities + pure-python exactness -------------

def _pairs(spark, rows):
    from inspectadb_spark.operators.privacy import sensitive_pair_counts
    df = spark.createDataFrame(rows, "qi string, band int, s string")
    return sensitive_pair_counts(df, ["qi", "band"], "s")


def _tvd_ppm_expect(rows):
    """Pure-python full-domain TVD per group, same integer contract."""
    from collections import Counter

    n = Counter((r[0], r[1]) for r in rows)
    cs = Counter(r[2] for r in rows)
    pair = Counter(((r[0], r[1]), r[2]) for r in rows)
    big_n = len(rows)
    out = {}
    for g, ng in n.items():
        # the DIRECT full-domain sum, absent values included — the
        # operator's folded n*N correction must reproduce it exactly
        num = sum(abs(pair.get((g, s), 0) * big_n - cs[s] * ng)
                  for s in cs)
        out[g] = num * 1000000 // (2 * ng * big_n)
    return out


def _readout(spark, rows, thresholds=(100000, 200000, 300000, 500000)):
    from inspectadb_spark.operators.privacy import t_closeness_readout
    return t_closeness_readout(_pairs(spark, rows), ["qi", "band"], "s",
                               thresholds_ppm=thresholds).collect()


def test_t_closeness_matches_pure_python_full_domain_tvd(spark):
    # group 'a' misses sensitive value 'z' entirely — exercises the
    # absent-value closed-form correction against the direct domain sum
    rows = ([("a", 1, "x")] * 3 + [("a", 1, "y")]
            + [("b", 1, "z")] * 4 + [("b", 1, "x")]
            + [("c", 2, s) for s in "xyzxyz"])
    tvd = _tvd_ppm_expect(rows)
    got = {r.t_ppm: r for r in _readout(spark, rows)}
    n = {("a", 1): 4, ("b", 1): 5, ("c", 2): 6}
    for t in (100000, 200000, 300000, 500000):
        over = [g for g, v in tvd.items() if v > t]
        assert got[t].groups_gt_t == len(over)
        assert got[t].rows_gt_t == sum(n[g] for g in over)
        assert got[t].max_tvd_ppm == max(tvd.values())


def test_group_matching_global_distribution_has_zero_tvd(spark):
    # both groups are exactly the global 50/50 mix -> TVD 0 everywhere
    rows = ([("a", 1, "x"), ("a", 1, "y")] * 2
            + [("b", 1, "x"), ("b", 1, "y")] * 3)
    for r in _readout(spark, rows):
        assert r.groups_gt_t == 0 and r.rows_gt_t == 0
        assert r.max_tvd_ppm == 0


def test_monoculture_tvd_is_one_minus_global_share(spark):
    # group 'm' is all-'x'; globally x is 6/10 -> TVD = 1 - 0.6 = 0.4
    rows = ([("m", 1, "x")] * 4
            + [("o", 1, "x")] * 2 + [("o", 1, "y")] * 4)
    got = {r.t_ppm: r for r in _readout(spark, rows)}
    assert got[300000].groups_gt_t >= 1      # m at 400000 ppm > 0.3
    assert got[500000].max_tvd_ppm >= 400000
    tvd = _tvd_ppm_expect(rows)
    assert tvd[("m", 1)] == 400000


def test_t_closeness_catches_skew_l_diversity_misses(spark):
    # the headline attack: group 'sk' has l=2 (passes l-diversity) but is
    # 90% 'x' where x is 50% globally -> TVD 0.4, flagged at t=0.3
    from inspectadb_spark.operators.privacy import (
        k_anonymity_readout, qi_group_stats,
    )

    rows = ([("sk", 1, "x")] * 9 + [("sk", 1, "y")]
            + [("bg", 1, "x")] * 1 + [("bg", 1, "y")] * 9)
    df = spark.createDataFrame(rows, "qi string, band int, s string")
    kan = {r.k: r for r in k_anonymity_readout(
        qi_group_stats(df, ["qi", "band"], "s")).collect()}
    assert kan[5].groups_l_lt_2 == 0          # l-diversity sees nothing
    got = {r.t_ppm: r for r in _readout(spark, rows)}
    assert got[300000].groups_gt_t == 2       # t-closeness flags both
    assert got[500000].groups_gt_t == 0


def test_q345_identities_and_qi_grain_agrees_with_q343(spark):
    from inspectadb_spark.queries import REGISTRY

    rows = REGISTRY["q345_t_closeness"].builder(spark, SF_DIR).collect()
    assert [r.t_ppm for r in rows] == [100000, 200000, 300000, 500000]
    for a, b in zip(rows, rows[1:]):
        # violation mass is anti-monotone in t; census is t-invariant
        assert b.groups_gt_t <= a.groups_gt_t
        assert b.rows_gt_t <= a.rows_gt_t
        assert b.n_groups == a.n_groups
        assert b.max_tvd_ppm == a.max_tvd_ppm
    # same QI grain as the q343 audit: identical group census
    k343 = REGISTRY["q343_k_anonymity"].builder(spark, SF_DIR).first()
    assert rows[0].n_groups == k343.n_groups


# -- DP noisy release (q347): mechanism contract + calibration --------------

def _dp_python(cells, releases=(("e05", 0.5), ("e20", 2.0)),
               sensitivity=1, salt="dp"):
    """Pure-python re-implementation of the full noise contract."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    out = {}
    for key, n in cells.items():
        for lbl, eps in releases:
            # length-prefixed part (injective encoding — see
            # _attach_laplace_draw)
            v = int(hashlib.md5(f"{len(key)}#{key}:{salt}:{lbl}".encode())
                    .hexdigest()[:8], 16)
            u = (v + 0.5) / 4294967296.0
            sg = 1 if u >= 0.5 else -1
            lnq = Decimal(repr(math.log(1 - 2 * abs(u - 0.5)))).quantize(
                Decimal("0.000001")).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP)
            b = Decimal(repr(sensitivity / eps)).quantize(Decimal("0.000001"))
            noisy = (Decimal(n) + (-sg) * b * lnq).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP)
            out[(lbl, key)] = int(noisy)
    return out


def _release(spark, cells, **kw):
    from inspectadb_spark.operators.privacy import dp_noisy_release
    rows = [(k,) for k, n in cells.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "cell string")
    return dp_noisy_release(df, ["cell"], **kw)


def test_dp_release_matches_pure_python_contract(spark):
    cells = {"a": 100, "b": 7, "c": 1}
    got = {(r.lbl, r.cell): r.n_noisy
           for r in _release(spark, cells).collect()}
    assert got == _dp_python(cells)


def test_dp_noise_is_replayable_and_salt_rotates_it(spark):
    cells = {"a": 50, "b": 50}
    one = sorted(tuple(r) for r in _release(spark, cells).collect())
    two = sorted(tuple(r) for r in _release(spark, cells).collect())
    assert one == two                       # replayable: same salt, same draw
    other = sorted(tuple(r)
                   for r in _release(spark, cells, salt="dp2").collect())
    assert other != one                     # rotating the salt redraws


def test_dp_calibration_and_epsilon_ordering(spark):
    # many cells, equal true counts: mean |noise| tracks b = 1/eps and the
    # strict rung is noisier than the loose one
    cells = {f"c{i:03d}": 1000 for i in range(200)}
    rows = _release(spark, cells).collect()
    err = {}
    for lbl in ("e05", "e20"):
        es = [abs(r.n_noisy - 1000) for r in rows if r.lbl == lbl]
        err[lbl] = sum(es) / len(es)
    assert err["e05"] > err["e20"]
    # Laplace mean |X| = b: wide bands (200 draws)
    assert 1.0 < err["e05"] < 4.0           # b = 2
    assert 0.25 < err["e20"] < 1.0          # b = 0.5
    # sign balance: the keyed PRF is not systematically one-sided
    pos = sum(1 for r in rows if r.lbl == "e05" and r.n_noisy > 1000)
    assert 60 < pos < 140


def test_dp_negative_counts_release_unclamped(spark):
    # tiny true counts + strict epsilon can go negative; the release must
    # not clamp (clamping is consumer post-processing)
    cells = {f"z{i:02d}": 1 for i in range(60)}
    rows = _release(spark, cells,
                    releases=(("e01", 0.125),)).collect()   # b = 8
    assert any(r.n_noisy < 0 for r in rows)


def test_q347_ladder_total_epsilon_is_sequential_composition(spark):
    from inspectadb_spark.queries import REGISTRY

    rows = REGISTRY["q347_dp_noisy_release"].builder(spark, SF_DIR).collect()
    ladder = sorted({(r.lbl, r.eps) for r in rows})
    assert ladder == [("e05", 0.5), ("e20", 2.0)]
    # total privacy spend of publishing both rungs
    assert sum(e for _, e in ladder) == 2.5
    # same cell census per rung
    per = {lbl: sorted(r.nation for r in rows if r.lbl == lbl)
           for lbl, _ in ladder}
    assert per["e05"] == per["e20"]


# -- DP bounded-contribution sum release (q348) -------------------------------

def test_dp_sum_clipping_bounds_whale_influence(spark):
    from inspectadb_spark.operators.privacy import dp_noisy_sum_release

    # base pool + one whale whose raw contribution is 100x the clip: the
    # released sums with and without the whale differ by AT MOST the clip
    # (that bounded difference IS the sensitivity the epsilon protects)
    base = [("g", f"u{i}", 100.0) for i in range(50)]
    whale = [("g", "whale", 100000.0)]
    kw = dict(contributor_col="contributor", value_col="v", clip=1000.0,
              releases=(("e10", 1.0),))
    df0 = spark.createDataFrame(base, "g string, contributor string, v double")
    df1 = spark.createDataFrame(base + whale,
                                "g string, contributor string, v double")
    a = dp_noisy_sum_release(df0, ["g"], **kw).first().sum_noisy
    b = dp_noisy_sum_release(df1, ["g"], **kw).first().sum_noisy
    # same cell key + salt -> same noise, so the delta is pure clipped signal
    assert b - a == 1000
    # without clipping the delta would be the whale's full 100000
    kw_unclipped = dict(kw, clip=10**9)
    a2 = dp_noisy_sum_release(df0, ["g"], **kw_unclipped).first().sum_noisy
    b2 = dp_noisy_sum_release(df1, ["g"], **kw_unclipped).first().sum_noisy
    assert b2 - a2 == 100000


def test_dp_sum_contributor_level_not_row_level(spark):
    from inspectadb_spark.operators.privacy import dp_noisy_sum_release

    # one contributor split across many small rows must clip on the TOTAL:
    # 20 rows x 100 = 2000, clip 1000 -> contributes 1000, not 20x100
    rows = ([("g", "many_rows", 100.0)] * 20
            + [("g", "one_row", 1000.0)])
    df = spark.createDataFrame(rows, "g string, contributor string, v double")
    got = dp_noisy_sum_release(df, ["g"], "contributor", "v", clip=1000.0,
                               releases=(("e10", 1.0),)).first()
    # clipped total = 1000 + 1000 = 2000 (+ deterministic noise)
    base = dp_noisy_sum_release(
        spark.createDataFrame([("g", "a", 1000.0), ("g", "b", 1000.0)],
                              "g string, contributor string, v double"),
        ["g"], "contributor", "v", clip=1000.0,
        releases=(("e10", 1.0),)).first()
    assert got.sum_noisy == base.sum_noisy


def test_q348_clip_binds_and_noise_scales(spark):
    from inspectadb_spark.queries import REGISTRY

    rows = REGISTRY["q348_dp_sum_release"].builder(spark, SF_DIR).collect()
    assert len(rows) == 50 and len({r.nation for r in rows}) == 25
    # fixture honesty: the clip actually binds on a real share of customers
    import pyspark.sql.functions as F
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    per = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    frac = per.filter("s > 3000000").count() / per.count()
    assert 0.05 < frac < 0.8, frac
    # strict rung deviates more from the true clipped total than the loose
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    t = (o.join(c, o.o_custkey == c.c_custkey)
         .groupBy(F.col("c_nationkey").alias("nation"), "o_custkey")
         .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("s"))
         .select("nation", F.least(F.col("s"), F.lit(3000000.0)
                                   .cast("decimal(18,6)")).alias("cs"))
         .groupBy("nation").agg(F.sum("cs").alias("t")))
    true = {r.nation: float(r.t) for r in t.collect()}
    err = {lbl: sum(abs(r.sum_noisy - true[r.nation])
                    for r in rows if r.lbl == lbl)
           for lbl in ("e05", "e20")}
    assert err["e05"] > err["e20"] > 0


# -- DP thresholded histogram (q349) ------------------------------------------

def test_dp_threshold_suppresses_singleton_keys(spark):
    from inspectadb_spark.operators.privacy import dp_thresholded_release

    # the attack the threshold exists for: a key with ONE contributor
    # (a user-generated string) must essentially never publish, while the
    # heavy keys publish fine
    rows = ([("common", ) for _ in range(500)]
            + [("secret-user-string",)])
    df = spark.createDataFrame(rows, "cell string")
    out = dp_thresholded_release(df, ["cell"], delta=1e-6).collect()
    cells = {(r.lbl, r.cell) for r in out}
    assert ("e05", "common") in cells and ("e20", "common") in cells
    assert not any(c == "secret-user-string" for _, c in cells)


def test_dp_threshold_is_the_calibrated_ceiling(spark):
    import math

    from inspectadb_spark.operators.privacy import dp_thresholded_release

    df = spark.createDataFrame([("a",)] * 100, "cell string")
    out = {r.lbl: r.tau for r in
           dp_thresholded_release(df, ["cell"], delta=1e-6).collect()}
    assert out["e05"] == math.ceil(1 + 2.0 * math.log(1 / 2e-6)) == 28
    assert out["e20"] == math.ceil(1 + 0.5 * math.log(1 / 2e-6)) == 8
    # smaller delta -> stricter bar
    out2 = {r.lbl: r.tau for r in
            dp_thresholded_release(df, ["cell"], delta=1e-9).collect()}
    assert out2["e05"] > out["e05"]


def test_dp_threshold_equals_filtered_plain_release(spark):
    from inspectadb_spark.operators.privacy import (
        dp_noisy_release, dp_thresholded_release,
    )

    rows = [(f"c{i % 7}",) for i in range(300)]
    df = spark.createDataFrame(rows, "cell string")
    thr = [(r.lbl, r.cell, r.n_noisy)
           for r in dp_thresholded_release(df, ["cell"]).collect()]
    plain = {(r.lbl, r.cell): r.n_noisy
             for r in dp_noisy_release(df, ["cell"]).collect()}
    tau = {"e05": 28, "e20": 8}
    want = sorted((lbl, c, n) for (lbl, c), n in plain.items()
                  if n >= tau[lbl])
    assert sorted(thr) == want


def test_q349_strict_rung_has_the_higher_bar(spark):
    from inspectadb_spark.queries import REGISTRY

    rows = REGISTRY["q349_dp_thresholded_histogram"].builder(
        spark, SF_DIR).collect()
    kept = {lbl: {r.segment for r in rows if r.lbl == lbl}
            for lbl in ("e05", "e20")}
    # publishing under the strict rung implies publishable under the loose
    # one on this fixture (tau_e05 > tau_e20 and noise is per-rung but
    # bounded well below the tau gap at these counts)
    assert kept["e05"] <= kept["e20"]
    taus = {r.lbl: r.tau for r in rows}
    assert taus["e05"] > taus["e20"]


# -- review regressions: clamp sidedness, NULL-key independence ---------------

def test_dp_sum_clamps_negative_contributions_too(spark):
    from inspectadb_spark.operators.privacy import dp_noisy_sum_release

    # signed values (refunds): a -1e9 contributor must move the release by
    # at most clip, exactly like the positive whale
    base = [("g", f"u{i}", 100.0) for i in range(50)]
    anti_whale = [("g", "refunder", -1_000_000.0)]
    kw = dict(contributor_col="contributor", value_col="v", clip=1000.0,
              releases=(("e10", 1.0),))
    df0 = spark.createDataFrame(base, "g string, contributor string, v double")
    df1 = spark.createDataFrame(base + anti_whale,
                                "g string, contributor string, v double")
    a = dp_noisy_sum_release(df0, ["g"], **kw).first().sum_noisy
    b = dp_noisy_sum_release(df1, ["g"], **kw).first().sum_noisy
    assert a - b == 1000     # bounded by the clip, not the raw 1e6


def test_dp_null_group_values_draw_independent_noise(spark):
    from inspectadb_spark.operators.privacy import dp_noisy_release

    # cells ('x', NULL) and (NULL, 'x') must not collapse onto one PRF key
    rows = [("x", None)] * 50 + [(None, "x")] * 50
    df = spark.createDataFrame(rows, "a string, b string")
    out = dp_noisy_release(df, ["a", "b"],
                           releases=(("e10", 1.0),)).collect()
    assert len(out) == 2
    noise = sorted(r.n_noisy - 50 for r in out)
    assert noise[0] != noise[1], out


def test_dp_colon_group_values_draw_independent_noise(spark):
    from inspectadb_spark.operators.privacy import dp_noisy_release

    # length-prefix injectivity (ADVICE r11): cells ('a:b','c') and
    # ('a','b:c') concatenate identically under a bare ':' join — they
    # must not share a draw
    rows = [("a:b", "c")] * 50 + [("a", "b:c")] * 50
    df = spark.createDataFrame(rows, "a string, b string")
    out = dp_noisy_release(df, ["a", "b"],
                           releases=(("e10", 1.0),)).collect()
    assert len(out) == 2
    noise = sorted(r.n_noisy - 50 for r in out)
    assert noise[0] != noise[1], out


def test_t_closeness_counts_null_sensitive_category(spark):
    # NULL is a distinguishable sensitive value: the marginal join must be
    # null-safe or those rows drop from n/cs while big_n still counts them
    # (ADVICE r11). Fixture: g1 = 50/50 x/NULL, g2 = all x.
    # Global: x=150, NULL=50, N=200. TVD(g1)=0.25, TVD(g2)=0.25 — computed
    # first-principles INCLUDING the NULL category.
    from inspectadb_spark.operators.privacy import t_closeness_readout

    pairs = spark.createDataFrame(
        [("g1", "x", 50), ("g1", None, 50), ("g2", "x", 100)],
        "qi string, s string, c long")
    out = {r.t_ppm: r for r in
           t_closeness_readout(pairs, ["qi"], "s",
                               thresholds_ppm=(200000, 300000)).collect()}
    assert out[200000].max_tvd_ppm == 250000
    assert out[200000].groups_gt_t == 2
    assert out[300000].groups_gt_t == 0
    # census covers ALL rows — the pre-fix inner join undercounted n
    assert out[200000].n_groups == 2
    assert out[200000].rows_gt_t == 200


def test_t_closeness_survives_large_synthetic_counts(spark):
    # counts big enough that the bigint form of (dev + n*N)*1e6 would wrap
    # (n*N ~ 2.5e13 > 4.6e12): decimal routing must keep tvd_ppm exact
    from inspectadb_spark.operators.privacy import t_closeness_readout

    pairs = spark.createDataFrame(
        [("g1", 0, "x", 5_000_000_000), ("g1", 0, "y", 5_000_000_000),
         ("g2", 0, "x", 2_500_000_000)],
        "qi string, band int, s string, c long")
    out = {r.t_ppm: r for r in
           t_closeness_readout(pairs, ["qi", "band"], "s").collect()}
    # global: x=7.5e9, y=5e9 of N=1.25e10; g1 is 50/50 (TVD=0.1),
    # g2 all-x (TVD=0.4) -> exact ppm, no wraparound garbage
    assert out[100000].max_tvd_ppm == 400000
    assert out[300000].groups_gt_t == 1
    assert 0 <= out[100000].rows_gt_t_ppm <= 1000000


def test_sweep_rejects_fractional_or_degenerate_base_width(spark):
    import pytest as _pytest

    from inspectadb_spark.operators.privacy import anonymize_sweep

    c = _cust(spark)
    for bad in (2500.5, 0.5, 0):
        with _pytest.raises(ValueError, match="integer-valued"):
            anonymize_sweep(c, ["nation"], "c_acctbal", base_width=bad)
