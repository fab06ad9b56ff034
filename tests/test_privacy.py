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
