"""Registry lint: no silently-constant statistic columns (VERDICT r8 item 3).

The round-8 manual oracle sweep found four queries whose HEADLINE statistic
was identically 0 or 1 at every SF (q257 drawdown, q246 lateness, q86
Jaccard, q292 MRR) — each hash-matched its DuckDB oracle perfectly while
proving nothing, the one failure mode a same-author oracle can never flag.
The round-9 sweep (this lint's first run) found ten more: q44 (n ≡ 1 — the
corpus has no exact dups), q61 (plain ≡ 0 ≡ with_null — the 3VL contrast
was invisible), q174 (modal bin ≡ 0), q190 (n_censored ≡ 0), q218
(n_churned ≡ 0), q45f (four language scores ≡ 0), q266 (n_stop_fps ≡ 0),
q269 (dup_ppm ≡ 0), q270/q302 (OOV ≡ 0 — 31-word closed vocabulary). All
ten were fixed in the same commit that added this lint.

This test promotes that sweep to a STANDING gate: every registered oracle
runs in DuckDB at sf0.001 AND sf0.01; any numeric column whose every
non-NULL value at BOTH SFs equals the same v ∈ {0, 1} must appear in the
justified-constant inventory below with a reviewed reason. Set equality is
asserted in both directions, so the inventory can't go stale: a new
saturated fixture fails the lint until justified, and a fixed/changed query
whose justification no longer applies fails until the entry is removed.

Scope notes. The {0, 1} filter is deliberate — those are the saturation
values of every bug class seen so far (zero-count, probability/ratio
collapse); a column constant at some other value (a parameter echoed into
the output, a fixture bound) doesn't make the query self-proving in the
same way. Constancy at ONE SF only is likewise fine (small-fixture noise);
the q326 class is constant across scale.
"""

from __future__ import annotations

import decimal

import duckdb
import pytest

from inspectadb_spark import queries as corpus

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
_SAT_VALUES = (0.0, 1.0)
_TOL = 1e-12

# (query id, column) -> (saturated value, why the constant is legitimate).
# Every entry was individually adjudicated; the paired test asserts the
# flagged set equals EXACTLY this inventory, so additions and removals are
# both conscious edits.
_JUSTIFIED: dict[tuple[str, str], tuple[float, str]] = {
    ("q01_scan_count", "mn"): (1.0,
        "MIN(l_linenumber) — the generator numbers lines from 1; the "
        "query's signal is the count columns, which vary"),
    ("q08_full_join", "nb"): (1.0,
        "COUNT(*) GROUP BY p_partkey is identically 1 on a primary key; "
        "the full-join signal is nb's NULL pattern on lineitem-only keys "
        "(NULLs are outside this detector) and na, which varies"),
    ("q141_salted_agg", "mn"): (0.0,
        "MIN(user_id) per event type hits the id domain floor 0 — every "
        "type reaches user 0 at both SFs; n/sv/mx vary and carry the "
        "salted-vs-plain parity signal"),
    ("q160_calendar_dim", "month"): (1.0,
        "the events corpus spans January 2024 only — month ≡ 1 is a "
        "calendar attribute of the fixture, not a statistic"),
    ("q160_calendar_dim", "quarter"): (1.0,
        "same: January 2024 only, quarter ≡ 1"),
    ("q205_dataset_card", "n_dup_docs"): (0.0,
        "the raw documents corpus genuinely holds zero exact duplicates; "
        "the card reports that fact. Dup COUNTING is value-exercised by "
        "the planted-dup overlays in q44/q269 and by q223's histogram"),
    ("q205_dataset_card", "dup_ppm"): (0.0,
        "same clean-corpus fact as n_dup_docs"),
    ("q230_cdc_lifecycle_census", "n_malformed"): (0.0,
        "the changelog is derived in-query and well-formed by "
        "construction; the counter is the guard asserting exactly that "
        "invariant, recomputed independently by the oracle"),
    ("q245_join_cardinality_audit", "err_ratio"): (0.0,
        "adjudicated in round 8: the cardinality estimator is exact on "
        "uniform keys by design — the zero error IS the demonstrated "
        "property"),
    ("q251_fk_enforcement", "n_quarantined"): (0.0,
        "the generator's FKs are referentially clean — the zero is the "
        "audited integrity invariant; enforce_inclusion's quarantine "
        "side is unit-tested with planted orphans "
        "(tests/test_inspection.py::test_enforce_inclusion_splits...)"),
    ("q253_cluster_split", "n_straddling_clusters"): (0.0,
        "the zero IS the group-leakage-safety property the query "
        "demonstrates: a cluster-keyed split never straddles clusters"),
    ("q305_isotropy", "rms_norm"): (1.0,
        "adjudicated in round 8: embeddings are unit-normalized by "
        "construction; centroid_norm/anisotropy vary"),
    ("q40_higher_order", "ssq"): (1.0,
        "adjudicated in round 8: the higher-order-function pipeline "
        "normalizes to a unit vector — ssq ≡ 1 is the checked identity"),
    ("q42b_from_json", "mn"): (0.0,
        "MIN of the JSON prop 'k' hits its domain floor 0 at both SFs; "
        "mx/avg vary and prove the extraction"),
    ("q42c_variant", "mn_k"): (0.0,
        "same domain-floor MIN as q42b, through the Variant path"),
    ("q54_dq_profile", "n_null"): (0.0,
        "the fixture has no NULLs; the DQ profile truthfully reports a "
        "clean table — COUNT(CASE WHEN x IS NULL) is formula-trivial in "
        "both engines, so same-author-wrong risk is negligible"),
    ("q54b_dq_integrity", "orphan_orders"): (0.0,
        "TPC-H-style generator referential integrity — the zero is the "
        "audited invariant (same class as q251)"),
    ("q54b_dq_integrity", "orphan_lineitems"): (0.0,
        "same referential-integrity invariant"),
    ("q54b_dq_integrity", "dup_orderkeys"): (0.0,
        "o_orderkey is the generator's primary key; zero dups is the "
        "audited invariant"),
    ("q61_not_in_3vl", "with_null"): (0.0,
        "THE three-valued-logic assertion: NOT IN over a NULL-containing "
        "subquery yields no rows, always. Meaningful because `plain` "
        "over the same (non-NULL) subquery is provably nonzero since the "
        "round-9 fix — the pair is the contrast"),
    ("q90_bit_bool_aggs", "b_and"): (0.0,
        "bit_and of hundreds of uniform integers is 0 with near-"
        "certainty at any SF; b_or/b_xor vary and prove the family"),
}


def _is_num(v) -> bool:
    return isinstance(v, (int, float, decimal.Decimal)) \
        and not isinstance(v, bool)


def saturated_columns(per_sf: list[tuple[list[str], list[tuple]]]
                      ) -> dict[str, float]:
    """Detector: columns whose every non-NULL value in EVERY result set
    equals the same v ∈ {0, 1} within 1e-12. Non-numeric columns and
    all-NULL columns are skipped (strings/bools/dates saturate
    differently; NULL patterns are the outer-join signal, not noise)."""
    cols = per_sf[0][0]
    out: dict[str, float] = {}
    for ci, c in enumerate(cols):
        vals: list[float] = []
        numeric = True
        for _, rows in per_sf:
            for r in rows:
                v = r[ci]
                if v is None:
                    continue
                if not _is_num(v):
                    numeric = False
                    break
                vals.append(float(v))
            if not numeric:
                break
        if not numeric or not vals:
            continue
        for sat in _SAT_VALUES:
            if all(abs(v - sat) <= _TOL for v in vals):
                out[c] = sat
                break
    return out


def test_detector_flags_planted_saturation():
    """The lint must actually catch a planted q326-class fixture."""
    cols = ["grp", "n", "dead_stat", "live_stat", "all_null", "ratio1"]
    sf_a = (cols, [("x", 3, 0, 0.7, None, 1.0), ("y", 5, 0, 0.2, None, 1.0)])
    sf_b = (cols, [("x", 31, 0, 0.9, None, 1.0), ("y", 54, 0, 0.0, None, 1.0)])
    got = saturated_columns([sf_a, sf_b])
    assert got == {"dead_stat": 0.0, "ratio1": 1.0}
    # constant at one SF but not the other -> NOT flagged
    sf_c = (cols, [("x", 3, 0, 0.7, None, 1.0), ("y", 5, 4, 0.2, None, 0.5)])
    assert "dead_stat" not in saturated_columns([sf_a, sf_c])
    # constant at a non-{0,1} value -> NOT flagged (parameter echo class)
    cols2 = ["k"]
    assert saturated_columns([(cols2, [(7,), (7,)]),
                              (cols2, [(7,), (7,)])]) == {}


@pytest.fixture(scope="module")
def _cons():
    cons = []
    for sf in SFS:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
        cons.append(con)
    yield cons
    for con in cons:
        con.close()


def test_no_unjustified_constant_statistics(_cons):
    osql = corpus.oracle_sql()
    flagged: dict[tuple[str, str], float] = {}
    for qid in sorted(osql):
        per_sf = []
        for con in _cons:
            cur = con.execute(osql[qid])
            per_sf.append(([d[0] for d in cur.description], cur.fetchall()))
        for col, val in saturated_columns(per_sf).items():
            flagged[(qid, col)] = val
    unjustified = {k: v for k, v in flagged.items() if k not in _JUSTIFIED}
    assert not unjustified, (
        "saturated statistic columns (constant 0/1 across rows AND both "
        "SFs) without a justified-constant inventory entry — the query "
        "hash-matches while proving nothing (q326 class). Fix the fixture "
        f"or justify here: {unjustified}"
    )
    stale = {k: v for k, v in _JUSTIFIED.items() if k not in flagged}
    assert not stale, (
        "inventory entries that no longer saturate — the justification "
        f"is stale, remove it: {list(stale)}"
    )
    # the justified VALUE must still be the observed one
    drift = {k: (flagged[k], _JUSTIFIED[k][0])
             for k in flagged if k in _JUSTIFIED
             and flagged[k] != _JUSTIFIED[k][0]}
    assert not drift, f"saturation value changed vs inventory: {drift}"
