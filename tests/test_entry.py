"""Driver-contract ordering regression (round-3 ADVICE item).

`__spark_entry__._PRIMARY` front-loads the driver's first-50 sample window;
these tests pin it against the registry so future query additions can't
silently displace the intended sampled set or reference a renamed id.

Round-14 contract (VERDICT r13 item 1): the oracled backlog is 0
(cumulative 399/399 after r13), so all 50 slots refresh evidence —
(a) the round-13-rewritten oracled ids never driver-sampled post-change,
(b) this optimization round's own targets, (c) the stalest remaining
evidence (r05-green ids, registry order).
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry
from inspectadb_spark.queries import REGISTRY

ROOT = Path(__file__).resolve().parent.parent

# Pre-round-14 baseline: only CORRECTNESS files from rounds < 14 count when
# deciding staleness, so this round's own CORRECTNESS_r14 landing mid-round
# can't flip these pins.
_BASELINE_CUTOFF = "CORRECTNESS_r14"

# Registry size pin: 416/399 frozen through both optimization rounds
# (VERDICT r13 item 10). Growth must consciously update this pin in the
# same commit that grows the registry.
_FROZEN_REGISTRY_SIZE = 416
_FROZEN_ORACLED_SIZE = 399

# Block (a): round-13-rewritten oracled ids whose post-change correctness
# the driver has never sampled (VERDICT r13 item 1 list, minus q53d / q267b /
# q207 / q199 which have no oracle SQL and would waste a slot).
_R13_REWRITTEN_UNSAMPLED = [
    "q102_null_safe_join", "q244_theil_sen", "q179_capped_sessions",
    "q182_repair_changelog", "q296_multiclass_prf", "tpch_q21",
    "q202_margin_bitext", "q203_matryoshka_recall",
    "q193_hard_negatives", "q224_knn_label_accuracy", "q267_mutual_nn",
    "q187_poisson_bootstrap",
    "q250_dedup_threshold_sweep", "q240_inclusion_audit",
    "q245_join_cardinality_audit", "q281_cramers_v", "q166_chi_square",
    "q306_mutual_information", "q173_psi_drift", "q273_spearman",
    "q264_ngram_coverage", "q130_curation_pipeline",
    "q284_shingle_containment", "q268_winnowing_neardup",
    "q266_winnowing_profile", "q131_dup_spans", "q137_cross_source_dups",
    "q142_fuzzy_join", "q129_boilerplate", "q198_heavy_hitters",
    "q237_keep_best_dedup", "q219_simhash_calibration",
    "q280_avg_precision",
]

# Block (b): this round's focus ids (rewritten, adjudicated, or stale).
_ROUND14_TARGETS = [
    "q204_minhash_calibration", "q302_kn_bigram_xent",
    "q43g_blocked_neardup",
]


def _green_rounds() -> dict[str, set[str]]:
    """id -> set of pre-cutoff CORRECTNESS files with a hash-green row."""
    green: dict[str, set[str]] = {}
    for p in ROOT.glob("CORRECTNESS_r*.json"):
        if p.name >= _BASELINE_CUTOFF:
            continue
        try:
            for name, row in json.loads(p.read_text()).items():
                if row.get("hash_match") is True:
                    green.setdefault(name, set()).add(p.name)
        except Exception:
            pass
    return green


def test_primary_names_all_exist_in_registry():
    missing = [n for n in entry._PRIMARY if n not in REGISTRY]
    assert not missing, f"_PRIMARY references unknown queries: {missing}"
    assert len(entry._PRIMARY) == len(set(entry._PRIMARY)), "duplicate ids"


def test_registry_size_is_pinned():
    from inspectadb_spark import queries as corpus

    assert len(REGISTRY) == _FROZEN_REGISTRY_SIZE, (
        f"registry is {len(REGISTRY)}, pin says {_FROZEN_REGISTRY_SIZE}; "
        "growth must consciously update the pin in the same commit"
    )
    assert len(corpus.oracle_sql()) == _FROZEN_ORACLED_SIZE


def test_round14_front_window_is_the_intended_sample():
    assert len(entry._ROUND14_FRONT) == 50
    front = entry._PRIMARY[:50]
    assert front == entry._ROUND14_FRONT, (
        "the first 50 queries() keys ARE the driver's sample — additions "
        "must go behind the curated window, not displace it"
    )
    # every sampled id must be oracled (a rows-only id would waste a slot)
    from inspectadb_spark import queries as corpus

    osql = corpus.oracle_sql()
    missing = [n for n in front if n not in osql]
    assert not missing, f"front-50 ids without oracle SQL: {missing}"


def test_round14_front_loads_the_r13_rewrites():
    """Every r13-rewritten oracled id the driver has not yet sampled
    post-change must be in the window (VERDICT r13 item 1), and none of
    them may already have an r13 driver row (else the slot is wasted)."""
    front = set(entry._ROUND14_FRONT)
    missing = [n for n in _R13_REWRITTEN_UNSAMPLED if n not in front]
    assert not missing, f"r13 rewrites left out of the window: {missing}"
    r13 = json.loads((ROOT / "CORRECTNESS_r13.json").read_text())
    already = [n for n in _R13_REWRITTEN_UNSAMPLED if n in r13]
    assert not already, (
        f"ids already driver-sampled in r13 occupy rewrite slots: {already}"
    )
    for n in _ROUND14_TARGETS:
        assert n in front, f"round-14 optimization target {n} not sampled"


def test_round14_refresh_slots_are_the_stalest_evidence():
    """The slots not spent on r13 rewrites / r14 targets must refresh ids
    whose latest green row is r05 — the oldest evidence in the corpus."""
    green = _green_rounds()
    reserved = set(_R13_REWRITTEN_UNSAMPLED) | set(_ROUND14_TARGETS)
    refresh = [n for n in entry._ROUND14_FRONT if n not in reserved]
    assert len(refresh) == 50 - len(reserved)
    fresh = [
        n
        for n in refresh
        if green.get(n) and max(green[n]) > "CORRECTNESS_r05.json"
    ]
    assert not fresh, f"refresh slots wasted on recently-verified ids: {fresh}"
    unsampled = [n for n in refresh if n not in green]
    assert not unsampled, (
        f"refresh ids with no prior green row (belong in backlog?): {unsampled}"
    )


def test_no_oracled_id_is_unsampled():
    """Cumulative driver coverage stays at 399/399: every oracled id has a
    green row somewhere in r02-r13 (the r13 rotation cleared the backlog)."""
    from inspectadb_spark import queries as corpus

    green = _green_rounds()
    never = [n for n in corpus.oracle_sql() if n not in green]
    assert not never, f"oracled ids with no driver row: {never}"


def test_round13_front_is_all_driver_green():
    """Regression guard: the previous curated window really did go green,
    so the rotation isn't abandoning red rows."""
    r13 = ROOT / "CORRECTNESS_r13.json"
    rows = json.loads(r13.read_text())
    bad = [
        n
        for n in entry._ROUND13_FRONT
        if rows.get(n, {}).get("hash_match") is not True
    ]
    assert not bad, f"round-13 window ids not hash-green in r13: {bad}"


def test_ordered_emits_every_registry_query():
    keys = list(entry.queries().keys())
    assert set(keys) == set(REGISTRY)
    assert keys[:50] == entry._ROUND14_FRONT
