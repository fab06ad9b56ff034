"""Driver-contract ordering regression (round-3 ADVICE item).

`__spark_entry__._PRIMARY` front-loads the driver's first-50 sample window;
these tests pin it against the registry so future query additions can't
silently displace the intended sampled set or reference a renamed id.

Round-12 contract (VERDICT r11 item 2): the window front-loads the 15
never-driver-sampled round-11 additions (q336-q350) so cumulative external
coverage reaches 386/386, and spends the remaining 35 slots refreshing the
stalest evidence — ids whose latest green driver rows date from r02-r04.
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry
from inspectadb_spark.queries import REGISTRY

ROOT = Path(__file__).resolve().parent.parent

# Pre-round-12 baseline: only CORRECTNESS files from rounds < 12 count when
# deciding "never driver-sampled" / "stale", so this round's own
# CORRECTNESS_r12 landing mid-round can't flip these pins.
_BASELINE_CUTOFF = "CORRECTNESS_r12"

# Registry size pin: 403/386 at the end of round 11; +13 in round 12
# (q351-q363, all oracled). Growth must consciously update this pin in the
# same commit that grows the registry.
_FROZEN_REGISTRY_SIZE = 416
_FROZEN_ORACLED_SIZE = 399


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


def _green_before_cutoff() -> set[str]:
    return set(_green_rounds())


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


def test_round12_front_window_is_the_intended_sample():
    assert len(entry._ROUND12_FRONT) == 50
    front = entry._PRIMARY[:50]
    assert front == entry._ROUND12_FRONT, (
        "the first 50 queries() keys ARE the driver's sample — additions "
        "must go behind the curated window, not displace it"
    )
    # every sampled id must be oracled (a rows-only id would waste a slot)
    from inspectadb_spark import queries as corpus

    osql = corpus.oracle_sql()
    missing = [n for n in front if n not in osql]
    assert not missing, f"front-50 ids without oracle SQL: {missing}"


def test_round12_front_clears_the_backlog():
    """The 15 never-driver-sampled round-11 additions are all in the
    window, so cumulative driver coverage reaches 386/386 (386 = pre-r12
    oracled count; this round's own additions are sampled in later
    rotations)."""
    from inspectadb_spark import queries as corpus

    osql = set(corpus.oracle_sql())
    never = {
        n
        for n in REGISTRY
        if n in osql
        and n not in _green_before_cutoff()
        and n not in _ROUND12_ADDITIONS
    }
    assert never == set(entry._NEVER_REST), (
        f"never-sampled set drifted: missing={never - set(entry._NEVER_REST)} "
        f"extra={set(entry._NEVER_REST) - never}"
    )
    front = set(entry._ROUND12_FRONT)
    assert never <= front, f"backlog ids left out of the window: {never - front}"


# Queries added during round 12 itself; they are new, so they have no
# pre-r12 driver row by construction and are excluded from the backlog
# arithmetic. Next round's rotation front-loads them.
_ROUND12_ADDITIONS: set[str] = {
    "q351_pq_adc_topk",
    "q352_pq_filtered_topk",
    "q353_sprt",
    "q354_randomized_response",
    "q355_msttr",
    "q356_lsh_bucket_skew",
    "q357_dp_quantile",
    "q358_conformal_interval",
    "q359_xmr_control_chart",
    "q360_neyman_allocation",
    "q361_nzv_screen",
    "q362_hill_tail_index",
    "q363_diff_in_differences",
}


def test_round12_refresh_slots_are_the_stalest_evidence():
    """The 35 non-backlog slots must refresh ids whose latest green row is
    r02-r04 — the oldest evidence in the corpus — not re-verify fresh ids."""
    green = _green_rounds()
    refresh = [n for n in entry._ROUND12_FRONT if n not in entry._NEVER_REST]
    assert len(refresh) == 35
    fresh = [
        n
        for n in refresh
        if green.get(n)
        and max(green[n]) > "CORRECTNESS_r04.json"
    ]
    assert not fresh, f"refresh slots wasted on recently-verified ids: {fresh}"
    unsampled = [n for n in refresh if n not in green]
    assert not unsampled, (
        f"refresh ids with no prior green row (belong in backlog?): {unsampled}"
    )


def test_round11_front_is_all_driver_green():
    """Regression guard: the previous curated window really did go green,
    so the rotation isn't abandoning red rows."""
    r11 = ROOT / "CORRECTNESS_r11.json"
    rows = json.loads(r11.read_text())
    bad = [
        n
        for n in entry._ROUND11_FRONT
        if rows.get(n, {}).get("hash_match") is not True
    ]
    assert not bad, f"round-11 window ids not hash-green in r11: {bad}"


def test_ordered_emits_every_registry_query():
    keys = list(entry.queries().keys())
    assert set(keys) == set(REGISTRY)
    assert keys[:50] == entry._ROUND12_FRONT
