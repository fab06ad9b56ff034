"""Driver-contract ordering regression (round-3 ADVICE item).

`__spark_entry__._PRIMARY` front-loads the driver's first-50 sample window;
these tests pin it against the registry so future query additions can't
silently displace the intended sampled set or reference a renamed id.

Round-13 contract (VERDICT r12 item 1): the window front-loads the 13
never-driver-sampled round-12 additions (q351-q363) so cumulative external
coverage reaches 399/399, and spends the remaining 37 slots refreshing the
stalest evidence — all 36 ids whose latest green driver row is r04, plus
one r05-stale id.
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry
from inspectadb_spark.queries import REGISTRY

ROOT = Path(__file__).resolve().parent.parent

# Pre-round-13 baseline: only CORRECTNESS files from rounds < 13 count when
# deciding "never driver-sampled" / "stale", so this round's own
# CORRECTNESS_r13 landing mid-round can't flip these pins.
_BASELINE_CUTOFF = "CORRECTNESS_r13"

# Registry size pin: 416/399 at the end of round 12. Growth must
# consciously update this pin in the same commit that grows the registry.
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


def test_round13_front_window_is_the_intended_sample():
    assert len(entry._ROUND13_FRONT) == 50
    front = entry._PRIMARY[:50]
    assert front == entry._ROUND13_FRONT, (
        "the first 50 queries() keys ARE the driver's sample — additions "
        "must go behind the curated window, not displace it"
    )
    # every sampled id must be oracled (a rows-only id would waste a slot)
    from inspectadb_spark import queries as corpus

    osql = corpus.oracle_sql()
    missing = [n for n in front if n not in osql]
    assert not missing, f"front-50 ids without oracle SQL: {missing}"


def test_round13_front_clears_the_backlog():
    """The 13 never-driver-sampled round-12 additions are all in the
    window, so cumulative driver coverage reaches 399/399 (399 = pre-r13
    oracled count; any round-13 additions are sampled in later
    rotations)."""
    from inspectadb_spark import queries as corpus

    osql = set(corpus.oracle_sql())
    never = {
        n
        for n in REGISTRY
        if n in osql
        and n not in _green_before_cutoff()
        and n not in _ROUND13_ADDITIONS
    }
    assert never == set(entry._NEVER_REST), (
        f"never-sampled set drifted: missing={never - set(entry._NEVER_REST)} "
        f"extra={set(entry._NEVER_REST) - never}"
    )
    front = set(entry._ROUND13_FRONT)
    assert never <= front, f"backlog ids left out of the window: {never - front}"


# Queries added during round 13 itself; they are new, so they have no
# pre-r13 driver row by construction and are excluded from the backlog
# arithmetic. Next round's rotation front-loads them.
_ROUND13_ADDITIONS: set[str] = set()


def test_round13_refresh_slots_are_the_stalest_evidence():
    """The 37 non-backlog slots must refresh ids whose latest green row is
    r04-r05 — the oldest evidence in the corpus — not re-verify fresh ids.
    All 36 r04-stale ids are in; one r05-stale id fills slot 50."""
    green = _green_rounds()
    refresh = [n for n in entry._ROUND13_FRONT if n not in entry._NEVER_REST]
    assert len(refresh) == 37
    fresh = [
        n
        for n in refresh
        if green.get(n)
        and max(green[n]) > "CORRECTNESS_r05.json"
    ]
    assert not fresh, f"refresh slots wasted on recently-verified ids: {fresh}"
    unsampled = [n for n in refresh if n not in green]
    assert not unsampled, (
        f"refresh ids with no prior green row (belong in backlog?): {unsampled}"
    )
    # every r04-stale id must be refreshed (none may be skipped for a
    # fresher one)
    r04_stale = {
        n for n, rounds in green.items()
        if max(rounds) == "CORRECTNESS_r04.json"
    }
    missing = r04_stale - set(refresh)
    assert not missing, f"r04-stale ids left out of the window: {missing}"


def test_round12_front_is_all_driver_green():
    """Regression guard: the previous curated window really did go green,
    so the rotation isn't abandoning red rows."""
    r12 = ROOT / "CORRECTNESS_r12.json"
    rows = json.loads(r12.read_text())
    bad = [
        n
        for n in entry._ROUND12_FRONT
        if rows.get(n, {}).get("hash_match") is not True
    ]
    assert not bad, f"round-12 window ids not hash-green in r12: {bad}"


def test_ordered_emits_every_registry_query():
    keys = list(entry.queries().keys())
    assert set(keys) == set(REGISTRY)
    assert keys[:50] == entry._ROUND13_FRONT
