"""Driver-contract ordering regression (round-3 ADVICE item).

`__spark_entry__._PRIMARY` front-loads the driver's first-50 sample window;
these tests pin it against the registry so future query additions can't
silently displace the intended sampled set or reference a renamed id.

Round-9 contract (VERDICT r8 items 1-2): the window is exactly the first
50 ids of the round-8 `_NEVER_REST` layout, the new `_NEVER_REST` is
exactly the 14-id unsampled remainder (q322-q335), and the corpus stays
FROZEN — the registry must not grow this round so the backlog clears in
round 10.
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry
from inspectadb_spark.queries import REGISTRY

ROOT = Path(__file__).resolve().parent.parent

# Pre-round-9 baseline: only CORRECTNESS files from rounds < 9 count when
# deciding "never driver-sampled", so this round's own CORRECTNESS_r09
# landing mid-round can't flip these pins.
_BASELINE_CUTOFF = "CORRECTNESS_r09"

# Corpus freeze (VERDICT r8 item 2): the registry held 388 queries / 371
# oracled at the end of round 8. Round 9 adds nothing, so any growth here
# is a freeze violation that must be consciously justified by editing this
# pin in the same commit.
_FROZEN_REGISTRY_SIZE = 388
_FROZEN_ORACLED_SIZE = 371


def _green_before_r09() -> set[str]:
    """Ids with a hash-green row in any pre-r09 CORRECTNESS file."""
    green: set[str] = set()
    for p in ROOT.glob("CORRECTNESS_r*.json"):
        if p.name >= _BASELINE_CUTOFF:
            continue
        try:
            for name, row in json.loads(p.read_text()).items():
                if row.get("hash_match") is True:
                    green.add(name)
        except Exception:
            pass
    return green


def test_primary_names_all_exist_in_registry():
    missing = [n for n in entry._PRIMARY if n not in REGISTRY]
    assert not missing, f"_PRIMARY references unknown queries: {missing}"
    assert len(entry._PRIMARY) == len(set(entry._PRIMARY)), "duplicate ids"


def test_corpus_is_frozen_this_round():
    from inspectadb_spark import queries as corpus

    assert len(REGISTRY) == _FROZEN_REGISTRY_SIZE, (
        f"registry grew to {len(REGISTRY)} during the round-9 corpus "
        "freeze (VERDICT r8 item 2); justify and update the pin in the "
        "same commit if an addition is genuinely needed"
    )
    assert len(corpus.oracle_sql()) == _FROZEN_ORACLED_SIZE


def test_round9_front_window_is_the_intended_sample():
    assert len(entry._ROUND9_FRONT) == 50
    front = entry._PRIMARY[:50]
    assert front == entry._ROUND9_FRONT, (
        "the first 50 queries() keys ARE the driver's sample — additions "
        "must go behind the curated window, not displace it"
    )
    # every sampled id must be oracled (a rows-only id would waste a slot)
    from inspectadb_spark import queries as corpus

    osql = corpus.oracle_sql()
    missing = [n for n in front if n not in osql]
    assert not missing, f"front-50 ids without oracle SQL: {missing}"


def test_round9_front_is_never_driver_green_before():
    """The rotation's whole point: the window spends its 50 slots on ids
    with no hash-green driver row in rounds 2-8."""
    stale = [n for n in entry._ROUND9_FRONT if n in _green_before_r09()]
    assert not stale, f"front-50 wastes slots on already-verified ids: {stale}"


def test_never_rest_is_exactly_the_unsampled_remainder():
    """_ROUND9_FRONT + _NEVER_REST must partition the never-driver-sampled
    oracled ids: nothing forgotten, nothing duplicated, so the round-10
    rotation is a mechanical front-load of _NEVER_REST."""
    from inspectadb_spark import queries as corpus

    osql = set(corpus.oracle_sql())
    listed = entry._ROUND9_FRONT + entry._NEVER_REST
    assert len(listed) == len(set(listed))
    never_pre_r9 = {
        n for n in REGISTRY if n in osql and n not in _green_before_r09()
    }
    assert set(listed) == never_pre_r9, (
        f"missing: {never_pre_r9 - set(listed)}; "
        f"extra: {set(listed) - never_pre_r9}"
    )
    # the backlog must have shrunk to exactly 14 (64 pre-r9 minus the 50
    # the r09 window front-loads)
    assert len(entry._NEVER_REST) == 14


def test_round8_front_is_all_driver_green():
    """Regression guard: the previous window really did go green, so the
    rotation isn't abandoning red rows."""
    r08 = ROOT / "CORRECTNESS_r08.json"
    rows = json.loads(r08.read_text())
    bad = [
        n
        for n in entry._ROUND8_FRONT
        if rows.get(n, {}).get("hash_match") is not True
    ]
    assert not bad, f"round-8 window ids not hash-green in r08: {bad}"


def test_ordered_emits_every_registry_query():
    keys = list(entry.queries().keys())
    assert set(keys) == set(REGISTRY)
    assert keys[:50] == entry._ROUND9_FRONT
