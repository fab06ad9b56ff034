"""Driver-contract ordering regression (round-3 ADVICE item).

`__spark_entry__._PRIMARY` front-loads the driver's first-50 sample window;
these tests pin it against the registry so future query additions can't
silently displace the intended sampled set or reference a renamed id.
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry
from inspectadb_spark.queries import REGISTRY

ROOT = Path(__file__).resolve().parent.parent


def _driver_green() -> set[str]:
    """Ids with a hash-green row in any prior CORRECTNESS_r*.json."""
    green: set[str] = set()
    for p in ROOT.glob("CORRECTNESS_r*.json"):
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


def test_round7_front_window_is_the_intended_sample():
    assert len(entry._ROUND7_FRONT) == 50
    front = entry._PRIMARY[:50]
    assert front == entry._ROUND7_FRONT, (
        "the first 50 queries() keys ARE the driver's sample — additions "
        "must go behind the curated window, not displace it"
    )
    # every sampled id must be oracled (a rows-only id would waste a slot)
    from inspectadb_spark import queries as corpus

    osql = corpus.oracle_sql()
    missing = [n for n in front if n not in osql]
    assert not missing, f"front-50 ids without oracle SQL: {missing}"


def test_round7_front_is_never_driver_green_before():
    """The rotation's whole point: the window spends its 50 slots on ids
    with no hash-green driver row yet. A CORRECTNESS_r07 file will
    legitimately overlap once the driver has run this round, so only
    pre-r07 files count as baseline."""
    baseline: set[str] = set()
    for p in ROOT.glob("CORRECTNESS_r*.json"):
        if p.name >= "CORRECTNESS_r07":
            continue
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match") is True:
                baseline.add(name)
    stale = [n for n in entry._ROUND7_FRONT if n in baseline]
    assert not stale, f"front-50 wastes slots on already-verified ids: {stale}"


def test_never_rest_is_exactly_the_unsampled_remainder():
    """_ROUND7_FRONT + _NEVER_REST must partition the never-driver-sampled
    oracled ids: nothing forgotten, nothing duplicated, so the round-8
    rotation is a mechanical front-load of _NEVER_REST."""
    from inspectadb_spark import queries as corpus

    osql = set(corpus.oracle_sql())
    never = [n for n in REGISTRY if n in osql and n not in _driver_green()]
    listed = entry._ROUND7_FRONT + entry._NEVER_REST
    assert len(listed) == len(set(listed))
    # compare before this round's CORRECTNESS_r07 lands; afterwards the
    # front-50 become green, so only require listed ⊇ never and that
    # every listed id is oracled and was never green before r07
    baseline: set[str] = set()
    for p in ROOT.glob("CORRECTNESS_r*.json"):
        if p.name >= "CORRECTNESS_r07":
            continue
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match") is True:
                baseline.add(name)
    never_pre_r7 = {n for n in REGISTRY if n in osql and n not in baseline}
    assert set(listed) == never_pre_r7, (
        f"missing: {never_pre_r7 - set(listed)}; "
        f"extra: {set(listed) - never_pre_r7}"
    )


def test_ordered_emits_every_registry_query():
    keys = list(entry.queries().keys())
    assert set(keys) == set(REGISTRY)
    assert keys[:50] == entry._ROUND7_FRONT
