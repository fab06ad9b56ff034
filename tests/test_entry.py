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


def _driver_seen() -> set[str]:
    seen: set[str] = set()
    for p in ROOT.glob("CORRECTNESS_r*.json"):
        try:
            seen |= set(json.loads(p.read_text()))
        except Exception:
            pass
    return seen


def test_primary_names_all_exist_in_registry():
    missing = [n for n in entry._PRIMARY if n not in REGISTRY]
    assert not missing, f"_PRIMARY references unknown queries: {missing}"
    assert len(entry._PRIMARY) == len(set(entry._PRIMARY)), "duplicate ids"


def test_round4_front_window_is_the_intended_sample():
    front = entry._PRIMARY[:50]
    assert front == entry._ROUND4_FRONT, (
        "the first 50 queries() keys ARE the driver's sample — additions "
        "must go behind the curated window, not displace it"
    )
    # every sampled id must be oracled (a rows-only id would waste a slot)
    from inspectadb_spark import queries as corpus

    osql = corpus.oracle_sql()
    missing = [n for n in front if n not in osql]
    assert not missing, f"front-50 ids without oracle SQL: {missing}"


def test_round4_front_is_never_driver_verified_before():
    """The rotation's whole point: the window spends its 50 slots on ids
    with no CORRECTNESS_r02/r03 row (r04+ files will legitimately overlap
    once the driver has run this round — only r02/r03 are the baseline)."""
    baseline: set[str] = set()
    for r in ("r02", "r03"):
        p = ROOT / f"CORRECTNESS_{r}.json"
        if p.exists():
            baseline |= set(json.loads(p.read_text()))
    stale = [n for n in entry._ROUND4_FRONT if n in baseline]
    assert not stale, f"front-50 wastes slots on already-verified ids: {stale}"


def test_ordered_emits_every_registry_query():
    keys = list(entry.queries().keys())
    assert set(keys) == set(REGISTRY)
    assert keys[:50] == entry._ROUND4_FRONT
