"""Driver-contract ordering regression (round-3 ADVICE item).

`__spark_entry__._PRIMARY` front-loads the driver's first-50 sample window;
these tests pin it against the registry so future query additions can't
silently displace the intended sampled set or reference a renamed id.

Round-11 contract (VERDICT r10 item 1): the window front-loads the final
14 never-driver-sampled oracled ids (q322-q335) so cumulative external
coverage reaches 371/371, and spends the remaining 36 slots refreshing the
stalest evidence — ids whose only green driver rows date from r02/r03.
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry
from inspectadb_spark.queries import REGISTRY

ROOT = Path(__file__).resolve().parent.parent

# Pre-round-11 baseline: only CORRECTNESS files from rounds < 11 count when
# deciding "never driver-sampled" / "stale", so this round's own
# CORRECTNESS_r11 landing mid-round can't flip these pins.
_BASELINE_CUTOFF = "CORRECTNESS_r11"

# Registry size pin: 388/371 at the end of round 10, +3 in round 11 (the
# VERDICT r10 item-3 promotions q336/q337/q338). Growth must consciously
# update this pin in the same commit that grows the registry.
_FROZEN_REGISTRY_SIZE = 403
_FROZEN_ORACLED_SIZE = 386


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


def _green_before_r11() -> set[str]:
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


def test_round11_front_window_is_the_intended_sample():
    assert len(entry._ROUND11_FRONT) == 50
    front = entry._PRIMARY[:50]
    assert front == entry._ROUND11_FRONT, (
        "the first 50 queries() keys ARE the driver's sample — additions "
        "must go behind the curated window, not displace it"
    )
    # every sampled id must be oracled (a rows-only id would waste a slot)
    from inspectadb_spark import queries as corpus

    osql = corpus.oracle_sql()
    missing = [n for n in front if n not in osql]
    assert not missing, f"front-50 ids without oracle SQL: {missing}"


def test_round11_front_clears_the_backlog():
    """The final 14 never-driver-sampled oracled ids are all in the window,
    so cumulative driver coverage reaches 371/371 (371 = pre-r11 oracled
    count; this round's own additions are sampled in later rotations)."""
    from inspectadb_spark import queries as corpus

    osql = set(corpus.oracle_sql())
    never = {
        n
        for n in REGISTRY
        if n in osql
        and n not in _green_before_r11()
        and n not in _ROUND11_ADDITIONS
    }
    assert never == set(entry._NEVER_REST), (
        f"never-sampled set drifted: missing={never - set(entry._NEVER_REST)} "
        f"extra={set(entry._NEVER_REST) - never}"
    )
    front = set(entry._ROUND11_FRONT)
    assert never <= front, f"backlog ids left out of the window: {never - front}"


# Queries added during round 11 itself (the VERDICT r10 item-3 promotions,
# the two SURVEY round-12 candidates landed early — the batched IVF k-NN
# join and persisted-index serving rows — and the quarantine-ingest
# accounting row); they are new, so they have no pre-r11 driver row by
# construction and are excluded from the backlog arithmetic. Next round's
# rotation front-loads them.
_ROUND11_ADDITIONS = {
    "q336_bucketed_join",
    "q337_binaryfile_ingest",
    "q338_pyds_roundtrip",
    "q339_ivf_knn_join",
    "q340_ivf_index_topk",
    "q341_quarantine_ingest",
    "q342_rbf_mmd_drift",
    "q343_k_anonymity",
    "q344_k_anonymize_sweep",
    "q345_t_closeness",
    "q346_dsir_selection",
    "q347_dp_noisy_release",
    "q348_dp_sum_release",
    "q349_dp_thresholded_histogram",
    "q350_filtered_vector_search",
}


def test_round11_refresh_slots_are_the_stalest_evidence():
    """The 36 non-backlog slots must refresh ids whose latest green row is
    r02/r03 — the oldest evidence in the corpus — not re-verify fresh ids."""
    green = _green_rounds()
    refresh = [n for n in entry._ROUND11_FRONT if n not in entry._NEVER_REST]
    assert len(refresh) == 36
    fresh = [
        n
        for n in refresh
        if green.get(n)
        and max(green[n]) > "CORRECTNESS_r03.json"
    ]
    assert not fresh, f"refresh slots wasted on recently-verified ids: {fresh}"
    unsampled = [n for n in refresh if n not in green]
    assert not unsampled, (
        f"refresh ids with no prior green row (belong in backlog?): {unsampled}"
    )


def test_round9_front_is_all_driver_green():
    """Regression guard: the previous curated window really did go green,
    so the rotation isn't abandoning red rows."""
    r09 = ROOT / "CORRECTNESS_r09.json"
    rows = json.loads(r09.read_text())
    bad = [
        n
        for n in entry._ROUND9_FRONT
        if rows.get(n, {}).get("hash_match") is not True
    ]
    assert not bad, f"round-9 window ids not hash-green in r09: {bad}"


def test_ordered_emits_every_registry_query():
    keys = list(entry.queries().keys())
    assert set(keys) == set(REGISTRY)
    assert keys[:50] == entry._ROUND11_FRONT
