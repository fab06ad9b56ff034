"""Docs/registry hygiene: README counts are derived facts, not prose.

Round-3 ADVICE: two commits that round were manual count fixups; pin the
numbers to the registry so any drift fails CI instead of shipping stale
documentation.
"""

from __future__ import annotations

import re
from pathlib import Path

from inspectadb_spark.queries import REGISTRY

ROOT = Path(__file__).resolve().parent.parent


def test_readme_counts_match_registry():
    readme = (ROOT / "README.md").read_text()
    m = re.search(r"(\d+) queries, (\d+) with DuckDB oracle SQL", readme)
    assert m, "README must state 'N queries, M with DuckDB oracle SQL'"
    n_queries, n_oracled = int(m.group(1)), int(m.group(2))
    oracled = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    assert n_queries == len(REGISTRY), (
        f"README says {n_queries} queries; registry has {len(REGISTRY)}"
    )
    assert n_oracled == oracled, (
        f"README says {n_oracled} oracled; registry has {oracled}"
    )


def test_registry_names_are_unique_and_well_formed():
    assert len(REGISTRY) == len(set(REGISTRY))
    pat = re.compile(r"^(q\d+[a-z]?(_[a-z0-9_]+)?|tpch_q\d{2})$")
    bad = [n for n in REGISTRY if not pat.match(n)]
    assert not bad, f"non-conforming query names: {bad}"
