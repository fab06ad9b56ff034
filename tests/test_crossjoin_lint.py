"""Plan lint: no unbounded cross joins (VERDICT r6 item 5).

A BroadcastNestedLoopJoin or CartesianProduct over row-scale inputs is
the O(n^2) trap: fine at sf0.01, a guaranteed blow-up at 100 TB. Like
tests/test_window_lint.py pinned unpartitioned windows, this lint walks
every registry query's PHYSICAL plan (sparkPlan — planned, not
executed) and classifies every nested-loop/cartesian site by its BUILD
side (the side Spark materializes and broadcasts):

- ``one_row_agg``: a global aggregate (no grouping keys) — one row by
  construction; the classic scalar-broadcast pattern (total counts,
  corpus-wide stats, thresholds).
- ``generated``: Range / LocalTableScan / Scan ExistingRDD — grids and
  literal rule tables built on the driver (createDataFrame), bounded by
  the code that wrote them, never by data volume.
- ``limited``: GlobalLimit / TakeOrderedAndProject / CollectLimit — a
  k-row frame.

Those classes are auto-justified. EVERY other site must appear in
_JUSTIFIED below with a boundedness argument; a new query (or a plan
regression in an old one) that introduces a cross join over row-scale
inputs fails here until the bounded-input argument is made explicitly.

The classification reads plan SHAPE: a grouped aggregate's output
cardinality or a filter's selectivity can't be proven by a static lint,
which is exactly why those sites carry a written justification instead
of an auto-pass.
"""

from __future__ import annotations

import pytest

from inspectadb_spark.queries import REGISTRY
from tests.conftest import SF_DIR as SF_DIR_SMALL

# r14 driver fast lane (pytest.ini): whole-registry plan inventory —
# builder-run each round with -m ""
pytestmark = pytest.mark.slow

# nodes skipped when finding the substantive node of a build-side subtree
_TRANSPARENT = (
    "Project", "Filter", "ColumnarToRow", "InputAdapter", "Sort",
    "Coalesce", "Exchange", "BroadcastExchange", "Generate",
)

_AUTO_OK = ("one_row_agg", "generated", "limited")

# query id -> sorted list of (build, probe) class pairs for every site
# NOT auto-justified, each with its boundedness argument. Counts are part
# of the pin: a query growing a second unbounded cross join fails.
_JUSTIFIED = {
    # SURVEY §2.2c contract row: CROSS JOIN is the operator under test
    # (5-row region x 25-row nation).
    "q11_cross_join": [("scan", "scan")],
    # KMV sketches: both sides are bottom-k (k=64) minimum-hash tables —
    # sketch-sized by construction (operators/sketches.py kmv_sketch).
    "q189_kmv_overlap": [("grouped_agg", "grouped_agg")] * 2,
    # r13 retirements: q193/q202/q203/q207/q224/q267 — the broadcast
    # pair-generation cross joins in the pair-scoring audit family were
    # replaced by batch_cross_dots (operators/similarity.py): the bounded
    # batch side packs into the candidate scan's mapInPandas closure (the
    # same driver materialization the BroadcastExchange paid) and the only
    # remaining joins are tiny broadcast EQUI-joins re-attaching batch
    # scalars by id, so these queries no longer own any cross-join site.
    # r14 q216: the grand-total side of the lift join is the ROLLUP(item)
    # aggregate filtered to grouping(item)=1 — exactly ONE row by
    # construction (a rollup emits a single grand-total row), broadcast
    # against the 625-cell (25-brand²) pair table. It stopped being the
    # auto-passed one_row_agg class only because nb now shares the
    # ic branch's rollup (the r14 single-scan fusion) instead of being a
    # separate global aggregate.
    "q216_association_rules": [("grouped_agg", "other:BroadcastHashJoin")],
    # Mann-Kendall pair signs on the DAY-grain revenue series: a
    # calendar-bounded |days|^2 self-join (q244's old shape; q244 itself
    # now packs the day series into one row and runs the pair slopes in
    # numpy, so it no longer cross-joins at all).
    "q311_mann_kendall": [("grouped_agg", "grouped_agg")],
    # Kendall tau-b: the O(n^2) pair definition reduced to a
    # |range(qty)| x |range(discount)| contingency-CELL self-join —
    # value-bounded (50 x 11 cells), asserted in COVERAGE.md/SCALE.md.
    "q276_kendall_tau": [("grouped_agg", "grouped_agg")],
    # Exact all-pairs cosine audit baseline (the contract B8 family's
    # threshold form); production paths are the sign-blocked q43g and
    # LSH-banded dedup operators, calibrated against this. r13 blocked
    # GEMM shape: both sides are the n_blocks-row (n_blocks=16, fixed in
    # code) packed-block aggregate, so the g1<=g2 join emits at most
    # n_blocks*(n_blocks+1)/2 = 136 block-pair rows by construction —
    # bounded by the block constant, never by data volume.
    "q43c_cosine_neardup": [("grouped_agg", "grouped_agg")],
    # JSD pair UNIVERSE: both sides are per-source token TOTALS (grouped
    # on the source column — bounded by the group domain, not row count),
    # and the |groups|^2/2 pair output is inherent to a pairwise
    # divergence metric. The cross join exists so disjoint-vocab pairs
    # (JSD = ln 2, the maximally-divergent case) survive — an inner-only
    # join on shared tokens silently dropped them (a8139d2 review fix).
    "q283_js_divergence": [("grouped_agg", "grouped_agg")],
}


def _walk(node):
    yield node
    cs = node.children()
    for i in range(cs.length()):
        yield from _walk(cs.apply(i))


def _classify(node) -> str:
    cur = node
    while True:
        nm = cur.nodeName()
        if nm in _TRANSPARENT:
            cs = cur.children()
            if cs.length() == 0:
                return "other:" + nm
            cur = cs.apply(0)
            continue
        if nm in ("HashAggregate", "ObjectHashAggregate", "SortAggregate"):
            try:
                if cur.groupingExpressions().isEmpty():
                    return "one_row_agg"
            except Exception:
                pass
            return "grouped_agg"
        if nm in ("Range", "LocalTableScan", "Scan ExistingRDD"):
            return "generated"
        if nm in ("GlobalLimit", "TakeOrderedAndProject", "CollectLimit"):
            return "limited"
        if nm.startswith("Scan parquet"):
            return "scan"
        return "other:" + nm


def _sites(df) -> list[tuple[str, str]]:
    plan = df._jdf.queryExecution().sparkPlan()
    out = []
    for n in _walk(plan):
        nm = n.nodeName()
        if "NestedLoop" not in nm and "Cartesian" not in nm:
            continue
        cs = n.children()
        if "NestedLoop" in nm:
            bi = 0 if str(n.buildSide()) == "BuildLeft" else 1
            out.append((_classify(cs.apply(bi)), _classify(cs.apply(1 - bi))))
        else:
            # CartesianProduct has no build side; require BOTH bounded or
            # a justification (classify left as "build" conservatively)
            out.append((_classify(cs.apply(0)), _classify(cs.apply(1))))
    return sorted(out)


@pytest.fixture(scope="module")
def crossjoin_inventory(spark):
    inv = {}
    for name, entry in sorted(REGISTRY.items()):
        sites = _sites(entry.builder(spark, SF_DIR_SMALL))
        if sites:
            inv[name] = sites
    return inv


def test_every_unbounded_crossjoin_site_is_justified(crossjoin_inventory):
    offenders = {}
    for name, sites in crossjoin_inventory.items():
        bad = [s for s in sites if s[0] not in _AUTO_OK]
        if bad and sorted(_JUSTIFIED.get(name, [])) != sorted(bad):
            offenders[name] = bad
    assert not offenders, (
        "cross-join sites whose build side is not statically bounded and "
        f"which lack a matching _JUSTIFIED entry: {offenders} — bound the "
        "input (broadcast a one-row aggregate / grid / top-k) or add the "
        "site with a written boundedness argument"
    )


def test_justified_inventory_is_not_stale(crossjoin_inventory):
    """Every _JUSTIFIED entry must still describe a real site — a plan
    improvement that removes a cross join should also remove its row
    here, keeping the inventory honest."""
    stale = {}
    for name, expected in _JUSTIFIED.items():
        actual = [s for s in crossjoin_inventory.get(name, [])
                  if s[0] not in _AUTO_OK]
        if sorted(expected) != sorted(actual):
            stale[name] = {"justified": sorted(expected),
                           "actual": sorted(actual)}
    assert not stale, f"stale _JUSTIFIED entries: {stale}"
