"""Plan lint: no unpartitioned row-scale windows (VERDICT r05 item 4).

``Window.orderBy`` with no partition spec drags its ENTIRE input through
one task — correct at sf0.01 and a guaranteed straggler at 100 TB (the
q156-RFM / q136-vocab-growth trap, both since rewired onto the
bucket-offset scheme of ``operators/scale.py``). This lint walks every
registry query's optimized logical plan and pins the class shut the way
test_registry_lint pinned the render class:

- an unpartitioned Window sitting directly on a scan (chain bottoms out
  at LogicalRelation) is FORBIDDEN unless the query is in _SCAN_SCALE_OK
  — the contractual global-window queries (SURVEY §2.2e) whose semantics
  ARE a single global frame;
- every other unpartitioned Window must appear in the _EXPECTED
  inventory: query id -> the exact multiset of child chains, each entry
  carrying its boundedness justification. A new query (or a regression
  in an old one) that introduces an unpartitioned window changes the
  inventory and fails here until the bounded-input argument is made
  explicitly.

The inventory records plan SHAPE, not cardinality — a static lint cannot
prove an Aggregate's output is bounded. The targeted assertions at the
bottom close that gap for the bucket-offset rewrites: their offset/carry
windows must aggregate on the synthetic ``_bkt`` key (one row per
bucket), not on a row-scale natural key.
"""

from __future__ import annotations

import pytest

from inspectadb_spark.queries import REGISTRY
from tests.conftest import SF_DIR as SF_DIR_SMALL

# r14 driver fast lane (pytest.ini): whole-registry plan inventory —
# builder-run each round with -m ""
pytestmark = pytest.mark.slow

# pass-through nodes skipped when summarizing what feeds a window
_TRANSPARENT = ("Project", "Filter", "SubqueryAlias", "Sort")

# Contractual global-frame queries (SURVEY §2.2e): the RANGE-frame window
# over events IS the operator under test; its single-frame semantics are
# the contract, with the distributed alternatives (global_rank /
# global_running_max / global_ntile) documented as the scale path.
_SCAN_SCALE_OK = {"q30_range_frame"}

# query id -> sorted child-chain list for each unpartitioned Window.
# Every entry asserts WHY its window input is bounded.
_EXPECTED = {
    # bucket-offset schemes: the window rides the per-bucket count/sum
    # table (one row per bucket_width of ids/values)
    "q119_equidepth_histogram": [("Aggregate",)],   # global_ntile offsets
    "q136_vocab_growth": [("Aggregate",)],          # bucket carry-in sums
    "q156_rfm": [("Aggregate",)] * 3,               # 3x global_ntile
    "q263_equi_depth_histogram": [("Aggregate",)],  # bucket-offset ranks
    "q273_spearman": [("Aggregate",)] * 2,          # 2x avg_rank2 offsets
    "q274_mann_whitney": [("Aggregate",)],          # avg_rank2 offsets
    "q275_kruskal_wallis": [("Aggregate",)],        # avg_rank2 offsets
    "q288_wilcoxon_signed_rank": [("Aggregate",)],  # avg_rank2 offsets
    "q257_revenue_drawdown": [("Aggregate",)],      # bucket max carry scan
    # chosen-width selection over the generalization LADDER table — one
    # row per multiplier (4 by construction); single-corpus-scan shape
    # pinned in tests/test_privacy.py
    "q344_k_anonymize_sweep": [("Aggregate",)],
    # day/bin/decile-cardinality intermediates (bounded by the calendar
    # or an explicit bin count, not by row count)
    "q74_cumulative_users": [("Aggregate",)],       # one row per day
    "q79_token_budget_selection": [("Aggregate",)],  # 4dp score histogram
    "q127_session_concurrency": [("Aggregate",)],   # distinct durations
    "q172_period_over_period": [("Join",)],         # month grain
    "q176_autocorrelation": [("Join",)] * 2,        # daily series
    # day grain trend MA; the dt subtree is duplicated under the se join
    "q272_seasonal_decompose": [("Aggregate",)] * 2,
    # Ljung-Box cumulative Q over the 7-row lag table (num x den join)
    "q297_ljung_box": [("Join",)],
    # day-index ROW_NUMBER on the day-grain aggregate (subtree duplicated
    # under the sufficient-stats join) + the residual lag over day grain
    "q298_durbin_watson": [("Aggregate",), ("Aggregate",), ("Join",)],
    # sign-series lag over the day-grain median join
    "q299_runs_test": [("Join",)],
    # ordinal-pattern leads over the day-grain aggregate (subtree
    # appears twice: lead(1) and lead(2) share the window input)
    "q310_permutation_entropy": [("Aggregate",), ("Aggregate",)],
    # two leaderboard ROW_NUMBERs over the |event-type|-row count table
    "q314_rbo": [("Aggregate",), ("Window", "Aggregate")],
    # split-candidate cumulative over the 24-row hour aggregate
    "q323_decision_stump": [("Aggregate",)],
    "q185_auc": [("Aggregate",)],                   # score-bin table
    "q280_avg_precision": [("Aggregate",)],         # q185's carry scan
    "q214_lorenz_deciles": [("Aggregate",)] * 2,    # decile cut table
    "q233_pareto_point": [("Aggregate",), ("Window", "Join")],  # day grain
    "q235_abc_classification": [("Aggregate",), ("Window", "Join")],  # parts
    # carry over the (day, 1000-user bucket) table — the (day,user) group
    # table is row-population-scale and is NOT windowed unpartitioned;
    # only its DIV-1000 bucket rollup is (ADVICE r8 medium item)
    "q246_disorder_profile": [("Aggregate",)],
    "q184_quantile_sketch": [("Aggregate",)] * 2,   # sketch-sized grid
    "q190_kaplan_meier": [                          # distinct durations
        ("Aggregate",), ("Window", "Aggregate"),
        ("Window", "Window", "Aggregate")],
    # top-k-bounded frames (GlobalLimit above, or a k-row join input)
    "q122_hybrid_rrf": [("GlobalLimit",)] * 2,      # two k-row rank lists
    "q145_skew_profile": [("Join",)],               # top_k hot keys
    "q158_skyline": [("Aggregate",)],               # distinct-pair frontier
}


def _walk(node):
    yield node
    cs = node.children()
    for i in range(cs.length()):
        yield from _walk(cs.apply(i))


def _chain_below(node) -> tuple:
    out, cur = [], node
    while True:
        cs = cur.children()
        if cs.length() == 0:
            out.append(cur.nodeName())
            break
        cur = cs.apply(0)
        nm = cur.nodeName()
        if nm in _TRANSPARENT:
            continue
        out.append(nm)
        if nm != "Window":
            break
    return tuple(out)


def _unpartitioned_chains(df) -> list[tuple]:
    plan = df._jdf.queryExecution().optimizedPlan()
    return sorted(
        _chain_below(n) for n in _walk(plan)
        if n.nodeName() == "Window" and n.partitionSpec().isEmpty()
    )


@pytest.fixture(scope="module")
def window_inventory(spark):
    inv = {}
    for name, entry in sorted(REGISTRY.items()):
        chains = _unpartitioned_chains(entry.builder(spark, SF_DIR_SMALL))
        if chains:
            inv[name] = chains
    return inv


def test_no_unpartitioned_window_on_scan(window_inventory):
    """The rawest form of the trap — a global window directly over a
    scan — is forbidden outside the contractual q30 family."""
    offenders = {
        n: c for n, c in window_inventory.items()
        if n not in _SCAN_SCALE_OK
        and any(chain[-1] in ("LogicalRelation", "Relation") for chain in c)
    }
    assert not offenders, (
        f"unpartitioned window directly over a scan: {offenders} — use the "
        "bucket-offset scheme (operators/scale.py global_rank/global_ntile/"
        "global_running_max) or partition the window")


def test_unpartitioned_window_inventory(window_inventory):
    """Exact inventory pin: adding/removing an unpartitioned window
    anywhere in the registry must update _EXPECTED with a boundedness
    justification."""
    got = {n: c for n, c in window_inventory.items()
           if n not in _SCAN_SCALE_OK}
    want = {n: sorted(c) for n, c in _EXPECTED.items()}
    assert got == want, (
        "unpartitioned-window inventory drifted.\n"
        f"unexpected: { {n: c for n, c in got.items() if n not in want or want[n] != c} }\n"
        f"missing:    { {n: c for n, c in want.items() if n not in got} }"
    )


@pytest.mark.parametrize("name", ["q119_equidepth_histogram",
                                  "q136_vocab_growth", "q156_rfm",
                                  "q273_spearman", "q274_mann_whitney",
                                  "q275_kruskal_wallis"])
def test_bucket_offset_windows_ride_bucket_table(spark, name):
    """The bucket-offset rewrites' unpartitioned windows must sit on an
    Aggregate grouped by the synthetic _bkt key (one row per bucket) —
    the check a shape-only inventory can't make. The pre-rewrite forms
    (ntile over groupBy(user_id); running sum over per-doc rows) FAIL
    here: their aggregates group on row-scale natural keys."""
    df = REGISTRY[name].builder(spark, SF_DIR_SMALL)
    plan = df._jdf.queryExecution().optimizedPlan()
    checked = 0
    for n in _walk(plan):
        if not (n.nodeName() == "Window" and n.partitionSpec().isEmpty()):
            continue
        cur = n
        while cur.children().length() > 0:
            cur = cur.children().apply(0)
            if cur.nodeName() not in _TRANSPARENT:
                break
        assert cur.nodeName() == "Aggregate", f"{name}: window over {cur.nodeName()}"
        grouping = cur.groupingExpressions().mkString(",")
        assert "_bkt" in grouping, (
            f"{name}: unpartitioned window aggregates on {grouping!r}, "
            "not the bounded _bkt bucket key")
        checked += 1
    assert checked >= 1
