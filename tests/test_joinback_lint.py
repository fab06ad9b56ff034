"""Plan lint: groupBy-branch + join-back on a shared frame (VERDICT r13
item 6 — mechanize the r13/r14 central fix so it can't silently come back).

The shape ``df.join(df.groupBy(k).agg(...), k)`` re-executes the shared
subtree once per branch: the join-implied ``isnotnull(k)`` and per-branch
column prunes push into each branch's scan, the subtrees stop being
byte-identical, and exchange/stage reuse is lost — one base-table pass per
consumer (the r13 audit found thirteen queries paying this; r14 fixed
q280/q204 the same way). The mechanized alternative is
``inspectadb_spark.operators.scale.with_group_stats`` (a partitionBy
window over the one shuffled stream).

Detector: walk every registry query's OPTIMIZED logical plan; flag each
equi-join where one side contains a grouped Aggregate whose CHILD subtree
``sameResult``-matches a subtree of the OTHER side (i.e., the aggregate
re-derives a frame the other side already computes). Self-joins of the
same aggregate (pair joins — AQE stage-reuses them) are excluded.

Two pins:

1. The queries REWRITTEN in r13/r14 to windows must stay at zero sites.
2. The inherited inventory is FROZEN: a query may not grow new sites, and
   no new query may introduce one, without a conscious entry here. The
   inherited sites are not all defects — many join back a frame the
   optimizer stage-reuses (identical exchanges), join a differently-
   filtered branch (not removable), or need the join's key-drop/invent
   semantics (q302's KN OOV probes: LEFT joins where absent-key NULLs are
   the signal — adjudicated r14, window rewrite not applicable). Each is
   a candidate for a `with_group_stats` retrofit with a written
   null-semantics argument, not an automatic one.
"""

from __future__ import annotations

import re

import pytest

from inspectadb_spark.queries import REGISTRY
from tests.conftest import SF_DIR

# r14 driver fast lane (pytest.ini): whole-registry plan inventory —
# builder-run each round with -m ""
pytestmark = pytest.mark.slow

# Queries rewritten to the window shape in r13/r14 — must stay clean.
_FIXED_MUST_BE_CLEAN = [
    "q280_avg_precision", "q204_minhash_calibration", "tpch_q20",
    "tpch_q21", "q240_inclusion_audit", "q245_join_cardinality_audit",
    "q281_cramers_v", "q166_chi_square", "q306_mutual_information",
    "q173_psi_drift", "q182_repair_changelog", "q273_spearman",
    "q296_multiclass_prf", "q130_curation_pipeline",
    "q237_keep_best_dedup",
]

# Frozen inherited inventory (r14 sweep): query -> normalized grouping-key
# site signatures. Growth requires a conscious edit of this dict in the
# same commit, with the boundedness / semantics argument for the new site.
_KNOWN_SITES = {
    "q120_bm25_topk": ["doc_id,term,dl"],
    "q122_hybrid_rrf": ["doc_id,term,dl"],
    "q133_ngram_novelty": ["doc_id,gram", "gram"],
    "q134_source_divergence": ["source,tok"],
    "q136_vocab_growth": ["first_doc"],
    "q138_winsorized_stats": ["source"],
    "q138b_mad": ["event_type"],
    "q144_pagerank": ["from_type,to_type"],
    "q156_rfm": ["_bkt", "user_id,maxd"],
    "q161_benford": ["event_type,digit"],
    "q167_hhi": ["nk"],
    "q185_auc": ["event_type,value"],
    "q186_ks_drift": ["event_type,value"],
    "q214_lorenz_deciles": ["o_custkey"],
    # r14 q216 rewrite: the ic/nb rollup branch and the pair branch both
    # consume the (basket, item) distinct over the SAME full projection —
    # byte-identical exchanges, built once under AQE stage reuse (runtime
    # audit: ONE lineitem-input stage per run). The detector sees the
    # aggregate-on-one-side shape but not the stage reuse.
    "q216_association_rules": ["basket,item"],
    "q228_seasonal_outliers": [
        "_groupingexpression,_groupingexpression", "dow"],
    "q232_topk_movers": ["_groupingexpression,p_brand"],
    "q233_pareto_point": ["o_custkey"],
    "q235_abc_classification": ["l_partkey"],
    "q250_dedup_threshold_sweep": ["blk,_groupingexpression"],
    "q266_winnowing_profile": ["doc_id,grp,fp"],
    "q267b_mutual_nn_ann": ["ida"],
    "q278_brown_forsythe": ["grp"],
    "q283_js_divergence": ["g,tok"],
    "q284_shingle_containment": ["doc_id,g"],
    "q287_levene_mean": ["grp"],
    "q299_runs_test": ["_groupingexpression"],
    "q302_kn_bigram_xent": ["w1,w2"],
    "q307_entropy_rate": ["source,w1"],
    "q308_hellinger": ["g,tok"],
    "q309_vocab_jaccard": ["g,tok"],
    "q315_markov_entropy": ["a"],
    "q317_seasonal_mann_kendall": [
        "_groupingexpression,_groupingexpression"],
    "q327_diversity_index": ["lang"],
    "q333_cold_start_rate": ["user_id"],
    "q345_t_closeness": ["nation,bal_band,c_mktsegment"],
    "q361_nzv_screen": ["metric,v"],
    "q44c_jaccard_pairs": ["blk,_groupingexpression"],
    "q44d_minhash_neardup": ["doc_id", "doc_id,shingle"],
    "q63_tfidf_topk": ["doc_id,term"],
    "q78_retention_cohorts": ["user_id"],
    "q97_chunk_dedup": ["h"],
    "tpch_q11": ["ps_partkey"],
}


def _walk(n):
    yield n
    ch = n.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def _site_key(agg) -> str:
    return re.sub(r"#\d+L?", "", agg.groupingExpressions().mkString(","))


def joinback_sites(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan()
    hits: set[str] = set()
    for j in _walk(plan):
        if j.nodeName() != "Join" or not j.condition().isDefined():
            continue
        left, right = j.left(), j.right()
        for side, other in ((left, right), (right, left)):
            for agg in _walk(side):
                if (agg.nodeName() != "Aggregate"
                        or agg.groupingExpressions().isEmpty()):
                    continue
                child = agg.children().apply(0)
                others = list(_walk(other))
                if any(n.sameResult(agg) for n in others):
                    continue  # self-join of the aggregate: pair join
                if any(n.sameResult(child) for n in others):
                    hits.add(_site_key(agg))
    return sorted(hits)


def test_rewritten_queries_stay_joinback_free(spark):
    dirty = {}
    for name in _FIXED_MUST_BE_CLEAN:
        sites = joinback_sites(REGISTRY[name].builder(spark, SF_DIR))
        if sites:
            dirty[name] = sites
    assert not dirty, (
        f"window-rewritten queries regressed to join-backs: {dirty} — "
        "use operators.scale.with_group_stats"
    )


def test_joinback_inventory_is_frozen(spark):
    grown = {}
    for name in sorted(REGISTRY):
        if name in _FIXED_MUST_BE_CLEAN:
            continue
        sites = joinback_sites(REGISTRY[name].builder(spark, SF_DIR))
        new = [s for s in sites if s not in _KNOWN_SITES.get(name, [])]
        if new:
            grown[name] = new
    assert not grown, (
        f"new groupBy+join-back sites on shared frames: {grown} — either "
        "rewrite with operators.scale.with_group_stats (guide §2.4) or "
        "extend _KNOWN_SITES with the semantics argument in this commit"
    )
