"""Registry lint: no silently-constant statistic columns (VERDICT r8 item 3).

The round-8 manual oracle sweep found four queries whose HEADLINE statistic
was identically 0 or 1 at every SF (q257 drawdown, q246 lateness, q86
Jaccard, q292 MRR) — each hash-matched its DuckDB oracle perfectly while
proving nothing, the one failure mode a same-author oracle can never flag.
The round-9 sweep (this lint's first run) found ten more: q44 (n ≡ 1 — the
corpus has no exact dups), q61 (plain ≡ 0 ≡ with_null — the 3VL contrast
was invisible), q174 (modal bin ≡ 0), q190 (n_censored ≡ 0), q218
(n_churned ≡ 0), q45f (four language scores ≡ 0), q266 (n_stop_fps ≡ 0),
q269 (dup_ppm ≡ 0), q270/q302 (OOV ≡ 0 — 31-word closed vocabulary). All
ten were fixed in the same commit that added this lint.

This test promotes that sweep to a STANDING gate: every registered oracle
runs in DuckDB at sf0.001 AND sf0.01; any numeric column whose every
non-NULL value at BOTH SFs equals the SAME value v (round-9 scope: only
v ∈ {0, 1}; widened to ANY constant per VERDICT r9/r10 item) must appear
in the justified-constant inventory below with a reviewed reason. Set
equality is asserted in both directions, so the inventory can't go stale:
a new saturated fixture fails the lint until justified, and a
fixed/changed query whose justification no longer applies fails until the
entry is removed.

Scope notes. {0, 1} are the saturation values of the bug classes seen
first (zero-count, probability/ratio collapse); the any-value widening
additionally catches the parameter-echo and fixture-bound classes — a
statistic pinned at, say, 268 bytes or 50000 ppm across rows AND scales
hash-matches while proving just as little. Most widened entries fall into
two benign families, named below so their one-line reasons stay readable:
PARAM (the query's own configuration echoed into the output — documents
the setup, carries no data signal by design) and FIXSIZE (documents /
embeddings are fixed-size side tables, NOT scaled by SF, so row counts
derived from them are corpus constants; lineitem/orders/events-derived
counts DO scale and never land here). Constancy at ONE SF only is
likewise fine (small-fixture noise); the q326 class is constant across
scale.
"""

from __future__ import annotations

import decimal

import duckdb
import pytest

from inspectadb_spark import queries as corpus

# r14 driver fast lane (pytest.ini): whole-registry statistics inventory —
# builder-run each round with -m ""
pytestmark = pytest.mark.slow

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
_TOL = 1e-12

# Shared one-line reason prefixes for the two benign widened families.
def _param(what: str) -> str:
    return f"PARAM echo: {what}"


def _fixsize(what: str) -> str:
    return f"FIXSIZE (500-doc/500-vec side tables are SF-invariant): {what}"

# (query id, column) -> (saturated value, why the constant is legitimate).
# Every entry was individually adjudicated; the paired test asserts the
# flagged set equals EXACTLY this inventory, so additions and removals are
# both conscious edits.
_JUSTIFIED: dict[tuple[str, str], tuple[float, str]] = {
    ("q01_scan_count", "mn"): (1.0,
        "MIN(l_linenumber) — the generator numbers lines from 1; the "
        "query's signal is the count columns, which vary"),
    ("q08_full_join", "nb"): (1.0,
        "COUNT(*) GROUP BY p_partkey is identically 1 on a primary key; "
        "the full-join signal is nb's NULL pattern on lineitem-only keys "
        "(NULLs are outside this detector) and na, which varies"),
    ("q141_salted_agg", "mn"): (0.0,
        "MIN(user_id) per event type hits the id domain floor 0 — every "
        "type reaches user 0 at both SFs; n/sv/mx vary and carry the "
        "salted-vs-plain parity signal"),
    ("q160_calendar_dim", "month"): (1.0,
        "the events corpus spans January 2024 only — month ≡ 1 is a "
        "calendar attribute of the fixture, not a statistic"),
    ("q160_calendar_dim", "quarter"): (1.0,
        "same: January 2024 only, quarter ≡ 1"),
    ("q205_dataset_card", "n_dup_docs"): (0.0,
        "the raw documents corpus genuinely holds zero exact duplicates; "
        "the card reports that fact. Dup COUNTING is value-exercised by "
        "the planted-dup overlays in q44/q269 and by q223's histogram"),
    ("q205_dataset_card", "dup_ppm"): (0.0,
        "same clean-corpus fact as n_dup_docs"),
    ("q230_cdc_lifecycle_census", "n_malformed"): (0.0,
        "the changelog is derived in-query and well-formed by "
        "construction; the counter is the guard asserting exactly that "
        "invariant, recomputed independently by the oracle"),
    ("q245_join_cardinality_audit", "err_ratio"): (0.0,
        "adjudicated in round 8: the cardinality estimator is exact on "
        "uniform keys by design — the zero error IS the demonstrated "
        "property"),
    ("q251_fk_enforcement", "n_quarantined"): (0.0,
        "the generator's FKs are referentially clean — the zero is the "
        "audited integrity invariant; enforce_inclusion's quarantine "
        "side is unit-tested with planted orphans "
        "(tests/test_inspection.py::test_enforce_inclusion_splits...)"),
    ("q253_cluster_split", "n_straddling_clusters"): (0.0,
        "the zero IS the group-leakage-safety property the query "
        "demonstrates: a cluster-keyed split never straddles clusters"),
    ("q305_isotropy", "rms_norm"): (1.0,
        "adjudicated in round 8: embeddings are unit-normalized by "
        "construction; centroid_norm/anisotropy vary"),
    ("q40_higher_order", "ssq"): (1.0,
        "adjudicated in round 8: the higher-order-function pipeline "
        "normalizes to a unit vector — ssq ≡ 1 is the checked identity"),
    ("q42b_from_json", "mn"): (0.0,
        "MIN of the JSON prop 'k' hits its domain floor 0 at both SFs; "
        "mx/avg vary and prove the extraction"),
    ("q42c_variant", "mn_k"): (0.0,
        "same domain-floor MIN as q42b, through the Variant path"),
    ("q54_dq_profile", "n_null"): (0.0,
        "the fixture has no NULLs; the DQ profile truthfully reports a "
        "clean table — COUNT(CASE WHEN x IS NULL) is formula-trivial in "
        "both engines, so same-author-wrong risk is negligible"),
    ("q54b_dq_integrity", "orphan_orders"): (0.0,
        "TPC-H-style generator referential integrity — the zero is the "
        "audited invariant (same class as q251)"),
    ("q54b_dq_integrity", "orphan_lineitems"): (0.0,
        "same referential-integrity invariant"),
    ("q54b_dq_integrity", "dup_orderkeys"): (0.0,
        "o_orderkey is the generator's primary key; zero dups is the "
        "audited invariant"),
    ("q61_not_in_3vl", "with_null"): (0.0,
        "THE three-valued-logic assertion: NOT IN over a NULL-containing "
        "subquery yields no rows, always. Meaningful because `plain` "
        "over the same (non-NULL) subquery is provably nonzero since the "
        "round-9 fix — the pair is the contrast"),
    ("q90_bit_bool_aggs", "b_and"): (0.0,
        "bit_and of hundreds of uniform integers is 0 with near-"
        "certainty at any SF; b_or/b_xor vary and prove the family"),
    # ------------------------------------------------------------------
    # Round-11 any-value widening (VERDICT r10 item 4). Each entry below
    # was individually adjudicated when the widened detector first ran.
    # PARAM echoes: the query's own configuration rendered into the output.
    ("q106_array_algebra", "pos"): (3.0,
        "known-answer probe: list_position of k+2 in sequence(k, k+5) is "
        "3 by construction — the checked positional identity; the "
        "inter/uni/diff columns vary"),
    ("q120_bm25_topk", "n_terms"): (3.0,
        _param("3-term query ('spark','window','join'); every top-k doc "
               "hits all three at both SFs — BM25 scores vary")),
    ("q166_chi_square", "n_cells"): (7.0, _param("7-bin contingency grid")),
    ("q187_poisson_bootstrap", "n_replicas"): (64.0,
        _param("64 bootstrap replicas")),
    ("q189_kmv_overlap", "kk"): (128.0, _param("KMV sketch size k=128")),
    ("q275_kruskal_wallis", "k"): (5.0, _param("5 event-type groups")),
    ("q277_friedman", "k"): (5.0, _param("5 treatments (event types)")),
    ("q278_brown_forsythe", "k"): (5.0, _param("5 groups")),
    ("q281_cramers_v", "ra"): (5.0, _param("5 priority rows in the grid")),
    ("q281_cramers_v", "cb"): (3.0, _param("3 status columns in the grid")),
    ("q281_cramers_v", "dof"): (8.0, _param("(5-1)*(3-1) grid dof")),
    ("q285_anova_f", "k"): (5.0, _param("5 groups")),
    ("q287_levene_mean", "k"): (5.0, _param("5 groups")),
    ("q289_cochran_q", "k"): (4.0, _param("4 binary treatments")),
    ("q290_bartlett", "k"): (5.0, _param("5 groups")),
    ("q310_permutation_entropy", "n_patterns"): (6.0,
        "all 3! = 6 ordinal patterns occur in the 28-triple series at "
        "both SFs — full support; the entropy itself varies"),
    ("q313_page_trend", "k"): (5.0, _param("5 ranked treatments")),
    ("q314_rbo", "k"): (5.0, _param("rank-biased overlap depth k=5")),
    ("q322_cmh_test", "n_strata"): (7.0, _param("7 day-strata")),
    ("q328_jackknife_ratio_se", "n_strata"): (7.0,
        _param("7 leave-one-out strata (days)")),
    # FIXSIZE: documents (500 rows / 20 sources / 31-word vocabulary) and
    # embeddings (500 vectors x 64 dims) are SF-invariant side tables.
    ("q125_embedding_dim_stats", "n"): (500.0, _fixsize("500 vectors")),
    ("q356_lsh_bucket_skew", "n_docs"): (500.0,
        _fixsize("every doc has >= 3 tokens so all 500 band once per "
                 "band; buckets/max/pairs/top-share vary")),
    ("q126_mixture_rebalance", "n_orig"): (25.0,
        _fixsize("25 docs per source")),
    ("q126_mixture_rebalance", "n_kept"): (25.0,
        "the uniform corpus already satisfies the target mixture, so "
        "rebalance keeps every doc; the DROPPING arm is value-exercised "
        "by q126b's weighted variant whose kept counts vary"),
    ("q126b_weighted_rebalance", "n_orig"): (25.0,
        _fixsize("25 docs per source")),
    ("q138_winsorized_stats", "n"): (25.0, _fixsize("25 docs per group")),
    ("q148_embedding_quartiles", "n"): (125.0,
        _fixsize("500 vectors / 4 quartile bins")),
    ("q149_embedding_covariance", "n"): (500.0, _fixsize("500 vectors")),
    ("q205_dataset_card", "n_docs"): (25.0, _fixsize("25 docs per source")),
    ("q222_dedup_impact", "docs_before"): (25.0,
        _fixsize("25 docs per source")),
    ("q237_keep_best_dedup", "n_docs"): (25.0,
        _fixsize("25 docs per source")),
    ("q238_zipf_fit", "n_types"): (31.0,
        _fixsize("closed 31-word vocabulary, fully observed per lang")),
    ("q249_mixture_temperature", "n_docs"): (25.0,
        _fixsize("25 docs per source; the mixture math runs on char mass, "
                 "which varies — see the q249 char-weighting note")),
    ("q252_split_leakage", "n_train_docs"): (410.0,
        _fixsize("deterministic md5 82/18 split of the fixed 500 docs")),
    ("q252_split_leakage", "n_test_docs"): (90.0,
        _fixsize("complement of the 410-doc train split")),
    ("q261_packing_efficiency", "n_docs"): (25.0,
        _fixsize("25 docs per source")),
    ("q261_packing_efficiency", "padded_seqs"): (25.0,
        "one packed sequence per doc at this context length — every doc "
        "is shorter than the window, so each opens (and pads) its own "
        "sequence; fill/waste ratios vary and carry the signal"),
    ("q266_winnowing_profile", "n_docs"): (25.0,
        _fixsize("25 docs per source")),
    ("q271_audio_pcm8_features", "n_samples"): (256.0,
        _param("fixed 0.25 s @ 8/8000 Hz clip per doc = 256 samples")),
    ("q271_audio_pcm8_features", "n_frames"): (8.0,
        _param("256 samples / 32-sample frames")),
    ("q303_flesch", "n_docs"): (25.0, _fixsize("25 docs per source")),
    ("q303_flesch", "sents"): (25.0,
        "the generator emits exactly one sentence per doc (no "
        "sentence-final punctuation inside); words/syllables vary"),
    ("q305_isotropy", "n"): (500.0, _fixsize("500 vectors")),
    ("q305_isotropy", "n_dims"): (64.0, _fixsize("64 dims")),
    ("q342_rbf_mmd_drift", "n_blocks"): (125.0,
        _fixsize("500 vectors / 4-row MMD_l blocks; the statistics "
                 "(mmd_l, h_sd, z) vary across SFs and arms")),
    ("q309_vocab_jaccard", "overlap_coef_ppm"): (1000000.0,
        "closed 31-word vocabulary: every source observes the full vocab, "
        "so pairwise containment saturates at 1.0; jaccard_ppm varies "
        "(union sizes differ) and carries the signal"),
    ("q330_theil_decomposition", "n_groups"): (25.0,
        _fixsize("25 docs per source-group")),
    ("q39_array_suite", "n"): (64.0, _fixsize("64-dim embedding arrays")),
    ("q53_multimodal_blobs", "n_blobs"): (500.0, _fixsize("500 docs")),
    ("q53_multimodal_blobs", "total_bytes"): (134000.0,
        _fixsize("500 blobs x 268 bytes — the accounting identity")),
    ("q53_multimodal_blobs", "min_bytes"): (268.0,
        "fixed raster format: 12-byte header + 16x16 px = 268 bytes per "
        "blob by construction; the oracle derives the same constant from "
        "the format spec — equality IS the plumbing check"),
    ("q53_multimodal_blobs", "max_bytes"): (268.0,
        "same fixed-format identity as min_bytes"),
    # 30-day events span (SF scales events-per-day, not days)
    ("q297_ljung_box", "n"): (30.0, _param("30 daily revenue points")),
    ("q298_durbin_watson", "n"): (30.0, _param("30 daily points")),
    ("q300_grubbs", "n"): (30.0, _param("30 daily points")),
    ("q310_permutation_entropy", "n"): (28.0,
        _param("30 days - 2 lead rows = 28 ordinal triples")),
    ("q311_mann_kendall", "n"): (30.0, _param("30 daily points")),
    ("q317_seasonal_mann_kendall", "n_days"): (30.0,
        _param("30-day span")),
    ("q329_gumbel_maxima", "n"): (30.0, _param("30 block maxima (days)")),
    ("q299_runs_test", "n1"): (15.0,
        "median split of an even 30-day series forces an exact 15/15 "
        "sign balance; runs and the z statistic vary"),
    ("q299_runs_test", "n2"): (15.0, "same forced median-split balance"),
    ("q299_runs_test", "mu"): (16.0,
        "mu = 2*n1*n2/(n1+n2) + 1 = 16 follows from the forced 15/15 "
        "split — a derived constant, not a statistic"),
    # derived-by-construction identities
    ("q293_cohens_kappa", "pe"): (0.5,
        "chance agreement of a median-split rater against any binary "
        "rater is 0.5 by construction (balanced marginals); po and "
        "kappa vary"),
    ("q42b_from_json", "mx"): (99.0,
        "MAX of the JSON prop 'k' hits its [0,100) domain ceiling at "
        "both SFs — the mirror of the justified mn=0; sk/n vary"),
    ("q42c_variant", "mx_k"): (99.0,
        "same domain-ceiling MAX as q42b, through the Variant path"),
}


def _is_num(v) -> bool:
    return isinstance(v, (int, float, decimal.Decimal)) \
        and not isinstance(v, bool)


def saturated_columns(per_sf: list[tuple[list[str], list[tuple]]]
                      ) -> dict[str, float]:
    """Detector: columns whose every non-NULL value in EVERY result set
    equals the SAME value within 1e-12 (round-11 widening: any constant,
    not just {0, 1} — the parameter-echo / fixture-bound classes
    hash-match while proving just as little). Non-numeric columns and
    all-NULL columns are skipped (strings/bools/dates saturate
    differently; NULL patterns are the outer-join signal, not noise)."""
    cols = per_sf[0][0]
    out: dict[str, float] = {}
    for ci, c in enumerate(cols):
        vals: list[float] = []
        numeric = True
        for _, rows in per_sf:
            for r in rows:
                v = r[ci]
                if v is None:
                    continue
                if not _is_num(v):
                    numeric = False
                    break
                vals.append(float(v))
            if not numeric:
                break
        if not numeric or not vals:
            continue
        if all(abs(v - vals[0]) <= _TOL for v in vals):
            out[c] = vals[0]
    return out


def test_detector_flags_planted_saturation():
    """The lint must actually catch a planted q326-class fixture."""
    cols = ["grp", "n", "dead_stat", "live_stat", "all_null", "ratio1"]
    sf_a = (cols, [("x", 3, 0, 0.7, None, 1.0), ("y", 5, 0, 0.2, None, 1.0)])
    sf_b = (cols, [("x", 31, 0, 0.9, None, 1.0), ("y", 54, 0, 0.0, None, 1.0)])
    got = saturated_columns([sf_a, sf_b])
    assert got == {"dead_stat": 0.0, "ratio1": 1.0}
    # constant at one SF but not the other -> NOT flagged
    sf_c = (cols, [("x", 3, 0, 0.7, None, 1.0), ("y", 5, 4, 0.2, None, 0.5)])
    assert "dead_stat" not in saturated_columns([sf_a, sf_c])
    # round-11 widening: a non-{0,1} constant (parameter echo / fixture
    # bound class) IS flagged now and must be inventory-justified
    cols2 = ["k"]
    assert saturated_columns([(cols2, [(7,), (7,)]),
                              (cols2, [(7,), (7,)])]) == {"k": 7.0}


@pytest.fixture(scope="module")
def _cons():
    cons = []
    for sf in SFS:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
        cons.append(con)
    yield cons
    for con in cons:
        con.close()


def test_no_unjustified_constant_statistics(_cons):
    osql = corpus.oracle_sql()
    flagged: dict[tuple[str, str], float] = {}
    for qid in sorted(osql):
        per_sf = []
        for con in _cons:
            cur = con.execute(osql[qid])
            per_sf.append(([d[0] for d in cur.description], cur.fetchall()))
        for col, val in saturated_columns(per_sf).items():
            flagged[(qid, col)] = val
    unjustified = {k: v for k, v in flagged.items() if k not in _JUSTIFIED}
    assert not unjustified, (
        "saturated statistic columns (constant 0/1 across rows AND both "
        "SFs) without a justified-constant inventory entry — the query "
        "hash-matches while proving nothing (q326 class). Fix the fixture "
        f"or justify here: {unjustified}"
    )
    stale = {k: v for k, v in _JUSTIFIED.items() if k not in flagged}
    assert not stale, (
        "inventory entries that no longer saturate — the justification "
        f"is stale, remove it: {list(stale)}"
    )
    # the justified VALUE must still be the observed one
    drift = {k: (flagged[k], _JUSTIFIED[k][0])
             for k in flagged if k in _JUSTIFIED
             and flagged[k] != _JUSTIFIED[k][0]}
    assert not drift, f"saturation value changed vs inventory: {drift}"
