"""Hand-computed cases + invariants for the corpus-hygiene and retention
family (q75-q78, q80): n-gram decontamination, redaction ordering,
corpus-frequency scoring, retention cohorts, time-weighted averages."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from inspectadb_spark.operators.text import (
    corpus_frequency_score,
    ngram_contamination,
    redact,
    word_ngrams,
)
from inspectadb_spark.operators.timeseries import retention_cohorts, time_weighted_avg


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- word_ngrams / ngram_contamination ---------------------------------------

def test_word_ngrams_hand_case(spark):
    out = word_ngrams(_docs(spark, [(1, "a b c d e f")]), n=5).collect()
    assert sorted(r.gram for r in out) == ["a b c d e", "b c d e f"]


def test_word_ngrams_short_doc_emits_nothing(spark):
    assert word_ngrams(_docs(spark, [(1, "a b c")]), n=5).count() == 0


def test_contamination_counts_and_rate(spark):
    corpus = _docs(spark, [(1, "a b c d e f"), (2, "x y z w v")])
    bench = _docs(spark, [(10, "b c d e f g")])
    rows = {r.doc_id: r for r in ngram_contamination(corpus, bench, n=5).collect()}
    # doc 1 shares exactly "b c d e f"; doc 2 shares nothing -> filtered out
    assert set(rows) == {1}
    assert (rows[1].n_grams, rows[1].n_shared, rows[1].share_rate) == (2, 1, 0.5)


def test_contamination_duplicate_grams_count_once(spark):
    corpus = _docs(spark, [(1, "a b a b a b a b")])  # "a b a b a" twice etc.
    bench = _docs(spark, [(10, "a b a b a")])
    r = ngram_contamination(corpus, bench, n=5).collect()[0]
    # distinct grams of doc 1: "a b a b a", "b a b a b" -> 2; one shared
    assert (r.n_grams, r.n_shared) == (2, 1)


# -- redact ------------------------------------------------------------------

def test_redact_applies_patterns_in_order(spark):
    docs = _docs(spark, [(1, "key abc123456 hash")])
    r = redact(docs, [(r"\b(key|hash)\b", "[S]"), (r"\d{3,}", "[N]")]).collect()[0]
    assert r.redacted == "[S] abc[N] [S]"
    assert r.n_hits == 3


def test_redact_earlier_replacement_not_rematched(spark):
    # first pass rewrites to text the second pattern would NOT hit
    docs = _docs(spark, [(1, "aaa")])
    r = redact(docs, [(r"a+", "999"), (r"\d{3,}", "[N]")]).collect()[0]
    # hits counted on the CURRENT text at each step: 1 then 1
    assert (r.n_hits, r.redacted) == (2, "[N]")


# -- corpus_frequency_score --------------------------------------------------

def test_corpus_freq_score_hand_case(spark):
    docs = _docs(spark, [(1, "a a b"), (2, "b c")])
    rows = {r.doc_id: r for r in corpus_frequency_score(docs).collect()}
    # corpus freq: a=2, b=2, c=1
    assert rows[1].n_tokens == 3 and rows[1].mean_tok_freq == 2.0
    assert rows[2].n_tokens == 2 and rows[2].mean_tok_freq == 1.5


# -- retention_cohorts -------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")


def test_retention_hand_case(spark):
    t = dt.datetime
    ev = _events(spark, [
        (1, t(2024, 1, 1), 100, 0.0),   # Mon wk0 — cohort A
        (2, t(2024, 1, 9), 100, 0.0),   # wk1: A retained
        (3, t(2024, 1, 2), 101, 0.0),   # wk0 — cohort A
        (4, t(2024, 1, 10), 102, 0.0),  # wk1 — cohort B
    ])
    rows = {(r.cohort_week, r.week_offset): r for r in retention_cohorts(ev).collect()}
    wk0, wk1 = t(2024, 1, 1), t(2024, 1, 8)
    assert rows[(wk0, 0)].n_cohort == 2 and rows[(wk0, 0)].retention == 1.0
    assert rows[(wk0, 1)].n_active == 1 and rows[(wk0, 1)].retention == 0.5
    assert rows[(wk1, 0)].n_cohort == 1 and rows[(wk1, 0)].retention == 1.0


def test_retention_offset_zero_is_always_full(spark):
    from inspectadb_spark.catalog import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, "events", SF_DIR)  # ns-shimmed ts
    zero = retention_cohorts(ev).filter(F.col("week_offset") == 0).collect()
    assert zero and all(r.retention == 1.0 and r.n_active == r.n_cohort for r in zero)


# -- time_weighted_avg -------------------------------------------------------

def test_twa_hand_case(spark):
    t = dt.datetime
    ev = _events(spark, [
        # user 7: 10.0 for 30s, then 20.0 for 10s, final obs unweighted
        (1, t(2024, 1, 1, 0, 0, 0), 7, 10.0),
        (2, t(2024, 1, 1, 0, 0, 30), 7, 20.0),
        (3, t(2024, 1, 1, 0, 0, 40), 7, 99.0),
    ])
    r = time_weighted_avg(ev).collect()[0]
    assert r.n_obs == 2 and r.span_s == 40.0
    assert r.twa == 12.5  # (10*30 + 20*10) / 40


def test_twa_bounded_by_min_max(spark):
    from inspectadb_spark.catalog import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, "events", SF_DIR)  # ns-shimmed ts
    twa = time_weighted_avg(ev)
    bounds = ev.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi"))
    bad = twa.join(bounds, "user_id").filter(
        (F.col("twa") < F.col("lo") - 1e-4) | (F.col("twa") > F.col("hi") + 1e-4))
    assert bad.count() == 0


# -- select_until_budget -------------------------------------------------------

def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, n_tokens long, mean_tok_freq double")


def test_budget_selection_matches_cumsum_semantics(spark):
    from inspectadb_spark.operators.pipeline import select_until_budget

    rows = [(1, 10, 3.0), (2, 10, 2.0), (3, 5, 2.0), (4, 10, 2.0), (5, 10, 1.0)]
    # order: 1(cum10), 2(20), 3(25), 4(35), 5(45); budget 26 keeps 1,2,3
    got = {r.doc_id for r in select_until_budget(_scored(spark, rows), 26).collect()}
    assert got == {1, 2, 3}


def test_budget_selection_boundary_bucket_stops_at_overflow(spark):
    from inspectadb_spark.operators.pipeline import select_until_budget

    # boundary bucket (score 2.0) in doc_id order: 2(10), 3(+5=15>12 stop)
    rows = [(1, 10, 3.0), (2, 10, 2.0), (3, 5, 2.0), (4, 1, 2.0)]
    got = {r.doc_id for r in select_until_budget(_scored(spark, rows), 22).collect()}
    assert got == {1, 2}  # doc 4 would fit alone but cumsum already overflowed


def test_budget_selection_all_fit_short_circuits(spark):
    from inspectadb_spark.operators.pipeline import select_until_budget

    rows = [(1, 5, 1.0), (2, 5, 2.0)]
    got = select_until_budget(_scored(spark, rows), 100)
    assert got.count() == 2


# -- sequence_funnel -----------------------------------------------------------

def test_sequence_funnel_requires_strict_order_within_window(spark):
    from inspectadb_spark.operators.timeseries import sequence_funnel

    t = dt.datetime
    rows = [
        # user 1: signup -> click -> purchase in order => complete
        (1, t(2024, 1, 1, 0), 1, "signup"),
        (2, t(2024, 1, 1, 1), 1, "click"),
        (3, t(2024, 1, 1, 2), 1, "purchase"),
        # user 2: purchase BEFORE click => incomplete
        (4, t(2024, 1, 1, 0), 2, "signup"),
        (5, t(2024, 1, 1, 2), 2, "click"),
        (6, t(2024, 1, 1, 1), 2, "purchase"),
        # user 3: click precedes signup; later click ok but purchase beyond 72h
        (7, t(2024, 1, 1, 0), 3, "click"),
        (8, t(2024, 1, 1, 1), 3, "signup"),
        (9, t(2024, 1, 1, 2), 3, "click"),
        (10, t(2024, 1, 5, 2), 3, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = sequence_funnel(ev, ["signup", "click", "purchase"], "72 hours").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_start, r.n_complete, r.rate) == (3, 1, 0.3333)


def test_session_transitions_exclude_cross_session_pairs(spark):
    from inspectadb_spark.operators.sessionize import session_transitions

    t = dt.datetime
    rows = [
        (1, t(2024, 1, 1, 0, 0), 1, "view"),
        (2, t(2024, 1, 1, 0, 10), 1, "click"),     # view->click (same session)
        (3, t(2024, 1, 1, 5, 0), 1, "purchase"),   # 5h gap: new session, no pair
        (4, t(2024, 1, 1, 5, 5), 1, "view"),       # purchase->view
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {(r.from_type, r.to_type): r.n for r in session_transitions(ev).collect()}
    assert got == {("view", "click"): 1, ("purchase", "view"): 1}


def test_assign_shards_is_deterministic_and_balanced(spark):
    from inspectadb_spark.operators.pipeline import assign_shards
    from tests.conftest import SF_DIR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {r.doc_id: r._shard for r in assign_shards(d, 8).collect()}
    b = {r.doc_id: r._shard for r in
         assign_shards(d.repartition(13), 8).collect()}
    assert a == b  # partitioning-invariant
    sizes = [0] * 8
    for s in a.values():
        sizes[s] += 1
    assert min(sizes) > 0 and max(sizes) < 2.5 * (len(a) / 8)
    # different salt reshuffles membership
    c = {r.doc_id: r._shard for r in assign_shards(d, 8, salt="epoch2").collect()}
    assert c != a


# -- chunk-level exact dedup (operators/dedup.py::chunk_dedup) ---------------

def test_chunk_dedup_plants_boilerplate(spark):
    ten = "a b c d e f g h i j"          # one exact 10-word chunk
    uniq1 = "k l m n o p q r s t"
    uniq2 = "u v w x y z aa bb cc dd"
    rows = [
        (0, f"{ten} {uniq1}"),            # chunks: ten, uniq1
        (1, f"{ten} {uniq2}"),            # ten repeats -> dropped here
        (2, f"{uniq2} {ten}"),            # both seen -> all dropped
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    from inspectadb_spark.operators.dedup import chunk_dedup

    out = {(r["doc_id"], r["chunk_idx"]): r["keep"] for r in chunk_dedup(df).collect()}
    assert out == {
        (0, 0): True, (0, 1): True,
        (1, 0): False, (1, 1): True,
        (2, 0): False, (2, 1): False,
    }


def test_chunk_dedup_partial_tail_chunk_is_its_own_unit(spark):
    # 13 words -> one full chunk + a 3-word tail; the tail dedups only
    # against identical 3-word tails, never against full chunks.
    df = spark.createDataFrame(
        [(0, "a b c d e f g h i j x y z"), (1, "x y z")],
        "doc_id bigint, text string",
    )
    from inspectadb_spark.operators.dedup import chunk_dedup

    out = {(r["doc_id"], r["chunk_idx"]): r["keep"] for r in chunk_dedup(df).collect()}
    assert out[(0, 1)] is True and out[(1, 0)] is False


# -- dynamic-gap sessionization (operators/sessionize.py) --------------------

def test_sessionize_dynamic_agrees_with_native_session_window(spark):
    import datetime as _dt

    from inspectadb_spark.operators.sessionize import sessionize_dynamic

    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # user 1: short events 30-min gap; a 'long' event extends to 45 min
    for i, (mins, typ) in enumerate(
        [(0, "a"), (29, "a"),      # merge (29 < 0+30)
         (70, "long"), (110, "a"),  # merge (110 < 70+45)
         (200, "a")]):              # new session
        rows.append((1, i, t0 + _dt.timedelta(minutes=mins), typ))
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp_ntz, event_type string")
    gap = (F.when(F.col("event_type") == "long", F.lit("45 minutes"))
           .otherwise(F.lit("30 minutes")))
    gap_iv = (F.when(F.col("event_type") == "long", F.expr("INTERVAL 45 MINUTE"))
              .otherwise(F.expr("INTERVAL 30 MINUTE")))
    manual = (
        sessionize_dynamic(df, gap_iv)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start_ts"), F.count("*").alias("n"))
        .select("user_id", "start_ts", "n")
    )
    native = (
        df.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("w.start").alias("start_ts"), "n")
    )
    m = sorted(map(tuple, manual.collect()))
    nv = sorted(map(tuple, native.collect()))
    assert m == nv
    assert [x[2] for x in m] == [2, 2, 1]


# -- pmi_collocations (q188) -------------------------------------------------

def test_pmi_planted_collocation_ranks_first(spark):
    """A pair that ALWAYS co-occurs and never appears apart must out-rank
    frequent-but-independent pairs."""
    from inspectadb_spark.operators.text import pmi_collocations

    # 'aa bb' glued 6x; 'xx' and 'yy' frequent but paired every which way.
    rows = [(i, "aa bb xx yy xx") for i in range(1, 7)] + [
        (10, "yy xx yy xx yy"), (11, "xx yy xx yy xx")]
    out = pmi_collocations(_docs(spark, rows), min_count=5, k=10).collect()
    assert out, "no collocations above min_count"
    top = out[0]
    assert (top["w1"], top["w2"]) == ("aa", "bb")
    assert top["n_pair"] == 6
    # every returned pair meets the count floor and is ordered by pmi desc
    assert all(r["n_pair"] >= 5 for r in out)
    pmis = [r["pmi"] for r in out]
    assert pmis == sorted(pmis, reverse=True)


def test_pmi_counts_match_naive(spark):
    from inspectadb_spark.operators.text import pmi_collocations

    rows = [(1, "a b a b a b"), (2, "b a b a b a")]
    out = {(r["w1"], r["w2"]): r["n_pair"]
           for r in pmi_collocations(_docs(spark, rows), min_count=1, k=100).collect()}
    # doc1 bigrams: ab,ba,ab,ba,ab ; doc2: ba,ab,ba,ab,ba
    assert out[("a", "b")] == 5 and out[("b", "a")] == 5


# -- KMV bottom-k sketch (q189) ------------------------------------------------

def test_kmv_signature_is_mergeable(spark):
    """Bottom-k of a union == bottom-k over the concatenated per-part
    signatures — the property that lets signatures be stored and rolled up."""
    from pyspark.sql import functions as F

    from inspectadb_spark.operators.sketches import kmv_signature

    df = spark.range(1, 2001).select(
        F.lit("g").alias("src"), F.col("id").cast("string").alias("key"))
    whole = kmv_signature(df, "src", "key", k=64)
    part1 = kmv_signature(df.filter("CAST(key AS INT) <= 1000"), "src", "key", k=64)
    part2 = kmv_signature(df.filter("CAST(key AS INT) > 1000"), "src", "key", k=64)
    from pyspark.sql import Window
    merged = (
        part1.select("g", "h").union(part2.select("g", "h")).distinct()
        .withColumn("r", F.row_number().over(Window.partitionBy("g").orderBy("h")))
        .filter("r <= 64")
    )
    assert sorted(r["h"] for r in whole.collect()) == \
        sorted(r["h"] for r in merged.collect())


def test_kmv_jaccard_estimate_tracks_exact(spark):
    """Planted overlap: sources share half their keys -> J = 1/3; the KMV
    estimate with k=128 must land within ~3 sigma (|err| <= 0.13)."""
    from pyspark.sql import functions as F

    from inspectadb_spark.operators.sketches import kmv_pairwise_jaccard

    a = spark.range(0, 1000).select(F.lit("a").alias("src"),
                                    F.col("id").cast("string").alias("key"))
    b = spark.range(500, 1500).select(F.lit("b").alias("src"),
                                      F.col("id").cast("string").alias("key"))
    out = kmv_pairwise_jaccard(a.union(b), "src", "key", k=128).collect()
    assert len(out) == 1
    est = out[0]["jaccard_ppm"] / 1e6
    assert abs(est - 1 / 3) <= 0.13, est
    assert out[0]["kk"] == 128


def test_kmv_jaccard_disjoint_and_identical_extremes(spark):
    from pyspark.sql import functions as F

    from inspectadb_spark.operators.sketches import kmv_pairwise_jaccard

    a = spark.range(0, 500).select(F.lit("a").alias("src"),
                                   F.col("id").cast("string").alias("key"))
    b = spark.range(1000, 1500).select(F.lit("b").alias("src"),
                                       F.col("id").cast("string").alias("key"))
    ident = a.union(a.withColumn("src", F.lit("b")))
    disjoint = kmv_pairwise_jaccard(a.union(b), "src", "key", k=64).collect()[0]
    same = kmv_pairwise_jaccard(ident, "src", "key", k=64).collect()[0]
    assert disjoint["jaccard_ppm"] == 0
    assert same["jaccard_ppm"] == 1000000


# -- NULL/empty-text semantics pins (robustness documentation) ---------------

def test_null_and_empty_text_semantics(spark):
    """Deterministic NULL handling across the text/dedup surface, pinned so
    a refactor can't silently change it:
    - exact_dedup groups NULL texts together under the NULL hash (SQL
      GROUP BY semantics — matches the DuckDB oracle), empty string is its
      own (non-NULL) group;
    - token_stats propagates NULL stats for NULL text;
    - unigram_logprob emits no row for a NULL-text doc (nothing to score).
    """
    from inspectadb_spark.operators.dedup import exact_dedup
    from inspectadb_spark.operators.text import token_stats, unigram_logprob

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, ""), (4, "hello world"),
         (5, None)],
        "doc_id long, text string")

    dd = {r["h"]: (r["n"], r["keep"]) for r in exact_dedup(docs).collect()}
    assert dd[None] == (2, 2)          # both NULL docs in one group
    assert dd["5eb63bbbe01eeed093cb22bb8f5acdc3"] == (2, 1)
    assert dd["d41d8cd98f00b204e9800998ecf8427e"] == (1, 3)

    ts = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert set(ts) == {1, 2, 3, 4, 5}
    assert ts[2]["n_ws"] is None

    lp = {r["doc_id"] for r in unigram_logprob(docs).collect()}
    assert lp == {1, 3, 4}


# --- blocklist screening -----------------------------------------------------
def test_blocklist_counts_nonoverlapping_occurrences(spark):
    from inspectadb_spark.operators.text import blocklist_matches

    docs = spark.createDataFrame(
        [(1, "aaa b aaa"), (2, "no hits here"), (3, "aaaa")],
        "doc_id long, text string")
    pats = spark.createDataFrame([("aaa",), ("b",), ("zz",)], "pat string")
    got = {(r.doc_id, r.pat): r.n_occ
           for r in blocklist_matches(docs, pats).collect()}
    # 'aaaa' contains ONE non-overlapping 'aaa' (left-to-right replace rule)
    assert got == {(1, "aaa"): 2, (1, "b"): 1, (3, "aaa"): 1}


# --- margin bitext mining ----------------------------------------------------
def test_margin_bitext_prefers_true_pair_over_hub(spark):
    """A hub vector near everything loses to the true translation pair
    under the ratio margin, even when its raw cosine is competitive."""
    from inspectadb_spark.operators.similarity import margin_bitext
    import numpy as np

    rng = np.random.RandomState(7)
    # B: one hub (near the centroid of everything) + distinct directions
    base = rng.randn(6, 8).astype("float64")
    a_rows = [(i, (base[i] + 0.05 * rng.randn(8)).tolist()) for i in range(4)]
    b_rows = [(100 + i, (base[i] + 0.05 * rng.randn(8)).tolist())
              for i in range(4)]
    b_rows.append((999, np.mean(base[:4], axis=0).tolist()))  # hub
    a = spark.createDataFrame(a_rows, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(b_rows, "vec_id long, embedding array<double>")
    out = {r.a_id: r.b_id
           for r in margin_bitext(a, b, k=3, threshold_ppm=0).collect()}
    assert out == {0: 100, 1: 101, 2: 102, 3: 103}


def test_margin_bitext_excludes_zero_norm_and_nonpositive(spark):
    from inspectadb_spark.operators.similarity import margin_bitext

    a = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0])],
        "vec_id long, embedding array<double>")
    b = spark.createDataFrame(
        [(10, [1.0, 0.1]), (11, [-1.0, 0.0]), (12, [0.0, 0.0])],
        "vec_id long, embedding array<double>")
    rows = margin_bitext(a, b, k=2, threshold_ppm=0).collect()
    # zero-norm a_id=1 and b_id=12 excluded; anti-parallel b_id=11 excluded
    assert [(r.a_id, r.b_id) for r in rows] == [(0, 10)]


# --- matryoshka truncation audit ----------------------------------------------
def test_truncated_recall_perfect_when_tail_dims_are_zero(spark):
    """If all information lives in the first `dims` coords, truncated and
    full rankings agree exactly -> recall 1e6 for every query."""
    from inspectadb_spark.operators.similarity import truncated_recall
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, ([float(x) for x in rng.randn(4)] + [0.0] * 4))
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = truncated_recall(df, dims=4, k=5, sample_mod=10, sample_rem=1)
    got = out.collect()
    assert len(got) == 4
    assert all(r.recall_ppm == 1_000_000 for r in got)


def test_blocklist_automaton_parity_with_relational(spark):
    """The Aho–Corasick scale path is row-identical to the relational
    replace-length form, including overlapping-match normalization."""
    from inspectadb_spark.operators.text import (
        blocklist_matches, blocklist_matches_automaton)
    from tests.conftest import SF_DIR

    pats = ["big data", "slow query", "customer data", "fast scan",
            "dup dup", "aaa", "a", "forbidden phrase"]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    extra = spark.createDataFrame(
        [(100001, "aaaa"), (100002, "aaa b aaa aaa"), (100003, None)],
        "doc_id long, text string")
    docs = docs.unionByName(extra)
    pdf = spark.createDataFrame([(p,) for p in pats], "pat string")
    rel = [tuple(r) for r in blocklist_matches(docs, pdf).collect()]
    aut = [tuple(r) for r in
           blocklist_matches_automaton(docs, pats).collect()]
    assert rel == aut and len(rel) > 0


# --- MMR diversified top-k ----------------------------------------------------
def _mmr_vecs(spark):
    import numpy as np
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(60)]
    # id 7 (sampled as query by mod 20 rem 7) + planted near-identical pair:
    # candidates 20 and 21 are the same direction (dups); 22 is orthogonal-ish
    base = [float(x) for x in rng.randn(8)]
    rows[20] = (20, base)
    rows[21] = (21, [x * 1.0000001 for x in base])
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_mmr_rank1_is_relevance_top1_and_lambda1_is_cosine_order(spark):
    from inspectadb_spark.operators.similarity import mmr_topk, cosine_topk

    df = _mmr_vecs(spark)
    out = mmr_topk(df, k=5, pool=30, lam_ppm=1_000_000).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r.c_id)
    qvec = {r.vec_id: r.embedding for r in df.collect()}
    for q_id, picked in by_q.items():
        ref = (cosine_topk(df.filter(F.col("vec_id") != q_id),
                           [float(x) for x in qvec[q_id]], k=5)
               .collect())
        # λ=1: pure relevance — same ids in the same order as cosine top-k
        # (both ppm-quantized with id ties)
        assert picked == [r.vec_id for r in ref], q_id


def test_mmr_suppresses_planted_duplicate(spark):
    from inspectadb_spark.operators.similarity import mmr_topk

    df = _mmr_vecs(spark)
    # make 20/21 the two most relevant for query 7 by copying its direction
    qvec = [r.embedding for r in df.filter("vec_id = 7").collect()][0]
    near = spark.createDataFrame(
        [(20, [x * 0.9 for x in qvec]), (21, [x * 0.9000001 for x in qvec])],
        "vec_id long, embedding array<double>")
    df2 = df.filter(~F.col("vec_id").isin(20, 21)).unionByName(near)
    out = [r for r in mmr_topk(df2, k=3, pool=10, lam_ppm=500_000).collect()
           if r.q_id == 7]
    picked = [r.c_id for r in out]
    assert picked[0] in (20, 21)          # rank 1: most relevant (tie->20)
    assert picked[1] not in (20, 21)      # rank 2: the duplicate is skipped


# --- quality rules & compression ratio ---------------------------------------
def test_quality_rules_bitmask_hand_cases(spark):
    from inspectadb_spark.operators.text import quality_rules

    docs = spark.createDataFrame([
        # 12 clean tokens incl. 2 stopwords, mean len in range -> pass
        (1, "the data scan runs well over wide nodes with fast sort keys"),
        (2, "tiny doc"),                       # <10 tokens -> bit 1 (+stop 4)
        (3, " ".join(["spam"] * 40)),          # dominance+distinct+stop bits
        (4, " ".join(["ab"] * 5 + ["x"] * 7)), # mean len < 3 -> bit 2
    ], "doc_id long, text string")
    got = {r.doc_id: r.rule_mask for r in quality_rules(docs).collect()}
    assert got[1] == 0
    assert got[2] & 1
    assert got[3] & 8 and got[3] & 16 and got[3] & 4
    assert got[4] & 2


def test_compression_ratio_flags_repetition_and_nulls(spark):
    from inspectadb_spark.operators.text import compression_ratio

    d = spark.createDataFrame(
        [(1, "spam " * 300), (2, " ".join(f"t{i*13%997}" for i in range(300))),
         (3, None), (4, "")],
        "doc_id long, text string")
    out = {r.doc_id: (r.ratio_ppm, r.n_compressed)
           for r in compression_ratio(d).collect()}
    assert out[1][0] < out[2][0]          # boilerplate compresses better
    assert out[3] == (None, None)         # NULL text -> NULL, not error
    assert out[4][0] is None              # empty text -> NULL ratio


def test_lang_id_und_and_tie_rule(spark):
    """The two lang_id arms the corpus can no longer reach after the
    round-9 marker re-anchoring: a doc hitting NO marker set predicts
    'und' (best <= 0), and an exact score tie breaks deterministically
    toward the EARLIER language in the markers tuple order (de before
    en before es ...). Marker sets are disjoint, so ties are
    constructed, never accidental. Uses the corpus-anchored lexicon
    explicitly, as the q45f site does."""
    from inspectadb_spark.operators.text import LANG_MARKERS_CORPUS, lang_id

    de = LANG_MARKERS_CORPUS[0][1][0]   # a 'de' marker word
    en = LANG_MARKERS_CORPUS[1][1][0]   # an 'en' marker word
    zh = LANG_MARKERS_CORPUS[4][1][0]   # a 'zh' marker word
    docs = spark.createDataFrame(
        [(1, "spark spark spark"),          # no marker hits -> und
         (2, f"{de} {en}"),                 # 1-1 tie -> de (earlier)
         (3, f"{en} {zh} {zh}")],           # zh wins 2-1
        "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict()
           for r in lang_id(docs, markers=LANG_MARKERS_CORPUS).collect()}
    assert got[1]["pred_lang"] == "und"
    assert all(got[1][f"s_{lang}"] == 0 for lang, _ in LANG_MARKERS_CORPUS)
    assert got[2]["pred_lang"] == "de"
    assert got[2]["s_de"] == got[2]["s_en"] == 1
    assert got[3]["pred_lang"] == "zh"
    assert (got[3]["s_zh"], got[3]["s_en"]) == (2, 1)


def test_lang_id_natural_defaults_classify_real_sentences(spark):
    """With NO markers argument, lang_id must classify real prose
    correctly (ADVICE r9: the default lexicon must be natural stopwords,
    not the test corpus' vocabulary partition)."""
    from inspectadb_spark.operators.text import lang_id

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat and looked at the dog that barked"),
         (2, "der hund ist nicht in das haus gegangen und die katze schlief"),
         (3, "los perros que viven en las casas corren por una calle para jugar"),
         (4, "les chats dorment dans une maison et ne sortent pas des pièces"),
         (5, "我 不 是 在 这里 的 人 我 是 了 客人"),
         (6, "zxqv wvut qqq ppp")],       # gibberish -> und
        "doc_id bigint, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "zh", 6: "und"}


def test_lang_id_natural_lexicons_are_disjoint():
    """Cross-language marker collisions would make scores ambiguous; both
    shipped lexicons must be 5 pairwise-disjoint 6-word sets."""
    from inspectadb_spark.operators.text import (
        LANG_MARKERS_CORPUS,
        LANG_MARKERS_NATURAL,
    )

    for lex in (LANG_MARKERS_NATURAL, LANG_MARKERS_CORPUS):
        words = [w for _, ms in lex for w in ms]
        assert len(words) == 30 and len(set(words)) == 30


# -- review regressions: short docs, null payloads, disjoint vocab, ids ------

def test_containment_pairs_survive_short_documents(spark):
    from inspectadb_spark.operators.dedup import shingle_containment_pairs

    # a 2-word doc has NO 5-gram shingles: must be silently absent from
    # the posting lists, not crash the job (sequence(1,0) is descending)
    rows = [(1, "only two"), (2, "a b c d e f g h"), (3, "a b c d e f g x")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = shingle_containment_pairs(df, n=5, min_shared=1,
                                    min_containment_ppm=1)
    pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert (2, 3) in pairs and not any(1 in p for p in pairs)


def test_asof_preserves_null_payload_of_the_matching_row(spark):
    from inspectadb_spark.operators.asof import asof_join, nearest_join

    left = spark.createDataFrame(
        [(1, 5, "old"), (1, 10, None)], "k int, ts long, v string")
    right = spark.createDataFrame([(1, 10)], "k int, rts long")
    got = asof_join(left, right, ["k"], "ts", "rts", ["v"]).first()
    assert got.v is None          # the ts=10 match's own (null) payload
    got2 = nearest_join(left, right, ["k"], "ts", "rts", ["v"]).first()
    assert got2.v is None


def test_chunk_dedup_keeper_is_positional_not_encoded(spark):
    from inspectadb_spark.operators.dedup import chunk_dedup

    # two docs sharing one chunk text: the keeper must be the true first
    # occurrence by (doc, chunk) order — exercised with ids large enough
    # that the old doc_id*1e6+idx arithmetic stays in range but the
    # struct-min must agree with it; and duplicate-within-doc keeps first
    rows = [(7, "a b c d e f g h i j a b c d e f g h i j"),
            (9, "a b c d e f g h i j z z z z z z z z z z")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_dedup(df, chunk_words=10)
    kept = {(r.doc_id, r.chunk_idx): r.keep for r in out.collect()}
    assert kept[(7, 0)] is True and kept[(7, 1)] is False
    assert kept[(9, 0)] is False  # same text as (7,0), later doc
    assert kept[(9, 1)] is True


def test_minhash_banding_validates_divisibility(spark):
    import pytest as _pytest

    from inspectadb_spark.operators.dedup import minhash_near_dup_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with _pytest.raises(ValueError, match="divide"):
        minhash_near_dup_pairs(df, num_hashes=32, bands=12)
    with _pytest.raises(ValueError, match="divide"):
        minhash_near_dup_pairs(df, num_hashes=32, bands=40)


def test_jsd_reports_disjoint_vocab_pairs_at_ln2(spark):
    import math

    from inspectadb_spark.operators.text import js_divergence_pairs

    rows = [("en", "alpha beta gamma"), ("en", "alpha beta"),
            ("zh", "uno dos tres"), ("mix", "alpha uno")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {(r.source_a, r.source_b): r for r in
           js_divergence_pairs(df).collect()}
    assert len(out) == 3          # the full pair universe, not just joined
    dj = out[("en", "zh")]
    assert dj.n_shared_vocab == 0
    assert abs(dj.jsd - math.log(2)) < 1e-4 and dj.jsd_norm == 1.0
    assert out[("en", "mix")].jsd < math.log(2)


def test_blocklist_automaton_handles_string_ids(spark):
    from inspectadb_spark.operators.text import (
        blocklist_matches, blocklist_matches_automaton,
    )

    rows = [("docA", "the key is here key"), ("docB", "nothing")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pats_df = spark.createDataFrame([("key",), ("here",)], "pat string")
    rel = sorted(tuple(r)
                 for r in blocklist_matches(df, pats_df).collect())
    aut = sorted(tuple(r)
                 for r in blocklist_matches_automaton(
                     df, ["key", "here"]).collect())
    assert rel == aut and rel


# --- q356 LSH bucket profile ------------------------------------------------

def test_lsh_bucket_profile_pair_mass_equals_candidate_incidences(spark):
    # the audit's candidate_pairs is EXACTLY the banding join's output:
    # sum over bands of sum s(s-1)/2 == sum over candidate pairs of
    # n_bands (each pair counted once per colliding band)
    from inspectadb_spark.operators.dedup import (
        lsh_bucket_profile, minhash_lsh_candidates_portable,
    )
    from tests.conftest import SF_DIR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prof = lsh_bucket_profile(d)
    pairs = minhash_lsh_candidates_portable(d)
    mass = prof.agg(F.sum("candidate_pairs")).first()[0]
    incidences = pairs.agg(F.sum("n_bands")).first()[0]
    assert mass == incidences and mass > 0


def test_lsh_bucket_profile_honors_custom_id_col(spark):
    # review r12: a custom id_col crashed on groupBy (the signature
    # helper emits 'doc_id' regardless); the profile is id-name-invariant
    from inspectadb_spark.operators.dedup import lsh_bucket_profile
    from tests.conftest import SF_DIR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = lsh_bucket_profile(d).orderBy("band")
    b = lsh_bucket_profile(d.withColumnRenamed("doc_id", "id"),
                           id_col="id").orderBy("band")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_token_overlap_pairs_equals_posting_join(spark):
    # r13: the blocked-GEMM overlap frame must be row-identical to the
    # posting-list self-join it replaced (the q44c/q250/q44e candidate
    # frame) — intersections, sizes and pair set all exact
    from inspectadb_spark.operators.dedup import token_overlap_pairs
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    new = token_overlap_pairs(docs, block_col="lang")
    tok = (docs.select("doc_id", "lang",
                       F.explode(F.split("text", " ")).alias("tok"))
           .distinct())
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = tok.select(F.col("doc_id").alias("d1"), "lang", "tok")
    b = tok.select(F.col("doc_id").alias("d2"), "lang", "tok")
    old = (a.join(b, ["lang", "tok"]).filter(F.col("d1") < F.col("d2"))
           .groupBy("d1", "d2").agg(F.count("*").alias("i"))
           .join(sizes.select(F.col("doc_id").alias("d1"),
                              F.col("sz").alias("s1")), "d1")
           .join(sizes.select(F.col("doc_id").alias("d2"),
                              F.col("sz").alias("s2")), "d2")
           .select("d1", "d2", "i", "s1", "s2"))
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    assert new.count() > 0
