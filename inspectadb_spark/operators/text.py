"""Text-analysis operators (SURVEY.md §2.2i — LLM-pipeline surface).

All built-ins (split/explode/regexp/length/md5): whole-stage codegen, no
Python in the hot path. Token-level aggregations are two-level (per-doc then
global) so the global shuffle moves counts, not tokens — the 100 TB pattern.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Common-subset regex (Java + RE2): word-ish / number / single punctuation.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_counts(docs: DataFrame, text_col: str = "text", top_n: int = 50) -> DataFrame:
    """Global top-N vocabulary by whitespace tokenization."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(top_n)
    )


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token accounting: whitespace tokens, BPE-ish regex tokens, and
    the chars/4 heuristic estimate used for budget planning."""
    return docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("n_ws"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)).alias("n_bpe"),
        F.ceil(F.length(F.col(text_col)) / 4).cast("bigint").alias("n_est"),
    )


def text_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is", "data"),
) -> DataFrame:
    """Heuristic quality features: token count, chars-per-token, stopword
    ratio, emitted as 4-dp doubles (portable). ``chars_per_tok`` is
    length(text)/n_tok — it INCLUDES the separator spaces (≈ mean token
    length + (n_tok−1)/n_tok), which is fine as a monotone quality signal
    but is not the space-free mean token length; ``quality_rules`` computes
    the space-free form where a Gopher-style threshold needs it."""
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    sw_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))

    def r4(c):
        return F.round(c.cast("decimal(18,6)"), 4).cast("double")

    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tok"),
        r4(F.length(F.col(text_col)).cast("double") / n_tok).alias("chars_per_tok"),
        r4(n_stop.cast("double") / n_tok).alias("stop_ratio"),
    )


# Marker lexicons per language — the classic cheap language-ID heuristic
# (score = hits against disjoint high-frequency marker sets, predict the
# argmax). Two lexicons ship:
#
# LANG_MARKERS_NATURAL (the DEFAULT): real high-frequency function words
# per language, disjoint across the five sets. This is what a user pointing
# lang_id at an arbitrary corpus should get — on real English/German/…
# prose the right language's stopwords dominate.
#
# LANG_MARKERS_CORPUS: DISJOINT 6-word partitions of the test corpus' own
# 31-word engine vocabulary. The test fixture's documents are an
# engine-term word salad in which real German/Spanish/French/Chinese
# function words can never occur, so with natural markers every non-English
# score was identically 0 at every SF and the multi-class scoring + argmax
# + tie chain was dead code (the q326 degeneracy class, caught by the
# round-9 oracle-constant sweep). The q45f query site passes this lexicon
# EXPLICITLY so the fixture exercises every arm; it is a test artifact,
# never a default.
#
# Both are ordered tuples: the CASE chain below evaluates in this order,
# so ties break deterministically toward the earlier (lexicographic)
# language in BOTH engines.
LangMarkers = tuple[tuple[str, tuple[str, ...]], ...]

LANG_MARKERS_NATURAL: LangMarkers = (
    ("de", ("der", "die", "und", "nicht", "ist", "das")),
    ("en", ("the", "and", "of", "to", "is", "that")),
    ("es", ("que", "los", "las", "por", "una", "para")),
    ("fr", ("les", "des", "une", "est", "dans", "pas")),
    ("zh", ("的", "是", "了", "在", "我", "不")),
)

LANG_MARKERS_CORPUS: LangMarkers = (
    ("de", ("agg", "batch", "column", "merge", "sort", "window")),
    ("en", ("the", "a", "data", "query", "table", "row")),
    ("es", ("customer", "filter", "group", "hash", "join", "key")),
    ("fr", ("line", "order", "part", "scan", "stream", "vector")),
    ("zh", ("big", "dup", "fast", "slow", "small", "value")),
)


def lang_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    markers: LangMarkers = LANG_MARKERS_NATURAL,
) -> DataFrame:
    """Heuristic language-ID: score = marker-token hits per language, predict
    the argmax (ties → lexicographically first language, 'und' = undetermined
    when no marker hits at all). ``markers`` defaults to natural stopword
    lexicons (LANG_MARKERS_NATURAL); pass a corpus-specific lexicon only when
    the corpus genuinely has its own vocabulary. Pure codegen: split + array
    filter + CASE — at 100 TB this is a single scan-side projection, no
    shuffle."""
    toks = F.split(F.col(text_col), " ")

    # NB: the lambda must take exactly ONE parameter — F.filter treats a
    # second parameter as the element index — so close over the marker array
    # via a factory, not a default argument.
    def _hits(arr):
        return lambda t: F.array_contains(arr, t)

    scores = {}
    for lang, words in markers:
        arr = F.array(*[F.lit(m) for m in words])
        scores[lang] = F.size(F.filter(toks, _hits(arr)))
    langs = [lang for lang, _ in markers]
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    out = docs.select(
        F.col(id_col),
        *[scores[lang].alias(f"s_{lang}") for lang in langs],
        pred.alias("pred_lang"),
    )
    return out


def char_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                     gram: int = 8) -> DataFrame:
    """Deterministic document fingerprint: min md5 over sliding character
    k-grams (winnowing-style min-sampling with window = whole doc).

    r13: a pure projection — ``array_min`` over the transform'd gram
    array replaces the explode + groupBy-min, removing a full shuffle of
    the gram stream from every consumer (q45e/q222/q223/q237/q252/q253);
    min over the same md5 set is order-insensitive, so the fingerprint
    is byte-identical. The scan spreads when it is a single split."""
    from inspectadb_spark.operators.scale import spread_small_scan

    return spread_small_scan(
        docs.filter(F.length(F.col(text_col)) >= gram)
        .select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        F.array_min(F.expr(
            f"transform(sequence(1, length({text_col}) - {gram - 1}),"
            f" i -> md5(substring({text_col}, i, {gram})))")).alias("fp"),
    )


def word_ngrams(docs: DataFrame, n: int = 5, text_col: str = "text",
                id_col: str = "doc_id", distinct: bool = True,
                extra_cols: Sequence = ()) -> DataFrame:
    """Word n-grams per document: (id_col, *extra_cols, gram) — distinct
    by default (set membership for dedup/contamination);
    ``distinct=False`` keeps multiplicity (the full gram stream, for
    frequency-domain operators like heavy hitters). ``extra_cols``
    carries doc-level columns (or column expressions over ``docs``)
    through the explode, so callers that need per-gram metadata don't
    re-join ``docs`` onto its own gram stream — that self-join costs a
    second scan of the corpus (r13).

    Built entirely from JVM higher-order functions (sequence → transform →
    slice → array_join), so gram construction stays inside whole-stage
    codegen — no Python in the path. Docs shorter than ``n`` tokens emit
    nothing (sequence would run backwards on a negative span, so it is
    guarded with a when()).

    r13: the doc tokenizes ONCE into a hoisted column — referencing
    ``split(text)`` inside the transform lambda re-ran the split at
    every gram position, O(len²) per doc. Same values (pure CSE).
    """
    pre = docs.select(F.col(id_col), *extra_cols,
                      F.split(F.col(text_col), " ").alias("_ws"))
    toks = F.col("_ws")
    span = F.size(toks) - F.lit(n)  # last 0-based start index
    grams = F.when(
        span >= 0,
        F.transform(
            F.sequence(F.lit(0), span),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    keep = [c for c in pre.columns if c != "_ws"]
    out = pre.select(*keep, F.explode(grams).alias("gram"))
    return out.distinct() if distinct else out


def ngram_contamination(docs: DataFrame, benchmark: DataFrame, n: int = 5,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: per-doc count of distinct word n-grams that
    also appear in ``benchmark`` (the held-out eval set).

    Scale shape (100 TB corpus, small benchmark): the benchmark gram set is
    broadcast, so the corpus side is a single scan + map-side semi probe —
    the only shuffle is the per-doc count aggregation. Returns
    (id_col, n_grams, n_shared, share_rate) for contaminated docs only.
    """
    doc_grams = word_ngrams(docs, n=n, text_col=text_col, id_col=id_col)
    bench_grams = word_ngrams(benchmark, n=n, text_col=text_col, id_col=id_col) \
        .select("gram").distinct().withColumn("_hit", F.lit(1))
    # One pass: broadcast LEFT join marks shared grams, a single per-doc agg
    # yields both counts — 2 shuffles total (gram distinct, doc rollup)
    # instead of recomputing the gram set per branch.
    marked = doc_grams.join(F.broadcast(bench_grams), "gram", "left")
    # exact ints -> IEEE double division -> exact-decimal round: engine-stable
    rate = (F.col("n_shared").cast("double") / F.col("n_grams")).cast("decimal(18,6)")
    return (
        marked.groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.count("_hit").alias("n_shared"))
        .filter(F.col("n_shared") > 0)
        .select(
            F.col(id_col), "n_grams", "n_shared",
            F.round(rate, 4).cast("double").alias("share_rate"),
        )
    )


def redact(docs: DataFrame, patterns: list[tuple[str, str]],
           text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII/secret redaction: apply (regex, replacement) pairs in order and
    count total hits. Pure ``regexp_replace``/``regexp_count`` — JVM regex,
    no UDF — so it runs at scan speed on a 100 TB corpus (narrow, no shuffle).

    Returns (id_col, n_hits, redacted).
    """
    red = F.col(text_col)
    hits = F.lit(0).cast("long")
    for pat, rep in patterns:
        hits = hits + F.regexp_count(red, F.lit(pat))
        red = F.regexp_replace(red, pat, rep)
    return docs.select(F.col(id_col), hits.alias("n_hits"), red.alias("redacted"))


def corpus_frequency_score(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Corpus-statistics quality score: mean corpus frequency of a doc's
    tokens (a deterministic stand-in for unigram-LM perplexity — higher means
    the doc is made of commoner tokens).

    Two aggregations: (1) global token counts — map-side partial combine, one
    shuffle on token; (2) per-doc mean — the vocabulary table is tiny
    relative to the corpus (Heaps' law), so the freq join is broadcast and
    the only other shuffle is the per-doc aggregation. Mean is computed via
    exact DECIMAL sums so the result is partial-agg-order independent.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    return (
        toks.join(F.broadcast(freq), "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("c").cast("decimal(18,6)")).alias("_s"),
        )
        .select(
            F.col(id_col), "n_tokens",
            F.round((F.col("_s").cast("double") / F.col("n_tokens"))
                    .cast("decimal(18,6)"), 4).cast("double").alias("mean_tok_freq"),
        )
    )


def boilerplate_score(
    docs: DataFrame,
    n: int = 2,
    min_df_num: int = 1,
    min_df_den: int = 4,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document template/boilerplate fraction: the share of a doc's
    DISTINCT word ``n``-grams that are "boilerplate" within its group —
    appearing in at least ``min_df_num/min_df_den`` of the group's
    documents (pure-integer rule ``df * den >= n_docs * num``, no float
    threshold). High scores flag navigation chrome, license headers and
    shared templates — the within-source cousin of the cross-corpus
    contamination check (``ngram_contamination``).

    Plan/scale: one gram explode (distinct-per-doc first, so df counts
    docs not occurrences); the per-(group, gram) document frequency is a
    COUNT WINDOW over the same partitioning instead of a groupBy branch
    joined back — the r13 branch-divergence fix: the old join-back
    re-evaluated the whole gram explode for the df branch (two corpus
    passes), the window reads the one shuffled gram stream in place.
    Group doc-counts broadcast; one per-doc agg. No all-pairs anything;
    shuffles are on uniform gram keys. Same integer rule, same values
    (q129 oracle MATCH re-proved).
    """
    from pyspark.sql import Window

    from inspectadb_spark.operators.scale import spread_small_scan

    toks = F.col("_ws")
    span = F.size(toks) - F.lit(n)
    grams = F.when(
        span >= 0,
        F.transform(
            F.sequence(F.lit(0), span),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = spread_small_scan(
        docs.select(F.col(id_col), F.col(group_col),
                    F.split(F.col(text_col), " ").alias("_ws"))
    ).select(
        F.col(id_col), F.col(group_col),
        F.explode(F.array_distinct(grams)).alias("gram"),
    )
    nd = docs.groupBy(group_col).agg(F.countDistinct(id_col).alias("_n"))
    wdf = Window.partitionBy(group_col, "gram")
    scored = (
        ex.withColumn("_d", F.count("*").over(wdf))
        .join(F.broadcast(nd), group_col)
        .withColumn(
            "_isbp",
            F.when(F.col("_d") * min_df_den >= F.col("_n") * min_df_num,
                   F.lit(1)))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.count("_isbp").alias("n_bp"),
            F.round(
                (F.count("_isbp") * F.lit(1.0) / F.count("*"))
                .cast("decimal(18,6)"), 4
            ).cast("double").alias("bp_frac"),
        )
        .orderBy(id_col)
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Unigram language-model quality score (CCNet-style perplexity proxy):
    per-document mean log-probability of its tokens under the corpus's own
    unigram distribution. Low scores flag gibberish / rare-token soup; high
    scores flag documents made of common language.

    Determinism: each token's log-probability is quantized BEFORE the
    per-doc sum — the probe-verified two-step (cast DECIMAL(18,6), then
    ROUND(…,4): the two spare digits absorb the engines' double→decimal
    rounding-mode difference) — so the aggregate is an exact decimal total,
    independent of partial-aggregation order on both engines. (A raw double
    sum would differ between Spark's and DuckDB's reduction trees.)

    Scale shape (100 TB): vocabulary count is one token-key shuffle with
    map-side combine; the vocabulary table is Heaps'-law small, so the
    score join is broadcast; one final per-doc aggregation. Returns
    (id_col, n_tokens, mean_logprob) with mean_logprob rounded to 4 dp.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("tot"))
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(
                F.log(F.col("c").cast("double") / F.col("tot"))
                .cast("decimal(18,6)"), 4
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"), F.sum("lp").alias("_s"))
        .select(
            F.col(id_col), "n_tokens",
            F.round((F.col("_s").cast("double") / F.col("n_tokens"))
                    .cast("decimal(18,6)"), 4)
            .cast("double").alias("mean_logprob"),
        )
    )


def bigram_logprob(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", lam: float = 0.7) -> DataFrame:
    """Interpolated bigram language-model score (the next step up from
    ``unigram_logprob``): per-document mean log-probability of each token
    given its predecessor, p = λ·c(prev,cur)/c(prev) + (1−λ)·c(cur)/total.
    Interpolation with the unigram model means unseen bigrams never hit
    log(0); the first token of each document is unscored (no context).

    Determinism: identical arithmetic expression text on both engines
    (double IEEE ops bind left-to-right), per-token quantization before the
    per-doc sum — the q132 two-step (DECIMAL(18,6) cast then ROUND 4).

    Scale shape: bigram pairs come from the token ARRAY by index (zero
    shuffle — no window/lag needed); the bigram and unigram count tables
    are Heaps'-law bounded and broadcast; one final per-doc rollup.
    """
    tk = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("tk"))
    toks = tk.select(F.col(id_col), F.explode("tk").alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c1"))
    total = toks.agg(F.count("*").alias("tot"))
    bi = (
        tk.filter(F.size("tk") >= 2)
        .select(
            F.col(id_col),
            F.expr("explode(sequence(2, size(tk)))").alias("i"),
            F.col("tk"),
        )
        .select(
            F.col(id_col),
            F.expr("element_at(tk, i - 1)").alias("prev"),
            F.expr("element_at(tk, i)").alias("cur"),
        )
    )
    c2 = bi.groupBy("prev", "cur").agg(F.count("*").alias("c2"))
    scored = (
        bi.join(F.broadcast(c2), ["prev", "cur"])
        .join(F.broadcast(vocab.withColumnRenamed("tok", "prev")
                          .withColumnRenamed("c1", "c1p")), "prev")
        .join(F.broadcast(vocab.withColumnRenamed("tok", "cur")
                          .withColumnRenamed("c1", "c1c")), "cur")
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(
                # CAST the λ literals to DOUBLE: a bare 0.7 parses as DECIMAL
                # in both dialects but their decimal-arithmetic scale rules
                # differ; doubles make the whole chain IEEE left-assoc.
                # repr(), not :.1f — rounding the unigram weight to one
                # decimal made any lam off the 0.1 grid a silently
                # mis-normalized model (0.75 -> weights 0.75 + 0.2)
                F.expr(f"ln(CAST({lam!r} AS DOUBLE) * c2 / c1p"
                       f" + CAST({1.0 - lam!r} AS DOUBLE) * c1c / tot)")
                .cast("decimal(18,6)"), 4
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp").alias("_s"))
        .select(
            F.col(id_col), "n_bigrams",
            F.round((F.col("_s").cast("double") / F.col("n_bigrams"))
                    .cast("decimal(18,6)"), 4)
            .cast("double").alias("mean_logprob"),
        )
    )


def ngram_novelty(docs: DataFrame, n: int = 5, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Incremental-corpus novelty: the fraction of a document's DISTINCT
    word n-grams that it introduces to the corpus — i.e. grams whose
    minimum doc_id equals this doc. In an append-ordered corpus this is the
    "how much new content does this shard add" curation signal (the
    complement of cross-shard duplication).

    Scale shape: one gram-key shuffle for min(doc_id) (map-side combine on
    uniform md5-free string keys), then the gram stream joins its own
    first-seen table on the SAME gram key — co-partitioned, no extra
    exchange under AQE — and one per-doc rollup. No all-pairs comparison.
    """
    grams = word_ngrams(docs, n=n, text_col=text_col, id_col=id_col)
    first = grams.groupBy("gram").agg(F.min(F.col(id_col)).alias("_first"))
    return (
        grams.join(first, "gram")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.count(F.when(F.col("_first") == F.col(id_col), 1)).alias("n_novel"),
        )
        .select(
            F.col(id_col), "n_grams", "n_novel",
            F.round((F.col("n_novel") * F.lit(1.0) / F.col("n_grams"))
                    .cast("decimal(18,6)"), 4).cast("double").alias("novelty"),
        )
    )


def source_divergence(docs: DataFrame, group_col: str = "source",
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-group distribution diagnostics for mixture monitoring: unigram
    entropy of each group and its KL divergence from the whole-corpus
    unigram distribution. Rising KL flags a source drifting away from the
    corpus mix (or a broken extractor); entropy flags template collapse.

    Determinism: every per-term contribution is computed from exact integer
    counts in double (one ln call), quantized to DECIMAL(18,6) BEFORE the
    per-group sum — aggregation-order-exact on both engines, same recipe as
    ``unigram_logprob``.

    Scale shape (100 TB): the raw token stream is exploded and shuffled
    ONCE, into the (group, token) counts; group totals, the vocabulary and
    the corpus total are all rollups of that already-aggregated (and
    reused) table — orders of magnitude smaller than the corpus. The tiny
    sides broadcast back; one per-group rollup of quantized decimals.
    Nothing all-pairs, nothing driver-side. Returns
    (group_col, n_tokens, entropy, kl_corpus), both measures in nats
    rounded to 4 dp.
    """
    # The explicit isNotNull mirrors what the inner joins below would infer
    # anyway — stating it up front keeps every branch's (group, tok) agg
    # subtree byte-identical, so Catalyst's exchange reuse collapses the
    # corpus-sized shuffle to ONE (ReusedExchange elsewhere).
    toks = docs.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    grp_term = toks.groupBy(group_col, "tok").agg(F.count("*").alias("c_gt"))
    grp_tot = grp_term.groupBy(group_col).agg(F.sum("c_gt").alias("n_g"))
    vocab = grp_term.groupBy("tok").agg(F.sum("c_gt").alias("c_t"))
    total = grp_tot.agg(F.sum("n_g").alias("n"))

    p_gt = F.col("c_gt").cast("double") / F.col("n_g")
    # KL term: p_gt * ln(p_gt / p_t) with p_t = c_t / N, all from exact ints
    kl_term = p_gt * F.log(
        (F.col("c_gt").cast("double") * F.col("n"))
        / (F.col("n_g").cast("double") * F.col("c_t"))
    )
    h_term = -p_gt * F.log(p_gt)
    scored = (
        grp_term.join(F.broadcast(grp_tot), group_col)
        .join(F.broadcast(vocab), "tok")
        .join(F.broadcast(total))
        .select(
            F.col(group_col), F.col("n_g"),
            h_term.cast("decimal(18,6)").alias("h"),
            kl_term.cast("decimal(18,6)").alias("kl"),
        )
    )
    return (
        scored.groupBy(group_col)
        .agg(
            F.max("n_g").alias("n_tokens"),
            F.round(F.sum("h"), 4).cast("double").alias("entropy"),
            F.round(F.sum("kl"), 4).cast("double").alias("kl_corpus"),
        )
    )


def vocabulary_growth(docs: DataFrame, n: int = 1, text_col: str = "text",
                      id_col: str = "doc_id",
                      bucket_width: int = 1024) -> DataFrame:
    """Vocabulary growth curve (Heaps'-law empirics) at token (``n=1``) or
    word-n-gram granularity: for each document that introduces at least one
    gram never seen in any earlier document (by id order), the number it
    introduces and the cumulative vocabulary size after it. The curve's
    flattening is the classic diminishing-returns signal for corpus
    acquisition.

    Scale shape: token → min(doc_id) ownership is one map-side-combinable
    shuffle; the growth frame then has at most one row per document (not
    per token) — still corpus-doc cardinality, so the cumulative sum uses
    the bucket-offset scheme (the ``scale.global_rank`` pattern): bucket
    = first_doc DIV ``bucket_width``; each bucket's carry-in is the
    strict-prefix sum over the BUCKET table (bounded: one row per
    ``bucket_width`` ids); the within-bucket running sum is a properly
    partitioned window. Only per-bucket totals cross the single-partition
    exchange — doc-cardinality rows never enter an unpartitioned window.
    Bit-identical to the naive global running sum (parity-tested).
    """
    from pyspark.sql import Window

    if n <= 1:
        grams = docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("gram"))
    else:
        grams = word_ngrams(docs, n=n, text_col=text_col, id_col=id_col)
    first = grams.groupBy("gram").agg(F.min(F.col(id_col)).alias("first_doc"))
    growth = first.groupBy("first_doc").agg(F.count("*").alias("n_new"))
    b = growth.withColumn("_bkt", F.expr(f"first_doc DIV {bucket_width}"))
    bsum = b.groupBy("_bkt").agg(F.sum("n_new").alias("_bn"))
    wprev = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    carry = bsum.withColumn(
        "_carry",
        F.coalesce(F.sum("_bn").over(wprev), F.lit(0).cast("bigint")),
    ).drop("_bn")
    win = (Window.partitionBy("_bkt").orderBy("first_doc")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        b.join(F.broadcast(carry), "_bkt")
        .withColumn("vocab_size", F.col("_carry") + F.sum("n_new").over(win))
        .select(F.col("first_doc").alias(id_col), "n_new", "vocab_size")
    )


def pmi_collocations(docs: DataFrame, text_col: str = "text",
                     min_count: int = 5, k: int = 50) -> DataFrame:
    """PMI-scored bigram collocations (word2phrase-style phrase mining):
    the corpus's top-k adjacent word pairs by pointwise mutual information
    pmi = ln(c_xy * N^2 / (c_x * c_y * M)) — pairs that co-occur far more
    often than their unigram frequencies predict. This is the standard
    phrase-vocabulary miner run before tokenizer training.

    Determinism: the ln argument is ONE double expression with identical
    text on both engines (IEEE left-assoc chain), rounded via the q63
    two-step (DECIMAL(18,6) cast then ROUND 4); ranking is by the rounded
    score with a (w1, w2) lexical tiebreak, so top-k membership and order
    are engine-invariant. ``min_count`` screens the unstable low-count
    tail (the classic PMI failure mode).

    Scale shape (100 TB): bigram pairs come from the token array by index
    (zero shuffle); one map-side-combinable count per table; the unigram
    table is Heaps'-law small and broadcast onto the bigram counts (which
    are filtered to >= min_count FIRST, so the join input is the filtered
    stream); global top-k is TakeOrderedAndProject — no full sort.
    """
    tk = docs.select(F.split(F.col(text_col), " ").alias("tk"))
    toks = tk.select(F.explode("tk").alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c1"))
    # the corpus is scanned exactly TWICE (unigram counts, bigram counts);
    # both totals are rollups of those small aggregate tables, never
    # additional data-sized passes
    n_tok = vocab.agg(F.sum("c1").alias("n_uni"))
    bi = (
        tk.filter(F.size("tk") >= 2)
        .select(F.expr("explode(sequence(2, size(tk)))").alias("i"), "tk")
        .select(
            F.expr("element_at(tk, i - 1)").alias("w1"),
            F.expr("element_at(tk, i)").alias("w2"),
        )
    )
    c2_all = bi.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    n_bi = c2_all.agg(F.sum("n_pair").alias("n_bi"))
    c2 = c2_all.filter(F.col("n_pair") >= min_count)
    scored = (
        c2.join(F.broadcast(vocab.select(F.col("tok").alias("w1"),
                                         F.col("c1").alias("c1a"))), "w1")
        .join(F.broadcast(vocab.select(F.col("tok").alias("w2"),
                                       F.col("c1").alias("c1b"))), "w2")
        .join(F.broadcast(n_tok))
        .join(F.broadcast(n_bi))
        .select(
            "w1", "w2", "n_pair",
            F.round(
                F.expr("ln(CAST(n_pair AS DOUBLE) * n_uni / c1a / c1b"
                       " * n_uni / n_bi)").cast("decimal(18,6)"), 4
            ).cast("double").alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1"), F.col("w2")).limit(k)


def blocklist_matches(
    docs: DataFrame,
    patterns: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pat_col: str = "pat",
) -> DataFrame:
    """Multi-pattern substring screening (safety blocklists, PII phrase
    lists, benchmark-canary strings): every (doc, pattern, occurrence
    count) for patterns that literally occur in the text.

    Occurrence counting is the replace-length identity —
    (len(text) − len(replace(text, pat, ''))) / len(pat) — standard
    non-overlapping left-to-right semantics, identical in Spark and
    DuckDB, entirely inside whole-stage codegen.

    Scale shape (100 TB): the pattern list is broadcast (blocklists are
    KBs–MBs) and the join is a scan-side BroadcastNestedLoopJoin — the
    corpus is never shuffled; output carries only actual hits. Past ~10k
    patterns the per-pattern contains() scan loses to a single automaton
    pass: swap the join for an Aho–Corasick trie in mapInPandas (build
    the trie once per executor from the broadcast list), keeping this
    exact relational form as the verification oracle.
    """
    t, p = F.col(text_col), F.col(pat_col)
    return (
        docs.join(F.broadcast(patterns), t.contains(p))
        .select(
            F.col(id_col), p.alias(pat_col),
            ((F.length(t) - F.length(F.replace(t, p, F.lit(""))))
             / F.length(p)).cast("bigint").alias("n_occ"),
        )
        .orderBy(id_col, pat_col)
    )


def blocklist_matches_automaton(
    docs: DataFrame,
    patterns: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Aho–Corasick form of ``blocklist_matches`` — the scale path for BIG
    pattern lists (>~10k), where N per-pattern contains() scans lose to ONE
    automaton pass over each document.

    The trie + failure links are built once per Python worker from the
    broadcast pattern list (build cost O(Σ|pat|), amortized across the
    partition's Arrow batches); matching is O(|text|) per document
    regardless of pattern count. Occurrence counts are post-filtered to the
    greedy non-overlapping left-to-right rule so the output is ROW-IDENTICAL
    to the relational replace-length form (parity-tested) — the relational
    form stays the correctness oracle.
    """
    import pandas as pd

    pats = sorted(set(patterns))

    def build():
        # trie: node -> {char: node}; out: node -> [pattern ids]; fail links
        trie = [{}]
        out: dict[int, list[int]] = {}
        for pid, p in enumerate(pats):
            node = 0
            for ch in p:
                node = trie[node].setdefault(ch, len(trie)) \
                    if trie[node].get(ch) is None else trie[node][ch]
                if node == len(trie):
                    trie.append({})
            out.setdefault(node, []).append(pid)
        from collections import deque
        fail = [0] * len(trie)
        q = deque()
        for node in trie[0].values():
            q.append(node)
        while q:
            u = q.popleft()
            for ch, v in trie[u].items():
                q.append(v)
                f = fail[u]
                while f and ch not in trie[f]:
                    f = fail[f]
                fail[v] = trie[f].get(ch, 0) if trie[f].get(ch, 0) != v else 0
                out.setdefault(v, [])
                out[v] = out[v] + out.get(fail[v], [])
        return trie, fail, out

    def scan(batches):
        trie, fail, out = build()
        for pdf in batches:
            ids, hit_pats, hit_ends = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                ends: dict[int, list[int]] = {}
                node = 0
                for i, ch in enumerate(text):
                    while node and ch not in trie[node]:
                        node = fail[node]
                    node = trie[node].get(ch, 0)
                    for pid in out.get(node, ()):
                        ends.setdefault(pid, []).append(i)
                for pid, es in ends.items():
                    # greedy non-overlapping from the left (replace-rule
                    # parity): accept an end only if the match start is
                    # past the previously accepted end
                    plen, last, n = len(pats[pid]), -1, 0
                    for e in es:
                        if e - plen + 1 > last:
                            n += 1
                            last = e
                    ids.append(did)
                    hit_pats.append(pats[pid])
                    hit_ends.append(n)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype=object),
                 "pat": hit_pats, "n_occ": pd.Series(hit_ends, dtype="int64")})

    # id column keeps the INPUT's own type (a hardcoded 'long' broke the
    # advertised row-identical parity with the relational form for any
    # string/decimal doc id)
    id_type = docs.schema[id_col].dataType.simpleString()
    return (
        docs.select(id_col, text_col)
        .mapInPandas(scan, f"{id_col} {id_type}, pat string, n_occ long")
        .orderBy(id_col, "pat")
    )


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-doc deflate compression ratio in ppm — the classic cheap
    repetitiveness signal (boilerplate and template spam compress far
    better than natural text; quality-filter stacks threshold on it).

    zlib at a FIXED level is deterministic for a given library build, but
    it is not an engine-portable function, so this ships as an
    Arrow-batched pandas UDF and its queries are rows-only; the pure
    relational repetition signals (q66 repeated n-grams, q129
    boilerplate) remain the oracle-class alternatives. Scan-side
    projection: zero shuffle at any scale.
    """
    from pyspark.sql.functions import pandas_udf

    # NB: lambda form — `from __future__ import annotations` makes hints
    # strings, and a locally-imported pd can't be resolved by pandas_udf
    def _comp(s):
        import zlib

        return s.map(lambda t: len(zlib.compress(t.encode("utf-8"), level))
                     if t is not None else None)

    comp_len = pandas_udf(lambda s: _comp(s), "long")

    out = docs.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        comp_len(F.col(text_col)).alias("n_compressed"),
    )
    return out.withColumn(
        "ratio_ppm",
        F.expr("CASE WHEN n_chars > 0 THEN n_compressed * 1000000"
               " DIV n_chars ELSE NULL END"))


def quality_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to", "in",
                                 "is", "data"),
) -> DataFrame:
    """Gopher-style quality-rule bitmask per document — each bit is one
    failed rule, all expressible as codegen projections (one scan, no
    shuffle, no Python):

      bit 1: fewer than 10 whitespace tokens
      bit 2: mean token length outside [3, 10] characters
      bit 4: fewer than 2 stopword hits
      bit 8: most frequent token exceeds 20% of tokens (repetition)
      bit 16: distinct-token ratio below 30% (template spam)

    Returns (id, n_tok, rule_mask); rule_mask = 0 is a pass. Thresholds
    follow the published Gopher/C4 heuristics adapted to the whitespace
    tokenizer; integer arithmetic only.
    """
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    # total chars across tokens = len(text) - (n_tok - 1) separators;
    # mean-length bounds are cross-multiplied so the rule is pure-integer
    tok_chars = F.length(text_col) - (n_tok - 1)
    top_tok = F.array_max(
        F.transform(F.array_distinct(toks),
                    lambda t: F.size(F.filter(toks, lambda x: x == t))))
    n_distinct = F.size(F.array_distinct(toks))
    mask = (
        F.when(n_tok < 10, 1).otherwise(0)
        + F.when((tok_chars * 10 < 30 * n_tok)
                 | (tok_chars * 10 > 100 * n_tok), 2).otherwise(0)
        + F.when(n_stop < 2, 4).otherwise(0)
        + F.when(top_tok * 5 > n_tok, 8).otherwise(0)
        + F.when(n_distinct * 10 < n_tok * 3, 16).otherwise(0)
    )
    return docs.select(F.col(id_col), n_tok.alias("n_tok"),
                       mask.cast("int").alias("rule_mask"))


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Zipf's-law fit per group: OLS slope/intercept of ln(frequency) on
    ln(rank) over the group's token-frequency table — the corpus-health
    audit that flags template spam (slope near 0: flat head) and synthetic
    token soup (slope far below -1) before expensive curation runs.

    Determinism across engines: ln() terms and their products are quantized
    to DECIMAL before the per-group summation (exact, associative — the
    same convention as source_divergence), so the OLS sufficient statistics
    are aggregation-order-proof; the final closed-form slope is a handful
    of scalar double ops on those exact sums, identical in any engine.

    Scale shape (100 TB): one explode + one (group, token) groupBy builds
    the frequency table (vocab-sized, << corpus-sized); ranking is a
    window over vocab rows partitioned by group (per-group vocab fits a
    partition at any text scale — it grows ~Heaps' law, sublinearly); the
    fit itself is a per-group agg of 5 decimal sums.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.desc("c"), F.asc("tok"))
    freq = (
        docs.select(F.col(group_col).alias("g"),
                    F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy("g", "tok").agg(F.count("*").alias("c"))
    )
    x = F.log(F.col("rnk").cast("double")).cast("decimal(18,6)")
    y = F.log(F.col("c").cast("double")).cast("decimal(18,6)")
    q = (
        freq.withColumn("rnk", F.row_number().over(w))
        .select(
            "g", "c", x.alias("x"), y.alias("y"),
            (x * y).cast("decimal(38,12)").alias("xy"),
            (x * x).cast("decimal(38,12)").alias("xx"),
        )
    )
    s = q.groupBy("g").agg(
        F.count("*").alias("n_types"),
        F.sum("c").alias("n_tokens"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"), F.sum("xx").alias("sxx"),
    )
    n = F.col("n_types").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    slope = (n * F.col("sxy").cast("double") - sx * sy) / F.nullif(
        n * F.col("sxx").cast("double") - sx * sx, F.lit(0.0))
    intercept = (sy - slope * sx) / n
    from inspectadb_spark.queries.registry import r4c

    return s.select(
        F.col("g").alias(group_col), "n_types", "n_tokens",
        r4c(slope).alias("zipf_slope"),
        r4c(intercept).alias("zipf_intercept"),
    )


def token_entropy(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document token (Shannon) entropy in bits — the lexical-diversity
    feature that separates natural text (high entropy) from template spam
    and keyword stuffing (low entropy at the same length). Computed as
    H = log2(n) - (Σ c·log2 c)/n over the doc's token counts, plus the
    ratio to the max possible (log2 of the distinct-token count) in ppm.

    Determinism: each type's c·log2(c) term is quantized (DECIMAL(18,6) →
    ROUND 4, the unigram_logprob two-step) BEFORE the per-doc sum, so the
    aggregate is an exact decimal total independent of aggregation order;
    the final H is rounded to 4 dp.

    Scale shape (100 TB): one (doc, token) count — a single map-side-
    combinable shuffle on the doc id (token counting happens inside the
    same aggregation) — then a per-doc fold. Nothing corpus-global.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    counts = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    term = F.round(
        (F.col("c").cast("double") * F.log2(F.col("c").cast("double")))
        .cast("decimal(18,6)"), 4)
    per_doc = counts.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(term).alias("_clogc"))
    h = (F.log2(F.col("n_tokens").cast("double"))
         - F.col("_clogc").cast("double") / F.col("n_tokens"))
    hmax = F.log2(F.col("n_types").cast("double"))
    # 4dp-quantized integers (×10000) so the ratio is a floor DIV on
    # exact integers — decimal→bigint CASTS round in DuckDB but truncate
    # in Spark, so the quantize-then-DIV form is the engine-exact one
    hq = (F.round(h.cast("decimal(18,6)"), 4) * 10000).cast("bigint")
    hmaxq = (F.round(hmax.cast("decimal(18,6)"), 4) * 10000).cast("bigint")
    return per_doc.select(
        F.col(id_col), "n_tokens", "n_types",
        F.round(h.cast("decimal(18,6)"), 4).cast("double").alias("entropy"),
        hq.alias("_hq"), hmaxq.alias("_hmaxq"),
    ).select(
        F.col(id_col), "n_tokens", "n_types", "entropy",
        F.when(F.col("n_types") > 1,
               F.expr("_hq * 1000000 DIV _hmaxq"))
        .otherwise(F.lit(0)).cast("bigint").alias("norm_ppm"),
    )


def ngram_split_coverage(docs: DataFrame, n: int = 3,
                         train_pct: int = 80,
                         text_col: str = "text", id_col: str = "doc_id",
                         group_col: str = "source") -> DataFrame:
    """Train→test n-gram coverage: after the q252-style doc-level md5
    split, what share of each TEST doc's distinct n-grams appears
    anywhere in TRAIN? High coverage = the test split mostly re-measures
    memorizable spans; low coverage = genuine generalization pressure.
    The complement of decontamination (q75 removes overlap; this measures
    what overlap remains under a given split policy).

    Exact integers end to end: per-test-doc coverage in ppm, then the
    per-group mean as an integer ppm (sum DIV count). One gram-keyed
    shuffle for the semi-join; the train gram set is reduced to DISTINCT
    grams before probing.
    """
    nib = (f"instr('0123456789abcdef', substr(md5(CAST({id_col} AS STRING)"
           " || ':split'), 1, 1)) - 1")
    # nearest-nibble threshold: 80% -> 13/16 (the q252 split convention)
    split = F.when(F.expr(nib) < (train_pct * 16 + 50) // 100, "train") \
        .otherwise("test")
    # split/grp ride the gram stream as pass-through columns (both are
    # functions of the doc row), so the corpus is NOT re-joined onto its
    # own gram stream; and the coverage fold is ONE left join against the
    # distinct train-gram set with a match marker (fan-out-free), so the
    # test stream is consumed once instead of twice. documents scans for
    # q264: 6 -> 2 (train-gram distinct + test fold) (r13).
    grams = word_ngrams(
        docs, n=n, text_col=text_col, id_col=id_col,
        extra_cols=[split.alias("split"), F.col(group_col).alias("grp")])
    train_grams = (grams.filter(F.col("split") == "train")
                   .select("gram").distinct())
    per_doc = (
        grams.filter(F.col("split") == "test")
        .join(train_grams.withColumn("_m", F.lit(1)), "gram", "left")
        .groupBy(id_col, "grp")
        .agg(F.count("*").alias("n_grams"),
             F.count("_m").alias("n_cov"))
        .withColumn("cov_ppm", F.expr("n_cov * 1000000 DIV n_grams"))
    )
    return per_doc.groupBy(F.col("grp").alias(group_col)).agg(
        F.count("*").alias("n_test_docs"),
        F.sum("n_grams").alias("n_grams"),
        F.sum("n_cov").alias("n_covered"),
        F.expr("SUM(n_cov) * 1000000 DIV SUM(n_grams)").alias("coverage_ppm"),
        F.expr("SUM(cov_ppm) DIV COUNT(*)").alias("mean_doc_cov_ppm"),
    )


def heldout_unigram_xent(docs: DataFrame, train_pct: int = 80,
                         text_col: str = "text", id_col: str = "doc_id",
                         group_col: str = "source",
                         vocab_top_k: int | None = None) -> DataFrame:
    """Held-out cross-entropy per group under an add-1-smoothed unigram
    LM trained on the md5 doc split's TRAIN side (the q252/q264 split
    convention): for each TEST token, lp = ln((c+1)/(N+V+1)) with c the
    train count (0 for OOV), N the train token total, V the train vocab
    size (+1 reserves the OOV bucket). Reports per-source test-token
    mass, OOV rate in exact ppm, and the mean negative logprob in nats —
    the language-model-quality eval next to q132's in-corpus scoring and
    q264's coverage (this one measures what a model FIT on train pays on
    test, so split leakage shows up as suspiciously low xent).

    ``vocab_top_k`` truncates the model vocabulary to the K most frequent
    train unigrams (ties broken by token — a total, engine-portable
    order); tokens outside it score as OOV. This is the standard
    truncated-vocab LM design, and on a closed-vocabulary fixture it is
    what makes the OOV arm real: any split of a corpus whose whole vocab
    appears everywhere covers the test side completely, so untruncated
    n_oov is identically zero and the smoothing fallback is dead code.

    Determinism: the ln argument is ONE double expression with identical
    text on both engines; each token's lp is quantized to 4dp DECIMAL
    BEFORE summation (the q132 convention) so the fold is aggregation-
    order-exact; the final mean re-quantizes through the same two-step.

    Scale shape (100 TB): one map-side-combinable (tok) count over the
    train split; test tokens probe the vocab via a tok-keyed equi-join
    (co-partitioned with the count shuffle; Heaps'-law vocab — let AQE
    broadcast it when small); the (N, V) stats frame is one broadcast
    row; one group fold. Nothing pairwise, nothing driver-side.
    """
    nib = (f"instr('0123456789abcdef', substr(md5(CAST({id_col} AS STRING)"
           " || ':split'), 1, 1)) - 1")
    split = F.when(F.expr(nib) < (train_pct * 16 + 50) // 100, "train") \
        .otherwise("test")
    toks = docs.select(
        F.col(group_col).alias("grp"), split.alias("split"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    vocab = (toks.filter(F.col("split") == "train")
             .groupBy("tok").agg(F.count("*").alias("c")))
    if vocab_top_k is not None:
        vocab = vocab.orderBy(F.desc("c"), "tok").limit(vocab_top_k)
    stats = vocab.agg(F.sum("c").alias("nt"), F.count("*").alias("v"))
    scored = (
        toks.filter(F.col("split") == "test")
        .join(vocab, "tok", "left")
        .join(F.broadcast(stats))
        .select(
            "grp",
            F.col("c").isNull().cast("bigint").alias("oov"),
            F.expr("ROUND(CAST(ln((COALESCE(c, 0) + 1) * 1.0 /"
                   " (nt + v + 1)) AS DECIMAL(18,6)), 4)").alias("lp")))
    return scored.groupBy(F.col("grp").alias(group_col)).agg(
        F.count("*").cast("bigint").alias("n_test_tokens"),
        F.sum("oov").cast("bigint").alias("n_oov"),
        F.expr("CAST(SUM(oov) * 1000000 DIV COUNT(*) AS BIGINT)")
        .alias("oov_ppm"),
        F.expr("CAST(ROUND(CAST(CAST(-SUM(lp) AS DOUBLE) / COUNT(*)"
               " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("xent_nats"))


def js_divergence_pairs(docs: DataFrame, group_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every two groups'
    unigram distributions — the symmetric, bounded ([0, ln 2]) mixture
    distance ``source_divergence``'s one-sided KL cannot give: which
    sources are interchangeable and which are genuinely different, the
    input a mixture-weight optimizer (q126/q249) actually wants.

    Decomposition that avoids a vocab-level full outer join: with
    m = (p+q)/2, tokens present in only one side contribute exactly
    p·ln2 (since p·ln(p/(p/2)) = p·ln2), so

        JSD = ½·[ Σ_shared (p·ln(2p/(p+q)) + q·ln(2q/(p+q)))
                  + (1-Σ_shared p)·ln2 + (1-Σ_shared q)·ln2 ]

    needs ONE inner join on the token key plus each side's exact shared
    token mass. Determinism: per-shared-token terms are computed from
    exact integer counts in double (the ratio inside ln uses the
    integer cross products ca·nb / cb·na, so no intermediate division)
    and quantized to DECIMAL(18,6) before summation — aggregation-order
    exact on both engines (the ``source_divergence`` recipe); the
    only-mass remainder folds exact integer sums in one final
    expression.

    Scale shape (100 TB): the token stream shuffles once into (group,
    token) counts; the pair table is an equi-join on the token key
    between two copies of that already-aggregated table (|vocab| rows a
    side, never corpus rows), group totals broadcast back, and the
    output is |groups choose 2| rows."""
    toks = docs.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    gt = toks.groupBy("g", "tok").agg(F.count("*").alias("c"))
    tot = gt.groupBy("g").agg(F.sum("c").alias("n"))
    a = gt.select(F.col("g").alias("ga"), "tok", F.col("c").alias("ca"))
    b = gt.select(F.col("g").alias("gb"), "tok", F.col("c").alias("cb"))
    na = tot.select(F.col("g").alias("ga"), F.col("n").alias("na"))
    nb = tot.select(F.col("g").alias("gb"), F.col("n").alias("nb"))
    term = (
        "CAST((CAST(ca AS DOUBLE) / na)"
        " * ln(2.0 * ca * nb / (CAST(ca AS DOUBLE) * nb"
        "                       + CAST(cb AS DOUBLE) * na))"
        " + (CAST(cb AS DOUBLE) / nb)"
        " * ln(2.0 * cb * na / (CAST(ca AS DOUBLE) * nb"
        "                       + CAST(cb AS DOUBLE) * na))"
        " AS DECIMAL(18,6))")
    shared = (
        a.join(b, "tok").filter(F.col("ga") < F.col("gb"))
        .join(F.broadcast(na), "ga").join(F.broadcast(nb), "gb")
        .select("ga", "gb", "na", "nb", "ca", "cb",
                F.expr(term).alias("term")))
    agg = shared.groupBy("ga", "gb").agg(
        F.count("*").cast("bigint").alias("n_shared_vocab"),
        F.sum("term").alias("s"),
        F.sum("ca").cast("bigint").alias("sca"),
        F.sum("cb").cast("bigint").alias("scb"))
    # pair UNIVERSE from the (model-sized) group totals: a pair sharing
    # zero vocabulary produces no shared rows at all, and an inner-only
    # result would silently OMIT exactly the maximally-divergent pairs
    # (JSD = ln 2) the metric exists to surface — the remainder terms
    # fold the disjoint case correctly once the zero-shared row exists
    univ = (na.crossJoin(nb).filter(F.col("ga") < F.col("gb")))
    agg = (univ.join(agg, ["ga", "gb"], "left")
           .select("ga", "gb", "na", "nb",
                   F.coalesce("n_shared_vocab", F.lit(0)).cast("bigint")
                   .alias("n_shared_vocab"),
                   F.coalesce("s", F.lit(0).cast("decimal(18,6)")).alias("s"),
                   F.coalesce("sca", F.lit(0)).alias("sca"),
                   F.coalesce("scb", F.lit(0)).alias("scb")))
    jsd = ("0.5 * (CAST(s AS DOUBLE)"
           " + (1 - CAST(sca AS DOUBLE) / na) * ln(2)"
           " + (1 - CAST(scb AS DOUBLE) / nb) * ln(2))")
    return agg.select(
        F.col("ga").alias("source_a"), F.col("gb").alias("source_b"),
        "n_shared_vocab",
        F.round(F.expr(jsd).cast("decimal(18,6)"), 4).cast("double")
        .alias("jsd"),
        F.round(F.expr(f"({jsd}) / ln(2)").cast("decimal(18,6)"), 4)
        .cast("double").alias("jsd_norm"))
