"""Training-data pipeline operators (SURVEY.md §2.2i extension set):
TF-IDF term scoring, document chunking, deterministic hash sampling,
repetition scoring, corpus n-grams, and greedy sequence packing.

All but ``pack_sequences`` are pure built-in-function plans (JVM-side,
whole-stage-codegen); packing is inherently sequential per group, so it runs
as an Arrow-batched ``applyInPandas`` over a keyed repartition — the one
sanctioned Python hot path (SURVEY.md §2.2l policy).

Scale notes (100 TB): every operator here is embarrassingly parallel per
document except the corpus-wide aggregations (df counts in TF-IDF, n-gram
counts), which are classic two-phase map-side-combine aggs; packing shuffles
once on the group key and streams each group through a single pass.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

# Shared tokenizer fragment: split on single spaces, drop empty tokens
# (split semantics incl. empties verified identical Spark vs DuckDB).
_WORDS = "filter(split({col}, ' '), w -> w <> '')"


def words_col(text_col: str = "text") -> F.Column:
    return F.expr(_WORDS.format(col=text_col))


# --------------------------------------------------------------------------
def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document top-k terms by TF-IDF.

    score = tf * ln((N+1)/(df+1)) — smoothed IDF; exact integer tf/df and a
    single double multiply keep the value bit-identical across engines.
    Plan: one explode + two hash aggs (term-per-doc, doc-freq) + a broadcast
    of the tiny (term, df) side + WindowGroupLimit for the top-k.
    """
    n_docs = docs.count()  # scalar, one job; at scale: cheap count-star scan
    terms = (
        docs.select(F.col(id_col), F.explode(words_col(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_counts = terms.groupBy("term").agg(F.count("*").alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        terms.join(F.broadcast(df_counts), "term")
        .withColumn(
            "score",
            F.round(
                (F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)))
                .cast("decimal(18,6)"), 4
            ).cast("double"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )


# --------------------------------------------------------------------------
def chunk_documents(
    docs: DataFrame, size: int = 120, step: int = 90,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping character windows.

    Emits (id, chunk_idx, chunk, chunk_len). Start offsets are generated with
    ``sequence(1, length, step)`` and exploded — no Python, no UDF; output
    grows ~len/step per doc and stays partition-local (zero shuffle).
    """
    starts = F.explode(F.expr(f"sequence(1, length({text_col}), {step})")).alias("s")
    return (
        docs.select(F.col(id_col), F.col(text_col), starts)
        .select(
            id_col,
            # integer floor-div, NOT double-div + cast: DuckDB casts
            # double->int by rounding, Spark by truncation — // and DIV agree
            F.expr(f"CAST((s - 1) DIV {step} AS INT)").alias("chunk_idx"),
            F.expr(f"substr({text_col}, s, {size})").alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk"))
    )


# --------------------------------------------------------------------------
def hash_bucket(id_col: str = "doc_id", salt: str = "s1") -> F.Column:
    """First hex nibble of md5(id:salt) — a 16-bucket deterministic hash
    identical in Spark and DuckDB (verified byte-equal digests)."""
    return F.expr(
        f"substr(md5(cast(concat(cast({id_col} as string), ':{salt}') as binary)), 1, 1)"
    )


def hash_sample(
    docs: DataFrame, nibbles: str = "0123", id_col: str = "doc_id", salt: str = "s1"
) -> DataFrame:
    """Deterministic ~len(nibbles)/16 sample: keep rows whose hash nibble is
    in ``nibbles``. Reproducible across runs/engines/cluster sizes — the
    property random() sampling lacks; this is the sampler a training pipeline
    should use so re-runs select identical corpora."""
    return docs.filter(hash_bucket(id_col, salt).isin(*nibbles))


# --------------------------------------------------------------------------
def word_repetition(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signal: 1 - distinct_words/total_words."""
    w = words_col(text_col)
    return docs.select(
        F.col(id_col),
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
    ).withColumn(
        "rep_ratio",
        F.round(
            (1.0 - F.col("n_distinct") / F.col("n_words")).cast("decimal(18,6)"), 4
        ).cast("double"),
    )


# --------------------------------------------------------------------------
def top_ngrams(
    docs: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide top-k word n-grams: explode n-gram arrays, two-phase
    count agg, TakeOrderedAndProject for the top-k (no global sort)."""
    joined = " || ' ' || ".join(f"element_at(w, i + {j})" for j in range(n))
    grams = F.explode(
        F.expr(f"transform(sequence(1, size(w) - {n - 1}), i -> {joined})")
    ).alias("ngram")
    return (
        docs.select(F.expr(_WORDS.format(col=text_col)).alias("w"))
        .filter(F.size("w") >= n)
        .select(grams)
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "ngram")
        .limit(k)
    )


# --------------------------------------------------------------------------
_PACK_SCHEMA = StructType([
    StructField("lang", StringType()),
    StructField("bin_id", IntegerType()),
    StructField("n_docs", IntegerType()),
    StructField("total_tokens", LongType()),
])


def pack_sequences(
    docs: DataFrame, budget: int = 128,
    text_col: str = "text", id_col: str = "doc_id", group_col: str = "lang",
) -> DataFrame:
    """Greedy next-fit packing of documents into token-budget bins, per group.

    Docs are ordered by id within each group (deterministic), token counts
    are word counts, and a doc longer than the budget gets its own bin. This
    is the batch-shaping step before training: one shuffle on the group key,
    then a single sequential pass per group inside an Arrow batch.
    Returns per-bin accounting (group, bin_id, n_docs, total_tokens).
    """
    sized = docs.select(
        F.col(group_col).alias("lang"),
        F.col(id_col).alias("_id"),
        F.size(words_col(text_col)).alias("_tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")
        out, bin_id, used, n_in_bin = [], 0, 0, 0
        for tok in pdf["_tok"]:
            if n_in_bin and used + tok > budget:
                out.append((pdf["lang"].iloc[0], bin_id, n_in_bin, used))
                bin_id, used, n_in_bin = bin_id + 1, 0, 0
            used += int(tok)
            n_in_bin += 1
        if n_in_bin:
            out.append((pdf["lang"].iloc[0], bin_id, n_in_bin, used))
        return pd.DataFrame(out, columns=["lang", "bin_id", "n_docs", "total_tokens"])

    return sized.groupBy("lang").applyInPandas(pack, schema=_PACK_SCHEMA)


def select_until_budget(
    scored: DataFrame,
    budget: int,
    score_col: str = "mean_tok_freq",
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus curation under a global token budget: take documents in
    (score DESC, id ASC) order while the running token total stays within
    ``budget`` — i.e. the rows a global cumulative-sum window would keep.

    A literal global window (SUM OVER ORDER BY with no partition) serializes
    the whole table through one task, so instead: (1) aggregate a per-score
    weight histogram — scores are 4dp-rounded, so the histogram is small and
    bounded, the MODEL not the data; (2) the driver walks it to find the
    boundary score and the residual budget; (3) whole buckets above the
    boundary pass with a plain filter (scan-parallel), and only the single
    boundary bucket pays a tiny cumulative window. Result is identical to
    the global-window formulation, row for row.
    """
    from pyspark.sql import Window

    hist = sorted(
        scored.groupBy(score_col).agg(F.sum(weight_col).alias("w")).collect(),
        key=lambda r: -r[score_col],
    )
    acc = 0
    cutoff, residual = None, budget
    for r in hist:
        if acc + r.w <= budget:
            acc += r.w
        else:
            cutoff, residual = r[score_col], budget - acc
            break
    if cutoff is None:
        return scored  # everything fits
    full = scored.filter(F.col(score_col) > cutoff)
    w = Window.orderBy(id_col)  # one score bucket only: tiny by construction
    boundary = (
        scored.filter(F.col(score_col) == cutoff)
        .withColumn("_cum", F.sum(weight_col).over(w))
        .filter(F.col("_cum") <= residual)
        .drop("_cum")
    )
    return full.unionByName(boundary)


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Deterministic shard assignment for training output: ``_shard`` =
    md5-derived value of (id, salt) mod ``n_shards``.

    Engine/run/partitioning invariant (pure hash of the id — no
    monotonically_increasing_id, no RNG), so a re-run or a different
    cluster produces byte-identical shard membership; the salt reshuffles
    epochs. Write with ``partitionBy("_shard")`` for one directory per
    shard. The two-nibble arithmetic is expressible identically in other
    engines (cross-checked vs DuckDB in q83's oracle).
    """
    hexmap = "0123456789abcdef"
    h = f"md5(cast(concat(cast({id_col} as string), ':{salt}') as binary))"
    v = F.expr(
        f"16 * (instr('{hexmap}', substr({h}, 1, 1)) - 1)"
        f" + instr('{hexmap}', substr({h}, 2, 1)) - 1")
    return df.withColumn("_shard", (v % n_shards).cast("int"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 relevance to a literal term list — the
    retrieval scorer a curation pipeline uses for query-based corpus mining
    (hard-negative selection, topical subsetting).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Determinism: tf/df/dl are exact integers; avgdl is one exact
    integer-sum division; each per-term score is rounded to 6 dp via an
    exact decimal cast BEFORE the per-document sum (decimal addition is
    associative, so partial-agg order cannot flip the result), and the
    final score rounds to 4 dp.

    Plan/scale: the term filter prunes the exploded stream to query terms
    only (at 100 TB: |terms|·docs rows, not all tokens); (term, df) and the
    one-row corpus stats are broadcast; one hash-agg by doc; top-k is
    TakeOrderedAndProject. No UDFs, no O(corpus) shuffle.
    """
    toks = docs.select(
        F.col(id_col), words_col(text_col).alias("_w")
    ).select(
        F.col(id_col), F.explode("_w").alias("term"), F.size("_w").alias("dl")
    )
    tf = (
        toks.filter(F.col("term").isin([str(t) for t in query_terms]))
        .groupBy(id_col, "term", "dl")
        .agg(F.count("*").alias("tf"))
    )
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = docs.select(
        F.count("*").alias("n_docs"),
        (F.sum(F.size(words_col(text_col))).cast("double")
         / F.count("*")).alias("avgdl"),
    )
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = (
        idf * F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_ts", F.round(term_score.cast("decimal(18,6)"), 6))
        .groupBy(id_col)
        .agg(
            F.round(F.sum("_ts"), 4).cast("double").alias("score"),
            F.count("*").cast("int").alias("n_terms"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def content_defined_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    boundary_prefix: str = "0",
) -> DataFrame:
    """Content-defined chunking: boundaries where the rolling 3-token
    window hashes into a sentinel bucket (md5 hex starts with
    ``boundary_prefix`` → expected chunk length ≈ 16 tokens), plus a forced
    boundary at token 0.

    Unlike fixed-stride chunking (``chunk_documents``), inserting or
    deleting a prefix only perturbs chunks near the edit: every boundary
    depends on a 3-token window, not on absolute offsets, so downstream
    chunk-hash dedup still matches the untouched remainder of near-duplicate
    documents (the Rabin/CDC idea from storage dedup, applied to tokens).

    Plan/scale: posexplode → two lags + running sum over (doc, pos) — ONE
    shuffle+sort per doc, both windows share it — then one hash-agg with an
    ordered listagg per chunk. Everything is built-ins; md5 keeps the
    boundary rule and chunk hashes engine-portable (oracle-class).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    toks = docs.select(
        F.col(id_col), F.posexplode(words_col(text_col)).alias("pos", "word")
    )
    ngram = F.concat_ws(
        " ", F.lag("word", 2).over(w), F.lag("word", 1).over(w), F.col("word")
    )
    flag = (
        F.when(F.col("pos") == 0, 1)
        .when(
            (F.col("pos") >= 2) & F.md5(ngram).startswith(boundary_prefix), 1
        )
        .otherwise(0)
    )
    run = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    chunks = (
        toks.withColumn("_flag", flag)
        .withColumn("chunk_id", (F.sum("_flag").over(run) - 1).cast("int"))
    )
    return (
        chunks.groupBy(id_col, "chunk_id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.md5(F.expr("listagg(word, ' ') WITHIN GROUP (ORDER BY pos)"))
            .alias("chunk_hash"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    topn: int = 50,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists: score = Σ 1/(k + rank).

    The standard hybrid-retrieval combiner (lexical BM25 + dense cosine):
    rank-based, so the two scorers need no calibration. Each input must
    carry (id, ``rank``) with rank starting at 1. Contributions are
    decimal-rounded to 6 dp before the sum (associative — partial-agg order
    can't flip values); docs absent from a list simply contribute nothing.

    Plan/scale: union of the (already tiny) top-N lists → one hash-agg →
    TakeOrderedAndProject. The expensive work stays in the upstream
    rankers; fusion itself is O(Σ list sizes).
    """
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    contribs = None
    for r in rankings:
        c = r.select(
            F.col(id_col),
            F.round(
                (F.lit(1.0) / (F.lit(float(k)) + F.col("rank")))
                .cast("decimal(18,6)"), 6,
            ).alias("_c"),
        )
        contribs = c if contribs is None else contribs.unionByName(c)
    return (
        contribs.groupBy(id_col)
        .agg(
            F.round(F.sum("_c"), 4).cast("double").alias("rrf"),
            F.count("*").cast("int").alias("n_lists"),
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(topn)
    )


def select_top_p_per_group(
    docs: DataFrame,
    group_col: str = "source",
    p_num: int = 1,
    p_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group nucleus (top-p) curation: within each group, keep the
    highest-quality documents until they cover ``p_num/p_den`` of the
    group's token mass — the per-source variant of global token-budget
    selection (``select_until_budget``), used to balance a mixed-source
    corpus without starving small sources.

    Quality score = distinct-token ratio (4-dp decimal). A document is
    kept iff its cumulative mass STARTS before the cutoff
    (``(cum - dl) * p_den < tot * p_num`` — exact integer comparison, no
    FP share computation): standard nucleus semantics, so the boundary
    document is included and every non-empty group keeps at least its
    top-ranked document (a <=-on-cum rule would starve any group whose
    best document alone exceeds p).

    Plan/scale: one shuffle on the group key; both windows (running token
    sum, group total) share its sort; everything else is per-row
    expressions. Group count bounds the state, not corpus size.
    """
    from pyspark.sql import Window

    w = words_col(text_col)
    scored = docs.select(
        F.col(id_col), F.col(group_col),
        F.size(w).alias("dl"),
        F.round(
            (F.size(F.array_distinct(w)) / F.size(w)).cast("decimal(18,6)"), 4
        ).cast("double").alias("score"),
    )
    run = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("score"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    whole = Window.partitionBy(group_col)
    return (
        scored.withColumn("cum", F.sum("dl").over(run))
        .withColumn("tot", F.sum("dl").over(whole))
        .filter((F.col("cum") - F.col("dl")) * p_den < F.col("tot") * p_num)
        .select(group_col, id_col, "score", "dl", "cum")
    )


def _md5_uniform_int_sql(id_col: str, salt: str, nibbles: int = 6) -> str:
    """SQL for a uniform integer in [0, 16^nibbles) from md5(id || ':salt').

    Pure instr/substr arithmetic over the md5 hex — evaluates identically
    in Spark SQL and DuckDB (same operators, same md5), so acceptance
    decisions built on it are engine-, run- and partitioning-invariant.
    """
    h = f"md5(CAST({id_col} AS STRING) || ':{salt}')"
    terms = [
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (nibbles - 1 - i)}"
        for i in range(nibbles)
    ]
    return "(" + " + ".join(terms) + ")"


def rebalance_mixture(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    target_weights: dict | None = None,
) -> DataFrame:
    """Deterministic mixture rebalancing: downsample each group toward a
    target share of the corpus — uniform (target per group = N/S) by
    default, or proportional to non-negative INTEGER ``target_weights``
    {group: w} (target_g = N * w_g / sum(w)); groups absent from the dict
    get weight 0 and are dropped. The curation step that stops a few
    dominant sources from swamping a training mixture.

    Acceptance is keep iff ``h6 <= thr_g`` where h6 is a 24-bit
    md5-derived uniform and ``thr_g = ceil(N * w_g * 16^6 / (W * n_g)) - 1``
    is a per-group integer threshold, algebraically identical to
    ``h6 * W * n_g < N * w_g * 16^6`` but computed once per group in
    DECIMAL(38,0) — so it cannot overflow 64-bit range at any corpus size
    (h6*W*n_g exceeds BIGINT at ~1e10 docs, where non-ANSI Spark would
    silently wrap while DuckDB promotes: the threshold form removes the
    per-row wide multiply entirely). No RNG, no floats: expected kept
    count per group is min(n_g, N*w_g/W) with byte-identical decisions on
    any engine or cluster layout (re-runs and backfills keep exactly the
    same rows). Groups at or below their target keep everything
    (thr_g then reaches the 16^6 - 1 cap).

    Plan/scale: one count-per-group agg (S rows; threshold math happens
    on those S rows, broadcast back) + a scan-side hash filter; no
    shuffle of the data itself.
    """
    thresholds = rebalance_thresholds(docs, group_col=group_col,
                                      target_weights=target_weights)
    return apply_rebalance(docs, thresholds, group_col=group_col,
                           id_col=id_col, salt=salt)


def rebalance_thresholds(
    docs: DataFrame,
    group_col: str = "source",
    target_weights: dict | None = None,
) -> DataFrame:
    """The profile half of ``rebalance_mixture``: the per-group integer
    acceptance thresholds (group_col, _thr) as an S-row frame. Split out so
    a batch profile job can compute it once and ``apply_rebalance`` can
    enforce it statelessly — including on a stream."""
    if target_weights is not None:
        bad = {g: w for g, w in target_weights.items()
               if not isinstance(w, int) or w < 0}
        if bad:
            raise ValueError(f"target_weights must be non-negative ints: {bad}")
        wsum = sum(target_weights.values())
        if wsum <= 0:
            raise ValueError("target_weights must contain a positive weight")
        wmap = F.create_map(
            *[F.lit(x) for kv in target_weights.items() for x in kv]
        )
        w_g = F.coalesce(wmap[F.col(group_col)], F.lit(0))
        w_tot = F.lit(wsum)
    else:  # uniform: w_g = 1 for every group present, W = #groups
        w_g = F.lit(1)
        w_tot = F.col("_s")
    counts = docs.groupBy(group_col).agg(F.count("*").alias("_n_g"))
    tot = docs.agg(
        F.count("*").alias("_n"),
        F.countDistinct(group_col).alias("_s"),
    )
    dec = "decimal(38,0)"
    t_num = F.col("_n").cast(dec) * w_g.cast(dec) * F.lit(16 ** 6).cast(dec)
    t_den = w_tot.cast(dec) * F.col("_n_g").cast(dec)
    # thr = ceil(T/D) - 1 = (T + D - 1) DIV D - 1 for T >= 0, D > 0 —
    # integral DIV is exact (decimal `/` rounds to a finite scale, which
    # can flip floor() by one when D >= 2e6). Clamping T at D*16^6 first
    # caps thr at 16^6 - 1 (keep-all) AND bounds the quotient so the
    # BIGINT result of DIV can never overflow at any corpus size.
    return (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("_t", F.least(t_num, t_den * F.lit(16 ** 6).cast(dec)))
        .withColumn("_d", t_den)
        .selectExpr(group_col, "CAST((_t + _d - 1) DIV _d AS BIGINT) - 1 AS _thr")
    )


def apply_rebalance(
    docs: DataFrame,
    thresholds: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Apply a (group, _thr) rebalance profile: keep iff the row's 24-bit
    md5 uniform is <= its group threshold. STATELESS — the profile is a
    static broadcast and the acceptance rule is a pure per-row expression,
    so the same call enforces a batch-computed mixture on a STREAM
    (stream-static join + filter, no state store, no watermark): the
    production shape where thresholds come from yesterday's profile job
    and arrivals are admitted on the fly (verified batch==stream in S22).
    """
    h6 = F.expr(_md5_uniform_int_sql(id_col, salt))
    return (
        docs.join(F.broadcast(thresholds), group_col)
        .withColumn("_keep", h6 <= F.col("_thr"))
        .drop("_thr")
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): inclusion probability proportional to ``weight_col``,
    no RNG — the randomness comes from the md5 uniform, so re-runs,
    backfills and any cluster layout select exactly the same rows.

    A-ES assigns each row the key u^(1/w) (u uniform in (0,1]) and keeps
    the k largest; equivalently the k SMALLEST of −ln(u)/w, which is the
    numerically stable form used here. u = (h6 + 1)/16^6 from the same
    24-bit md5 uniform as the rebalance family; the key is rounded to 6 dp
    decimal BEFORE ranking (the q132 two-step) so the global top-k
    boundary is engine-portable even where raw ln() differs in the last
    ulp; ties break on the id. Weights must be positive.

    Scale: the key is a scan-side expression; global top-k compiles to
    TakeOrderedAndProject (per-partition heaps + single merge of k rows) —
    no global sort, no shuffle of the data.
    """
    u = f"(CAST({_md5_uniform_int_sql(id_col, salt)} AS DOUBLE) + 1) / 16777216"
    key = F.round(
        F.expr(f"-ln({u}) / {weight_col}").cast("decimal(18,6)"), 6
    ).cast("double")
    return (
        docs.withColumn("_es_key", key)
        .orderBy("_es_key", id_col)
        .limit(k)
    )


def packing_efficiency(
    docs: DataFrame, budget: int = 128,
    text_col: str = "text", group_col: str = "source",
) -> DataFrame:
    """Sequence-packing efficiency report: per group, the token mass and
    the padding cost of the two standard batch-shaping strategies at a
    fixed context length — one-doc-per-sequence (each doc padded to a
    multiple of the budget: ceil(tok/L) sequences) vs dense concatenation
    (the q79/pack_sequences path: ceil(group_tokens/L) sequences).
    The gap between the two utilization columns is what packing buys.

    Everything is exact integer arithmetic (ceil via (x + L - 1) DIV L,
    rates in ppm), so the report is engine-exact. One groupBy on the
    group key; token counts are word counts, computed scan-side.

    100 TB design: a single map-side-combinable aggregation over
    (group, tok) — no row explosion, no second pass.
    """
    L = int(budget)
    sized = docs.select(
        F.col(group_col).alias("grp"),
        F.size(words_col(text_col)).cast("bigint").alias("tok"))
    per_doc_seqs = F.expr(f"(tok + {L - 1}) DIV {L}")
    g = sized.groupBy("grp").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("tokens"),
        F.sum(per_doc_seqs).alias("padded_seqs"))
    return g.select(
        F.col("grp").alias(group_col), "n_docs", "tokens", "padded_seqs",
        (F.col("padded_seqs") * L - F.col("tokens")).alias("pad_tokens"),
        F.expr(f"tokens * 1000000 DIV (padded_seqs * {L})")
        .alias("padded_util_ppm"),
        F.expr(f"(tokens + {L - 1}) DIV {L}").alias("packed_seqs"),
        F.expr(f"tokens * 1000000 DIV (((tokens + {L - 1}) DIV {L}) * {L})")
        .alias("packed_util_ppm"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    target: F.Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """Hashed-unigram importance weights for domain-targeted data selection
    (DSIR — Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score every document in the pool by how much
    more likely its tokens are under the TARGET domain's hashed-unigram
    distribution than under the full pool's,

        logw(doc) = Σ_tokens [ ln p_target(b(tok)) − ln p_raw(b(tok)) ]

    with md5-derived feature buckets (the paper's hashed n-gram trick: a
    fixed-size model regardless of vocabulary — Heaps' law never grows it)
    and add-one smoothing so target-absent buckets stay finite. High-logw
    documents "look like" the target domain; resampling/top-k by logw
    shifts the training mixture toward it without a learned classifier.

    Determinism: bucket assignment is a pure md5 of the token (engine/
    run/partitioning invariant, the assign_shards convention); each
    bucket's log-ratio takes ln of an exact-integer ratio
    ((ct+1)·(N_raw+B)) / ((cr+1)·(N_target+B)) and is quantized
    DECIMAL(18,6)→ROUND 4 BEFORE the per-doc sum — the q132 two-step — so
    the aggregate is an exact decimal total on any aggregation order.

    Scale shape (100 TB): one token explode feeding ONE map-side-combinable
    group-by on the bucket key (target counts ride along as a conditional
    sum — no second scan); the bucket table is B rows (model-sized,
    broadcast both for the totals and the score join); one final per-doc
    aggregation. Returns (id_col, n_tokens, logw R4-double).
    """
    model = dsir_bucket_model(docs, target, text_col=text_col,
                              n_buckets=n_buckets, salt=salt)
    return dsir_weights_from_model(docs, model, text_col=text_col,
                                   id_col=id_col, n_buckets=n_buckets,
                                   salt=salt)


def dsir_bucket_sql(n_buckets: int = 256, salt: str = "dsir",
                    tok: str = "tok") -> str:
    """The shared md5 feature-bucket expression (SQL string, so the S59
    live model can use it as an IncrementalAggregate key expr verbatim).

    Draws ceil(log16(n_buckets)) md5 nibbles (min 2, so the default
    B=256 keeps its historical two-nibble form and q346's oracle), then
    reduces mod n_buckets — without widening the draw, any B > 256 would
    silently leave buckets 256.. unreachable while the smoothing still
    normalized by B. Power-of-two B ≤ the drawn range is modulo-bias
    free; other B carry the usual (tiny) modulo bias, noted not fixed."""
    B = int(n_buckets)
    if B < 2:
        raise ValueError(f"n_buckets must be >= 2, got {B}")
    n_nibbles = 2
    while 16 ** n_nibbles < B:
        n_nibbles += 1
    hexmap = "0123456789abcdef"
    h = f"md5(cast(concat({tok}, ':{salt}') as binary))"
    acc = " + ".join(
        f"(instr('{hexmap}', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (n_nibbles - 1 - i)}"
        for i in range(n_nibbles))
    return f"CAST(({acc}) % {B} AS INT)"


def dsir_bucket_model(docs: DataFrame, target: F.Column,
                      text_col: str = "text", n_buckets: int = 256,
                      salt: str = "dsir") -> DataFrame:
    """The DSIR sufficient statistic: per-bucket raw and target token
    counts ``(bk, cr, ct)``. Exactly a (bucket)-keyed `count` + conditional
    `sum` IncrementalAggregate, so the live model (S59) maintains the SAME
    B-row table from a document stream and scores through the SAME
    ``dsir_weights_from_model`` closed form."""
    toks = docs.select(target.cast("boolean").alias("_t"),
                       F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    return (toks.select(F.expr(dsir_bucket_sql(n_buckets, salt)).alias("bk"),
                        "_t")
            .groupBy("bk")
            .agg(F.count(F.lit(1)).alias("cr"),
                 F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("ct")))


def dsir_weights_from_model(docs: DataFrame, model: DataFrame,
                            text_col: str = "text", id_col: str = "doc_id",
                            n_buckets: int = 256,
                            salt: str = "dsir") -> DataFrame:
    """Score documents against a (bk, cr, ct) bucket model — shared
    VERBATIM by the q346 batch path and the S59 live model. The model need
    not come from the same corpus being scored: a frozen model scores new
    pool shards without re-counting (the DSIR deployment shape at scale).

    The score table is built over the FULL 0..B-1 bucket spine, not just
    the model's observed buckets: a new shard's token can hash into a
    bucket the frozen model never saw, and add-one smoothing defines its
    log-ratio (ln((0+1)(nr+B)/((0+1)(nt+B)))) — an inner join on observed
    buckets would silently drop such tokens from both n_tokens and the
    weight sum."""
    B = int(n_buckets)
    counts = model.select(F.col("bk").cast("int").alias("bk"),
                          F.col("cr").cast("bigint").alias("cr"),
                          F.col("ct").cast("bigint").alias("ct"))
    spark = model.sparkSession
    spine = spark.range(B).select(F.col("id").cast("int").alias("bk"))
    counts = (spine.join(counts, "bk", "left")
              .select("bk",
                      F.coalesce("cr", F.lit(0)).alias("cr"),
                      F.coalesce("ct", F.lit(0)).alias("ct")))
    tots = counts.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    lr = (counts.join(F.broadcast(tots))
          .select("bk",
                  F.round(
                      F.log(((F.col("ct") + 1) * (F.col("nr") + B))
                            .cast("double")
                            / ((F.col("cr") + 1) * (F.col("nt") + B)))
                      .cast("decimal(18,6)"), 4).alias("lr")))
    b = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).select(id_col, F.expr(dsir_bucket_sql(n_buckets, salt)).alias("bk"))
    return (b.join(F.broadcast(lr), "bk")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.sum("lr").cast("decimal(18,6)"), 4)
                 .cast("double").alias("logw")))


def dsir_select_topk(
    docs: DataFrame,
    target: F.Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """Deterministic DSIR selection: the k pool documents with the highest
    importance weight (ties broken by id — the paper's Gumbel-resampling
    variant needs RNG; top-k is its deterministic, re-run-stable analog).
    Global top-k is a TakeOrderedAndProject — no full sort materializes."""
    w = dsir_importance_weights(docs, target, text_col=text_col,
                                id_col=id_col, n_buckets=n_buckets,
                                salt=salt)
    return (w.orderBy(F.desc("logw"), F.col(id_col))
            .limit(int(k)))
