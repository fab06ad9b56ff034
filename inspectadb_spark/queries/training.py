"""Training-pipeline queries Q63–Q68 (SURVEY.md §2.2i extension set):
TF-IDF, chunking, deterministic sampling, repetition, n-grams, packing.

Oracle notes: tokenization (`split` keeping empties + explicit filter), md5
hex digests, 1-indexed element access and inclusive `sequence`/
`generate_series` bounds were all probe-verified byte-identical between
Spark and DuckDB; integer outputs are cast to Spark's natural widths on the
DuckDB side (COUNT→BIGINT matches, len()/ROW_NUMBER→INT casts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspectadb_spark.operators import pipeline as P
from inspectadb_spark.queries.registry import query, r4, r4c, tables

_DUCK_WORDS = "list_filter(string_split(text, ' '), w -> w <> '')"


# --------------------------------------------------------------------------
@query(
    "q63_tfidf_topk",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest({_DUCK_WORDS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY doc_id, term),
    dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT doc_id, term,
             CAST(ROUND(CAST(tf * ln((n + 1.0) / (df + 1.0)) AS DECIMAL(18,6)), 4)
                  AS DOUBLE) AS score
      FROM tf JOIN dfc USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term)
                  AS INT) AS rnk
      FROM scored)
    SELECT doc_id, term, score, rnk FROM ranked WHERE rnk <= 3
    """,
    doc="Per-document top-3 TF-IDF terms (smoothed IDF, exact int tf/df).",
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return P.tfidf_top_terms(docs, k=3).withColumnRenamed("rank", "rnk")


# --------------------------------------------------------------------------
@query(
    "q64_chunking",
    oracle="""
    SELECT doc_id, CAST((s - 1) // 90 AS INT) AS chunk_idx,
           substr(text, s, 120) AS chunk,
           CAST(length(substr(text, s, 120)) AS INT) AS chunk_len
    FROM (SELECT doc_id, text,
                 unnest(generate_series(1, length(text), 90)) AS s
          FROM documents)
    """,
    doc="Overlapping 120-char windows, stride 90 — zero-shuffle explode.",
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return P.chunk_documents(docs, size=120, step=90)


# --------------------------------------------------------------------------
@query(
    "q65_hash_sample",
    oracle="""
    SELECT lang, COUNT(*) AS n_total,
           COUNT(CASE WHEN substr(md5(cast(doc_id AS VARCHAR) || ':s1'), 1, 1)
                           IN ('0','1','2','3') THEN 1 END) AS n_sampled
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="Deterministic md5-nibble ~25% sample, accounted per language.",
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    sampled = F.when(P.hash_bucket("doc_id", "s1").isin(*"0123"), F.lit(1))
    return (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_total"), F.count(sampled).alias("n_sampled"))
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
@query(
    "q66_repetition",
    oracle=f"""
    SELECT doc_id, CAST(len(w) AS INT) AS n_words,
           CAST(len(list_distinct(w)) AS INT) AS n_distinct,
           CAST(ROUND(CAST(1.0 - len(list_distinct(w)) / len(w)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS rep_ratio
    FROM (SELECT doc_id, {_DUCK_WORDS} AS w FROM documents)
    """,
    doc="Gopher-style repetition ratio: 1 - distinct/total words.",
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return P.word_repetition(docs)


# --------------------------------------------------------------------------
@query(
    "q67_bigrams",
    oracle=f"""
    WITH g AS (
      SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1])) AS ngram
      FROM (SELECT {_DUCK_WORDS} AS w FROM documents)
      WHERE len(w) >= 2)
    SELECT ngram, COUNT(*) AS cnt FROM g
    GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20
    """,
    doc="Corpus-wide top-20 word bigrams (two-phase agg + top-k).",
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return P.top_ngrams(docs, n=2, k=20)


# --------------------------------------------------------------------------
@query(
    "q68_pack_bins",
    oracle=None,  # greedy sequential packing: not SQL-expressible
    check="P: greedy next-fit invariants (capacity, completeness, "
          "doc_id-order determinism) pinned in tests/test_training_ops.py; "
          "the oracled packing-accounting sibling is q261",
    doc="Greedy next-fit token packing per language (applyInPandas); "
        "per-bin accounting, deterministic by doc_id order.",
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return P.pack_sequences(docs, budget=128).orderBy("lang", "bin_id")


# --------------------------------------------------------------------------
_CENTROID_SQL = """
    SELECT label, CAST(i AS INT) AS dim,
           CAST(ROUND(CAST(CAST(SUM(CAST(embedding[i] AS DECIMAL(28,12))) AS DOUBLE)
                           / COUNT(*) AS DECIMAL(18,6)), 4) AS DOUBLE) AS centroid
    FROM (SELECT label, embedding, unnest(generate_series(1, 64)) AS i
          FROM embeddings)
    GROUP BY label, i
"""


@query(
    "q69_label_centroids",
    oracle=_CENTROID_SQL,
    doc="Per-(label, dim) exact-decimal mean centroid, 4dp.",
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import label_centroids

    return label_centroids(tables(spark, sf_dir)["embeddings"])


@query(
    "q69b_centroid_outliers",
    oracle=f"""
    WITH cent AS ({_CENTROID_SQL}),
    expl AS (
      SELECT vec_id, label, CAST(i AS INT) AS dim,
             CAST(embedding[i] AS DOUBLE) AS x
      FROM (SELECT vec_id, label, embedding, unnest(generate_series(1, 64)) AS i
            FROM embeddings)),
    d AS (
      SELECT vec_id, expl.label AS label,
             SUM(CAST((x - centroid) * (x - centroid) AS DECIMAL(28,12))) AS ss
      FROM expl JOIN cent ON expl.label = cent.label AND expl.dim = cent.dim
      GROUP BY vec_id, expl.label)
    SELECT vec_id, label,
           CAST(ROUND(CAST(SQRT(CAST(ss AS DOUBLE)) AS DECIMAL(18,6)), 4) AS DOUBLE) AS dist
    FROM d ORDER BY dist DESC, vec_id LIMIT 20
    """,
    doc="Top-20 distance-to-own-centroid outliers (4dp-pinned centroids).",
)
def q69b(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import centroid_outliers

    return centroid_outliers(tables(spark, sf_dir)["embeddings"], k=20)


# --------------------------------------------------------------------------
@query(
    "q65b_stratified_quota",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(cast(doc_id AS VARCHAR) || ':q'), doc_id) AS rn
      FROM documents) t
    WHERE rn <= 5
    """,
    doc="Per-language quota sample: first 5 docs per lang in md5 order — "
        "deterministic stratified sampling (engine/run/cluster invariant).",
)
def q65b(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = tables(spark, sf_dir)["documents"]
    h = F.expr("md5(cast(concat(cast(doc_id as string), ':q') as binary))")
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "lang")
    )


# --------------------------------------------------------------------------
# Q75 benchmark decontamination: docs from the training corpus (source <>
# 'src0') sharing word 5-grams with the held-out benchmark set (source =
# 'src0'). Benchmark gram set is broadcast; corpus side is one scan + one
# per-doc count shuffle.
@query(
    "q75_decontam_ngrams",
    oracle="""
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source,
             array_to_string(list_slice(t, i, i + 4), ' ') AS gram
      FROM tok, UNNEST(generate_series(1, len(t) - 4)) AS u(i)),
    bench AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0'),
    corpus AS (SELECT doc_id, gram FROM grams WHERE source <> 'src0'),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id),
    sh AS (SELECT corpus.doc_id, COUNT(*) AS n_shared
           FROM corpus JOIN bench USING (gram) GROUP BY corpus.doc_id)
    SELECT tot.doc_id AS doc_id, n_grams, n_shared,
           CAST(ROUND(CAST(CAST(n_shared AS DOUBLE) / n_grams
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS share_rate
    FROM tot JOIN sh ON tot.doc_id = sh.doc_id
    """,
    doc="Eval-set decontamination: per-doc distinct 5-gram overlap with the "
        "benchmark source, broadcast semi-probe (no corpus-side fan-out).",
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import ngram_contamination

    docs = tables(spark, sf_dir)["documents"]
    return ngram_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=5,
    )


# --------------------------------------------------------------------------
# Q76 PII/secret redaction: sequential (regex -> replacement) passes with a
# total hit count. Pure JVM regexp_* — scan-speed, zero shuffle.
_REDACT_PATTERNS = [
    (r"\b(key|hash)\b", "[SECRET]"),
    (r"\d{3,}", "[NUM]"),  # zero-hit path on this corpus: exercised, not dead
]


@query(
    "q76_redact",
    oracle=r"""
    WITH s1 AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '\b(key|hash)\b')) AS h1,
             regexp_replace(text, '\b(key|hash)\b', '[SECRET]', 'g') AS t
      FROM documents),
    s2 AS (
      SELECT doc_id, h1, len(regexp_extract_all(t, '\d{3,}')) AS h2,
             regexp_replace(t, '\d{3,}', '[NUM]', 'g') AS t
      FROM s1)
    SELECT doc_id, CAST(h1 + h2 AS BIGINT) AS n_hits, t AS redacted FROM s2
    """,
    doc="Ordered regex redaction with hit accounting (PII scrubbing shape).",
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import redact

    return redact(tables(spark, sf_dir)["documents"], _REDACT_PATTERNS)


# --------------------------------------------------------------------------
# Q77 corpus-statistics quality score: mean corpus frequency of each doc's
# tokens (deterministic unigram-LM stand-in). Vocab table broadcast.
@query(
    "q77_corpus_freq_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
    freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok)
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(ROUND(CAST(CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE)
                           / COUNT(*) AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS mean_tok_freq
    FROM toks JOIN freq USING (tok) GROUP BY doc_id
    """,
    doc="Unigram corpus-frequency doc score via exact-decimal mean.",
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import corpus_frequency_score

    return corpus_frequency_score(tables(spark, sf_dir)["documents"])


# --------------------------------------------------------------------------
# Q79 token-budget corpus selection: best-scored docs (q77's corpus-frequency
# score) until a global 6000-token budget. The oracle is the global
# cumulative-sum window; the engine computes the same rows via a per-score
# histogram + boundary-bucket refinement (no global serial window — see
# operators/pipeline.py::select_until_budget).
@query(
    "q79_token_budget_selection",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
    freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             CAST(ROUND(CAST(CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE)
                             / COUNT(*) AS DECIMAL(18,6)), 4) AS DOUBLE)
               AS mean_tok_freq
      FROM toks JOIN freq USING (tok) GROUP BY doc_id),
    c AS (
      SELECT *, SUM(n_tokens) OVER (
        ORDER BY mean_tok_freq DESC, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM scored)
    SELECT doc_id, n_tokens, mean_tok_freq FROM c WHERE cum <= 6000
    """,
    doc="Budgeted curation: histogram + boundary-bucket refinement equals "
        "the global cumulative-window selection row-for-row.",
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.pipeline import select_until_budget
    from inspectadb_spark.operators.text import corpus_frequency_score

    scored = corpus_frequency_score(tables(spark, sf_dir)["documents"])
    return select_until_budget(scored, budget=6000)


# --------------------------------------------------------------------------
# Q83 deterministic training shards: per-shard doc and token accounting.
# Shard membership is a pure hash of the doc id (no RNG, no row numbering),
# so any engine/cluster/re-run produces identical shards.
@query(
    "q83_training_shards",
    oracle="""
    WITH sh AS (
      SELECT doc_id, text,
             CAST((16 * (strpos('0123456789abcdef',
                           substr(md5(concat(cast(doc_id AS VARCHAR), ':shard')), 1, 1)) - 1)
                   + strpos('0123456789abcdef',
                           substr(md5(concat(cast(doc_id AS VARCHAR), ':shard')), 2, 1)) - 1)
                  % 8 AS INT) AS _shard
      FROM documents)
    SELECT _shard, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM sh GROUP BY _shard ORDER BY _shard
    """,
    doc="Hash-deterministic shard assignment + per-shard accounting.",
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.pipeline import assign_shards

    d = tables(spark, sf_dir)["documents"]
    return (
        assign_shards(d, n_shards=8)
        .groupBy("_shard")
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.size(F.split("text", " "))).alias("n_tokens"))
        .orderBy("_shard")
    )


# --------------------------------------------------------------------------
@query(
    "q120_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_WORDS}) AS term,
             len({_DUCK_WORDS}) AS dl
      FROM documents),
    tf AS (
      SELECT doc_id, term, dl, COUNT(*) AS tf FROM toks
      WHERE term IN ('spark', 'window', 'join')
      GROUP BY doc_id, term, dl),
    dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(len({_DUCK_WORDS})) AS DOUBLE) / COUNT(*) AS avgdl
      FROM documents),
    scored AS (
      SELECT doc_id,
             ROUND(CAST(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             AS DECIMAL(18,6)), 6) AS ts
      FROM tf JOIN dfc USING (term) CROSS JOIN stats)
    SELECT doc_id, CAST(ROUND(SUM(ts), 4) AS DOUBLE) AS score,
           CAST(COUNT(*) AS INT) AS n_terms
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT 50
    """,
    doc="BM25 top-50 for query terms (spark, window, join): k1=1.2, b=0.75,"
        " decimal-rounded per-term scores so the per-doc sum is exact.",
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return P.bm25_topk(docs, ["spark", "window", "join"], k=50)


# --------------------------------------------------------------------------
# Shared oracle CTE chain for the content-defined chunking family
# (q121 result + q124 pair mining build on the same boundary rule).
_CDC_CORE_SQL = f"""
    toks AS (
      SELECT doc_id,
             generate_subscripts({_DUCK_WORDS}, 1) - 1 AS pos,
             unnest({_DUCK_WORDS}) AS word
      FROM documents),
    lagged AS (
      SELECT doc_id, pos, word,
             LAG(word, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
             LAG(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
      FROM toks),
    flagged AS (
      SELECT doc_id, pos, word,
             CASE WHEN pos = 0 THEN 1
                  WHEN pos >= 2 AND md5(w2 || ' ' || w1 || ' ' || word) LIKE '0%'
                  THEN 1 ELSE 0 END AS flag
      FROM lagged),
    chunked AS (
      SELECT doc_id, pos, word,
             CAST(SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS INT)
               AS chunk_id
      FROM flagged)"""


@query(
    "q121_cdc_chunking",
    oracle=f"""
    WITH {_CDC_CORE_SQL}
    SELECT doc_id, chunk_id, CAST(COUNT(*) AS INT) AS n_tokens,
           md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_hash
    FROM chunked GROUP BY doc_id, chunk_id
    ORDER BY doc_id, chunk_id
    """,
    doc="Content-defined (rolling-hash) chunking: md5 3-gram boundary rule,"
        " shift-robust chunk hashes for sub-document dedup.",
)
def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return P.content_defined_chunks(docs).orderBy("doc_id", "chunk_id")


# --------------------------------------------------------------------------
# q122 hybrid retrieval: BM25 (lexical) + brute-force cosine (dense) fused
# by reciprocal rank. documents.doc_id and embeddings.vec_id share the id
# domain (the corpus's multimodal join key, as in q43's join leg).
@query(
    "q122_hybrid_rrf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_WORDS}) AS term,
             len({_DUCK_WORDS}) AS dl
      FROM documents),
    tf AS (
      SELECT doc_id, term, dl, COUNT(*) AS tf FROM toks
      WHERE term IN ('spark', 'window', 'join')
      GROUP BY doc_id, term, dl),
    dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(len({_DUCK_WORDS})) AS DOUBLE) / COUNT(*) AS avgdl
      FROM documents),
    bm_scored AS (
      SELECT doc_id,
             ROUND(CAST(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             AS DECIMAL(18,6)), 6) AS ts
      FROM tf JOIN dfc USING (term) CROSS JOIN stats),
    bm_top AS (
      SELECT doc_id, CAST(ROUND(SUM(ts), 4) AS DOUBLE) AS score
      FROM bm_scored GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT 100),
    bm_ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM bm_top),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    z AS (
      SELECT e.vec_id, UNNEST(e.embedding) AS x, UNNEST(q.qe) AS y
      FROM embeddings e CROSS JOIN q),
    s AS (
      SELECT vec_id,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS n1,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS n2
      FROM z GROUP BY vec_id),
    vec_top AS (
      SELECT vec_id AS doc_id,
             CAST(ROUND(CAST(dot / (SQRT(n1) * SQRT(n2)) AS DECIMAL(18,6)), 4)
                  AS DOUBLE) AS sim
      FROM s ORDER BY sim DESC, doc_id LIMIT 100),
    vec_ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS rank
      FROM vec_top),
    contribs AS (
      SELECT doc_id, ROUND(CAST(1.0 / (60 + rank) AS DECIMAL(18,6)), 6) AS c
      FROM bm_ranked
      UNION ALL
      SELECT doc_id, ROUND(CAST(1.0 / (60 + rank) AS DECIMAL(18,6)), 6) AS c
      FROM vec_ranked)
    SELECT doc_id, CAST(ROUND(SUM(c), 4) AS DOUBLE) AS rrf,
           CAST(COUNT(*) AS INT) AS n_lists
    FROM contribs GROUP BY doc_id
    ORDER BY rrf DESC, doc_id LIMIT 50
    """,
    doc="Hybrid retrieval: reciprocal-rank fusion of BM25 top-100 and "
        "cosine top-100 (k=60) — rank-based, calibration-free.",
)
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from inspectadb_spark.operators.similarity import cosine_topk

    docs = tables(spark, sf_dir)["documents"]
    emb = tables(spark, sf_dir)["embeddings"]
    bm = P.bm25_topk(docs, ["spark", "window", "join"], k=100).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rank"),
    )
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    vec = (
        cosine_topk(emb, [float(x) for x in qvec], k=100)
        .withColumnRenamed("vec_id", "doc_id")
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("sim"), F.asc("doc_id")))
            .alias("rank"),
        )
    )
    return P.rrf_fuse([bm, vec], topn=50)


# --------------------------------------------------------------------------
@query(
    "q123_source_top_p",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             len({_DUCK_WORDS}) AS dl,
             CAST(ROUND(CAST(len(list_distinct({_DUCK_WORDS}))
                  / CAST(len({_DUCK_WORDS}) AS DOUBLE) AS DECIMAL(18,6)), 4)
                  AS DOUBLE) AS score
      FROM documents),
    windowed AS (
      SELECT source, doc_id, score, dl,
             SUM(dl) OVER (PARTITION BY source ORDER BY score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(dl) OVER (PARTITION BY source) AS tot
      FROM scored)
    SELECT source, doc_id, score, dl, CAST(cum AS BIGINT) AS cum
    FROM windowed WHERE (cum - dl) * 2 < tot * 1
    ORDER BY source, score DESC, doc_id
    """,
    doc="Per-source nucleus (top-p=0.5) curation by distinct-token-ratio "
        "quality; exclusive-start integer cutoff (boundary doc included, "
        "no group starved).",
)
def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return (
        P.select_top_p_per_group(docs, "source", 1, 2)
        .orderBy("source", F.desc("score"), "doc_id")
    )


# --------------------------------------------------------------------------
_CDC_HASHES_SQL = """
    hashes AS (
      SELECT DISTINCT doc_id,
             md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_hash
      FROM chunked GROUP BY doc_id, chunk_id)"""


@query(
    "q124_cdc_chunk_pairs",
    oracle=f"""
    WITH {_CDC_CORE_SQL},{_CDC_HASHES_SQL}
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(COUNT(*) AS INT) AS shared_chunks
    FROM hashes a JOIN hashes b ON a.chunk_hash = b.chunk_hash
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 1
    ORDER BY d1, d2
    """,
    doc="Near-dup candidate pairs via shared content-defined chunk hashes "
        "(min_shared=1 at this corpus size); O(collisions) bucket join.",
)
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import cdc_chunk_near_dup_pairs

    docs = tables(spark, sf_dir)["documents"]
    return cdc_chunk_near_dup_pairs(docs, min_shared=1).orderBy("d1", "d2")


# --------------------------------------------------------------------------
_H6_SQL = P._md5_uniform_int_sql("doc_id", "mix")


def _rebalance_oracle_sql(weights_sql: str | None, wsum: int | None) -> str:
    """Threshold-form rebalance oracle (ceil(T/D)-1 via HUGEINT integer
    division — same overflow-safe algebra as the Spark side; mirrors
    operators/pipeline.py::rebalance_mixture exactly).

    ``weights_sql``/``wsum``: a VALUES list ``(source, w)`` + its python-side
    weight sum for the weighted variant, or None for uniform (w=1, W=s).
    """
    if weights_sql is None:
        w_g, w_tot, w_join = "1", "s", ""
    else:
        w_g, w_tot = "COALESCE(w, 0)", str(wsum)
        w_join = f"LEFT JOIN (VALUES {weights_sql}) AS wt(wsrc, w)"
        w_join += " ON counts.source = wt.wsrc"
    return f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_g FROM documents GROUP BY source),
    tot AS (
      SELECT COUNT(*) AS n, COUNT(DISTINCT source) AS s FROM documents),
    thr AS (
      SELECT counts.source,
             (LEAST(CAST(n AS HUGEINT) * {w_g} * 16777216,
                    CAST({w_tot} AS HUGEINT) * n_g * 16777216)
              + CAST({w_tot} AS HUGEINT) * n_g - 1)
             // (CAST({w_tot} AS HUGEINT) * n_g) - 1 AS thr
      FROM counts CROSS JOIN tot {w_join}),
    flagged AS (
      SELECT d.source,
             CASE WHEN {_H6_SQL} <= thr THEN 1 ELSE 0 END AS keep
      FROM documents d JOIN thr USING (source))
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_orig,
           CAST(SUM(keep) AS BIGINT) AS n_kept
    FROM flagged GROUP BY source ORDER BY source
    """


def _rebalance_counts(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("source")
        .agg(
            F.count("*").alias("n_orig"),
            F.sum(F.col("_keep").cast("bigint")).alias("n_kept"),
        )
        .orderBy("source")
    )


@query(
    "q126_mixture_rebalance",
    oracle=_rebalance_oracle_sql(None, None),
    doc="Deterministic mixture rebalancing toward uniform source shares: "
        "per-group integer threshold (overflow-safe at any corpus size), "
        "pure-integer md5 acceptance, no RNG, engine/run invariant.",
)
def q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return _rebalance_counts(P.rebalance_mixture(docs, "source"))


# Weighted variant: src2–src9 weight 1 (downsampled toward N/98), src10–src19
# weight 9 (above-target, keep-all), src0/src1 absent (weight 0, dropped) —
# exercises all three threshold regimes.
_Q126B_WEIGHTS = {f"src{i}": (1 if i < 10 else 9) for i in range(2, 20)}
_Q126B_VALUES = ", ".join(
    f"('{s}', {w})" for s, w in sorted(_Q126B_WEIGHTS.items())
)


@query(
    "q126b_weighted_rebalance",
    oracle=_rebalance_oracle_sql(_Q126B_VALUES, sum(_Q126B_WEIGHTS.values())),
    doc="Mixture rebalancing toward arbitrary integer target weights "
        "{source: w}; absent sources get weight 0 and are dropped.",
)
def q126b(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return _rebalance_counts(
        P.rebalance_mixture(docs, "source", target_weights=_Q126B_WEIGHTS)
    )


# --------------------------------------------------------------------------
# Q129 boilerplate/template detection: share of each doc's distinct bigrams
# that appear in >= 1/4 of its source's documents (integer df rule). The
# within-source cousin of q75's cross-corpus decontamination.
@query(
    "q129_boilerplate",
    oracle="""
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, source, toks[i] || ' ' || toks[i+1] AS gram
      FROM w, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)),
    nd AS (SELECT source, COUNT(DISTINCT doc_id) AS n FROM documents GROUP BY source),
    df AS (SELECT source, gram, COUNT(*) AS d FROM sh GROUP BY source, gram),
    bp AS (SELECT df.source, gram FROM df JOIN nd USING (source)
           WHERE d * 4 >= n * 1),
    j AS (SELECT s.doc_id, CASE WHEN bp.gram IS NOT NULL THEN 1 END AS isbp
          FROM sh s LEFT JOIN bp ON s.source = bp.source AND s.gram = bp.gram)
    SELECT doc_id, COUNT(*) AS n_grams, COUNT(isbp) AS n_bp,
           CAST(ROUND(CAST(COUNT(isbp) * 1.0 / COUNT(*) AS DECIMAL(18,6)), 4)
                AS DOUBLE) AS bp_frac
    FROM j GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Per-doc boilerplate fraction: distinct bigrams appearing in >=1/4 "
        "of the same source's docs (pure-integer df rule), the "
        "template-detection curation step.",
)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import boilerplate_score

    docs = tables(spark, sf_dir)["documents"]
    return boilerplate_score(docs, n=2, min_df_num=1, min_df_den=4)


# --------------------------------------------------------------------------
# Q130 end-to-end curation pipeline — the flagship COMPOSITION: quality gate
# (repetition ratio + min length) -> benchmark decontamination (shared
# 5-gram with src0) -> exact dedup (md5 keep-min) -> uniform mixture
# rebalancing, reported per source. Every stage is one of the corpus's
# verified operators; the oracle replays the identical integer/r4 rules, so
# the WHOLE pipeline is hash-checked, not just its pieces.
_Q130_ORACLE = f"""
WITH base AS (SELECT * FROM documents WHERE source <> 'src0'),
wl AS (SELECT doc_id, {_DUCK_WORDS} AS w FROM base),
rep AS (
  SELECT doc_id,
         CAST(ROUND(CAST(1.0 - len(list_distinct(w)) * 1.0 / len(w)
                         AS DECIMAL(18,6)), 4) AS DOUBLE) AS rr
  FROM wl),
q AS (
  SELECT b.* FROM base b JOIN rep USING (doc_id)
  WHERE rr <= 0.80 AND n_chars >= 60),
tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM q),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 4), ' ') AS gram
  FROM tok, UNNEST(generate_series(1, len(t) - 4)) AS u(i)),
btok AS (SELECT string_split(text, ' ') AS t FROM documents WHERE source = 'src0'),
bench AS (
  SELECT DISTINCT array_to_string(list_slice(t, i, i + 4), ' ') AS gram
  FROM btok, UNNEST(generate_series(1, len(t) - 4)) AS u(i)),
contaminated AS (SELECT DISTINCT doc_id FROM grams JOIN bench USING (gram)),
clean AS (
  SELECT * FROM q WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
dd AS (SELECT md5(text) AS h, MIN(doc_id) AS keep FROM clean GROUP BY 1),
ded AS (SELECT c.* FROM clean c JOIN dd ON c.doc_id = dd.keep),
counts AS (SELECT source, COUNT(*) AS n_g FROM ded GROUP BY source),
tot AS (SELECT COUNT(*) AS n, COUNT(DISTINCT source) AS s FROM ded),
thr AS (
  SELECT counts.source,
         (LEAST(CAST(n AS HUGEINT) * 16777216,
                CAST(s AS HUGEINT) * n_g * 16777216)
          + CAST(s AS HUGEINT) * n_g - 1)
         // (CAST(s AS HUGEINT) * n_g) - 1 AS thr
  FROM counts CROSS JOIN tot),
flagged AS (
  SELECT d.source, d.n_chars,
         CASE WHEN {P._md5_uniform_int_sql("doc_id", "mix")} <= thr
              THEN 1 ELSE 0 END AS keep
  FROM ded d JOIN thr USING (source))
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_in,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep = 1 THEN n_chars END) AS BIGINT) AS chars_kept
FROM flagged GROUP BY source ORDER BY source
"""


@query(
    "q130_curation_pipeline",
    oracle=_Q130_ORACLE,
    doc="End-to-end curation pipeline (quality -> decontam -> dedup -> "
        "rebalance) hash-verified as a whole; composes q66/q75/q44/q126's "
        "operators with their exact integer/r4 decision rules.",
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import ngram_contamination

    from pyspark.sql import Window

    docs = tables(spark, sf_dir)["documents"]
    base = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    # r13: rep_ratio is a row-wise expression (no aggregation), so it is
    # computed inline instead of joining the corpus onto its own
    # projection; the isNotNull filter reproduces the dropped join's
    # implicit doc_id key semantics. The dedup keep-min likewise becomes
    # a min-over-hash-partition window on ONE clean pass instead of a
    # groupBy branch joined back (which re-planned the whole quality+
    # decontam lineage a second time). documents scans: 6 -> 3.
    w = P.words_col("text")
    rep_ratio = F.round(
        (1.0 - F.size(F.array_distinct(w)) / F.size(w))
        .cast("decimal(18,6)"), 4).cast("double")
    q = (
        base.filter(F.col("doc_id").isNotNull())
        .filter((rep_ratio <= 0.80) & (F.col("n_chars") >= 60))
    )
    contaminated = ngram_contamination(q, bench, n=5).select("doc_id")
    clean = q.join(contaminated, "doc_id", "left_anti")
    wdd = Window.partitionBy(F.md5(F.col("text")))
    ded = (clean.withColumn("_kid", F.min("doc_id").over(wdd))
           .filter(F.col("doc_id") == F.col("_kid")).drop("_kid"))
    reb = P.rebalance_mixture(ded, "source")
    return (
        reb.groupBy("source")
        .agg(
            F.count("*").alias("n_in"),
            F.sum(F.col("_keep").cast("bigint")).alias("n_kept"),
            F.sum(F.when(F.col("_keep"), F.col("n_chars"))).alias("chars_kept"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
@query(
    "q131_dup_spans",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    g AS (
      SELECT doc_id, md5(array_to_string(list_slice(tk, i, i + 7), ' ')) AS g
      FROM t, UNNEST(generate_series(1, len(tk) - 7)) AS u(i)),
    d AS (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY g)
    SELECT doc_id, COUNT(*) AS n_spans,
           COUNT(CASE WHEN nd >= 2 THEN 1 END) AS n_dup,
           CAST(ROUND(CAST(COUNT(CASE WHEN nd >= 2 THEN 1 END) * 1.0 / COUNT(*)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS dup_frac
    FROM g JOIN d USING (g)
    GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Span-level exact duplication (Lee et al. 2021 signal at word-8-gram "
        "resolution): per-doc count and fraction of sliding windows whose "
        "text occurs in another document.",
)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import duplicated_spans

    docs = tables(spark, sf_dir)["documents"]
    return duplicated_spans(docs, w=8).orderBy("doc_id")


# --------------------------------------------------------------------------
@query(
    "q132_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT SUM(c) AS tot FROM vocab),
    lp AS (
      SELECT doc_id,
             ROUND(CAST(ln(c * 1.0 / tot) AS DECIMAL(18,6)), 4) AS lp
      FROM toks JOIN vocab USING (tok) CROSS JOIN tot)
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(ROUND(CAST(CAST(SUM(lp) AS DOUBLE) / COUNT(*)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS mean_logprob
    FROM lp GROUP BY doc_id ORDER BY doc_id
    """,
    doc="CCNet-style unigram-LM quality score: per-doc mean token "
        "log-probability under the corpus unigram distribution, decimal-"
        "quantized per token so the sum is aggregation-order-exact.",
)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import unigram_logprob

    docs = tables(spark, sf_dir)["documents"]
    return unigram_logprob(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
@query(
    "q133_ngram_novelty",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(tk, i, i + 4), ' ') AS gram
      FROM t, UNNEST(generate_series(1, len(tk) - 4)) AS u(i)),
    f AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT doc_id, COUNT(*) AS n_grams,
           COUNT(CASE WHEN first_doc = doc_id THEN 1 END) AS n_novel,
           CAST(ROUND(CAST(COUNT(CASE WHEN first_doc = doc_id THEN 1 END)
                           * 1.0 / COUNT(*) AS DECIMAL(18,6)), 4)
                AS DOUBLE) AS novelty
    FROM g JOIN f USING (gram)
    GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Incremental-corpus novelty: fraction of each doc's distinct word "
        "5-grams first introduced by that doc (min-doc_id ownership), the "
        "what-does-this-shard-add curation signal.",
)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import ngram_novelty

    docs = tables(spark, sf_dir)["documents"]
    return ngram_novelty(docs, n=5).orderBy("doc_id")


# --------------------------------------------------------------------------
@query(
    "q134_source_divergence",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
    gt AS (SELECT source, tok, COUNT(*) AS c_gt FROM toks GROUP BY source, tok),
    g AS (SELECT source, COUNT(*) AS n_g FROM toks GROUP BY source),
    v AS (SELECT tok, COUNT(*) AS c_t FROM toks GROUP BY tok),
    nn AS (SELECT COUNT(*) AS n FROM toks),
    s AS (
      SELECT gt.source, n_g,
             CAST(-(c_gt * 1.0 / n_g) * ln(c_gt * 1.0 / n_g)
                  AS DECIMAL(18,6)) AS h,
             CAST((c_gt * 1.0 / n_g)
                  * ln((c_gt * 1.0 * n) / (n_g * 1.0 * c_t))
                  AS DECIMAL(18,6)) AS kl
      FROM gt JOIN g USING (source) JOIN v USING (tok) CROSS JOIN nn)
    SELECT source, MAX(n_g) AS n_tokens,
           CAST(ROUND(SUM(h), 4) AS DOUBLE) AS entropy,
           CAST(ROUND(SUM(kl), 4) AS DOUBLE) AS kl_corpus
    FROM s GROUP BY source ORDER BY source
    """,
    doc="Mixture-drift diagnostics: per-source unigram entropy and KL "
        "divergence from the whole-corpus distribution (nats, 4 dp), "
        "per-term contributions decimal-quantized before summation.",
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import source_divergence

    docs = tables(spark, sf_dir)["documents"]
    return source_divergence(docs).orderBy("source")


# --------------------------------------------------------------------------
@query(
    "q136_vocab_growth",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(tk, i, i + 2), ' ') AS gram
      FROM t, UNNEST(generate_series(1, len(tk) - 2)) AS u(i)),
    f AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram),
    gr AS (SELECT first_doc, COUNT(*) AS n_new FROM f GROUP BY first_doc)
    SELECT first_doc AS doc_id, n_new,
           CAST(SUM(n_new) OVER (ORDER BY first_doc
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS vocab_size
    FROM gr ORDER BY doc_id
    """,
    doc="Vocabulary growth curve (Heaps'-law empirics) at trigram "
        "granularity: new grams introduced per doc (id order) and "
        "cumulative vocabulary size — the diminishing-returns signal for "
        "corpus acquisition.",
)
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import vocabulary_growth

    docs = tables(spark, sf_dir)["documents"]
    return vocabulary_growth(docs, n=3).orderBy("doc_id")


# --------------------------------------------------------------------------
@query(
    "q137_cross_source_dups",
    oracle="""
    WITH t AS (SELECT source, string_split(text, ' ') AS tk FROM documents),
    g AS (
      SELECT DISTINCT source,
             md5(array_to_string(list_slice(tk, i, i + 7), ' ')) AS g
      FROM t, UNNEST(generate_series(1, len(tk) - 7)) AS u(i)),
    p AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM g a JOIN g b ON a.g = b.g AND a.source < b.source)
    SELECT src_a, src_b, COUNT(*) AS n_shared
    FROM p GROUP BY src_a, src_b ORDER BY src_a, src_b
    """,
    doc="Cross-source duplication flow matrix: distinct word-8-gram spans "
        "shared per source pair — which feeds overlap, before doc-level "
        "dedup decisions.",
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import cross_source_dup_matrix

    docs = tables(spark, sf_dir)["documents"]
    return cross_source_dup_matrix(docs, w=8).orderBy("src_a", "src_b")


# --------------------------------------------------------------------------
@query(
    "q138_winsorized_stats",
    oracle="""
    WITH q AS (
      SELECT source, COUNT(*) AS n,
             CAST(ROUND(CAST(quantile_cont(n_chars, 0.05) AS DECIMAL(18,6)), 4)
                  AS DOUBLE) AS p_lo,
             CAST(ROUND(CAST(quantile_cont(n_chars, 0.95) AS DECIMAL(18,6)), 4)
                  AS DOUBLE) AS p_hi
      FROM documents GROUP BY source)
    SELECT d.source, MAX(n) AS n, MAX(p_lo) AS p_lo, MAX(p_hi) AS p_hi,
           CAST(ROUND(CAST(CAST(SUM(CAST(
                  GREATEST(LEAST(CAST(n_chars AS DOUBLE), p_hi), p_lo)
                AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)), 4)
                AS DOUBLE) AS win_mean
    FROM documents d JOIN q USING (source)
    GROUP BY d.source ORDER BY d.source
    """,
    doc="Robust per-source doc-length profile: exact p05/p95 and the "
        "winsorized mean (clamped into [p05, p95]) — outlier-proof stats "
        "for skewed length distributions.",
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.quality import winsorized_stats

    docs = tables(spark, sf_dir)["documents"]
    return winsorized_stats(docs, "source", "n_chars").orderBy("source")


# --------------------------------------------------------------------------
@query(
    "q139_centroid_separation",
    oracle=f"""
    WITH cent AS ({_CENTROID_SQL}),
    p AS (
      SELECT a.label AS la, b.label AS lb,
             SUM(CAST(a.centroid * b.centroid AS DECIMAL(28,12))) AS dot,
             SUM(CAST(a.centroid * a.centroid AS DECIMAL(28,12))) AS na,
             SUM(CAST(b.centroid * b.centroid AS DECIMAL(28,12))) AS nb
      FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
      GROUP BY a.label, b.label)
    SELECT la, lb,
           CAST(ROUND(CAST(CAST(dot AS DOUBLE)
                           / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE)))
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS cos
    FROM p ORDER BY la, lb
    """,
    doc="Cluster-separation matrix: pairwise cosine between 4dp-pinned "
        "label centroids, decimal-exact dot/norm accumulation.",
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import centroid_separation

    return centroid_separation(
        tables(spark, sf_dir)["embeddings"]).orderBy("la", "lb")


# --------------------------------------------------------------------------
@query(
    "q138b_mad",
    oracle="""
    WITH m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(ROUND(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,6)), 4)
                  AS DOUBLE) AS med
      FROM events GROUP BY event_type)
    SELECT e.event_type, MAX(n) AS n, MAX(med) AS med,
           CAST(ROUND(CAST(quantile_cont(ABS(CAST(value AS DOUBLE) - med), 0.5)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS mad
    FROM events e JOIN m USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    doc="Median absolute deviation per event type: robust spread via two "
        "percentile passes with the 4dp-pinned median broadcast between.",
)
def q138b(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.quality import mad_stats

    ev = tables(spark, sf_dir)["events"]
    return mad_stats(ev, "event_type", "value").orderBy("event_type")


# --------------------------------------------------------------------------
# Q147 interpolated bigram-LM quality score — the next model up from q132's
# unigram: p(cur|prev) = 0.7·c2/c1(prev) + 0.3·c1(cur)/total. Bigram pairs
# come straight from the token array by index (zero shuffle); both count
# tables are Heaps'-law bounded broadcasts; per-token quantization before
# the per-doc sum keeps the aggregate order-exact on both engines.
@query(
    "q147_bigram_logprob",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    toks AS (SELECT doc_id, unnest(tk) AS tok FROM t),
    vocab AS (SELECT tok, COUNT(*) AS c1 FROM toks GROUP BY tok),
    tot AS (SELECT COUNT(*) AS tot FROM toks),
    bi AS (
      SELECT doc_id, tk[i - 1] AS prev, tk[i] AS cur
      FROM t, UNNEST(generate_series(2, len(tk))) AS u(i)
      WHERE len(tk) >= 2),
    c2t AS (SELECT prev, cur, COUNT(*) AS c2 FROM bi GROUP BY prev, cur),
    lp AS (
      SELECT doc_id,
             ROUND(CAST(ln(CAST(0.7 AS DOUBLE) * c2 / c1p
                           + CAST(0.3 AS DOUBLE) * c1c / tot)
                        AS DECIMAL(18,6)), 4) AS lp
      FROM bi
      JOIN c2t USING (prev, cur)
      JOIN (SELECT tok AS prev, c1 AS c1p FROM vocab) vp USING (prev)
      JOIN (SELECT tok AS cur, c1 AS c1c FROM vocab) vc USING (cur)
      CROSS JOIN tot)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(ROUND(CAST(CAST(SUM(lp) AS DOUBLE) / COUNT(*)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS mean_logprob
    FROM lp GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Interpolated bigram language-model score per document: "
        "λ·bigram + (1−λ)·unigram, per-token decimal quantization.",
)
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import bigram_logprob

    docs = tables(spark, sf_dir)["documents"]
    return bigram_logprob(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q157 deterministic weighted sampling without replacement (Efraimidis–
# Spirakis): longer documents proportionally more likely; no RNG — the
# md5 uniform makes selection identical across engines/runs/layouts. The
# 6-dp decimal rounding of the key BEFORE ranking makes the top-k boundary
# engine-portable; ties break on doc_id.
from inspectadb_spark.operators.pipeline import _md5_uniform_int_sql  # noqa: E402

_Q157_U = f"(CAST({_md5_uniform_int_sql('doc_id', 'ws')} AS DOUBLE) + 1) / 16777216"


@query(
    "q157_weighted_sample",
    oracle=f"""
    SELECT doc_id, n_chars,
           CAST(ROUND(CAST(-ln({_Q157_U}) / n_chars AS DECIMAL(18,6)), 6)
                AS DOUBLE) AS es_key
    FROM documents
    ORDER BY es_key, doc_id LIMIT 50
    """,
    doc="A-ES weighted sample (k=50, weight=n_chars): md5-uniform keys, "
        "6-dp decimal-rounded before the global top-k.",
)
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.pipeline import weighted_sample

    docs = tables(spark, sf_dir)["documents"]
    return weighted_sample(docs, "n_chars", k=50).select(
        "doc_id", "n_chars", F.col("_es_key").alias("es_key")
    )


# --------------------------------------------------------------------------
# Q169 tokenizer fertility by language: chars-per-token (the tokenizer-
# efficiency metric a multilingual corpus is balanced on). Exact integer
# char/token totals; one doc-local projection + a lang rollup.
@query(
    "q169_tokenizer_fertility",
    oracle=f"""
    WITH d AS (
      SELECT lang, length(text) AS n_chars,
             len({_DUCK_WORDS}) AS n_toks
      FROM documents)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(n_toks) AS BIGINT) AS toks,
           CAST(ROUND(CAST(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_toks)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS fertility
    FROM d GROUP BY lang ORDER BY lang
    """,
    doc="Chars-per-token fertility by language — the tokenizer-efficiency "
        "signal for mixture balancing.",
)
def q169(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    d = docs.select(
        "lang",
        F.length("text").alias("n_chars"),
        F.size(F.expr("filter(split(text, ' '), w -> w <> '')")).alias("n_toks"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
            F.sum("n_toks").cast("bigint").alias("toks"),
            F.round(
                (F.sum("n_chars").cast("double") / F.sum("n_toks"))
                .cast("decimal(18,6)"), 4
            ).cast("double").alias("fertility"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q170 cross-lingual duplicate detection: identical text bodies filed
# under DIFFERENT language labels — a labeling-error/contamination signal
# the per-lang dedup passes miss. One shuffle on md5(text).
@query(
    "q170_crosslingual_dups",
    oracle="""
    WITH h AS (
      SELECT md5(text) AS th, lang, doc_id FROM documents),
    g AS (
      SELECT th, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
             MIN(doc_id) AS first_doc
      FROM h GROUP BY th HAVING COUNT(DISTINCT lang) > 1)
    SELECT first_doc, n_docs, n_langs FROM g ORDER BY first_doc
    """,
    doc="Texts duplicated across language labels (labeling-error signal); "
        "one md5-keyed shuffle.",
)
def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return (
        docs.select(F.md5("text").alias("th"), "lang", "doc_id")
        .groupBy("th")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_langs") > 1)
        .select("first_doc", "n_docs", "n_langs")
        .orderBy("first_doc")
    )


# --------------------------------------------------------------------------
# Q188 PMI collocations: phrase-vocabulary mining before tokenizer training.
# Ranking is by the 4dp-rounded score with a lexical tiebreak (the q63
# pattern), so top-k membership and order are engine-invariant.
@query(
    "q188_pmi_collocations",
    oracle="""
    WITH tk AS (SELECT string_split(text, ' ') AS tk FROM documents),
    toks AS (SELECT unnest(tk) AS tok FROM tk),
    vocab AS (SELECT tok, COUNT(*) AS c1 FROM toks GROUP BY tok),
    nt AS (SELECT COUNT(*) AS n_uni FROM toks),
    bi AS (
      SELECT tk[i - 1] AS w1, tk[i] AS w2
      FROM tk, UNNEST(generate_series(2, len(tk))) AS u(i)
      WHERE len(tk) >= 2),
    nb AS (SELECT COUNT(*) AS n_bi FROM bi),
    c2 AS (SELECT w1, w2, COUNT(*) AS n_pair FROM bi
           GROUP BY w1, w2 HAVING COUNT(*) >= 5),
    scored AS (
      SELECT w1, w2, n_pair,
             CAST(ROUND(CAST(
               ln(CAST(n_pair AS DOUBLE) * n_uni / c1a.c1 / c1b.c1
                  * n_uni / n_bi)
               AS DECIMAL(18,6)), 4) AS DOUBLE) AS pmi
      FROM c2
      JOIN vocab c1a ON c2.w1 = c1a.tok
      JOIN vocab c1b ON c2.w2 = c1b.tok
      CROSS JOIN nt CROSS JOIN nb)
    SELECT w1, w2, n_pair, pmi FROM scored
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
    doc="Top-50 PMI-scored bigram collocations (min_count=5): word2phrase-"
        "style phrase mining; broadcast Heaps'-law vocab, top-k via "
        "TakeOrderedAndProject.",
)
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import pmi_collocations

    docs = tables(spark, sf_dir)["documents"]
    return pmi_collocations(docs, min_count=5, k=50)


# --------------------------------------------------------------------------
# Q189 KMV (bottom-k) sketch cross-source overlap: the scalable form of
# q137's exact dup-flow matrix. Signatures are |sources|*k rows; every
# pairwise step runs on that constant-size table. Pure-integer output.
@query(
    "q189_kmv_overlap",
    oracle="""
    WITH tk AS (
      SELECT source, string_split(text, ' ') AS tk FROM documents),
    g AS (
      SELECT DISTINCT source AS g,
             md5(array_to_string(list_slice(tk, i, i + 4), ' ')) AS h
      FROM tk, UNNEST(generate_series(1, len(tk) - 4)) AS u(i)),
    sig AS (
      SELECT g, h FROM g
      QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) <= 128),
    pairs AS (
      SELECT a.g AS src_a, b.g AS src_b
      FROM (SELECT DISTINCT g FROM sig) a
      JOIN (SELECT DISTINCT g FROM sig) b ON a.g < b.g),
    u AS (
      SELECT src_a, src_b, h, MAX(fa) AS fa, MAX(fb) AS fb FROM (
        SELECT p.src_a, p.src_b, s.h, 1 AS fa, 0 AS fb
        FROM pairs p JOIN sig s ON s.g = p.src_a
        UNION ALL
        SELECT p.src_a, p.src_b, s.h, 0 AS fa, 1 AS fb
        FROM pairs p JOIN sig s ON s.g = p.src_b)
      GROUP BY src_a, src_b, h),
    bottom AS (
      SELECT src_a, src_b, fa, fb FROM u
      QUALIFY ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) <= 128)
    SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS kk,
           CAST(SUM(fa * fb) AS BIGINT) AS n_common,
           CAST(SUM(fa * fb) * 1000000 // COUNT(*) AS BIGINT) AS jaccard_ppm
    FROM bottom GROUP BY src_a, src_b ORDER BY src_a, src_b
    """,
    doc="Pairwise source Jaccard ESTIMATES from mergeable bottom-k md5 "
        "sketches of word-5-grams — O(|sources|*k) pair stage, no floats.",
)
def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.sketches import kmv_pairwise_jaccard
    from inspectadb_spark.operators.text import word_ngrams

    docs = tables(spark, sf_dir)["documents"]
    grams = word_ngrams(docs.withColumnRenamed("source", "src"), n=5,
                        id_col="src")
    return kmv_pairwise_jaccard(
        grams, group_col="src", key_col="gram", k=128
    ).orderBy("src_a", "src_b")


# --------------------------------------------------------------------------
# Q192 entity-grouped cross-validation folds: the fold is a pure-hash
# function of the ENTITY (user), so every row of a user lands in the same
# fold by construction — the leakage-safe split (row-hash splits put one
# user's events in both train and eval, inflating metrics). Same md5
# machinery as q83's shards; the contract here is entity atomicity.
_FOLD = f"({_md5_uniform_int_sql('user_id', 'fold')} % 5)"


@query(
    "q192_group_kfold",
    oracle=f"""
    WITH f AS (
      SELECT user_id, {_FOLD} AS fold, COUNT(*) AS n_events
      FROM events GROUP BY user_id),
    t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS tot FROM f)
    SELECT CAST(fold AS INT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(n_events) * 1000000 // tot AS BIGINT) AS events_ppm
    FROM f CROSS JOIN t GROUP BY fold, tot ORDER BY fold
    """,
    doc="Entity-grouped 5-fold CV assignment: md5(user) fold, per-fold "
        "user/event counts + integer-ppm shares; leakage-safe by "
        "construction (one user never straddles folds).",
)
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    f = ev.groupBy("user_id").agg(F.count("*").alias("n_events")).select(
        F.expr(_FOLD).cast("int").alias("fold"), "n_events")
    t = f.agg(F.sum("n_events").alias("tot"))
    return (
        f.join(F.broadcast(t))
        .groupBy("fold", "tot")
        .agg(F.count("*").alias("n_users"),
             F.sum("n_events").alias("n_events"))
        .select("fold", "n_users", "n_events",
                F.expr("n_events * 1000000 DIV tot").alias("events_ppm"))
        .orderBy("fold")
    )


# --------------------------------------------------------------------------
# Q194 BPE tokenizer training: the first 12 merge rules learned from the
# corpus (Sennrich-style, word-frequency formulation — the corpus pays ONE
# aggregation; every iteration runs on the Heaps'-law-small word table).
# Iterative with a 1-row collect per round — not SQL-expressible; pinned
# against an independent pure-Python BPE reference in tests.
@query(
    "q194_bpe_merges",
    oracle=None,
    check="P: iterative 1-row-collect-per-round learner (not "
          "SQL-expressible); pinned against an independent pure-Python "
          "BPE reference in tests/test_tokenizer.py",
    doc="First 12 BPE merge rules (rank, left, right, merged, pair_freq): "
        "deterministic (freq DESC, left, right) selection, greedy "
        "non-overlapping JVM-fold merges on the word-frequency table.",
)
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.tokenizer import bpe_merges

    docs = tables(spark, sf_dir)["documents"]
    return bpe_merges(docs, n_merges=12).orderBy("rank")


# --------------------------------------------------------------------------
# Q198 exact heavy hitters with Misra–Gries pruning: the frequency-domain
# member of the mergeable-summary family (HLL q84 / CMS q94 / Bloom q181 /
# vhist q184 / KMV q189). Phase 1 bounds memory at m counters per partition
# regardless of vocabulary size; phase 2's exact verify makes the output
# hash-identical to the plain GROUP BY ... HAVING oracle.
@query(
    "q198_heavy_hitters",
    oracle="""
    WITH tk AS (SELECT string_split(text, ' ') AS tk FROM documents),
    g AS (
      SELECT array_to_string(list_slice(tk, i, i + 2), ' ') AS gram
      FROM tk, UNNEST(generate_series(1, len(tk) - 2)) AS u(i)),
    c AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY gram),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM g)
    SELECT gram, cnt, tot, cnt * 1000000 // tot AS freq_ppm
    FROM c CROSS JOIN t
    WHERE cnt * 5000 >= tot
    ORDER BY cnt DESC, gram
    """,
    doc="Word-trigram heavy hitters (freq >= total/5000): Misra–Gries "
        "per-partition candidate pruning + broadcast-semi-join exact "
        "verification — exact counts, bounded memory, vocabulary never "
        "shuffled.",
)
def q198(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.scale import spread_small_scan
    from inspectadb_spark.operators.sketches import heavy_hitters
    from inspectadb_spark.operators.text import word_ngrams

    docs = tables(spark, sf_dir)["documents"]
    # r13: spread the single-split scan so the Misra-Gries phase-1 pass
    # runs one summary per core instead of one task over the whole gram
    # stream; phase 2's exact verify is partitioning-invariant by design
    # (its no-false-negatives pigeonhole holds for any partitioning).
    grams = word_ngrams(spread_small_scan(docs.select("doc_id", "text")),
                        n=3, distinct=False).select("gram")
    return heavy_hitters(grams, col="gram", denom=5000)


# --------------------------------------------------------------------------
# Q201 blocklist screening: the relational form of safety/PII/canary phrase
# filtering. Occurrence counts via the replace-length identity keep the whole
# operator in codegen; the never-matching pattern exercises the empty case.
_BLOCKLIST = ("big data", "slow query", "customer data", "fast scan",
              "dup dup", "forbidden phrase")
_BL_VALUES = ", ".join(f"('{p}')" for p in _BLOCKLIST)


@query(
    "q201_blocklist",
    oracle=f"""
    WITH pats(pat) AS (VALUES {_BL_VALUES})
    SELECT doc_id, pat,
           CAST((length(text) - length(replace(text, pat, ''))) / length(pat)
                AS BIGINT) AS n_occ
    FROM documents CROSS JOIN pats
    WHERE contains(text, pat)
    ORDER BY doc_id, pat
    """,
    doc="Multi-pattern blocklist screening: (doc, pattern, occurrences) for "
        "every blocklist phrase literally present — broadcast pattern list, "
        "scan-side contains, replace-length occurrence counting.",
)
def q201(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import blocklist_matches

    docs = tables(spark, sf_dir)["documents"]
    pats = spark.createDataFrame([(p,) for p in _BLOCKLIST], "pat string")
    return blocklist_matches(docs, pats)


# --------------------------------------------------------------------------
# Q199 tokenizer fertility payoff: learn the first 8 BPE merges (q194's
# collect-loop training), apply them to the corpus (stacked codegen column
# rewrites — scan-side), and report the per-language compression. The
# training loop is iterative with a 1-row collect per round, so the query
# is rows-only (not SQL-expressible); the encode fold is pinned against a
# pure-Python BPE reference in tests/test_tokenizer.py.
@query(
    "q199_bpe_encode",
    oracle=None,
    check="rows-only: the one driver-side encode loop (Heaps'-law-small "
          "rule table — watched, kept off data-scale paths); encode fold "
          "pinned against a pure-Python BPE reference in "
          "tests/test_tokenizer.py",
    doc="Per-language symbol compression from applying the first 8 learned "
        "BPE merges: (lang, n_docs, n_words, n_syms_char, n_syms_bpe, "
        "saved_ppm) — the fertility payoff of q194's rules.",
)
def q199(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.tokenizer import bpe_encode, bpe_merges

    docs = tables(spark, sf_dir)["documents"]
    rules_df = bpe_merges(docs, n_merges=8)
    rules = [(r["left"], r["right"])
             for r in rules_df.orderBy("rank").collect()]
    enc = bpe_encode(docs, rules)
    return (
        enc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_words").alias("n_words"),
             F.sum("n_syms_char").alias("n_syms_char"),
             F.sum("n_syms_bpe").alias("n_syms_bpe"))
        .withColumn(
            "saved_ppm",
            F.expr("(n_syms_char - n_syms_bpe) * 1000000 DIV n_syms_char"))
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q205 dataset card: the one-query per-source corpus report a training run
# records next to the data — volume, token mass, language mix (mode with a
# deterministic tie rule), and within-source exact-duplication rate. Pure
# composition of verified primitives; every ratio is integer ppm.
@query(
    "q205_dataset_card",
    oracle="""
    WITH base AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM documents GROUP BY source),
    lc AS (
      SELECT source, lang, COUNT(*) AS cnt FROM documents
      GROUP BY source, lang),
    tl AS (
      SELECT source, lang AS top_lang, cnt FROM (
        SELECT source, lang, cnt,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY cnt DESC, lang) AS r
        FROM lc) t WHERE r = 1),
    dup AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n_dup_docs FROM (
        SELECT source, md5(text) AS h, COUNT(*) AS c FROM documents
        GROUP BY source, md5(text) HAVING COUNT(*) > 1) g
      GROUP BY source)
    SELECT b.source, b.n_docs, b.n_tokens, b.n_chars, b.n_langs,
           tl.top_lang, tl.cnt * 1000000 // b.n_docs AS top_lang_ppm,
           CAST(COALESCE(d.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
           COALESCE(d.n_dup_docs, 0) * 1000000 // b.n_docs AS dup_ppm
    FROM base b JOIN tl USING (source)
    LEFT JOIN dup d USING (source)
    ORDER BY source
    """,
    doc="Per-source dataset card: docs, token/char mass, language count, "
        "modal language (ppm share, deterministic ties), within-source "
        "exact-dup docs and rate — the report a curation run files with "
        "the shipped data.",
)
def q205(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = tables(spark, sf_dir)["documents"]
    base = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"))
    lc = docs.groupBy("source", "lang").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("lang"))
    tl = (lc.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
          .select("source", F.col("lang").alias("top_lang"), "cnt"))
    dup = (docs.groupBy("source", F.md5("text").alias("h"))
           .agg(F.count("*").alias("c")).filter(F.col("c") > 1)
           .groupBy("source").agg(F.sum("c").alias("n_dup_docs")))
    return (
        base.join(tl, "source").join(dup, "source", "left")
        .select(
            "source", "n_docs", "n_tokens", "n_chars", "n_langs", "top_lang",
            F.expr("cnt * 1000000 DIV n_docs").alias("top_lang_ppm"),
            F.coalesce("n_dup_docs", F.lit(0)).alias("n_dup_docs"),
            F.expr("coalesce(n_dup_docs, 0) * 1000000 DIV n_docs")
            .alias("dup_ppm"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q261 sequence-packing efficiency report (operators/pipeline.py::
# packing_efficiency): per source, the padding cost of one-doc-per-
# sequence batching vs dense concatenation at context length 128 — the
# measurement that justifies running pack_sequences (q79) at all. Exact
# integer ceil/ppm arithmetic end to end.
@query(
    "q261_packing_efficiency",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(len({_DUCK_WORDS}) AS BIGINT) AS tok
      FROM documents),
    g AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS tokens,
             CAST(SUM((tok + 127) // 128) AS BIGINT) AS padded_seqs
      FROM s GROUP BY source)
    SELECT source, n_docs, tokens, padded_seqs,
           CAST(padded_seqs * 128 - tokens AS BIGINT) AS pad_tokens,
           CAST(tokens * 1000000 // (padded_seqs * 128) AS BIGINT)
             AS padded_util_ppm,
           CAST((tokens + 127) // 128 AS BIGINT) AS packed_seqs,
           CAST(tokens * 1000000 // (((tokens + 127) // 128) * 128)
                AS BIGINT) AS packed_util_ppm
    FROM g ORDER BY source
    """,
    doc="Packing-efficiency report at context 128: per source, sequences "
        "and utilization under one-doc-per-sequence padding vs dense "
        "concatenation — the gap is what sequence packing buys.",
)
def q261(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    return P.packing_efficiency(docs, budget=128).orderBy("source")


# --------------------------------------------------------------------------
# Q265 simplified silhouette per label (operators/similarity.py::
# label_silhouette): a = distance to own 4dp-pinned label centroid, b =
# min distance to any other, s = (b-a)/max(a,b), per-vector-quantized
# then decimal-mean'd per label — the geometry-level embedding-quality
# score next to q224's 1-NN accuracy and q139's centroid separation.
@query(
    "q265_label_silhouette",
    oracle=f"""
    WITH cent AS ({_CENTROID_SQL}),
    expl AS (
      SELECT vec_id, label, CAST(i AS INT) AS dim,
             CAST(embedding[i] AS DOUBLE) AS x
      FROM (SELECT vec_id, label, embedding,
                   unnest(generate_series(1, 64)) AS i
            FROM embeddings)),
    d AS (
      SELECT e.vec_id, e.label, c.label AS cand,
             CAST(ROUND(CAST(SQRT(CAST(SUM(CAST((x - centroid) * (x - centroid)
                                              AS DECIMAL(28,12))) AS DOUBLE))
                             AS DECIMAL(18,6)), 4) AS DOUBLE) AS dist
      FROM expl e JOIN cent c ON e.dim = c.dim
      GROUP BY e.vec_id, e.label, c.label),
    pv AS (
      SELECT vec_id, label,
             MIN(CASE WHEN cand = label THEN dist END) AS a,
             MIN(CASE WHEN cand <> label THEN dist END) AS b
      FROM d GROUP BY vec_id, label),
    sv AS (
      SELECT vec_id, label,
             CASE WHEN GREATEST(a, b) > 0
                  THEN CAST(ROUND(CAST((b - a) / GREATEST(a, b)
                                       AS DECIMAL(18,6)), 4) AS DECIMAL(18,4))
                  ELSE CAST(0 AS DECIMAL(18,4)) END AS s
      FROM pv)
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(ROUND(CAST(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE)
                           / COUNT(*) AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS mean_silhouette,
           CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative
    FROM sv GROUP BY label ORDER BY label
    """,
    doc="Per-label simplified silhouette vs 4dp-pinned label centroids: "
        "mean s and misplaced-vector count; decimal residual sums, "
        "per-vector quantization before the mean.",
)
def q265(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import label_silhouette

    return label_silhouette(tables(spark, sf_dir)["embeddings"]).orderBy("label")


# --------------------------------------------------------------------------
# Q267 reciprocal best match / mutual nearest neighbors over the q224
# sample (operators/similarity.py::mutual_nn): pairs that are each
# other's cosine top-1 — the precision filter bitext mining applies
# before trusting a one-directional top-1. ppm cosine, id tie-breaks.
@query(
    "q267_mutual_nn",
    oracle="""
    WITH v AS (
      SELECT vec_id AS id, embedding AS v, label FROM embeddings
      WHERE vec_id % 10 = 3),
    z AS (
      SELECT a.id AS ida, b.id AS idb, a.label AS la, b.label AS lb,
             UNNEST(a.v) AS x, UNNEST(b.v) AS y
      FROM v a CROSS JOIN v b WHERE a.id <> b.id),
    s AS (
      SELECT ida, idb, la, lb,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
      FROM z GROUP BY ida, idb, la, lb),
    p AS (
      SELECT ida, idb,
             CAST(CAST(dot / (SQRT(na) * SQRT(nb)) AS DECIMAL(18,6))
                  * 1000000 AS BIGINT) AS sim_ppm
      FROM s WHERE na > 0 AND nb > 0),
    nn AS (
      SELECT ida, idb AS nn, sim_ppm FROM (
        SELECT ida, idb, sim_ppm,
               ROW_NUMBER() OVER (PARTITION BY ida
                                  ORDER BY sim_ppm DESC, idb) AS r
        FROM p) t WHERE r = 1),
    m AS (
      SELECT f.ida AS id_a, f.nn AS id_b, f.sim_ppm
      FROM nn f JOIN nn r ON r.ida = f.nn AND r.nn = f.ida
      WHERE f.ida < f.nn)
    SELECT id_a, id_b, sim_ppm,
           va.label AS label_a, vb.label AS label_b,
           va.label = vb.label AS same_label
    FROM m JOIN v va ON va.id = id_a JOIN v vb ON vb.id = id_b
    ORDER BY id_a
    """,
    doc="Mutual cosine top-1 pairs over the vec_id%10=3 sample: "
        "reciprocal best match with ppm similarity and label agreement.",
)
def q267(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import mutual_nn

    return mutual_nn(tables(spark, sf_dir)["embeddings"]).orderBy("id_a")


# --------------------------------------------------------------------------
# Q270 held-out cross-entropy (operators/text.py::heldout_unigram_xent):
# per source, test-token mass, OOV ppm, and mean negative logprob in
# nats under an add-1-smoothed unigram LM fit on the md5 doc split's
# train side — the fit-on-train eval next to q132's in-corpus scoring
# and q264's coverage; split leakage reads as suspiciously low xent.
# Per-token lp quantized to 4dp decimal before the fold (q132 two-step).
@query(
    "q270_heldout_xent",
    oracle="""
    WITH toks AS (
      SELECT source,
             CASE WHEN (instr('0123456789abcdef',
                              substr(md5(CAST(doc_id AS VARCHAR)
                                         || ':split'), 1, 1)) - 1) < 13
                  THEN 'train' ELSE 'test' END AS split,
             unnest(string_split(text, ' ')) AS tok
      FROM documents),
    vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks
              WHERE split = 'train' GROUP BY tok
              ORDER BY c DESC, tok LIMIT 25),
    st AS (SELECT CAST(SUM(c) AS BIGINT) AS nt,
                  CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    sc AS (
      SELECT t.source,
             CASE WHEN vocab.c IS NULL THEN 1 ELSE 0 END AS oov,
             ROUND(CAST(ln((COALESCE(vocab.c, 0) + 1) * 1.0
                           / (nt + v + 1)) AS DECIMAL(18,6)), 4) AS lp
      FROM toks t LEFT JOIN vocab USING (tok) CROSS JOIN st
      WHERE t.split = 'test')
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_test_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(SUM(oov) * 1000000 // COUNT(*) AS BIGINT) AS oov_ppm,
           CAST(ROUND(CAST(CAST(-SUM(lp) AS DOUBLE) / COUNT(*)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS xent_nats
    FROM sc GROUP BY source ORDER BY source
    """,
    doc="Held-out unigram cross-entropy per source: add-1-smoothed "
        "top-25-truncated-vocab LM fit on the md5 train split, OOV ppm "
        "+ mean neg logprob (nats), per-token decimal quantization for "
        "order-exact folds.",
)
def q270(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import heldout_unigram_xent

    docs = tables(spark, sf_dir)["documents"]
    return heldout_unigram_xent(docs, vocab_top_k=25).orderBy("source")


# --------------------------------------------------------------------------
# Q267b full-corpus mutual-NN via SRP buckets (operators/similarity.py::
# mutual_nn_ann): the production form whose bounded-sample audit is
# q267 — candidate edges from 8 x 8-bit SRP signature tables, exact ppm
# cosine on candidates, reciprocal-best filter. Rows-only: SRP planes
# are seeded numpy with no SQL analog; the property suite pins ANN ==
# exact on separable data and the recall bound on this corpus.
@query("q267b_mutual_nn_ann", oracle=None,
       check="P: SRP-bucketed candidate graph (recall-class); exact "
             "within the graph, recall vs the oracled q267 audit sample "
             "pinned in tests/test_properties.py",
       doc="Full-corpus reciprocal best match through SRP candidate "
           "buckets — never vector x vector; exact within the candidate "
           "graph.")
def q267b(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import mutual_nn_ann

    e = tables(spark, sf_dir)["embeddings"]
    return mutual_nn_ann(e).orderBy("id_a")


# --------------------------------------------------------------------------
# Q283 pairwise Jensen-Shannon divergence between source unigram
# distributions (operators/text.py::js_divergence_pairs): the symmetric
# bounded mixture distance q134's one-sided KL can't give — which
# sources are interchangeable, which genuinely differ. One token-key
# equi-join between per-source count tables (never a vocab outer join:
# single-side tokens contribute exactly p·ln2, folded from exact shared
# masses); per-term decimal quantization keeps the sum order-exact.
@query(
    "q283_js_divergence",
    oracle="""
    WITH toks AS (
      SELECT source AS g, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE source IS NOT NULL),
    gt AS (SELECT g, tok, COUNT(*) AS c FROM toks GROUP BY g, tok),
    tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM gt GROUP BY g),
    sh AS (
      SELECT a.g AS ga, b.g AS gb, na.n AS na, nb.n AS nb,
             a.c AS ca, b.c AS cb,
             CAST((CAST(a.c AS DOUBLE) / na.n)
                  * ln(2.0 * a.c * nb.n / (CAST(a.c AS DOUBLE) * nb.n
                                           + CAST(b.c AS DOUBLE) * na.n))
                  + (CAST(b.c AS DOUBLE) / nb.n)
                  * ln(2.0 * b.c * na.n / (CAST(a.c AS DOUBLE) * nb.n
                                           + CAST(b.c AS DOUBLE) * na.n))
                  AS DECIMAL(18,6)) AS term
      FROM gt a JOIN gt b ON a.tok = b.tok AND a.g < b.g
      JOIN tot na ON na.g = a.g JOIN tot nb ON nb.g = b.g),
    agg AS (
      SELECT ga, gb, na, nb,
             CAST(COUNT(*) AS BIGINT) AS n_shared_vocab,
             SUM(term) AS s,
             CAST(SUM(ca) AS BIGINT) AS sca,
             CAST(SUM(cb) AS BIGINT) AS scb
      FROM sh GROUP BY ga, gb, na, nb)
    SELECT ga AS source_a, gb AS source_b, n_shared_vocab,
           CAST(ROUND(CAST(0.5 * (CAST(s AS DOUBLE)
                + (1 - CAST(sca AS DOUBLE) / na) * ln(2)
                + (1 - CAST(scb AS DOUBLE) / nb) * ln(2))
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS jsd,
           CAST(ROUND(CAST((0.5 * (CAST(s AS DOUBLE)
                + (1 - CAST(sca AS DOUBLE) / na) * ln(2)
                + (1 - CAST(scb AS DOUBLE) / nb) * ln(2))) / ln(2)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS jsd_norm
    FROM agg ORDER BY source_a, source_b
    """,
    doc="Pairwise Jensen-Shannon divergence between source unigram "
        "distributions (nats and ln2-normalized), shared-token join "
        "plus exact only-mass fold — the symmetric mixture distance.",
)
def q283(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import js_divergence_pairs

    docs = tables(spark, sf_dir)["documents"]
    return js_divergence_pairs(docs).orderBy("source_a", "source_b")


def ndcg_readout(c: DataFrame) -> DataFrame:
    """NDCG@3/@1 closed form over (user_id, event_type)-grain sufficient
    statistics: ``s`` = model-half interaction count (the ranking score),
    ``r`` = graded second-half relevance. Shared VERBATIM by the q291
    batch query and the S48 live model-eval monitor
    (tests/test_streaming.py), so batch ≡ stream is an identity of code,
    not a coincidence of math."""
    from pyspark.sql import Window

    wp = Window.partitionBy("user_id").orderBy(F.desc("s"), "event_type")
    wi = Window.partitionBy("user_id").orderBy(F.desc("r"), "event_type")
    p = c.select("user_id", "r",
                 F.row_number().over(wp).alias("pos"),
                 F.row_number().over(wi).alias("ipos"))
    u = p.groupBy("user_id").agg(
        F.sum(F.expr("CASE WHEN pos <= 3 THEN ROUND(CAST("
                     "r / log2(pos + 1.0) AS DECIMAL(18,6)), 6)"
                     " ELSE 0 END")).alias("dcg3"),
        F.sum(F.expr("CASE WHEN ipos <= 3 THEN ROUND(CAST("
                     "r / log2(ipos + 1.0) AS DECIMAL(18,6)), 6)"
                     " ELSE 0 END")).alias("idcg3"),
        F.sum(F.expr("CASE WHEN pos = 1 THEN r ELSE 0 END")).alias("dcg1"),
        F.sum(F.expr("CASE WHEN ipos = 1 THEN r ELSE 0 END"))
        .alias("idcg1"))
    q = (u.filter("idcg3 > 0")
         .select(F.expr("ROUND(CAST(CAST(dcg3 AS DOUBLE)"
                        " / CAST(idcg3 AS DOUBLE)"
                        " AS DECIMAL(18,6)), 6)").alias("ndcg3"),
                 F.expr("ROUND(CAST(CAST(dcg1 AS DOUBLE) / idcg1"
                        " AS DECIMAL(18,6)), 6)").alias("ndcg1")))
    return q.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.expr("CAST(ROUND(CAST(CAST(SUM(ndcg3) AS DOUBLE) / COUNT(*)"
               " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("avg_ndcg3"),
        F.expr("CAST(ROUND(CAST(CAST(SUM(ndcg1) AS DOUBLE) / COUNT(*)"
               " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("avg_ndcg1"))




def mrr_readout(c: DataFrame) -> DataFrame:
    """MRR / hit@1 / hit@3 closed form over (user_id, event_type)-grain
    sufficient statistics: ``s`` = model-half interaction count (the
    ranking score), ``r`` = binaryizable second-half relevance (q292
    passes the HIGH-VALUE count). Shared VERBATIM by the q292 batch query
    and the S48 live model-eval monitor (tests/test_streaming.py)."""
    from pyspark.sql import Window

    wp = Window.partitionBy("user_id").orderBy(F.desc("s"), "event_type")
    p = c.select("user_id", "r",
                 F.row_number().over(wp).alias("pos"))
    u = (p.groupBy("user_id")
         .agg(F.min(F.expr("CASE WHEN r > 0 THEN pos END")).alias("frp"),
              F.max("r").alias("mr"))
         .filter("mr > 0"))
    return u.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.expr("CAST(ROUND(CAST(CAST(SUM(ROUND(CAST(1.0 / frp"
               " AS DECIMAL(18,6)), 6)) AS DOUBLE) / COUNT(*)"
               " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("mrr"),
        F.expr("SUM(CASE WHEN frp = 1 THEN 1 ELSE 0 END) * 1000000"
               " DIV COUNT(*)").alias("hit1_ppm"),
        F.expr("SUM(CASE WHEN frp <= 3 THEN 1 ELSE 0 END) * 1000000"
               " DIV COUNT(*)").alias("hit3_ppm"))




# --------------------------------------------------------------------------
# Q291 NDCG@k of a next-interaction recommender: per user, event types
# are ranked by FIRST-half activity (days 1-15, the "model"), graded
# relevance is SECOND-half activity (days 16-30, the "future") — the
# ranking-quality eval that completes the metric family (q185 ROC AUC,
# q280 average precision grade set-level discrimination; NDCG grades
# position-discounted ranked lists). Per-user candidate lists are
# bounded by the event-type domain, so every window partitions by user;
# DCG/IDCG terms and per-user NDCG are DECIMAL(18,6)-quantized before
# the cross-user sum (q280 convention) so the average is
# aggregation-order-exact on both engines.
@query(
    "q291_ndcg",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type,
             SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS s,
             SUM(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END) AS r
      FROM events GROUP BY user_id, event_type),
    p AS (
      SELECT user_id, r,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY s DESC, event_type) AS pos,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY r DESC, event_type) AS ipos
      FROM c),
    u AS (
      SELECT user_id,
             SUM(CASE WHEN pos <= 3 THEN ROUND(CAST(
                   r / log2(pos + 1.0) AS DECIMAL(18,6)), 6)
                 ELSE 0 END) AS dcg3,
             SUM(CASE WHEN ipos <= 3 THEN ROUND(CAST(
                   r / log2(ipos + 1.0) AS DECIMAL(18,6)), 6)
                 ELSE 0 END) AS idcg3,
             SUM(CASE WHEN pos = 1 THEN r ELSE 0 END) AS dcg1,
             SUM(CASE WHEN ipos = 1 THEN r ELSE 0 END) AS idcg1
      FROM p GROUP BY user_id),
    q AS (
      SELECT ROUND(CAST(CAST(dcg3 AS DOUBLE) / CAST(idcg3 AS DOUBLE)
                        AS DECIMAL(18,6)), 6) AS ndcg3,
             ROUND(CAST(CAST(dcg1 AS DOUBLE) / idcg1
                        AS DECIMAL(18,6)), 6) AS ndcg1
      FROM u WHERE idcg3 > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(ROUND(CAST(CAST(SUM(ndcg3) AS DOUBLE) / COUNT(*)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS avg_ndcg3,
           CAST(ROUND(CAST(CAST(SUM(ndcg1) AS DOUBLE) / COUNT(*)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS avg_ndcg1
    FROM q
    """,
    doc="NDCG@3 and NDCG@1 of ranking event types by first-half activity "
        "against second-half graded relevance, per-user windows only, "
        "decimal-quantized order-exact averaging.",
)
def q291(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    c = ev.groupBy("user_id", "event_type").agg(
        F.sum(F.expr("CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END"))
        .alias("s"),
        F.sum(F.expr("CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END"))
        .alias("r"))
    return ndcg_readout(c)


# --------------------------------------------------------------------------
# Q292 mean reciprocal rank + hit rate of the q291 recommender: rank
# event types per user by first-half activity, score the FIRST position
# whose second-half relevance is nonzero — the navigational complement
# to q291's graded NDCG. Reciprocal ranks are exact rationals quantized
# to DECIMAL(18,6) before the cross-user sum; hit@1/hit@3 fold as exact
# integer-ppm ratios. Users with no second-half activity are excluded
# (no relevant item to find), per the standard MRR definition.
@query(
    "q292_mrr",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type,
             SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS s,
             SUM(CASE WHEN day(ts) > 15 AND value > 150
                 THEN 1 ELSE 0 END) AS r
      FROM events GROUP BY user_id, event_type),
    p AS (
      SELECT user_id, r,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY s DESC, event_type) AS pos
      FROM c),
    u AS (
      SELECT user_id, MIN(CASE WHEN r > 0 THEN pos END) AS frp
      FROM p GROUP BY user_id
      HAVING MAX(r) > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(ROUND(CAST(CAST(SUM(ROUND(CAST(1.0 / frp
                  AS DECIMAL(18,6)), 6)) AS DOUBLE) / COUNT(*)
                  AS DECIMAL(18,6)), 4) AS DOUBLE) AS mrr,
           CAST(SUM(CASE WHEN frp = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS hit1_ppm,
           CAST(SUM(CASE WHEN frp <= 3 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS hit3_ppm
    FROM u
    """,
    doc="Mean reciprocal rank and hit@1/hit@3 (integer ppm) of first-half "
        "activity ranking against second-half HIGH-VALUE relevance "
        "(value > 150 — the q321 cut), per-user windows, order-exact "
        "decimal averaging. Plain second-half activity saturated on this "
        "dense corpus (every user's top-ranked type was relevant, so MRR "
        "was identically 1.0 at every SF — the q326 degeneracy class, "
        "caught by the round-8 audit sweep); the binary first-hit metric "
        "needs the sparser relevance to discriminate, unlike q291's "
        "graded NDCG which already varies.",
)
def q292(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    c = ev.groupBy("user_id", "event_type").agg(
        F.sum(F.expr("CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END"))
        .alias("s"),
        F.sum(F.expr("CASE WHEN day(ts) > 15 AND value > 150"
                     " THEN 1 ELSE 0 END")).alias("r"))
    return mrr_readout(c)


# --------------------------------------------------------------------------
# Q296 multiclass precision/recall/F1 of a (dow, hour) -> event-type
# classifier: fit on days 1-15 (per-cell majority class, ties broken by
# type name; cells unseen in training fall back to the global train
# majority), evaluate on days 16-30 — the per-class complement to
# q224's 1-NN accuracy probe. The confusion matrix is one
# groupBy(actual, predicted) over the test scan after a broadcast join
# with the 168-row predictor table; per-class tp/fp/fn fold from
# class-domain-sized frames. Precision/recall are exact integer ppm,
# F1 is one double division r4'd.
@query(
    "q296_multiclass_prf",
    oracle="""
    WITH tr AS (
      SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS dow,
             CAST(hour(ts) AS INT) AS hr, event_type,
             COUNT(*) AS cnt
      FROM events WHERE day(ts) <= 15 GROUP BY dow, hr, event_type),
    pred AS (
      SELECT dow, hr, event_type AS ptype FROM (
        SELECT dow, hr, event_type,
               ROW_NUMBER() OVER (PARTITION BY dow, hr
                                  ORDER BY cnt DESC, event_type) AS rn
        FROM tr) WHERE rn = 1),
    fallback AS (
      SELECT event_type AS ftype FROM tr
      GROUP BY event_type
      ORDER BY SUM(cnt) DESC, event_type LIMIT 1),
    pairs AS (
      SELECT e.event_type AS actual,
             COALESCE(p.ptype, f.ftype) AS predicted
      FROM events e
      LEFT JOIN pred p
        ON p.dow = CAST(dayofweek(CAST(e.ts AS DATE)) + 1 AS INT)
       AND p.hr = CAST(hour(e.ts) AS INT)
      CROSS JOIN fallback f
      WHERE day(e.ts) > 15),
    conf AS (
      SELECT actual, predicted, COUNT(*) AS n FROM pairs
      GROUP BY actual, predicted),
    act AS (SELECT actual AS cls, CAST(SUM(n) AS BIGINT) AS act_n
            FROM conf GROUP BY actual),
    prd AS (SELECT predicted AS cls, CAST(SUM(n) AS BIGINT) AS pred_n
            FROM conf GROUP BY predicted),
    tp AS (SELECT actual AS cls, CAST(SUM(n) AS BIGINT) AS tp
           FROM conf WHERE actual = predicted GROUP BY actual),
    cl AS (
      SELECT COALESCE(a.cls, p.cls) AS cls,
             COALESCE(act_n, 0) AS act_n, COALESCE(pred_n, 0) AS pred_n,
             COALESCE(tp, 0) AS tp
      FROM act a FULL JOIN prd p ON a.cls = p.cls
      LEFT JOIN tp t ON COALESCE(a.cls, p.cls) = t.cls)
    SELECT cls, act_n, pred_n, tp,
           CASE WHEN pred_n = 0 THEN NULL
                ELSE CAST(tp * 1000000 // pred_n AS BIGINT)
           END AS precision_ppm,
           CASE WHEN act_n = 0 THEN NULL
                ELSE CAST(tp * 1000000 // act_n AS BIGINT)
           END AS recall_ppm,
           CASE WHEN act_n + pred_n = 0 THEN NULL
                ELSE CAST(ROUND(CAST(2.0 * tp / (act_n + pred_n)
                          AS DECIMAL(18,6)), 4) AS DOUBLE)
           END AS f1
    FROM cl ORDER BY cls
    """,
    doc="Per-class precision/recall (integer ppm) and F1 of a "
        "(dow, hour) majority-class classifier fit on days 1-15 and "
        "evaluated on days 16-30, broadcast predictor join, "
        "class-domain-sized folds.",
)
def q296(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = tables(spark, sf_dir)["events"]
    base = ev.select(
        "event_type",
        F.expr("CAST(dayofweek(CAST(ts AS DATE)) AS INT)").alias("dow"),
        F.expr("CAST(hour(ts) AS INT)").alias("hr"),
        F.expr("day(ts)").alias("dd"))
    tr = (base.filter("dd <= 15")
          .groupBy("dow", "hr", "event_type")
          .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("dow", "hr").orderBy(F.desc("cnt"), "event_type")
    pred = (tr.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("dow", "hr", F.col("event_type").alias("ptype")))
    # global train majority: top-1 of the 5-row class table (limit path,
    # TakeOrderedAndProject — never a global window)
    fallback = (tr.groupBy("event_type").agg(F.sum("cnt").alias("tot"))
                .orderBy(F.desc("tot"), "event_type").limit(1)
                .select(F.col("event_type").alias("ftype")))
    pairs = (base.filter("dd > 15")
             .join(F.broadcast(pred), ["dow", "hr"], "left")
             .join(F.broadcast(fallback))
             .select(F.col("event_type").alias("actual"),
                     F.expr("COALESCE(ptype, ftype)").alias("predicted")))
    conf = pairs.groupBy("actual", "predicted").agg(F.count("*").alias("n"))
    # r13 single-consumer fold: the act/prd/tp branches re-consumed conf —
    # and tp's actual=predicted filter pushed BELOW conf's aggregate into
    # a second full test scan. Each confusion cell instead explodes into
    # its two class contributions (one as actual, one as predicted; tp
    # rides the actual row so it counts once), and one groupBy(cls) folds
    # everything. The _nk side tag reproduces the old full-join NULL
    # semantics bit-for-bit: a NULL actual class and a NULL predicted
    # class stayed two separate rows there (NULL join keys never match),
    # so NULL classes group by side while real classes merge.
    cells = conf.select(F.explode(F.array(
        F.struct(F.col("actual").alias("cls"), F.lit("a").alias("side"),
                 F.col("n").alias("a_n"),
                 F.lit(0).cast("bigint").alias("p_n"),
                 F.when(F.col("actual") == F.col("predicted"), F.col("n"))
                 .otherwise(F.lit(0)).cast("bigint").alias("tp_n")),
        F.struct(F.col("predicted").alias("cls"), F.lit("p").alias("side"),
                 F.lit(0).cast("bigint").alias("a_n"),
                 F.col("n").alias("p_n"),
                 F.lit(0).cast("bigint").alias("tp_n")))).alias("s")
    ).select("s.*")
    cl = (cells.groupBy(
              "cls",
              F.when(F.col("cls").isNull(), F.col("side")).alias("_nk"))
          .agg(F.sum("a_n").cast("bigint").alias("act_n"),
               F.sum("p_n").cast("bigint").alias("pred_n"),
               F.sum("tp_n").cast("bigint").alias("tp"))
          .drop("_nk"))
    return cl.select(
        "cls", "act_n", "pred_n", "tp",
        F.expr("CASE WHEN pred_n = 0 THEN NULL"
               " ELSE tp * 1000000 DIV pred_n END").alias("precision_ppm"),
        F.expr("CASE WHEN act_n = 0 THEN NULL"
               " ELSE tp * 1000000 DIV act_n END").alias("recall_ppm"),
        F.expr("CASE WHEN act_n + pred_n = 0 THEN NULL"
               " ELSE CAST(ROUND(CAST(2.0 * tp / (act_n + pred_n)"
               " AS DECIMAL(18,6)), 4) AS DOUBLE) END").alias("f1"),
    ).orderBy("cls")


# --------------------------------------------------------------------------
# Q301 Good-Turing frequency smoothing of the corpus unigram counts:
# count-of-counts N_r, the adjusted count r* = (r+1)·N_{r+1}/N_r, and
# the smoothed probability mass at each count class — the classical
# answer to "how much probability belongs to unseen tokens" (the r=1
# class mass IS the unseen-mass estimate). Both levels are plain
# aggregations (token -> count, count -> class size); the r+1 lookup is
# a self-join on the count-class table, bounded by max token frequency,
# and the class mass (r+1)·N_{r+1}/N folds as exact integer ppm. The
# report keeps the 10 SMALLEST count classes (ordered LIMIT, not a
# WHERE r <= k: this synthetic corpus's vocabulary is tiny, so small-r
# classes can be empty at larger SFs).
@query(
    "q301_good_turing",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_DUCK_WORDS}) AS tok FROM documents),
    vc AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    cc AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r
           FROM vc GROUP BY c),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vc)
    SELECT CAST(a.r AS BIGINT) AS r, a.n_r,
           COALESCE(b.n_r, 0) AS n_r1,
           {r4("(a.r + 1.0) * COALESCE(b.n_r, 0) / a.n_r")} AS r_star,
           CAST((a.r + 1) * COALESCE(b.n_r, 0) * 1000000 // n AS BIGINT)
             AS mass_ppm
    FROM cc a LEFT JOIN cc b ON b.r = a.r + 1 CROSS JOIN tot
    ORDER BY a.r LIMIT 10
    """,
    doc="Good-Turing count-of-counts, adjusted counts r* and exact "
        "integer-ppm class mass for the 10 smallest count classes; the lowest-r mass is "
        "the unseen-token probability estimate.",
)
def q301(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    toks = docs.select(F.explode(F.expr(
        "filter(split(text, ' '), w -> w <> '')")).alias("tok"))
    vc = toks.groupBy("tok").agg(F.count("*").alias("c"))
    cc = vc.groupBy(F.col("c").alias("r")).agg(
        F.count("*").cast("bigint").alias("n_r"))
    tot = vc.agg(F.sum("c").cast("bigint").alias("n"))
    b = cc.select(F.col("r").alias("r1"), F.col("n_r").alias("n_r1"))
    return (cc.orderBy("r").limit(10)
            .join(b, F.expr("r1 = r + 1"), "left")
            .join(F.broadcast(tot))
            .select(F.col("r").cast("bigint").alias("r"), "n_r",
                    F.expr("COALESCE(n_r1, 0)").alias("n_r1"),
                    r4c(F.expr("(r + 1.0) * COALESCE(n_r1, 0) / n_r"))
                    .alias("r_star"),
                    F.expr("(r + 1) * COALESCE(n_r1, 0) * 1000000 DIV n")
                    .alias("mass_ppm"))
            .orderBy("r"))


# --------------------------------------------------------------------------
# Q305 embedding isotropy audit: how directionally uniform is the
# embedding cloud? Reports the centroid norm, the mean squared vector
# norm, and their ratio ("anisotropy" — 0 for a perfectly centered
# cloud, 1 when every vector is the same direction): isotropy problems
# are why raw embedding cosines saturate (the q139/q265 centroid ops'
# diagnostic). Exactness: coordinates quantize to integer 1e-4 units
# (q149 convention); per-dimension sums and the squared-norm total are
# exact integers, so both engines divide the same exact quantities
# once. One posexplode shuffle on the 64-key dimension space plus one
# vector-grain aggregate.
@query(
    "q305_isotropy",
    oracle="""
    WITH e AS (
      SELECT list_transform(embedding,
                            x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000)
                                      AS BIGINT)) AS q
      FROM embeddings),
    p AS (
      SELECT generate_subscripts(q, 1) - 1 AS d, unnest(q) AS x
      FROM e),
    dims AS (
      SELECT d, CAST(SUM(x) AS BIGINT) AS sd FROM p GROUP BY d),
    nrm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s2) AS HUGEINT) AS s2
      FROM (SELECT list_sum(list_transform(q, v -> v * v)) AS s2 FROM e)),
    top AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
             CAST(SUM(CAST(sd AS HUGEINT) * sd) AS HUGEINT) AS ssd
      FROM dims)
    SELECT n, n_dims,
           CAST(ROUND(CAST(sqrt(CAST(ssd AS DOUBLE)) / n / 10000
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS centroid_norm,
           CAST(ROUND(CAST(sqrt(CAST(s2 AS DOUBLE) / n) / 10000
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS rms_norm,
           CAST(ROUND(CAST(CAST(ssd AS DOUBLE) / (CAST(n AS DOUBLE) * n)
                / (CAST(s2 AS DOUBLE) / n)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS anisotropy
    FROM nrm CROSS JOIN top
    """,
    doc="Embedding-cloud isotropy audit: exact integer-quantized centroid "
        "norm, RMS vector norm, and their squared ratio (anisotropy).",
)
def q305(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables(spark, sf_dir)["embeddings"]
    e = emb.select(F.expr(
        "transform(embedding,"
        " x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT))")
        .alias("q"))
    p = e.select(F.posexplode("q").alias("d", "x"))
    dims = p.groupBy("d").agg(F.sum("x").cast("bigint").alias("sd"))
    nrm = (e.select(F.expr(
        "aggregate(transform(q, v -> v * v), 0L, (a, b) -> a + b)")
        .alias("s2"))
        .agg(F.count("*").cast("bigint").alias("n"),
             # widen INSIDE the sum: per-vector s2 is int64-safe but the
             # corpus accumulation must be decimal-exact (ADVICE r7)
             F.sum(F.col("s2").cast("decimal(38,0)")).alias("s2")))
    top = dims.agg(
        F.count("*").cast("bigint").alias("n_dims"),
        F.sum(F.expr("CAST(sd AS DECIMAL(38,0)) * sd"))
        .cast("decimal(38,0)").alias("ssd"))
    return (nrm.join(F.broadcast(top))
            .select("n", "n_dims",
                    r4c(F.expr("sqrt(CAST(ssd AS DOUBLE)) / n / 10000"))
                    .alias("centroid_norm"),
                    r4c(F.expr("sqrt(CAST(s2 AS DOUBLE) / n) / 10000"))
                    .alias("rms_norm"),
                    r4c(F.expr("CAST(ssd AS DOUBLE)"
                               " / (CAST(n AS DOUBLE) * n)"
                               " / (CAST(s2 AS DOUBLE) / n)"))
                    .alias("anisotropy")))


# --------------------------------------------------------------------------
# Q302 interpolated Kneser-Ney bigram cross-entropy on the held-out md5
# split (q270's split convention, q67's bigram construction): the
# standard n-gram LM quality signal one order above q270's add-1
# unigram — KN's continuation counts ("how many distinct histories
# precede w2") are exactly what distinguishes templated from diverse
# text. Model: absolute discount d = 0.75,
#   P(w2|w1) = (max(c12 − d, 0) + d·T1(w1)·Pc(w2)) / c1(w1)
# backing off to Pc(w2) = (T2(w2) + 1)/(B + V + 1) for unseen
# histories (add-1 over continuation types keeps Pc > 0 for OOV).
# All five model tables are map-side-combinable aggregations of the
# train bigram frame joined back by key; probabilities fold exact
# integers in one shared double expression, per-token logprobs
# quantized to 6dp before the per-source fold (4dp left a
# single source's mean ON a rounding boundary at sf0.001). The model
# vocabulary is truncated to the top-25 train unigrams: the fixture's
# 31-word closed vocabulary appears in full on any split side, so the
# untruncated model had hist_oov identically 0 at both SFs and the
# continuation-probability backoff arm was dead code (q326 degeneracy
# class, round-9 oracle-constant sweep).
@query(
    "q302_kn_bigram_xent",
    oracle="""
    WITH d AS (
      SELECT source,
             CASE WHEN (instr('0123456789abcdef',
                              substr(md5(CAST(doc_id AS VARCHAR)
                                         || ':split'), 1, 1)) - 1) < 13
                  THEN 'train' ELSE 'test' END AS split,
             list_filter(string_split(text, ' '), w -> w <> '') AS w
      FROM documents),
    bg AS (
      SELECT source, split, w[i] AS w1, w[i + 1] AS w2
      FROM (SELECT source, split, w,
                   unnest(generate_series(1, len(w) - 1)) AS i
            FROM d WHERE len(w) >= 2)),
    ut AS (SELECT unnest(w) AS tok FROM d WHERE split = 'train'),
    uvoc AS (
      SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM ut GROUP BY tok)
      ORDER BY c DESC, tok LIMIT 25),
    big AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM bg WHERE split = 'train'
        AND w1 IN (SELECT tok FROM uvoc)
        AND w2 IN (SELECT tok FROM uvoc)
      GROUP BY w1, w2),
    hist AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS t1
      FROM big GROUP BY w1),
    cont AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS t2
      FROM big GROUP BY w2),
    gl AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS b,
             (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT)
              FROM (SELECT w1 AS tok FROM big
                    UNION ALL SELECT w2 FROM big)) AS v
      FROM big),
    sc AS (
      SELECT t.source,
             CASE WHEN h.c1 IS NULL THEN 1 ELSE 0 END AS hist_oov,
             CASE WHEN b2.c12 IS NULL THEN 1 ELSE 0 END AS bg_unseen,
             ROUND(CAST(ln(
               CASE WHEN h.c1 IS NULL
                 THEN (COALESCE(c.t2, 0) + CAST(1 AS DOUBLE))
                      / (g.b + g.v + 1)
                 ELSE (GREATEST(COALESCE(b2.c12, 0)
                                - CAST(0.75 AS DOUBLE), 0)
                       + CAST(0.75 AS DOUBLE) * h.t1
                         * ((COALESCE(c.t2, 0) + CAST(1 AS DOUBLE))
                            / (g.b + g.v + 1)))
                      / h.c1
               END) AS DECIMAL(18,6)), 6) AS lp
      FROM bg t
      LEFT JOIN big b2 ON b2.w1 = t.w1 AND b2.w2 = t.w2
      LEFT JOIN hist h ON h.w1 = t.w1
      LEFT JOIN cont c ON c.w2 = t.w2
      CROSS JOIN gl g
      WHERE t.split = 'test')
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(hist_oov) * 1000000 // COUNT(*) AS BIGINT)
             AS hist_oov_ppm,
           CAST(SUM(bg_unseen) * 1000000 // COUNT(*) AS BIGINT)
             AS bg_unseen_ppm,
           CAST(ROUND(CAST(CAST(-SUM(lp) AS DOUBLE) / COUNT(*)
                           AS DECIMAL(18,6)), 4) AS DOUBLE) AS xent_nats
    FROM sc GROUP BY source ORDER BY source
    """,
    doc="Interpolated Kneser-Ney bigram cross-entropy per source on the "
        "held-out md5 split: absolute discount 0.75, top-25-truncated "
        "model vocabulary (real OOV backoff), continuation-count "
        "backoff with add-1 floor, exact integer model tables, "
        "6dp-quantized per-token logprobs.",
)
def q302(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    d = docs.select(
        "source",
        F.expr("CASE WHEN (instr('0123456789abcdef',"
               " substr(md5(CAST(doc_id AS STRING) || ':split'), 1, 1))"
               " - 1) < 13 THEN 'train' ELSE 'test' END").alias("split"),
        F.expr("filter(split(text, ' '), w -> w <> '')").alias("w"))
    bg = (d.filter("size(w) >= 2")
          .select("source", "split",
                  F.explode(F.expr(
                      "transform(sequence(1, size(w) - 1),"
                      " i -> struct(element_at(w, i) AS w1,"
                      "             element_at(w, i + 1) AS w2))"))
                  .alias("p"))
          .select("source", "split", "p.w1", "p.w2"))
    # model vocabulary = top-25 train unigrams (count DESC, token — a
    # total order); bigrams outside it are excluded from every model
    # table, so out-of-vocab test histories genuinely miss `hist`
    uvoc = (d.filter("split = 'train'")
            .select(F.explode("w").alias("tok"))
            .groupBy("tok").agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), "tok").limit(25)
            .select("tok"))
    big = (bg.filter("split = 'train'")
           .join(F.broadcast(uvoc.withColumnRenamed("tok", "w1")),
                 "w1", "semi")
           .join(F.broadcast(uvoc.withColumnRenamed("tok", "w2")),
                 "w2", "semi")
           .groupBy("w1", "w2")
           .agg(F.count("*").cast("bigint").alias("c12")))
    hist = big.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count("*").cast("bigint").alias("t1"))
    cont = big.groupBy("w2").agg(
        F.count("*").cast("bigint").alias("t2"))
    toks = (big.select(F.col("w1").alias("tok"))
            .unionAll(big.select(F.col("w2").alias("tok"))))
    # two SEPARATE one-row broadcasts (a combined (b, v) frame would be a
    # nested-loop join itself, outside the lint's one_row_agg class)
    btot = big.agg(F.count("*").cast("bigint").alias("b"))
    vtot = toks.agg(F.countDistinct("tok").cast("bigint").alias("v"))
    t = bg.filter("split = 'test'")
    sc = (t.join(big, ["w1", "w2"], "left")
          .join(hist, "w1", "left")
          .join(cont, "w2", "left")
          .join(F.broadcast(btot))
          .join(F.broadcast(vtot))
          .select(
              "source",
              F.expr("CASE WHEN c1 IS NULL THEN 1 ELSE 0 END")
              .alias("hist_oov"),
              F.expr("CASE WHEN c12 IS NULL THEN 1 ELSE 0 END")
              .alias("bg_unseen"),
              F.expr(
                  "ROUND(CAST(ln("
                  "CASE WHEN c1 IS NULL"
                  " THEN (COALESCE(t2, 0) + CAST(1 AS DOUBLE))"
                  "      / (b + v + 1)"
                  " ELSE (GREATEST(COALESCE(c12, 0)"
                  "                - CAST(0.75 AS DOUBLE), 0)"
                  "       + CAST(0.75 AS DOUBLE) * t1"
                  "         * ((COALESCE(t2, 0) + CAST(1 AS DOUBLE))"
                  "            / (b + v + 1)))"
                  "      / c1"
                  " END) AS DECIMAL(18,6)), 6)").alias("lp")))
    return (sc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.expr("SUM(hist_oov) * 1000000 DIV COUNT(*)")
        .alias("hist_oov_ppm"),
        F.expr("SUM(bg_unseen) * 1000000 DIV COUNT(*)")
        .alias("bg_unseen_ppm"),
        F.expr("CAST(ROUND(CAST(CAST(-SUM(lp) AS DOUBLE) / COUNT(*)"
               " AS DECIMAL(18,6)), 4) AS DOUBLE)").alias("xent_nats"))
        .orderBy("source"))


# --------------------------------------------------------------------------
# Q316 linear-kernel MMD² drift between embedding groups (even vs odd
# labels): ||μ_A − μ_B||², the first-moment member of the
# maximum-mean-discrepancy family and the exact scalar behind "did the
# embedding distribution move" monitoring (q173's PSI for vectors),
# with the top-drifting dimension via an ordered LIMIT 1. Exactness:
# 1e-4-quantized integer per-dimension sums (q149/q305 convention), so
# both engines divide identical exact quantities; reported ×1e4 for
# 4dp resolution on near-identical groups.
@query(
    "q316_embedding_mmd",
    oracle="""
    WITH e AS (
      SELECT CASE WHEN label % 2 = 0 THEN 'a' ELSE 'b' END AS g,
             list_transform(embedding,
                            x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000)
                                      AS BIGINT)) AS q
      FROM embeddings),
    p AS (
      SELECT g, generate_subscripts(q, 1) - 1 AS d, unnest(q) AS x
      FROM e),
    dims AS (
      SELECT d,
             CAST(SUM(CASE WHEN g = 'a' THEN x ELSE 0 END) AS BIGINT)
               AS sa,
             CAST(SUM(CASE WHEN g = 'b' THEN x ELSE 0 END) AS BIGINT)
               AS sb
      FROM p GROUP BY d),
    n AS (
      SELECT CAST(SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(SUM(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT)
               AS nb
      FROM e),
    sh AS (
      SELECT d, (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
                / 10000 AS shift
      FROM dims CROSS JOIN n),
    top AS (
      SELECT CAST(d AS INT) AS top_dim,
             CAST(ROUND(CAST(shift AS DECIMAL(18,6)), 4) AS DOUBLE)
               AS top_shift
      FROM sh ORDER BY abs(shift) DESC, d LIMIT 1),
    mmd AS (
      SELECT CAST(SUM(ROUND(CAST(10000 * shift * shift
                   AS DECIMAL(18,6)), 6)) AS DOUBLE) AS m
      FROM sh)
    SELECT (SELECT na FROM n) AS na, (SELECT nb FROM n) AS nb,
           CAST(ROUND(CAST(m AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS mmd2_x1e4,
           top_dim, top_shift
    FROM mmd CROSS JOIN top
    """,
    doc="Linear-kernel MMD² between even/odd-label embedding groups from "
        "exact quantized per-dimension sums, with the top-drifting "
        "dimension via ordered LIMIT 1.",
)
def q316(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables(spark, sf_dir)["embeddings"]
    e = emb.select(
        F.expr("CASE WHEN label % 2 = 0 THEN 'a' ELSE 'b' END").alias("g"),
        F.expr("transform(embedding,"
               " x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000) AS BIGINT))")
        .alias("q"))
    p = e.select("g", F.posexplode("q").alias("d", "x"))
    dims = p.groupBy("d").agg(
        F.sum(F.expr("CASE WHEN g = 'a' THEN x ELSE 0 END"))
        .cast("bigint").alias("sa"),
        F.sum(F.expr("CASE WHEN g = 'b' THEN x ELSE 0 END"))
        .cast("bigint").alias("sb"))
    n = e.agg(
        F.sum(F.expr("CASE WHEN g = 'a' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("na"),
        F.sum(F.expr("CASE WHEN g = 'b' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("nb"))
    sh = (dims.join(F.broadcast(n))
          .select("d", "na", "nb",
                  F.expr("(CAST(sa AS DOUBLE) / na"
                         " - CAST(sb AS DOUBLE) / nb) / 10000")
                  .alias("shift")))
    top = (sh.orderBy(F.expr("abs(shift)").desc(), "d").limit(1)
           .select(F.col("d").cast("int").alias("top_dim"),
                   r4c(F.col("shift")).alias("top_shift")))
    mmd = sh.agg(F.expr(
        "CAST(SUM(ROUND(CAST(10000 * shift * shift"
        " AS DECIMAL(18,6)), 6)) AS DOUBLE)").alias("m"))
    return (n.join(F.broadcast(mmd)).join(F.broadcast(top))
            .select("na", "nb", r4c(F.col("m")).alias("mmd2_x1e4"),
                    "top_dim", "top_shift"))


# --------------------------------------------------------------------------
# Q317 seasonal (Hirsch-Slack) Mann-Kendall trend test: q311's pair-sign
# S computed WITHIN each ISO-dow stratum of the daily revenue series
# (so the weekly cycle can't masquerade as trend), strata statistics
# and tie-corrected variances summed, one continuity-corrected z. The
# pair frame is an equi-join on the stratum key with a day inequality —
# hash-partitioned by dow, |days/7|² pairs per stratum, never a cross
# join.
@query(
    "q317_seasonal_mann_kendall",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(ts AS DATE) AS day, isodow(CAST(ts AS DATE)) AS dow,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM rev a JOIN rev b ON b.dow = a.dow AND b.day > a.day),
    strata AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COALESCE(SUM(tt), 0) AS BIGINT) AS tt
      FROM (SELECT dow, cents, COUNT(*) AS t,
                   CASE WHEN COUNT(*) > 1
                        THEN COUNT(*) * (COUNT(*) - 1)
                             * (2 * COUNT(*) + 5)
                        ELSE 0 END AS tt
            FROM rev GROUP BY dow, cents)
      GROUP BY dow),
    v AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_days,
             SUM((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tt) / 18)
               AS var_s
      FROM strata)
    SELECT n_days, s_stat,
           {r4("CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)"
               "     WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)"
               "     ELSE CAST(0 AS DOUBLE) END")} AS z
    FROM s CROSS JOIN v
    """,
    doc="Seasonal (per-ISO-dow) Mann-Kendall trend test of daily "
        "revenue: stratum pair signs via a dow-keyed equi-join, summed "
        "tie-corrected variances, continuity-corrected z.",
)
def q317(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    rev = (ev.filter(F.col("event_type") == "purchase")
           .groupBy(F.to_date("ts").alias("day"),
                    F.expr("((dayofweek(CAST(ts AS DATE)) + 5) % 7) + 1")
                    .alias("dow"))
           .agg(F.expr("SUM(CAST(ROUND(value * 100) AS BIGINT))")
                .alias("cents")))
    b = rev.select(F.col("dow").alias("bdow"),
                   F.col("day").alias("bday"), F.col("cents").alias("bc"))
    s = (rev.join(b, F.expr("bdow = dow AND bday > day"))
         .agg(F.sum(F.expr("CASE WHEN bc > cents THEN 1"
                           " WHEN bc < cents THEN -1 ELSE 0 END"))
              .cast("bigint").alias("s_stat")))
    strata = (rev.groupBy("dow", "cents").agg(F.count("*").alias("t"))
              .select("dow", "t",
                      F.expr("CASE WHEN t > 1"
                             " THEN t * (t - 1) * (2 * t + 5)"
                             " ELSE 0 END").alias("tt"))
              .groupBy("dow")
              .agg(F.sum("t").cast("bigint").alias("n"),
                   F.expr("CAST(COALESCE(SUM(tt), 0) AS BIGINT)")
                   .alias("tt")))
    v = strata.agg(
        F.sum("n").cast("bigint").alias("n_days"),
        F.sum(F.expr("(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tt)"
                     " / 18")).alias("var_s"))
    return (s.join(F.broadcast(v))
            .select("n_days", "s_stat",
                    r4c(F.expr(
                        "CASE WHEN s_stat > 0"
                        " THEN (s_stat - 1) / sqrt(var_s)"
                        " WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)"
                        " ELSE CAST(0 AS DOUBLE) END")).alias("z")))


# --------------------------------------------------------------------------
# Q318 delta-method CI for a ratio metric (revenue cents per event):
# the denominator is itself random, so the naive per-row stderr is
# wrong — the standard experimentation fix is the delta method over
# USER-level sufficient statistics, with d_i = y_i − R·m_i having
# exactly zero mean by construction. One groupBy(user) pass to exact
# integer (y, m) pairs, one fold to (U, Σy, Σm, Σy², Σm², Σym), the
# closed form in shared double text (1.96 cast to DOUBLE — the
# decimal-literal rule).
@query(
    "q318_delta_method",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM events GROUP BY user_id),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS un,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(m) AS BIGINT) AS sm,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(m AS HUGEINT) * m) AS HUGEINT) AS smm,
             CAST(SUM(CAST(y AS HUGEINT) * m) AS HUGEINT) AS sym
      FROM u),
    d AS (
      SELECT un, sy, sm,
             CAST(sy AS DOUBLE) / sm AS r,
             sqrt((CAST(syy AS DOUBLE)
                   - 2 * (CAST(sy AS DOUBLE) / sm) * CAST(sym AS DOUBLE)
                   + (CAST(sy AS DOUBLE) / sm) * (CAST(sy AS DOUBLE) / sm)
                     * CAST(smm AS DOUBLE)) / (un - 1) / un)
               / (CAST(sm AS DOUBLE) / un) AS se
      FROM s)
    SELECT un AS n_users,
           {r4("r")} AS ratio,
           {r4("se")} AS se,
           {r4("r - CAST(1.96 AS DOUBLE) * se")} AS ci_lo,
           {r4("r + CAST(1.96 AS DOUBLE) * se")} AS ci_hi
    FROM d
    """,
    doc="Delta-method 95% CI for revenue-per-event (a ratio of sums "
        "with a random denominator) from exact user-level integer "
        "sufficient statistics.",
)
def q318(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (tables(spark, sf_dir)["events"]
         .groupBy("user_id")
         .agg(F.sum(F.expr(
                  "CASE WHEN event_type = 'purchase'"
                  " THEN CAST(ROUND(value * 100) AS BIGINT)"
                  " ELSE 0 END")).cast("bigint").alias("y"),
              F.count("*").cast("bigint").alias("m")))
    s = u.agg(
        F.count("*").cast("bigint").alias("un"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("m").cast("bigint").alias("sm"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))")
        .alias("syy"),
        F.expr("CAST(SUM(CAST(m AS DECIMAL(38,0)) * m) AS DECIMAL(38,0))")
        .alias("smm"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,0)) * m) AS DECIMAL(38,0))")
        .alias("sym"))
    d = s.select(
        "un", "sy", "sm",
        F.expr("CAST(sy AS DOUBLE) / sm").alias("r"),
        F.expr(
            "sqrt((CAST(syy AS DOUBLE)"
            " - 2 * (CAST(sy AS DOUBLE) / sm) * CAST(sym AS DOUBLE)"
            " + (CAST(sy AS DOUBLE) / sm) * (CAST(sy AS DOUBLE) / sm)"
            "   * CAST(smm AS DOUBLE)) / (un - 1) / un)"
            " / (CAST(sm AS DOUBLE) / un)").alias("se"))
    return d.select(
        F.col("un").alias("n_users"),
        r4c(F.col("r")).alias("ratio"),
        r4c(F.col("se")).alias("se"),
        r4c(F.expr("r - CAST(1.96 AS DOUBLE) * se")).alias("ci_lo"),
        r4c(F.expr("r + CAST(1.96 AS DOUBLE) * se")).alias("ci_hi"))


# --------------------------------------------------------------------------
# Q319 CUPED variance reduction on a hash-split A/B of users: the
# pre-period covariate X = first-half revenue adjusts the metric
# Y = second-half revenue with the pooled θ = cov(X,Y)/var(X) (the
# U-scale factors cancel in the ratio), and the achieved variance
# reduction is exactly corr²(X,Y). Per-user exact integer (x, y)
# pairs, arm means via conditional sums, everything folded from one
# user-grain pass — the standard experimentation pipeline shape.
@query(
    "q319_cuped",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN (instr('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR) || ':arm'), 1, 1))
                  - 1) < 8 THEN 'a' ELSE 'b' END AS arm,
             CAST(SUM(CASE WHEN event_type = 'purchase' AND day(ts) <= 15
                  THEN CAST(ROUND(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' AND day(ts) > 15
                  THEN CAST(ROUND(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS un,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(SUM(CASE WHEN arm = 'a' THEN x ELSE 0 END) AS BIGINT)
               AS sxa,
             CAST(SUM(CASE WHEN arm = 'a' THEN y ELSE 0 END) AS BIGINT)
               AS sya,
             CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
               AS nb,
             CAST(SUM(CASE WHEN arm = 'b' THEN x ELSE 0 END) AS BIGINT)
               AS sxb,
             CAST(SUM(CASE WHEN arm = 'b' THEN y ELSE 0 END) AS BIGINT)
               AS syb
      FROM u),
    d AS (
      SELECT na, nb,
             (CAST(un AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * sy)
             / (CAST(un AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * sx) AS theta,
             CAST(sx AS DOUBLE) / un AS xbar,
             (CAST(un AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * sy)
             * (CAST(un AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * sy)
             / ((CAST(un AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * sx)
                * (CAST(un AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * sy)) AS r2,
             sxa, sya, sxb, syb
      FROM s)
    SELECT na, nb,
           {r4("theta")} AS theta,
           {r4("CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb")}
             AS diff_raw,
           {r4("(CAST(sya AS DOUBLE) / na"
               " - theta * (CAST(sxa AS DOUBLE) / na - xbar))"
               " - (CAST(syb AS DOUBLE) / nb"
               "    - theta * (CAST(sxb AS DOUBLE) / nb - xbar))")}
             AS diff_cuped,
           {r4("r2")} AS var_reduction
    FROM d
    """,
    doc="CUPED-adjusted A/B difference of second-half revenue using "
        "first-half revenue as the covariate on an md5 user split; "
        "variance reduction is exactly corr²(X,Y).",
)
def q319(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (tables(spark, sf_dir)["events"]
         .groupBy("user_id")
         .agg(F.sum(F.expr(
                  "CASE WHEN event_type = 'purchase' AND day(ts) <= 15"
                  " THEN CAST(ROUND(value * 100) AS BIGINT)"
                  " ELSE 0 END")).cast("bigint").alias("x"),
              F.sum(F.expr(
                  "CASE WHEN event_type = 'purchase' AND day(ts) > 15"
                  " THEN CAST(ROUND(value * 100) AS BIGINT)"
                  " ELSE 0 END")).cast("bigint").alias("y"))
         .select(F.expr(
             "CASE WHEN (instr('0123456789abcdef',"
             " substr(md5(CAST(user_id AS STRING) || ':arm'), 1, 1))"
             " - 1) < 8 THEN 'a' ELSE 'b' END").alias("arm"), "x", "y"))
    s = u.agg(
        F.count("*").cast("bigint").alias("un"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
        .alias("sxx"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))")
        .alias("syy"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))")
        .alias("sxy"),
        F.sum(F.expr("CASE WHEN arm = 'a' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("na"),
        F.sum(F.expr("CASE WHEN arm = 'a' THEN x ELSE 0 END"))
        .cast("bigint").alias("sxa"),
        F.sum(F.expr("CASE WHEN arm = 'a' THEN y ELSE 0 END"))
        .cast("bigint").alias("sya"),
        F.sum(F.expr("CASE WHEN arm = 'b' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("nb"),
        F.sum(F.expr("CASE WHEN arm = 'b' THEN x ELSE 0 END"))
        .cast("bigint").alias("sxb"),
        F.sum(F.expr("CASE WHEN arm = 'b' THEN y ELSE 0 END"))
        .cast("bigint").alias("syb"))
    d = s.select(
        "na", "nb", "sxa", "sya", "sxb", "syb",
        F.expr("(CAST(un AS DOUBLE) * CAST(sxy AS DOUBLE)"
               " - CAST(sx AS DOUBLE) * sy)"
               " / (CAST(un AS DOUBLE) * CAST(sxx AS DOUBLE)"
               "    - CAST(sx AS DOUBLE) * sx)").alias("theta"),
        F.expr("CAST(sx AS DOUBLE) / un").alias("xbar"),
        F.expr("(CAST(un AS DOUBLE) * CAST(sxy AS DOUBLE)"
               " - CAST(sx AS DOUBLE) * sy)"
               " * (CAST(un AS DOUBLE) * CAST(sxy AS DOUBLE)"
               "    - CAST(sx AS DOUBLE) * sy)"
               " / ((CAST(un AS DOUBLE) * CAST(sxx AS DOUBLE)"
               "     - CAST(sx AS DOUBLE) * sx)"
               "    * (CAST(un AS DOUBLE) * CAST(syy AS DOUBLE)"
               "       - CAST(sy AS DOUBLE) * sy))").alias("r2"))
    return d.select(
        "na", "nb",
        r4c(F.col("theta")).alias("theta"),
        r4c(F.expr("CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb"))
        .alias("diff_raw"),
        r4c(F.expr(
            "(CAST(sya AS DOUBLE) / na"
            " - theta * (CAST(sxa AS DOUBLE) / na - xbar))"
            " - (CAST(syb AS DOUBLE) / nb"
            "    - theta * (CAST(sxb AS DOUBLE) / nb - xbar))"))
        .alias("diff_cuped"),
        r4c(F.col("r2")).alias("var_reduction"))


# --------------------------------------------------------------------------
# Spark-side md5 A/B arm assignment shared by the experimentation panel
# (q320/q321) and the S45 live monitor; the oracle SQL spells the DuckDB
# dialect (VARCHAR cast) inline.
_ARM_EXPR = (
    "CASE WHEN (instr('0123456789abcdef',"
    " substr(md5(CAST(user_id AS STRING) || ':arm'), 1, 1))"
    " - 1) < 8 THEN 'a' ELSE 'b' END")
# "converted": purchased over $150 in the evaluation half (days 16-30)
_CONV_EXPR = ("CASE WHEN event_type = 'purchase' AND day(ts) > 15"
              " AND value > 150 THEN 1 ELSE 0 END")


def srm_readout(s: DataFrame) -> DataFrame:
    """q320's closed-form SRM gate over exact per-arm distinct-user
    counts (columns na, nb): arm share in integer ppm, 1-df chi-square
    and the signed z. Factored out so the S45 live monitor applies the
    SAME arithmetic to its streaming state that the batch query applies
    to its one-shot aggregate (the S29 Wilson-monitor composition)."""
    return s.select(
        "na", "nb",
        F.expr("na * 1000000 DIV (na + nb)").alias("share_a_ppm"),
        r4c(F.expr("CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb)"))
        .alias("chi2"),
        r4c(F.expr("(na - nb) / sqrt(CAST(na + nb AS DOUBLE))"))
        .alias("z"))


def two_prop_readout(s: DataFrame) -> DataFrame:
    """q321's two-proportion z / unpooled CI / 80%-power MDE readout over
    exact per-arm (users, conversions) counts (na, ca, nb, cb) — shared
    with the S45 live monitor for the same reason as ``srm_readout``."""
    d = s.select(
        "na", "ca", "nb", "cb",
        F.expr("CAST(ca AS DOUBLE) / na").alias("p1"),
        F.expr("CAST(cb AS DOUBLE) / nb").alias("p2"),
        F.expr("CAST(ca + cb AS DOUBLE) / (na + nb)").alias("pp"))
    return d.select(
        "na", "ca", "nb", "cb",
        r4c(F.expr("p1 - p2")).alias("diff"),
        r4c(F.expr(
            "(p1 - p2) / sqrt(pp * (1 - pp)"
            " * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))"))
        .alias("z"),
        r4c(F.expr(
            "p1 - p2 - CAST(1.96 AS DOUBLE)"
            " * sqrt(p1 * (1 - p1) / na + p2 * (1 - p2) / nb)"))
        .alias("ci_lo"),
        r4c(F.expr(
            "p1 - p2 + CAST(1.96 AS DOUBLE)"
            " * sqrt(p1 * (1 - p1) / na + p2 * (1 - p2) / nb)"))
        .alias("ci_hi"),
        r4c(F.expr(
            "(CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))"
            " * sqrt(pp * (1 - pp)"
            " * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))"))
        .alias("mde_80"))


# --------------------------------------------------------------------------
# Q320 sample-ratio-mismatch (SRM) check of the q319 user split: the
# first gate of any experiment readout — if the md5 assignment doesn't
# produce the designed 50/50, every downstream metric is suspect.
# One distinct-user aggregation, 1-df chi-square and the signed z in
# closed form.
@query(
    "q320_srm_check",
    oracle=f"""
    WITH u AS (
      SELECT DISTINCT user_id,
             CASE WHEN (instr('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR) || ':arm'), 1, 1))
                  - 1) < 8 THEN 'a' ELSE 'b' END AS arm
      FROM events),
    s AS (
      SELECT CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
               AS nb
      FROM u)
    SELECT na, nb,
           CAST(na * 1000000 // (na + nb) AS BIGINT) AS share_a_ppm,
           {r4("CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb)")}
             AS chi2,
           {r4("(na - nb) / sqrt(CAST(na + nb AS DOUBLE))")} AS z
    FROM s
    """,
    doc="Sample-ratio-mismatch gate for the md5 user split: exact arm "
        "counts, share in integer ppm, 1-df chi-square and signed z.",
)
def q320(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (tables(spark, sf_dir)["events"]
         .select(F.col("user_id")).distinct()
         .select(F.expr(_ARM_EXPR).alias("arm")))
    s = u.agg(
        F.sum(F.expr("CASE WHEN arm = 'a' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("na"),
        F.sum(F.expr("CASE WHEN arm = 'b' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("nb"))
    return srm_readout(s)


# --------------------------------------------------------------------------
# Q321 two-proportion z-test + minimum detectable effect for the q319
# A/B split: conversion = "user purchased in the evaluation half"
# over $150 (days 16-30; the high-value cut keeps the rate off the
# degenerate 100% this corpus's raw purchase rate sits at), pooled z, unpooled 95% CI for the difference,
# and the 80%-power MDE at this sample size — the readout that tells an
# experimenter whether a null result is evidence of no effect or just
# an underpowered test. One user-grain aggregation to exact integer
# (converted, arm) counts; every z/CI/MDE literal is CAST to DOUBLE
# (the decimal-literal rule).
@query(
    "q321_two_proportion_z",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN (instr('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR) || ':arm'), 1, 1))
                  - 1) < 8 THEN 'a' ELSE 'b' END AS arm,
             MAX(CASE WHEN event_type = 'purchase' AND day(ts) > 15
                      AND value > 150
                 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id),
    s AS (
      SELECT CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(SUM(CASE WHEN arm = 'a' THEN conv ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
               AS nb,
             CAST(SUM(CASE WHEN arm = 'b' THEN conv ELSE 0 END)
                  AS BIGINT) AS cb
      FROM u),
    d AS (
      SELECT na, ca, nb, cb,
             CAST(ca AS DOUBLE) / na AS p1,
             CAST(cb AS DOUBLE) / nb AS p2,
             CAST(ca + cb AS DOUBLE) / (na + nb) AS pp
      FROM s)
    SELECT na, ca, nb, cb,
           {r4("p1 - p2")} AS diff,
           {r4("(p1 - p2) / sqrt(pp * (1 - pp)"
               " * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))")}
             AS z,
           {r4("p1 - p2 - CAST(1.96 AS DOUBLE)"
               " * sqrt(p1 * (1 - p1) / na + p2 * (1 - p2) / nb)")}
             AS ci_lo,
           {r4("p1 - p2 + CAST(1.96 AS DOUBLE)"
               " * sqrt(p1 * (1 - p1) / na + p2 * (1 - p2) / nb)")}
             AS ci_hi,
           {r4("(CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))"
               " * sqrt(pp * (1 - pp)"
               " * (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb))")}
             AS mde_80
    FROM d
    """,
    doc="Two-proportion z-test of second-half conversion on the md5 A/B "
        "split, with unpooled 95% CI and the 80%-power minimum "
        "detectable effect at this sample size.",
)
def q321(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (tables(spark, sf_dir)["events"]
         .groupBy("user_id")
         .agg(F.max(F.expr(_CONV_EXPR)).alias("conv"))
         .select(F.expr(_ARM_EXPR).alias("arm"), "conv"))
    s = u.agg(
        F.sum(F.expr("CASE WHEN arm = 'a' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("na"),
        F.sum(F.expr("CASE WHEN arm = 'a' THEN conv ELSE 0 END"))
        .cast("bigint").alias("ca"),
        F.sum(F.expr("CASE WHEN arm = 'b' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("nb"),
        F.sum(F.expr("CASE WHEN arm = 'b' THEN conv ELSE 0 END"))
        .cast("bigint").alias("cb"))
    return two_prop_readout(s)


# --------------------------------------------------------------------------
# Q335 robust A/B difference of per-user revenue on the md5 split:
# heavy-tailed metrics make the plain mean diff (q319's raw readout)
# whale-dominated, so report the winsorized diff (values clamped into
# the POOLED [p05, p95] — pooled so the treatment can't move its own
# clamp) and the trimmed diff (outside-clamp users dropped), next to
# the untrimmed one. Exact-interpolated quantiles on integer cents
# agree cross-engine (the q138 precedent); one user-grain pass, a
# one-row quantile broadcast, and a conditional fold.
@query(
    "q335_winsorized_ab",
    oracle=f"""
    WITH u AS (
      SELECT CASE WHEN (instr('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR) || ':arm'), 1, 1))
                  - 1) < 8 THEN 'a' ELSE 'b' END AS arm,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id),
    q AS (
      SELECT CAST(quantile_cont(y, 0.05) AS DOUBLE) AS p_lo,
             CAST(quantile_cont(y, 0.95) AS DOUBLE) AS p_hi
      FROM u),
    w AS (
      SELECT arm,
             GREATEST(LEAST(CAST(y AS DOUBLE), p_hi), p_lo) AS yw,
             CASE WHEN y >= p_lo AND y <= p_hi THEN 1 ELSE 0 END
               AS keep,
             y
      FROM u CROSS JOIN q),
    s AS (
      SELECT CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
               AS nb,
             SUM(CASE WHEN arm = 'a' THEN ROUND(CAST(yw
                 AS DECIMAL(18,6)), 6) ELSE 0 END) AS swa,
             SUM(CASE WHEN arm = 'b' THEN ROUND(CAST(yw
                 AS DECIMAL(18,6)), 6) ELSE 0 END) AS swb,
             CAST(SUM(CASE WHEN arm = 'a' THEN keep ELSE 0 END)
                  AS BIGINT) AS ka,
             CAST(SUM(CASE WHEN arm = 'b' THEN keep ELSE 0 END)
                  AS BIGINT) AS kb,
             CAST(SUM(CASE WHEN arm = 'a' AND keep = 1 THEN y ELSE 0
                  END) AS BIGINT) AS sta,
             CAST(SUM(CASE WHEN arm = 'b' AND keep = 1 THEN y ELSE 0
                  END) AS BIGINT) AS stb
      FROM w)
    SELECT na, nb, ka, kb,
           {r4("(CAST(swa AS DOUBLE) / na - CAST(swb AS DOUBLE) / nb)"
               " / 100")} AS win_diff_dollars,
           {r4("(CAST(sta AS DOUBLE) / ka - CAST(stb AS DOUBLE) / kb)"
               " / 100")} AS trim_diff_dollars
    FROM s
    """,
    doc="Winsorized and trimmed A/B difference of per-user revenue on "
        "the md5 split, clamped into the POOLED exact [p05, p95] so the "
        "treatment cannot move its own clamp.",
)
def q335(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (tables(spark, sf_dir)["events"]
         .groupBy("user_id")
         .agg(F.sum(F.expr(
                  "CASE WHEN event_type = 'purchase'"
                  " THEN CAST(ROUND(value * 100) AS BIGINT)"
                  " ELSE 0 END")).cast("bigint").alias("y"))
         .select(F.expr(
             "CASE WHEN (instr('0123456789abcdef',"
             " substr(md5(CAST(user_id AS STRING) || ':arm'), 1, 1))"
             " - 1) < 8 THEN 'a' ELSE 'b' END").alias("arm"), "y"))
    q = u.agg(
        F.expr("CAST(percentile(y, 0.05) AS DOUBLE)").alias("p_lo"),
        F.expr("CAST(percentile(y, 0.95) AS DOUBLE)").alias("p_hi"))
    w = (u.join(F.broadcast(q))
         .select("arm", "y",
                 F.expr("GREATEST(LEAST(CAST(y AS DOUBLE), p_hi), p_lo)")
                 .alias("yw"),
                 F.expr("CASE WHEN y >= p_lo AND y <= p_hi"
                        " THEN 1 ELSE 0 END").alias("keep")))
    s = w.agg(
        F.sum(F.expr("CASE WHEN arm = 'a' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("na"),
        F.sum(F.expr("CASE WHEN arm = 'b' THEN 1 ELSE 0 END"))
        .cast("bigint").alias("nb"),
        F.sum(F.expr("CASE WHEN arm = 'a' THEN ROUND(CAST(yw"
                     " AS DECIMAL(18,6)), 6) ELSE 0 END")).alias("swa"),
        F.sum(F.expr("CASE WHEN arm = 'b' THEN ROUND(CAST(yw"
                     " AS DECIMAL(18,6)), 6) ELSE 0 END")).alias("swb"),
        F.sum(F.expr("CASE WHEN arm = 'a' THEN keep ELSE 0 END"))
        .cast("bigint").alias("ka"),
        F.sum(F.expr("CASE WHEN arm = 'b' THEN keep ELSE 0 END"))
        .cast("bigint").alias("kb"),
        F.sum(F.expr("CASE WHEN arm = 'a' AND keep = 1 THEN y ELSE 0"
                     " END")).cast("bigint").alias("sta"),
        F.sum(F.expr("CASE WHEN arm = 'b' AND keep = 1 THEN y ELSE 0"
                     " END")).cast("bigint").alias("stb"))
    return s.select(
        "na", "nb", "ka", "kb",
        r4c(F.expr("(CAST(swa AS DOUBLE) / na - CAST(swb AS DOUBLE)"
                   " / nb) / 100")).alias("win_diff_dollars"),
        r4c(F.expr("(CAST(sta AS DOUBLE) / ka - CAST(stb AS DOUBLE)"
                   " / kb) / 100")).alias("trim_diff_dollars"))


# --------------------------------------------------------------------------
# Q342 RBF-kernel embedding drift via LINEAR-TIME MMD (Gretton et al.
# 2012 MMD_l) between the even-id and odd-id halves of the embeddings
# table, sigma² = dim = 64. The general member of the drift family: q173's
# PSI bins scalars, q316's linear-kernel MMD² sees only MEAN shift —
# RBF MMD also detects variance/shape/multimodal changes, and the block
# estimator keeps it linear: blocks of four consecutive ids form the
# disjoint groups, so the pairing is id arithmetic, not a global
# row_number, the plan is window-free, and the one shuffle is the block
# group-by. Two arms: 'observed' (the halves are i.i.d. draws — the
# calibrated null, |z| < 2) and 'shifted' (+0.5 planted on dimension 1 of
# the Y half — z ~ 9-11, detection value-exercised against the stationary
# fixture). Each block's h quantized DECIMAL(18,6) before the sum; Σh²
# rides the 12-dp DECIMAL(38,12) kind; the CLT z-score makes the readout
# its own significance test.
@query(
    "q342_rbf_mmd_drift",
    oracle="""
    WITH arms AS (SELECT UNNEST(['observed', 'shifted']) AS scenario),
    v AS (
      SELECT a.scenario, vec_id // 4 AS t, CAST(vec_id % 4 AS INT) AS role,
             embedding
      FROM embeddings CROSS JOIN arms a),
    e AS (
      SELECT scenario, t, role, pos,
             CASE WHEN scenario = 'shifted' AND role % 2 = 1 AND pos = 2
                  THEN x + 0.5 ELSE x END AS x
      FROM (SELECT scenario, t, role,
                   generate_subscripts(embedding, 1) AS pos,
                   CAST(UNNEST(embedding) AS DOUBLE) AS x FROM v)),
    d AS (
      SELECT a.scenario AS scenario, a.t AS t, a.role AS ra, b.role AS rb,
             SUM((a.x - b.x) * (a.x - b.x)) AS d2
      FROM e a JOIN e b
        ON a.scenario = b.scenario AND a.t = b.t AND a.pos = b.pos
      WHERE (a.role, b.role) IN ((0, 2), (1, 3), (0, 3), (2, 1))
      GROUP BY a.scenario, a.t, a.role, b.role),
    h AS (
      SELECT scenario, t, CAST(
          MAX(CASE WHEN ra = 0 AND rb = 2 THEN exp(-d2 / 128.0) END)
        + MAX(CASE WHEN ra = 1 AND rb = 3 THEN exp(-d2 / 128.0) END)
        - MAX(CASE WHEN ra = 0 AND rb = 3 THEN exp(-d2 / 128.0) END)
        - MAX(CASE WHEN ra = 2 AND rb = 1 THEN exp(-d2 / 128.0) END)
        AS DECIMAL(18,6)) AS hq
      FROM d GROUP BY scenario, t HAVING COUNT(*) = 4),
    agg AS (
      SELECT scenario, CAST(COUNT(*) AS BIGINT) AS n_blocks,
             SUM(hq) AS sh,
             SUM(CAST(hq * hq AS DECIMAL(38,12))) AS sh2
      FROM h GROUP BY scenario)
    SELECT scenario, n_blocks,
           CAST(ROUND(CAST(CAST(sh AS DOUBLE) / n_blocks
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS mmd_l,
           CAST(ROUND(CAST(sqrt((CAST(sh2 AS DOUBLE)
                - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE) / n_blocks)
                / (n_blocks - 1)) AS DECIMAL(18,6)), 4) AS DOUBLE) AS h_sd,
           CAST(ROUND(CAST((CAST(sh AS DOUBLE) / n_blocks)
                / sqrt(((CAST(sh2 AS DOUBLE)
                         - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)
                           / n_blocks) / (n_blocks - 1)) / n_blocks)
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS z
    FROM agg ORDER BY scenario
    """,
    doc="Linear-time MMD between even/odd embedding halves (RBF kernel, "
        "sigma²=64) with CLT z-score; null and planted-shift arms.",
)
def q342(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.drift import mmd_linear

    e = tables(spark, sf_dir)["embeddings"]
    obs = mmd_linear(e, sigma2=64.0)
    shf = mmd_linear(
        e, sigma2=64.0,
        y_shift=lambda v: F.transform(
            v, lambda x, i: x + F.when(i == F.lit(1), F.lit(0.5))
                                 .otherwise(F.lit(0.0))))
    return (obs.select(F.lit("observed").alias("scenario"), "*")
            .unionAll(shf.select(F.lit("shifted").alias("scenario"), "*"))
            .orderBy("scenario"))


# --------------------------------------------------------------------------
# Q346 DSIR domain-targeted selection (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every pool document by
# the log importance ratio of its tokens under the TARGET domain's
# hashed-unigram distribution vs the full pool's, then keep the top-100.
# The classifier-free way to shift a training mixture toward a domain: the
# model is B=256 md5-hashed buckets (fixed size regardless of vocabulary)
# with add-one smoothing; each bucket's log-ratio takes ln of an
# exact-integer ratio and is DECIMAL-quantized before the per-doc sum (the
# q132 two-step), so the whole selection is deterministic and
# engine-invariant — top-k with id tie-break stands in for the paper's
# Gumbel resampling. Fixture story: 'en' is ~39%/22% of the pool at
# sf0.001/sf0.01 but 50%/58% of the selection — real enrichment, bounded
# by the synthetic corpus's shared cross-language vocabulary.
@query(
    "q346_dsir_selection",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    b AS (
      SELECT doc_id, lang,
             CAST((16 * (strpos('0123456789abcdef',
                                substr(md5(tok || ':dsir'), 1, 1)) - 1)
                   + strpos('0123456789abcdef',
                            substr(md5(tok || ':dsir'), 2, 1)) - 1)
                  % 256 AS INT) AS bk
      FROM toks),
    counts AS (
      SELECT bk, COUNT(*) AS cr,
             COUNT(CASE WHEN lang = 'en' THEN 1 END) AS ct
      FROM b GROUP BY bk),
    tots AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM counts),
    lr AS (
      SELECT bk,
             ROUND(CAST(ln(((ct + 1) * (nr + 256)) * 1.0
                           / ((cr + 1) * (nt + 256))) AS DECIMAL(18,6)), 4)
               AS lr
      FROM counts CROSS JOIN tots),
    d AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             CAST(ROUND(CAST(SUM(lr) AS DECIMAL(18,6)), 4) AS DOUBLE)
               AS logw
      FROM b JOIN lr USING (bk) GROUP BY doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, logw
    FROM d ORDER BY logw DESC, doc_id LIMIT 100
    """,
    doc="DSIR importance-resampling selection toward the 'en' domain: "
        "hashed-unigram (B=256, md5) log importance weights with add-one "
        "smoothing, decimal-quantized per bucket; deterministic top-100.",
)
def q346(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.pipeline import dsir_select_topk

    docs = tables(spark, sf_dir)["documents"]
    return dsir_select_topk(docs, F.col("lang") == "en", 100)
