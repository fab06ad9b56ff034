"""LLM-data-pipeline queries — Q43–Q45 + dedup/similarity/text extensions
(SURVEY.md §2.2i; mandated 100 TB training-data surface).

SQL-expressible variants carry DuckDB oracles; MinHash-LSH and SRP-ANN use
engine-native hashing (xxhash64) with no DuckDB analog, so they are declared
rows-only and verified by property tests against exact brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspectadb_spark.operators.dedup import (
    exact_dedup,
    jaccard_similar_pairs,
    minhash_near_dup_pairs,
    simhash,
)
from inspectadb_spark.operators.similarity import cosine_topk, srp_ann_topk
from inspectadb_spark.operators.text import (
    BPE_ISH_PATTERN,
    char_fingerprint,
    text_quality,
    token_counts,
    token_stats,
)
from inspectadb_spark.queries.registry import query, r4, r4c, tables


# --------------------------------------------------------------------------
# Q43 brute-force cosine top-k vs query vector vec_id=0 (no UDF: zip_with +
# aggregate higher-order built-ins; query side broadcast).
@query(
    "q43_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    z AS (
      SELECT e.vec_id, UNNEST(e.embedding) AS x, UNNEST(q.qe) AS y
      FROM embeddings e CROSS JOIN q
    ),
    s AS (
      SELECT vec_id,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS n1,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS n2
      FROM z GROUP BY vec_id
    )
    SELECT vec_id, {r4('dot / (SQRT(n1) * SQRT(n2))')} AS sim
    FROM s ORDER BY sim DESC, vec_id LIMIT 10
    """,
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["embeddings"]
    # one-row lookup of the query vector, then codegen-unrolled scan
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return cosine_topk(e, [float(x) for x in qvec], k=10)


# --------------------------------------------------------------------------
# Q43b ANN via signed-random-projection LSH (rows-only; recall property-tested)
@query("q43b_ann_srp", oracle=None,
       check="P: SRP-LSH planted-neighbor recall bars + determinism in "
             "tests/test_cluster.py (P2 family); exact baseline is the "
             "oracled q43")
def q43b(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tables(spark, sf_dir)["embeddings"]
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return srp_ann_topk(e, list(qvec), k=10, bits=8, tables=4, seed=42)


# --------------------------------------------------------------------------
# Q43e IVF ANN with k-means-trained centroids (rows-only; Lloyd's iterations
# are the iterative-algorithm class — no SQL analog. Determinism: md5-order
# init + exact-decimal mean/inertia accumulators, so the trained model and
# the probe result are run/partitioning invariant).
@query("q43e_ann_ivf_kmeans", oracle=None,
       check="P: Lloyd's iterations are the iterative-algorithm class (no "
             "SQL analog); md5-order init + exact-decimal accumulators "
             "make the model partitioning-invariant, recall/determinism "
             "pinned in tests/test_cluster.py")
def q43e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import ivf_topk, kmeans_fit

    e = tables(spark, sf_dir)["embeddings"]
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    cents, _ = kmeans_fit(e, k=8, iters=2)
    return ivf_topk(e, [float(x) for x in qvec], k=10, n_probe=3, centroids=cents)


# --------------------------------------------------------------------------
# Q43f top-k over int8-quantized embeddings (rows-only; reconstruction error
# and neighbourhood preservation are property-tested in P5). The scale play:
# the collection is stored as int8 codes (4x smaller scans); queries probe
# dequantized values.
@query("q43f_quantized_topk", oracle=None,
       check="A: int8 reconstruction-error bound and neighborhood "
             "preservation property-tested (P5, tests/test_properties.py "
             "/ tests/test_cluster.py)")
def q43f(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import (
        dequantize_embeddings,
        embedding_ranges,
        quantize_embeddings,
    )

    e = tables(spark, sf_dir)["embeddings"]
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    lo, hi = embedding_ranges(e)
    deq = dequantize_embeddings(quantize_embeddings(e, lo, hi), lo, hi)
    return cosine_topk(deq, [float(x) for x in qvec], k=10)


# --------------------------------------------------------------------------
# Q44 exact dedup by md5(text). The raw corpus contains ZERO exact
# duplicates at every SF, so against `documents` alone n ≡ 1 for every
# group and a broken COUNT/keep would hash-match anyway (the q326
# degeneracy class, caught by the round-9 oracle-constant sweep). A
# deterministic dup overlay — every doc_id % 50 == 0 document re-keyed at
# +1,000,000 — plants real clusters (n = 2, keep = the original id) so the
# group-count and min-survivor logic are value-exercised.
@query(
    "q44_exact_dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0)
    SELECT md5(text) AS h, COUNT(*) AS n, MIN(doc_id) AS keep
    FROM corpus GROUP BY 1 ORDER BY h LIMIT 500
    """,
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"].select("doc_id", "text")
    dup = (d.filter(F.col("doc_id") % 50 == 0)
           .withColumn("doc_id", F.col("doc_id") + F.lit(1000000)))
    return exact_dedup(d.unionByName(dup)).orderBy("h").limit(500)


# --------------------------------------------------------------------------
# Q44b SimHash fingerprints (votes from md5 hex chars — portable bit math)
@query(
    "q44b_simhash",
    oracle="""
    WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
    js AS (SELECT UNNEST(generate_series(0, 15)) AS j),
    v AS (
      SELECT doc_id, j,
             CASE WHEN SUBSTR(md5(tok), j + 1, 1) IN ('8','9','a','b','c','d','e','f')
                  THEN 1 ELSE -1 END AS v
      FROM tok CROSS JOIN js
    ),
    b AS (SELECT doc_id, j, CASE WHEN SUM(v) >= 0 THEN 1 ELSE 0 END AS bit
          FROM v GROUP BY doc_id, j)
    SELECT doc_id, CAST(SUM(bit * CAST(POWER(2, j) AS BIGINT)) AS BIGINT) AS sim16
    FROM b GROUP BY doc_id ORDER BY doc_id
    """,
)
def q44b(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    return simhash(d).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q44c exact token-set Jaccard pairs within a lang block
@query(
    "q44c_jaccard_pairs",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2,
           CAST(ROUND(CAST(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) AS DECIMAL(18,6)), 4) AS DOUBLE) AS jac
    FROM inter
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5
    ORDER BY d1, d2
    """,
)
def q44c(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    pairs = jaccard_similar_pairs(d, block_col="lang", threshold=0.5)
    return pairs.select("d1", "d2", r4c(F.col("jac")).alias("jac")).orderBy("d1", "d2")


# --------------------------------------------------------------------------
# Q44d MinHash + LSH near-dup pairs (rows-only: xxhash64 has no DuckDB analog)
@query("q44d_minhash_neardup", oracle=None,
       check="P: planted near-dup recall + banding-vs-Jaccard calibration "
             "in tests/test_corpus_ops.py / tests/test_properties.py (P1); "
             "the oracled portable-hash form is q114")
def q44d(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    pairs = minhash_near_dup_pairs(d, num_hashes=32, bands=8, shingle_k=3, threshold=0.5)
    return pairs.select("d1", "d2", r4c(F.col("jac")).alias("jac")).orderBy("d1", "d2")


# --------------------------------------------------------------------------
# Q45 text analysis: global top-50 vocabulary
@query(
    "q45_token_counts",
    oracle="""
    SELECT tok, COUNT(*) AS n FROM
      (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents) t
    GROUP BY tok ORDER BY n DESC, tok LIMIT 50
    """,
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(tables(spark, sf_dir)["documents"], top_n=50)


# --------------------------------------------------------------------------
# Q45b per-lang corpus stats
@query(
    "q45b_lang_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def q45b(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    return (
        d.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Q45c heuristic text-quality features
@query(
    "q45c_text_quality",
    oracle="""
    SELECT doc_id,
           CAST(LEN(string_split(text, ' ')) AS INT) AS n_tok,
           CAST(ROUND(CAST(CAST(LENGTH(text) AS DOUBLE) / LEN(string_split(text, ' '))
                AS DECIMAL(18,6)), 4) AS DOUBLE) AS chars_per_tok,
           CAST(ROUND(CAST(CAST(LEN(list_filter(string_split(text, ' '),
                t -> t IN ('the','a','of','and','to','in','is','data'))) AS DOUBLE)
                / LEN(string_split(text, ' ')) AS DECIMAL(18,6)), 4) AS DOUBLE) AS stop_ratio
    FROM documents ORDER BY doc_id
    """,
)
def q45c(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_quality(tables(spark, sf_dir)["documents"]).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q45d token accounting (whitespace vs BPE-ish regex vs chars/4 estimate)
@query(
    "q45d_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(string_split(text, ' ')) AS INT) AS n_ws,
           CAST(LEN(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INT) AS n_bpe,
           CAST(CEIL(LENGTH(text) / 4) AS BIGINT) AS n_est
    FROM documents ORDER BY doc_id
    """,
)
def q45d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(tables(spark, sf_dir)["documents"]).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q45e character-8-gram min-md5 document fingerprint
@query(
    "q45e_fingerprint",
    oracle="""
    WITH pos AS (
      SELECT doc_id, text, UNNEST(generate_series(1, CAST(LENGTH(text) AS INT) - 7)) AS i
      FROM documents WHERE LENGTH(text) >= 8
    )
    SELECT doc_id, MIN(md5(SUBSTR(text, i, 8))) AS fp
    FROM pos GROUP BY doc_id ORDER BY doc_id
    """,
)
def q45e(spark: SparkSession, sf_dir: str) -> DataFrame:
    return char_fingerprint(tables(spark, sf_dir)["documents"]).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q97 chunk-level exact dedup accounting (operators/dedup.py::chunk_dedup):
# per-document surviving-chunk counts after corpus-wide first-occurrence
# dedup of 10-word chunks.
@query(
    "q97_chunk_dedup",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    c AS (
      SELECT doc_id,
             unnest(range(0, CAST(ceil(len(words) / 10.0) AS INT))) AS chunk_idx,
             words
      FROM w),
    ch AS (
      SELECT doc_id, chunk_idx,
             md5(array_to_string(words[(chunk_idx*10+1):(chunk_idx*10+10)], ' ')) AS h
      FROM c),
    keep AS (
      SELECT h, MIN(doc_id * 1000000 + chunk_idx) AS keeper FROM ch GROUP BY h)
    SELECT ch.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN ch.doc_id * 1000000 + ch.chunk_idx = k.keeper
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM ch JOIN keep k USING (h)
    GROUP BY ch.doc_id ORDER BY ch.doc_id LIMIT 500
    """,
    doc="Sub-document boilerplate removal: fixed 10-word chunks, corpus-wide "
        "first occurrence kept, per-doc survival accounting.",
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import chunk_dedup

    d = chunk_dedup(tables(spark, sf_dir)["documents"])
    return (
        d.groupBy("doc_id")
        .agg(F.count("*").alias("n_chunks"),
             F.sum(F.col("keep").cast("bigint")).alias("n_kept"))
        .orderBy("doc_id")
        .limit(500)
    )


# --------------------------------------------------------------------------
# Q114 portable MinHash-LSH candidate generation: the banding stage of the
# near-dup pipeline with an md5-hex hash family, hash-matched end to end
# (signatures → band keys → bucket join). Complements q44d, whose xxhash64
# family is faster (8-byte ints vs 32-char strings) but engine-specific.
@query(
    "q114_minhash_lsh_portable",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      FROM toks WHERE len(w) >= 3),
    seeded AS (
      SELECT doc_id, unnest(generate_series(0, 7)) AS j, shingle FROM sh),
    sig AS (
      SELECT doc_id, j,
             MIN(md5(CAST(j AS VARCHAR) || '#' || shingle)) AS sig
      FROM seeded GROUP BY doc_id, j),
    keys AS (
      SELECT doc_id, CAST(j // 2 AS INT) AS band,
             md5(string_agg(sig, '|' ORDER BY j)) AS bk
      FROM sig GROUP BY doc_id, CAST(j // 2 AS INT))
    SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS INT) AS n_bands
    FROM keys a JOIN keys b ON a.band = b.band AND a.bk = b.bk
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id ORDER BY d1, d2
    """,
    doc="MinHash-LSH banding with a portable md5 hash family — candidate "
        "pairs and per-pair colliding-band counts hash-match the oracle.",
)
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import minhash_lsh_candidates_portable

    d = tables(spark, sf_dir)["documents"]
    return minhash_lsh_candidates_portable(d).orderBy("d1", "d2")


# --------------------------------------------------------------------------
# q125 per-dimension embedding statistics: integer-quantized aggregation so
# cross-row float-sum order and double->decimal repr rounding can't diverge
# between engines (see operators/similarity.py::embedding_dim_stats).
@query(
    "q125_embedding_dim_stats",
    oracle="""
    WITH q AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT) AS q
      FROM embeddings)
    SELECT pos, COUNT(*) AS n,
           CAST(CASE WHEN SUM(q) >= 0
                  THEN (2 * SUM(q) + COUNT(*)) // (2 * COUNT(*))
                  ELSE -((2 * -SUM(q) + COUNT(*)) // (2 * COUNT(*))) END
                AS DOUBLE) / 10000 AS mean_q,
           CAST(MIN(q) AS DOUBLE) / 10000 AS min_q,
           CAST(MAX(q) AS DOUBLE) / 10000 AS max_q
    FROM q GROUP BY pos ORDER BY pos
    """,
    doc="Per-dimension embedding stats via integer quantization (1e-4 "
        "resolution) — exact, associative, engine-portable aggregation.",
)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import embedding_dim_stats

    return embedding_dim_stats(tables(spark, sf_dir)["embeddings"])


# --------------------------------------------------------------------------
# Q202 margin-based bitext mining (Artetxe & Schwenk ratio margin): per en
# doc the best de candidate scored by cosine normalized against both
# vectors' top-k neighborhoods — integer-ppm exact end to end.
@query(
    "q202_margin_bitext",
    oracle="""
    WITH ve AS (
      SELECT e.vec_id AS id, e.embedding AS v, d.lang
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
    a AS (SELECT id, v FROM ve WHERE lang = 'en'),
    b AS (SELECT id, v FROM ve WHERE lang = 'de'),
    z AS (
      SELECT a.id AS a_id, b.id AS b_id, UNNEST(a.v) AS x, UNNEST(b.v) AS y
      FROM a CROSS JOIN b),
    s AS (
      SELECT a_id, b_id,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
      FROM z GROUP BY a_id, b_id),
    p AS (
      SELECT a_id, b_id,
             CAST(CAST(dot / (SQRT(na) * SQRT(nb)) AS DECIMAL(18,6))
                  * 1000000 AS BIGINT) AS sim_ppm
      FROM s WHERE na > 0 AND nb > 0),
    pp AS (SELECT * FROM p WHERE sim_ppm > 0),
    ra AS (
      SELECT a_id, CAST(SUM(sim_ppm) AS BIGINT) AS ra_sum FROM (
        SELECT a_id, sim_ppm,
               ROW_NUMBER() OVER (PARTITION BY a_id
                                  ORDER BY sim_ppm DESC, b_id) AS r
        FROM pp) t WHERE r <= 4 GROUP BY a_id),
    rb AS (
      SELECT b_id, CAST(SUM(sim_ppm) AS BIGINT) AS rb_sum FROM (
        SELECT b_id, sim_ppm,
               ROW_NUMBER() OVER (PARTITION BY b_id
                                  ORDER BY sim_ppm DESC, a_id) AS r
        FROM pp) t WHERE r <= 4 GROUP BY b_id),
    m AS (
      SELECT pp.a_id, pp.b_id, pp.sim_ppm,
             pp.sim_ppm * 8 * 1000000 // (ra_sum + rb_sum) AS margin_ppm
      FROM pp JOIN ra USING (a_id) JOIN rb USING (b_id)),
    w AS (
      SELECT a_id, b_id, sim_ppm, margin_ppm,
             ROW_NUMBER() OVER (PARTITION BY a_id
                                ORDER BY margin_ppm DESC, b_id) AS r
      FROM m)
    SELECT a_id, b_id, sim_ppm, margin_ppm
    FROM w WHERE r = 1 AND margin_ppm >= 1000000 ORDER BY a_id
    """,
    doc="Margin-based (CSLS-style ratio) bitext candidate mining en→de over "
        "doc-aligned embeddings: hub-robust cross-lingual pairing, "
        "integer-ppm deterministic.",
)
def q202(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import margin_bitext

    t = tables(spark, sf_dir)
    ve = t["embeddings"].join(
        t["documents"].select(F.col("doc_id").alias("vec_id"), "lang"),
        "vec_id")
    return margin_bitext(
        ve.filter(F.col("lang") == "en"), ve.filter(F.col("lang") == "de"),
        k=4, threshold_ppm=1_000_000)


# --------------------------------------------------------------------------
# Q203 matryoshka truncation audit: recall@10 of 16-dim truncated cosine
# top-k vs full 64-dim top-k over a deterministic query sample — both
# rankings ppm-quantized with id ties, so the overlap is engine-exact.
@query(
    "q203_matryoshka_recall",
    oracle="""
    WITH v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
    q AS (SELECT id, v FROM v WHERE id % 20 = 7),
    z AS (
      SELECT q.id AS q_id, c.id AS c_id,
             UNNEST(q.v) AS x, UNNEST(c.v) AS y,
             generate_subscripts(q.v, 1) AS pos
      FROM q CROSS JOIN v c WHERE c.id <> q.id),
    s AS (
      SELECT q_id, c_id,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nq,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nc,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
               FILTER (pos <= 16) AS dot16,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
               FILTER (pos <= 16) AS nq16,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
               FILTER (pos <= 16) AS nc16
      FROM z GROUP BY q_id, c_id),
    p AS (
      SELECT q_id, c_id,
             CAST(CAST(dot / (SQRT(nq) * SQRT(nc)) AS DECIMAL(18,6))
                  * 1000000 AS BIGINT) AS sim_full,
             CAST(CAST(dot16 / (SQRT(nq16) * SQRT(nc16)) AS DECIMAL(18,6))
                  * 1000000 AS BIGINT) AS sim_trunc
      FROM s WHERE nq > 0 AND nc > 0 AND nq16 > 0 AND nc16 > 0),
    tf AS (
      SELECT q_id, c_id FROM (
        SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY sim_full DESC, c_id) AS r FROM p) t WHERE r <= 10),
    tt AS (
      SELECT q_id, c_id FROM (
        SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY sim_trunc DESC, c_id) AS r FROM p) t WHERE r <= 10),
    o AS (
      SELECT tf.q_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
      FROM tf JOIN tt USING (q_id, c_id) GROUP BY tf.q_id)
    SELECT q.id AS q_id,
           CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
           COALESCE(o.n_overlap, 0) * 1000000 // 10 AS recall_ppm
    FROM q LEFT JOIN o ON o.q_id = q.id ORDER BY q_id
    """,
    doc="Matryoshka truncation audit: per sampled query, overlap of "
        "16-dim-truncated cosine top-10 with full 64-dim top-10 "
        "(recall@10 in ppm) — decides if a truncated index tier is safe.",
)
def q203(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import truncated_recall

    return truncated_recall(tables(spark, sf_dir)["embeddings"],
                            dims=16, k=10, sample_mod=20, sample_rem=7)


# --------------------------------------------------------------------------
# Q204 MinHash calibration audit: per LSH candidate pair, the signature-
# agreement Jaccard ESTIMATE next to the EXACT shingle-set Jaccard and the
# absolute error — validates (num_hashes, bands) on a corpus sample before
# trusting the sketch at scale. Portable md5 family, integer-ppm exact.
@query(
    "q204_minhash_calibration",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      FROM toks WHERE len(w) >= 3),
    seeded AS (
      SELECT doc_id, unnest(generate_series(0, 7)) AS j, shingle FROM sh),
    sig AS (
      SELECT doc_id, j,
             MIN(md5(CAST(j AS VARCHAR) || '#' || shingle)) AS sig
      FROM seeded GROUP BY doc_id, j),
    keys AS (
      SELECT doc_id, CAST(j // 2 AS INT) AS band,
             md5(string_agg(sig, '|' ORDER BY j)) AS bk
      FROM sig GROUP BY doc_id, CAST(j // 2 AS INT)),
    cand AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS INT) AS n_bands
      FROM keys a JOIN keys b ON a.band = b.band AND a.bk = b.bk
      WHERE a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id),
    agree AS (
      SELECT c.d1, c.d2, c.n_bands,
             CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_agree
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.d1
      JOIN sig sb ON sb.doc_id = c.d2 AND sb.j = sa.j
      GROUP BY c.d1, c.d2, c.n_bands),
    nsh AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh
            FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.d1, c.d2, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM cand c
      JOIN sh a ON a.doc_id = c.d1
      JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
      GROUP BY c.d1, c.d2)
    SELECT g.d1, g.d2, g.n_bands,
           g.n_agree * 1000000 // 8 AS est_ppm,
           i.n_inter * 1000000 // (n1.n_sh + n2.n_sh - i.n_inter)
             AS exact_ppm,
           ABS(g.n_agree * 1000000 // 8
               - i.n_inter * 1000000 // (n1.n_sh + n2.n_sh - i.n_inter))
             AS err_ppm
    FROM agree g
    JOIN inter i ON i.d1 = g.d1 AND i.d2 = g.d2
    JOIN nsh n1 ON n1.doc_id = g.d1
    JOIN nsh n2 ON n2.doc_id = g.d2
    ORDER BY g.d1, g.d2
    """,
    doc="Per-candidate-pair MinHash estimate vs exact shingle Jaccard with "
        "absolute error — the sketch-calibration audit run on a sample "
        "before applying (num_hashes, bands) corpus-wide.",
)
def q204(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import minhash_calibration

    return minhash_calibration(tables(spark, sf_dir)["documents"])


# --------------------------------------------------------------------------
# Q207 MMR diversified retrieval: greedy λ-tradeoff re-rank of the cosine
# pool — rows-only (sequential greedy recurrence); semantics pinned by
# property tests (rank-1 = relevance top-1, λ=1 degenerates to cosine
# order, planted duplicates suppressed).
@query(
    "q207_mmr_topk",
    oracle=None,
    check="P: greedy sequential re-rank (iterative, not SQL-expressible); "
          "rank-1 ≡ relevance top-1 / λ=1 ≡ cosine order / planted-dup "
          "suppression pinned in tests/test_corpus_ops.py",
    doc="Per sampled query, MMR-diversified top-5 from the cosine top-30 "
        "pool (λ=0.7, integer-ppm scores, id ties) via cogrouped "
        "applyInPandas — redundancy-suppressing retrieval re-rank.",
)
def q207(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import mmr_topk

    return mmr_topk(tables(spark, sf_dir)["embeddings"],
                    k=5, pool=30, lam_ppm=700_000)


# --------------------------------------------------------------------------
# Q219 SimHash calibration audit: q204's companion for the OTHER sketch —
# over a deterministic sample of same-lang doc pairs, the 16-bit SimHash
# hamming distance next to the exact token-set Jaccard (ppm). This is the
# table that picks the hamming radius for a simhash dedup pass. NB: the
# DuckDB '^' operator is POWER, not xor — the oracle uses xor(a, b).
@query(
    "q219_simhash_calibration",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok
      FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.lang = b.lang AND a.tok = b.tok
        AND a.doc_id < b.doc_id
      WHERE a.doc_id % 25 = 0
      GROUP BY 1, 2 HAVING COUNT(*) >= 5),
    alltok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
               FROM documents),
    js AS (SELECT UNNEST(generate_series(0, 15)) AS j),
    v AS (
      SELECT doc_id, j,
             CASE WHEN SUBSTR(md5(tok), j + 1, 1)
                       IN ('8','9','a','b','c','d','e','f')
                  THEN 1 ELSE -1 END AS v
      FROM alltok CROSS JOIN js),
    b AS (SELECT doc_id, j, CASE WHEN SUM(v) >= 0 THEN 1 ELSE 0 END AS bit
          FROM v GROUP BY doc_id, j),
    fp AS (SELECT doc_id,
                  CAST(SUM(bit * CAST(POWER(2, j) AS BIGINT)) AS BIGINT)
                    AS sim16
           FROM b GROUP BY doc_id)
    SELECT i.d1, i.d2,
           CAST(i.i * 1000000 // (s1.sz + s2.sz - i.i) AS BIGINT)
             AS jac_ppm,
           CAST(bit_count(xor(f1.sim16, f2.sim16)) AS BIGINT) AS hamming
    FROM inter i
    JOIN sizes s1 ON s1.doc_id = i.d1
    JOIN sizes s2 ON s2.doc_id = i.d2
    JOIN fp f1 ON f1.doc_id = i.d1
    JOIN fp f2 ON f2.doc_id = i.d2
    ORDER BY i.d1, i.d2
    """,
    doc="SimHash-vs-exact calibration: per sampled same-lang pair the "
        "16-bit hamming distance and the exact token Jaccard (ppm) — "
        "picks the hamming radius before a simhash dedup pass.",
)
def q219(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    tok = (d.select(F.col("doc_id"), F.col("lang"),
                    F.explode(F.split("text", " ")).alias("tok"))
           .distinct())
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(b, (F.col("a.lang") == F.col("b.lang"))
               & (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .filter(F.col("a.doc_id") % 25 == 0)
        .groupBy(F.col("a.doc_id").alias("d1"),
                 F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("i")).filter(F.col("i") >= 5)
    )
    fp = simhash(d)
    # r14 (guide §2.4): sizes and fp were four separate join-backs — two
    # subtree instances EACH of the token-dedup and simhash pipelines
    # (six documents scans per run). One combined per-doc frame joined
    # for d1 and d2 leaves two BroadcastExchanges over byte-identical
    # subtrees, which AQE builds once and reuses.
    perdoc = sizes.join(fp, "doc_id")
    return (
        inter
        .join(F.broadcast(perdoc.select(F.col("doc_id").alias("d1"),
                                        F.col("sz").alias("s1"),
                                        F.col("sim16").alias("f1"))), "d1")
        .join(F.broadcast(perdoc.select(F.col("doc_id").alias("d2"),
                                        F.col("sz").alias("s2"),
                                        F.col("sim16").alias("f2"))), "d2")
        .select("d1", "d2",
                F.expr("CAST(i * 1000000 DIV (s1 + s2 - i) AS BIGINT)")
                .alias("jac_ppm"),
                F.expr("CAST(bit_count(f1 ^ f2) AS BIGINT)")
                .alias("hamming"))
        .orderBy("d1", "d2")
    )


# --------------------------------------------------------------------------
# Q220 compression-ratio quality signal: per-source distribution of the
# per-doc deflate ratio — rows-only (zlib is deterministic per library
# build but not engine-portable); the relational repetition signals
# (q66/q129) are the oracle-class alternatives.
@query(
    "q220_compression_ratio",
    oracle=None,
    check="rows-only: deflate ratios are zlib-library-defined, not "
          "SQL-derivable; repetition/null flagging + bounds pinned in "
          "tests/test_corpus_ops.py; q66/q129 are the oracle-class "
          "repetitiveness alternatives",
    doc="Per-source deflate compression-ratio profile (min/median-ish via "
        "avg/max in ppm): the Gopher-stack repetitiveness signal; "
        "Arrow-batched pandas UDF, scan-side.",
)
def q220(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import compression_ratio

    d = tables(spark, sf_dir)["documents"]
    cr = compression_ratio(d).join(d.select("doc_id", "source"), "doc_id")
    return (
        cr.groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.min("ratio_ppm").alias("min_ppm"),
             F.expr("CAST(SUM(ratio_ppm) DIV COUNT(*) AS BIGINT)")
             .alias("mean_ppm"),
             F.max("ratio_ppm").alias("max_ppm"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q221 quality-rule report: Gopher/C4-style heuristic rules as a per-doc
# bitmask (operators/text.py::quality_rules, pure codegen), aggregated to
# per-rule failure counts plus the overall pass rate — the go/no-go
# dashboard of a corpus-filtering run. Integer arithmetic end to end.
@query(
    "q221_quality_rules",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w, length(text) AS lc
      FROM documents),
    f AS (
      SELECT doc_id, len(w) AS n_tok,
             lc - (len(w) - 1) AS tok_chars,
             len(list_filter(w, t -> t IN ('the','a','of','and','to',
                                           'in','is','data'))) AS n_stop,
             (SELECT MAX(c) FROM (
                SELECT COUNT(*) AS c FROM UNNEST(w) AS u(t) GROUP BY t) g)
               AS top_tok,
             len(list_distinct(w)) AS n_distinct
      FROM d),
    m AS (
      SELECT doc_id, n_tok,
             (CASE WHEN n_tok < 10 THEN 1 ELSE 0 END
              + CASE WHEN tok_chars * 10 < 30 * n_tok
                       OR tok_chars * 10 > 100 * n_tok THEN 2 ELSE 0 END
              + CASE WHEN n_stop < 2 THEN 4 ELSE 0 END
              + CASE WHEN top_tok * 5 > n_tok THEN 8 ELSE 0 END
              + CASE WHEN n_distinct * 10 < n_tok * 3 THEN 16 ELSE 0 END)
               AS rule_mask
      FROM f),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM m)
    SELECT r.rule, CAST(SUM(CASE WHEN m.rule_mask & r.rule <> 0
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
           CAST(SUM(CASE WHEN m.rule_mask = 0 THEN 1 ELSE 0 END) * 1000000
                // MAX(t.n_docs) AS BIGINT) AS pass_ppm
    FROM m CROSS JOIN t
    CROSS JOIN (SELECT UNNEST([1, 2, 4, 8, 16]) AS rule) r
    GROUP BY r.rule ORDER BY r.rule
    """,
    doc="Per-rule failure counts + overall pass rate (ppm) of the "
        "Gopher-style quality bitmask — the corpus-filtering dashboard.",
)
def q221(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import quality_rules

    d = tables(spark, sf_dir)["documents"]
    m = quality_rules(d)
    t = m.agg(F.count("*").alias("n_docs"))
    rules = spark.createDataFrame([(1,), (2,), (4,), (8,), (16,)],
                                  "rule int")
    return (
        m.join(F.broadcast(t)).join(F.broadcast(rules))
        .groupBy("rule")
        .agg(F.sum(F.when(F.expr("rule_mask & rule") != 0, 1).otherwise(0))
             .alias("n_failed"),
             F.expr("SUM(CASE WHEN rule_mask = 0 THEN 1 ELSE 0 END)"
                    " * 1000000 DIV MAX(n_docs)").alias("pass_ppm"))
        .orderBy("rule")
    )


# --------------------------------------------------------------------------
# Q222 dedup impact report: per source, corpus mass before/after
# fingerprint-level dedup (docs + whitespace tokens) and the reduction in
# ppm — the "what did dedup buy us" table every curation run records.
# The cluster key is the q45e winnowing fingerprint (min md5 over 8-char
# grams), which groups near-identical docs where exact md5 finds none on
# this corpus (verified: zero exact-text dups — an md5-keyed report is
# truthfully all-zero). Survivor = min doc_id per (source, fp) group;
# sub-8-char docs fall back to md5(text) singletons.
@query(
    "q222_dedup_impact",
    oracle="""
    WITH fp AS (
      SELECT doc_id, MIN(md5(substr(text, i, 8))) AS fp
      FROM documents, UNNEST(generate_series(1, length(text) - 7)) AS u(i)
      WHERE length(text) >= 8 GROUP BY doc_id),
    d AS (
      SELECT d.source, d.doc_id, COALESCE(fp.fp, md5(d.text)) AS h,
             len(string_split(d.text, ' ')) AS n_tok
      FROM documents d LEFT JOIN fp ON fp.doc_id = d.doc_id),
    surv AS (
      SELECT source, h, MIN(doc_id) AS keep FROM d GROUP BY source, h),
    j AS (
      SELECT d.source, d.n_tok,
             CASE WHEN s.keep = d.doc_id THEN 1 ELSE 0 END AS kept
      FROM d JOIN surv s ON s.source = d.source AND s.h = d.h)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs_before,
           CAST(SUM(kept) AS BIGINT) AS docs_after,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_before,
           CAST(SUM(kept * n_tok) AS BIGINT) AS tokens_after,
           CAST((COUNT(*) - SUM(kept)) * 1000000 // COUNT(*) AS BIGINT)
             AS doc_drop_ppm,
           CAST((SUM(n_tok) - SUM(kept * n_tok)) * 1000000 // SUM(n_tok)
                AS BIGINT) AS token_drop_ppm
    FROM j GROUP BY source ORDER BY source
    """,
    doc="Per-source before/after exact-dedup corpus mass (docs + tokens) "
        "with drop rates in ppm — the dedup cost/benefit table.",
)
def q222(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import char_fingerprint

    docs = tables(spark, sf_dir)["documents"]
    fp = char_fingerprint(docs)
    d = (docs.join(fp, "doc_id", "left")
         .select("source", "doc_id",
                 F.coalesce("fp", F.md5("text")).alias("h"),
                 F.size(F.split("text", " ")).alias("n_tok")))
    surv = d.groupBy("source", "h").agg(F.min("doc_id").alias("keep"))
    j = d.join(surv, ["source", "h"]).select(
        "source", "n_tok",
        F.when(F.col("keep") == F.col("doc_id"), 1).otherwise(0)
        .alias("kept"))
    return (
        j.groupBy("source")
        .agg(F.count("*").alias("docs_before"),
             F.sum("kept").alias("docs_after"),
             F.sum("n_tok").alias("tokens_before"),
             F.sum(F.col("kept") * F.col("n_tok")).alias("tokens_after"))
        .select(
            "source", "docs_before", "docs_after", "tokens_before",
            "tokens_after",
            F.expr("(docs_before - docs_after) * 1000000 DIV docs_before")
            .alias("doc_drop_ppm"),
            F.expr("(tokens_before - tokens_after) * 1000000"
                   " DIV tokens_before").alias("token_drop_ppm"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q223 duplicate-cluster-size histogram: how fingerprint-dup groups
# distribute (singletons vs pairs vs large template blooms) — the
# diagnostic that tells you whether dedup is fighting scattered twins or
# a few mass duplicates. Same winnowing-fingerprint key as q222; bucket
# rule is integer CASE, counts exact.
@query(
    "q223_dup_cluster_histogram",
    oracle="""
    WITH fp AS (
      SELECT doc_id, MIN(md5(substr(text, i, 8))) AS fp
      FROM documents, UNNEST(generate_series(1, length(text) - 7)) AS u(i)
      WHERE length(text) >= 8 GROUP BY doc_id),
    k AS (
      SELECT COALESCE(fp.fp, md5(d.text)) AS h
      FROM documents d LEFT JOIN fp ON fp.doc_id = d.doc_id),
    g AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS sz FROM k GROUP BY h),
    b AS (
      SELECT CASE WHEN sz = 1 THEN '1'
                  WHEN sz = 2 THEN '2'
                  WHEN sz <= 5 THEN '3-5'
                  WHEN sz <= 20 THEN '6-20'
                  ELSE '21+' END AS bucket,
             sz
      FROM g)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz - 1) AS BIGINT) AS n_removable
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="Histogram of exact-duplicate cluster sizes with per-bucket doc "
        "and removable counts — dedup shape diagnostics.",
)
def q223(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import char_fingerprint

    docs = tables(spark, sf_dir)["documents"]
    fp = char_fingerprint(docs)
    g = (docs.join(fp, "doc_id", "left")
         .select(F.coalesce("fp", F.md5("text")).alias("h"))
         .groupBy("h").agg(F.count("*").alias("sz")))
    bucket = (F.when(F.col("sz") == 1, "1")
              .when(F.col("sz") == 2, "2")
              .when(F.col("sz") <= 5, "3-5")
              .when(F.col("sz") <= 20, "6-20")
              .otherwise("21+"))
    return (
        g.select(bucket.alias("bucket"), "sz")
        .groupBy("bucket")
        .agg(F.count("*").alias("n_clusters"),
             F.sum("sz").alias("n_docs"),
             F.sum(F.col("sz") - 1).alias("n_removable"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Q224 1-NN label accuracy (leave-one-out kNN probe): for each sampled
# vector, does its nearest neighbor share its label? THE cheap embedding-
# quality eval — collapsing accuracy is the first sign of a broken
# encoder. Same ppm-cosine + struct-max winner machinery as q193/q203.
@query(
    "q224_knn_label_accuracy",
    oracle="""
    WITH v AS (SELECT vec_id AS id, embedding AS v, label FROM embeddings),
    q AS (SELECT * FROM v WHERE id % 10 = 3),
    z AS (
      SELECT q.id AS q_id, q.label AS q_label,
             c.id AS c_id, c.label AS c_label,
             UNNEST(q.v) AS x, UNNEST(c.v) AS y
      FROM q CROSS JOIN v c WHERE c.id <> q.id),
    s AS (
      SELECT q_id, q_label, c_id, c_label,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nq,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nc
      FROM z GROUP BY q_id, q_label, c_id, c_label),
    p AS (
      SELECT q_id, q_label, c_id, c_label,
             CAST(CAST(dot / (SQRT(nq) * SQRT(nc)) AS DECIMAL(18,6))
                  * 1000000 AS BIGINT) AS sim_ppm
      FROM s WHERE nq > 0 AND nc > 0),
    w AS (
      SELECT q_id, q_label, c_label,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY sim_ppm DESC, c_id) AS r
      FROM p)
    SELECT CAST(q_label AS INT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN c_label = q_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN c_label = q_label THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS acc_ppm
    FROM w WHERE r = 1 GROUP BY q_label ORDER BY label
    """,
    doc="Leave-one-out 1-NN label accuracy per class over a deterministic "
        "vector sample — the cheap embedding-quality probe; ppm cosine, "
        "id ties, integer accuracy.",
)
def q224(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import _norm2, batch_cross_dots

    e = tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") % 10 == 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"),
        F.sqrt(_norm2("embedding")).alias("qm"),
        F.col("label").alias("q_label")).filter(F.col("qm") > 0)
    c = e.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce"),
        F.sqrt(_norm2("embedding")).alias("cm"),
        F.col("label").alias("c_label")).filter(F.col("cm") > 0)
    # r13: the broadcast q-batch is scored against each candidate in ONE
    # corpus pass (batch_cross_dots — bit-identical fixed-order dots, the
    # same driver materialization the old BroadcastExchange paid); q-side
    # scalars re-attach by key and the old join condition becomes the
    # identical post-filter.
    raw = batch_cross_dots(c, ["c_id", "c_label", "cm"], ["ce"],
                           q, "q_id", ["qe"], ["_dotqc"])
    sim = F.col("_dotqc") / (F.col("qm") * F.col("cm"))
    pairs = (
        raw.join(F.broadcast(q.select("q_id", "qm", "q_label")), "q_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_label", "c_id", "c_label",
                (sim.cast("decimal(18,6)") * 1_000_000)
                .cast("bigint").alias("sim_ppm"))
    )
    win = (
        pairs.groupBy("q_id", "q_label")
        .agg(F.max(F.struct(
            F.col("sim_ppm").alias("s"),
            (-F.col("c_id")).alias("nid"),
            F.col("c_label").alias("nl"))).alias("w"))
        .select("q_label", F.col("w.nl").alias("c_label"))
    )
    return (
        win.groupBy(F.col("q_label").cast("int").alias("label"))
        .agg(F.count("*").alias("n_queries"),
             F.sum(F.when(F.col("c_label") == F.col("q_label"), 1)
                   .otherwise(0)).alias("n_correct"))
        .select("label", "n_queries", "n_correct",
                F.expr("n_correct * 1000000 DIV n_queries").alias("acc_ppm"))
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Q237 keep-best dedup resolution: q222/q223 diagnose dedup mass with a
# keep-FIRST policy; production curation keeps the BEST cluster member
# (max n_chars, tie min doc_id) corpus-wide, which makes losses cross
# source boundaries — this is the attribution table for that policy.
@query(
    "q237_keep_best_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id, MIN(md5(substr(text, i, 8))) AS fp
      FROM documents, UNNEST(generate_series(1, length(text) - 7)) AS u(i)
      WHERE length(text) >= 8 GROUP BY doc_id),
    d AS (
      SELECT d.source, d.doc_id, d.n_chars, COALESCE(fp.fp, md5(d.text)) AS h
      FROM documents d LEFT JOIN fp ON fp.doc_id = d.doc_id),
    mx AS (SELECT h, MAX(n_chars) AS mq FROM d GROUP BY h),
    w AS (
      SELECT d.h, MIN(d.doc_id) AS win_id
      FROM d JOIN mx ON mx.h = d.h AND d.n_chars = mx.mq
      GROUP BY d.h),
    ww AS (
      SELECT w.h, w.win_id, d.source AS win_src
      FROM w JOIN d ON d.h = w.h AND d.doc_id = w.win_id),
    j AS (
      SELECT d.source, d.doc_id, ww.win_id, ww.win_src
      FROM d JOIN ww ON ww.h = d.h)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN doc_id = win_id THEN 1 END) AS BIGINT)
             AS n_kept,
           CAST(COUNT(CASE WHEN doc_id <> win_id AND source = win_src
                      THEN 1 END) AS BIGINT) AS lost_same_source,
           CAST(COUNT(CASE WHEN doc_id <> win_id AND source <> win_src
                      THEN 1 END) AS BIGINT) AS lost_cross_source
    FROM j GROUP BY source ORDER BY source
    """,
    doc="Keep-best (max-quality) dedup resolution per source: kept docs "
        "plus same-source vs cross-source casualties under a corpus-wide "
        "winner election on the winnowing-fingerprint cluster key.",
)
def q237(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import keep_best_dedup

    docs = tables(spark, sf_dir)["documents"]
    ann = keep_best_dedup(docs)
    lost = ~F.col("keep")
    return (
        ann.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            F.sum((lost & (F.col("source") == F.col("win_group")))
                  .cast("bigint")).alias("lost_same_source"),
            F.sum((lost & (F.col("source") != F.col("win_group")))
                  .cast("bigint")).alias("lost_cross_source"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q238 Zipf's-law fit per language: OLS of ln(freq) on ln(rank) over the
# token-frequency table, sufficient statistics decimal-quantized so the
# fit is aggregation-order-exact (same convention as q134's entropy).
@query(
    "q238_zipf_fit",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
    f AS (SELECT lang, tok, COUNT(*) AS c FROM toks GROUP BY lang, tok),
    r AS (
      SELECT lang, tok, c,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok)
               AS rnk
      FROM f),
    q AS (
      SELECT lang, c,
             CAST(ln(CAST(rnk AS DOUBLE)) AS DECIMAL(18,6)) AS x,
             CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(18,6)) AS y
      FROM r),
    s AS (
      SELECT lang, COUNT(*) AS n_types, SUM(c) AS n_tokens,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
      FROM q GROUP BY lang),
    fit AS (
      SELECT lang, n_types, n_tokens, sx, sy,
             (CAST(n_types AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(CAST(n_types AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0)
               AS slope_raw
      FROM s)
    SELECT lang, CAST(n_types AS BIGINT) AS n_types,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(ROUND(CAST(slope_raw AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS zipf_slope,
           CAST(ROUND(CAST((CAST(sy AS DOUBLE) - slope_raw
                            * CAST(sx AS DOUBLE))
                           / CAST(n_types AS DOUBLE) AS DECIMAL(18,6)), 4)
                AS DOUBLE) AS zipf_intercept
    FROM fit ORDER BY lang
    """,
    doc="Per-language Zipf fit (OLS slope/intercept of ln freq vs ln rank) "
        "with decimal-quantized sufficient statistics — corpus-health "
        "audit for template spam (flat head) and synthetic token soup.",
)
def q238(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import zipf_fit

    docs = tables(spark, sf_dir)["documents"]
    return zipf_fit(docs).orderBy("lang")


# --------------------------------------------------------------------------
# Q249 temperature-scaled mixture weights: the multilingual-training
# standard (sample source s with probability share_s^alpha / Z, alpha<1
# upweights the tail). q126/q126b enforce a target mixture; this COMPUTES
# the target from the corpus itself. Weights are CHAR-based (the token
# proxy — training mixtures are token-budgeted, not doc-counted), which
# also keeps the statistic non-degenerate: the driver corpus is exactly
# uniform in docs-per-source (25 each — the round-11 any-value degeneracy
# sweep caught the doc-count formulation collapsing every output column
# to a constant), while per-source char mass genuinely varies. Scalar
# pow/normalization happen on the source table (|sources| rows) after
# exact integer sums.
@query(
    "q249_mixture_temperature",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n, SUM(n_chars) AS chars
      FROM documents GROUP BY source),
    t AS (SELECT SUM(chars) AS tot FROM s),
    w AS (
      SELECT source, n, chars, tot,
             POW(CAST(chars AS DOUBLE) / CAST(tot AS DOUBLE), 0.7) AS tw
      FROM s CROSS JOIN t),
    z AS (SELECT SUM(tw) AS sw FROM w)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CAST(chars AS BIGINT) AS n_chars,
           CAST(chars * 1000000 // tot AS BIGINT) AS share_ppm,
           CAST(ROUND(CAST(tw AS DECIMAL(18,6)), 4) AS DOUBLE) AS temp_weight,
           CAST(ROUND(CAST(tw / sw AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS temp_share
    FROM w CROSS JOIN z ORDER BY source
    """,
    doc="Temperature-scaled (alpha=0.7) sampling weights per source over "
        "char mass (the token proxy): raw share ppm (exact integers) plus "
        "normalized temperature share (4-dp doubles over the "
        "|sources|-row table).",
)
def q249(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    s = docs.groupBy("source").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("chars")
    )
    return mixture_readout(s).orderBy("source")


def mixture_readout(s: DataFrame, alpha: float = 0.7) -> DataFrame:
    """q249's closed form over (source)-grain sufficient statistics
    ``(source, n, chars)`` — shared with the S49 live mixture monitor so
    batch and stream read out through the SAME code path. ``n``/``chars``
    must be exact (integer or decimal) sums; all scalar pow/normalization
    happens on the |sources|-row model table, never the corpus."""
    s = s.select("source", F.col("n").cast("bigint").alias("n"),
                 F.col("chars").cast("bigint").alias("chars"))
    t = s.agg(F.sum("chars").alias("tot"))
    w = s.crossJoin(F.broadcast(t)).withColumn(
        "tw", F.pow(F.col("chars").cast("double") / F.col("tot").cast("double"),
                    F.lit(alpha)))
    z = w.agg(F.sum("tw").alias("sw"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source", F.col("n").alias("n_docs"),
            F.col("chars").alias("n_chars"),
            F.expr("chars * 1000000 DIV tot").alias("share_ppm"),
            r4c(F.col("tw")).alias("temp_weight"),
            r4c(F.col("tw") / F.col("sw")).alias("temp_share"),
        )
    )


# --------------------------------------------------------------------------
# Q250 dedup threshold sweep: pair and affected-doc counts at each
# candidate Jaccard cutoff — the operating-curve table you read before
# committing a near-dup threshold corpus-wide. Similarity is integer ppm
# (i*1e6 DIV union), so every row is engine-exact; the pair table is
# computed ONCE (blocked, like q44c) and the sweep is a tiny
# threshold-join over it.
_Q250_THRS = [200000, 300000, 400000, 500000, 600000, 700000, 800000]


@query(
    "q250_dedup_threshold_sweep",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok
      FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
      FROM tok a JOIN tok b
        ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    p AS (
      SELECT d1, d2, i * 1000000 // (s1.sz + s2.sz - i) AS jppm
      FROM inter
      JOIN sizes s1 ON s1.doc_id = d1
      JOIN sizes s2 ON s2.doc_id = d2
      WHERE i * 1000000 // (s1.sz + s2.sz - i) >= {_Q250_THRS[0]}),
    t(thr) AS (VALUES {', '.join(f'({x})' for x in _Q250_THRS)}),
    m AS (SELECT t.thr, d1, d2 FROM p JOIN t ON p.jppm >= t.thr),
    pc AS (SELECT thr, COUNT(*) AS n_pairs FROM m GROUP BY thr),
    dc AS (
      SELECT thr, COUNT(DISTINCT doc) AS n_docs FROM (
        SELECT thr, d1 AS doc FROM m UNION SELECT thr, d2 FROM m) u
      GROUP BY thr)
    SELECT CAST(t.thr AS BIGINT) AS thr_ppm,
           CAST(COALESCE(pc.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(dc.n_docs, 0) AS BIGINT) AS n_docs_affected
    FROM t LEFT JOIN pc ON pc.thr = t.thr LEFT JOIN dc ON dc.thr = t.thr
    ORDER BY thr_ppm
    """,
    doc="Near-dup threshold operating curve: blocked exact-Jaccard pairs "
        "in integer ppm, swept over candidate cutoffs — pairs and distinct "
        "affected docs per threshold, zero-filled.",
)
def q250(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import token_overlap_pairs

    docs = tables(spark, sf_dir)["documents"]
    # r13: the pair frame comes from the blocked-GEMM token_overlap_pairs
    # (exact integer intersections) instead of the Σ df² posting-list
    # self-join — same (d1, d2, i, s1, s2) rows, ~10x less shuffled.
    # jppm stays the same all-integer expression, so results are
    # bit-identical.
    p = (
        token_overlap_pairs(docs, block_col="lang")
        .select("d1", "d2",
                F.expr("i * 1000000 DIV (s1 + s2 - i)").alias("jppm"))
        .filter(F.col("jppm") >= _Q250_THRS[0])
    )
    thr = spark.createDataFrame([(x,) for x in _Q250_THRS], "thr bigint")
    m = p.join(F.broadcast(thr), F.col("jppm") >= F.col("thr")).select(
        "thr", "d1", "d2")
    # r14 (guide §2.4): the pair-count and affected-doc branches each
    # re-ran the blocked-GEMM pair subtree; ONE doc-level stream now
    # serves both — every pair emits exactly two doc rows (d1 < d2 is
    # strict), so n_pairs = COUNT(*) DIV 2 and n_docs_affected =
    # COUNT(DISTINCT doc), in one aggregation over one GEMM pass
    stacked = m.select("thr", F.explode(F.array("d1", "d2")).alias("doc"))
    agg = stacked.groupBy("thr").agg(
        F.expr("COUNT(*) DIV 2").alias("n_pairs"),
        F.countDistinct("doc").alias("n_docs_affected"))
    return (
        thr.join(agg, "thr", "left")
        .select(F.col("thr").alias("thr_ppm"),
                F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
                F.coalesce("n_docs_affected", F.lit(0))
                .alias("n_docs_affected"))
        .orderBy("thr_ppm")
    )


# --------------------------------------------------------------------------
# Q252 split-leakage audit: a doc-level random split (md5 hash, 80/20) is
# NOT dedup-aware — near-dup content straddles train/test and inflates
# eval. Per straddle diagnosis: clusters (winnowing-fingerprint key, as
# q222) containing BOTH train and test members, and the test docs thereby
# leaked, in ppm of the test split. The fix this audit motivates is
# cluster-level splitting (hash the FINGERPRINT, not the doc id).
@query(
    "q252_split_leakage",
    oracle="""
    WITH fp AS (
      SELECT doc_id, MIN(md5(substr(text, i, 8))) AS fp
      FROM documents, UNNEST(generate_series(1, length(text) - 7)) AS u(i)
      WHERE length(text) >= 8 GROUP BY doc_id),
    d AS (
      SELECT d.doc_id, COALESCE(fp.fp, md5(d.text)) AS h,
             CASE WHEN (instr('0123456789abcdef',
                              substr(md5(CAST(d.doc_id AS VARCHAR)
                                         || ':split'), 1, 1)) - 1) < 13
                  THEN 'train' ELSE 'test' END AS split
      FROM documents d LEFT JOIN fp ON fp.doc_id = d.doc_id),
    c AS (
      SELECT h,
             COUNT(CASE WHEN split = 'train' THEN 1 END) AS n_tr,
             COUNT(CASE WHEN split = 'test' THEN 1 END) AS n_te
      FROM d GROUP BY h)
    SELECT CAST(SUM(n_tr) AS BIGINT) AS n_train_docs,
           CAST(SUM(n_te) AS BIGINT) AS n_test_docs,
           CAST(COUNT(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 END) AS BIGINT)
             AS n_straddling_clusters,
           CAST(SUM(CASE WHEN n_tr > 0 THEN n_te ELSE 0 END) AS BIGINT)
             AS n_test_docs_leaked,
           CAST(SUM(CASE WHEN n_tr > 0 THEN n_te ELSE 0 END) * 1000000
                // SUM(n_te) AS BIGINT) AS test_leak_ppm
    FROM c
    """,
    doc="Eval-hygiene audit: fingerprint clusters straddling a doc-level "
        "md5 80/20 split, and the leaked test mass in ppm — the "
        "measurement that motivates cluster-level (fingerprint-hashed) "
        "splitting. First-hex-nibble < 13 approximates 80% portably.",
)
def q252(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    fp = char_fingerprint(docs)
    nib = ("instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)"
           " || ':split'), 1, 1)) - 1")
    d = (docs.join(fp, "doc_id", "left")
         .select(F.coalesce("fp", F.md5("text")).alias("h"),
                 F.when(F.expr(nib) < 13, "train").otherwise("test")
                 .alias("split")))
    c = d.groupBy("h").agg(
        F.sum((F.col("split") == "train").cast("bigint")).alias("n_tr"),
        F.sum((F.col("split") == "test").cast("bigint")).alias("n_te"))
    leaked = F.when(F.col("n_tr") > 0, F.col("n_te")).otherwise(0)
    return c.agg(
        F.sum("n_tr").alias("n_train_docs"),
        F.sum("n_te").alias("n_test_docs"),
        F.sum(((F.col("n_tr") > 0) & (F.col("n_te") > 0)).cast("bigint"))
        .alias("n_straddling_clusters"),
        F.sum(leaked).alias("n_test_docs_leaked"),
    ).select(
        "n_train_docs", "n_test_docs", "n_straddling_clusters",
        "n_test_docs_leaked",
        F.expr("n_test_docs_leaked * 1000000 DIV n_test_docs")
        .alias("test_leak_ppm"),
    )


# --------------------------------------------------------------------------
# Q253 cluster-level split (the FIX q252 motivates): hash the FINGERPRINT,
# not the doc id, so a near-dup cluster lands wholly in one split — zero
# straddling clusters BY CONSTRUCTION, verified in-query (the leak columns
# are part of the oracle-matched output and must be 0).
@query(
    "q253_cluster_split",
    oracle="""
    WITH fp AS (
      SELECT doc_id, MIN(md5(substr(text, i, 8))) AS fp
      FROM documents, UNNEST(generate_series(1, length(text) - 7)) AS u(i)
      WHERE length(text) >= 8 GROUP BY doc_id),
    d AS (
      SELECT d.doc_id, COALESCE(fp.fp, md5(d.text)) AS h,
             len(string_split(d.text, ' ')) AS n_tok
      FROM documents d LEFT JOIN fp ON fp.doc_id = d.doc_id),
    sp AS (
      SELECT doc_id, h, n_tok,
             CASE WHEN (instr('0123456789abcdef',
                              substr(md5(h || ':clsplit'), 1, 1)) - 1) < 13
                  THEN 'train' ELSE 'test' END AS split
      FROM d),
    c AS (
      SELECT h,
             COUNT(CASE WHEN split = 'train' THEN 1 END) AS n_tr,
             COUNT(CASE WHEN split = 'test' THEN 1 END) AS n_te
      FROM sp GROUP BY h)
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           (SELECT CAST(COUNT(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 END)
                   AS BIGINT) FROM c) AS n_straddling_clusters
    FROM sp GROUP BY split ORDER BY split
    """,
    doc="Dedup-aware train/test split: the split hash keys on the "
        "fingerprint cluster, so straddling clusters are structurally "
        "impossible — the zero is computed, not assumed, and "
        "oracle-matched alongside the per-split doc/token mass.",
)
def q253(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    fp = char_fingerprint(docs)
    d = (docs.join(fp, "doc_id", "left")
         .select("doc_id",
                 F.coalesce("fp", F.md5("text")).alias("h"),
                 F.size(F.split("text", " ")).alias("n_tok")))
    nib = ("instr('0123456789abcdef',"
           " substr(md5(h || ':clsplit'), 1, 1)) - 1")
    sp = d.withColumn(
        "split", F.when(F.expr(nib) < 13, "train").otherwise("test"))
    c = sp.groupBy("h").agg(
        F.sum((F.col("split") == "train").cast("bigint")).alias("n_tr"),
        F.sum((F.col("split") == "test").cast("bigint")).alias("n_te"))
    straddle = c.agg(
        F.sum(((F.col("n_tr") > 0) & (F.col("n_te") > 0)).cast("bigint"))
        .alias("n_straddling_clusters"))
    return (
        sp.groupBy("split")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tok").alias("n_tokens"))
        .crossJoin(F.broadcast(straddle))
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# Q262 per-document token entropy (operators/text.py::token_entropy):
# Shannon entropy of the doc's token distribution in bits + the ratio to
# the max possible (log2 n_types) in quantized ppm — the lexical-diversity
# feature that flags template spam / keyword stuffing at equal length.
@query(
    "q262_token_entropy",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok),
    d AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             SUM(CAST(ROUND(CAST(c * log2(CAST(c AS DOUBLE))
                                 AS DECIMAL(18,6)), 4)
                      AS DECIMAL(18,6))) AS clogc
      FROM c GROUP BY doc_id),
    e AS (
      SELECT doc_id, n_tokens, n_types,
             CAST(ROUND(CAST(log2(CAST(n_tokens AS DOUBLE))
                             - CAST(clogc AS DOUBLE) / n_tokens
                             AS DECIMAL(18,6)), 4) AS DECIMAL(18,6)) AS h4,
             CAST(ROUND(CAST(log2(CAST(n_types AS DOUBLE))
                             AS DECIMAL(18,6)), 4) AS DECIMAL(18,6)) AS hm4
      FROM d)
    SELECT doc_id, n_tokens, n_types,
           CAST(h4 AS DOUBLE) AS entropy,
           CASE WHEN n_types > 1
                THEN CAST(CAST(h4 * 10000 AS BIGINT) * 1000000
                          // CAST(hm4 * 10000 AS BIGINT) AS BIGINT)
                ELSE 0 END AS norm_ppm
    FROM e ORDER BY doc_id
    """,
    doc="Per-doc Shannon token entropy (bits, 4dp) + normalized entropy "
        "in quantized ppm: c*log2(c) terms decimal-quantized before the "
        "per-doc sum (aggregation-order-proof), ratio as integer floor "
        "DIV over 4dp-quantized integers (cast-rounding-proof).",
)
def q262(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import token_entropy

    docs = tables(spark, sf_dir)["documents"]
    return token_entropy(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# Q264 train->test n-gram coverage under the q252 doc-level split
# (operators/text.py::ngram_split_coverage): what share of each test
# doc's distinct trigrams the train split already contains — the
# generalization-pressure measurement that complements decontamination
# (q75 removes overlap; this quantifies what a split policy leaves).
@query(
    "q264_ngram_coverage",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT DISTINCT doc_id, source,
             array_to_string(list_slice(w, i, i + 2), ' ') AS gram
      FROM t, UNNEST(generate_series(1, len(w) - 2)) AS u(i)),
    s AS (
      SELECT doc_id, source, gram,
             CASE WHEN (instr('0123456789abcdef',
                              substr(md5(CAST(doc_id AS VARCHAR)
                                         || ':split'), 1, 1)) - 1) < 13
                  THEN 'train' ELSE 'test' END AS split
      FROM g),
    tr AS (SELECT DISTINCT gram FROM s WHERE split = 'train'),
    te AS (SELECT doc_id, source, gram FROM s WHERE split = 'test'),
    cov AS (
      SELECT te.doc_id, te.source,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_cov
      FROM te LEFT JOIN tr ON tr.gram = te.gram
      GROUP BY te.doc_id, te.source),
    p AS (
      SELECT doc_id, source, n_grams, n_cov,
             CAST(n_cov * 1000000 // n_grams AS BIGINT) AS cov_ppm
      FROM cov)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_test_docs,
           CAST(SUM(n_grams) AS BIGINT) AS n_grams,
           CAST(SUM(n_cov) AS BIGINT) AS n_covered,
           CAST(SUM(n_cov) * 1000000 // SUM(n_grams) AS BIGINT)
             AS coverage_ppm,
           CAST(SUM(cov_ppm) // COUNT(*) AS BIGINT) AS mean_doc_cov_ppm
    FROM p GROUP BY source ORDER BY source
    """,
    doc="Per-source train->test trigram coverage under the md5 80/20 doc "
        "split: corpus-mass and mean per-doc coverage in exact ppm — the "
        "complement of decontamination.",
)
def q264(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.text import ngram_split_coverage

    docs = tables(spark, sf_dir)["documents"]
    return ngram_split_coverage(docs, n=3).orderBy("source")


# --------------------------------------------------------------------------
# Q266 winnowing (MOSS) fingerprint-index profile (operators/dedup.py::
# winnowing_profile): per source, the size/selectivity of a robust-
# winnowing character-8-gram index (window w=4) and the stop-fingerprint
# count (df > 10) a pair-join pipeline blocklists first — the index-
# sizing audit before committing to substring-level dedup at scale.
# Threshold 10, not q268's corpus-level 50: per-source document frequency
# is bounded by the ~25-250 docs a source holds, so df > 50 could never
# fire and n_stop_fps was identically 0 at both SFs (q326 degeneracy
# class, round-9 sweep); the per-source max df is 22, so > 10 selects a
# real, varying stop set (78/79 fingerprints).
@query(
    "q266_winnowing_profile",
    oracle="""
    WITH g AS (
      SELECT doc_id, source, i AS pos, md5(substr(text, i, 8)) AS h
      FROM documents, UNNEST(generate_series(1, length(text) - 7)) AS u(i)
      WHERE length(text) >= 8),
    w AS (
      SELECT doc_id, source,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM g),
    f AS (SELECT DISTINCT doc_id, source, fp FROM w),
    dfx AS (SELECT source, fp, CAST(COUNT(*) AS BIGINT) AS df
            FROM f GROUP BY source, fp),
    ng AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
           FROM g GROUP BY source),
    pg AS (SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                  CAST(COUNT(*) AS BIGINT) AS n_fps FROM f GROUP BY source),
    da AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct_fps,
                  CAST(SUM(CASE WHEN df > 10 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_stop_fps,
                  CAST(MAX(df) AS BIGINT) AS max_df
           FROM dfx GROUP BY source)
    SELECT source, n_docs, n_grams, n_fps, n_distinct_fps, n_stop_fps,
           max_df,
           CAST(n_fps * 1000000 // n_grams AS BIGINT) AS density_ppm
    FROM pg JOIN ng USING (source) JOIN da USING (source) ORDER BY source
    """,
    doc="Winnowing fingerprint-index profile per source: grams, selected "
        "fingerprints, distinct/stop fingerprints (df > 10), selection "
        "density ppm — exact integers, one per-doc window + one distinct.",
)
def q266(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import winnowing_profile

    docs = tables(spark, sf_dir)["documents"]
    return winnowing_profile(docs, stop_df=10).orderBy("source")


# --------------------------------------------------------------------------
# Q268 winnowing near-dup pair detection (operators/dedup.py::
# winnowing_neardup_pairs): the pair-finding pass q266's index audit
# sizes — robust-winnowing char-8-gram fingerprints (window 4), stop
# fingerprints (df > 50) blocklisted, pairs sharing >= 5 survivors AND
# >= 50% overlap coefficient (exact ppm; sharply bimodal on this corpus,
# so the cut is clean). Fingerprint-bucketed equi-join, never doc x doc.
@query(
    "q268_winnowing_neardup",
    oracle="""
    WITH g AS (
      SELECT doc_id, i AS pos, md5(substr(text, i, 8)) AS h
      FROM documents, UNNEST(generate_series(1, length(text) - 7)) AS u(i)
      WHERE length(text) >= 8),
    w AS (
      SELECT doc_id,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM g),
    f AS (SELECT DISTINCT doc_id, fp FROM w),
    dfx AS (SELECT fp, COUNT(*) AS df FROM f GROUP BY fp),
    keep AS (SELECT f.doc_id, f.fp FROM f JOIN dfx USING (fp)
             WHERE df <= 50),
    sz AS (SELECT doc_id, COUNT(*) AS n_fp FROM keep GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b, n_shared,
           CAST(n_shared * 1000000 // LEAST(sa.n_fp, sb.n_fp) AS BIGINT)
             AS overlap_ppm
    FROM pairs
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE n_shared >= 5
      AND n_shared * 1000000 // LEAST(sa.n_fp, sb.n_fp) >= 500000
    ORDER BY doc_a, doc_b
    """,
    doc="Winnowing (MOSS) near-dup pairs: stop-filtered fingerprint "
        "equi-join, shared-fingerprint counts, overlap coefficient ppm.",
)
def q268(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import winnowing_neardup_pairs

    docs = tables(spark, sf_dir)["documents"]
    return winnowing_neardup_pairs(docs).orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# Q269 dedup-weighted token budget (operators/dedup.py::
# dedup_weighted_tokens): per source, raw vs duplication-discounted token
# mass (each doc's tokens / its corpus-wide exact-dup cluster size, in
# exact integer millionths) — the budget a post-dedup selection pass
# (q79) actually has to spend, next to q222's doc-level dedup impact.
@query(
    "q269_dedup_weighted_tokens",
    oracle="""
    WITH corpus AS (
      SELECT source, text FROM documents
      UNION ALL
      SELECT source, text FROM documents WHERE doc_id % 50 = 0),
    h AS (
      SELECT source, md5(text) AS hh,
             CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS tok
      FROM corpus),
    cs AS (SELECT hh, CAST(COUNT(*) AS BIGINT) AS csize
           FROM h GROUP BY hh)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS raw_tokens,
           CAST(SUM(tok * 1000000 // csize) AS BIGINT)
             AS eff_token_millionths,
           CAST((SUM(tok) * 1000000 - SUM(tok * 1000000 // csize))
                // NULLIF(SUM(tok), 0) AS BIGINT) AS dup_ppm
    FROM h JOIN cs USING (hh) GROUP BY source ORDER BY source
    """,
    doc="Dedup-weighted effective token mass per source: tokens "
        "discounted by exact-dup cluster size, integer millionths. The "
        "raw corpus has zero exact dups at every SF — dup_ppm was "
        "identically 0 and the 1/cluster discount untested (q326 "
        "degeneracy class, round-9 sweep) — so the q44 deterministic dup "
        "overlay (doc_id % 50 == 0 re-inserted) plants real clusters.",
)
def q269(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import dedup_weighted_tokens

    docs = tables(spark, sf_dir)["documents"].select("doc_id", "source",
                                                     "text")
    corpus = docs.unionByName(docs.filter(F.col("doc_id") % 50 == 0)) \
        .select("source", "text")
    return dedup_weighted_tokens(corpus).orderBy("source")


# --------------------------------------------------------------------------
# Q284 asymmetric shingle-containment near-dup pairs (operators/dedup.py::
# shingle_containment_pairs): Broder containment |S(A)∩S(B)|/|S(A)| over
# word 5-gram md5 shingles — the subset-duplication detector (a doc
# quoting or embedding another) that symmetric Jaccard dilutes when the
# container is much larger. Stop shingles (df > 20) broadcast LEFT ANTI;
# candidates from the shingle-key equi-join, per-bucket cost ≤ stop_df²;
# integer-ppm containments both directions.
@query(
    "q284_shingle_containment",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(tk, i, i + 4), ' ')) AS g
      FROM t, UNNEST(generate_series(1, len(tk) - 4)) AS u(i)),
    stops AS (SELECT g FROM (SELECT g, COUNT(*) AS df FROM g GROUP BY g)
              WHERE df > 20),
    keep AS (SELECT * FROM g WHERE g NOT IN (SELECT g FROM stops)),
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM keep GROUP BY doc_id),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM keep a JOIN keep b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
      HAVING COUNT(*) >= 3)
    SELECT doc_a, doc_b, n_shared,
           CAST(n_shared * 1000000 // sa.n_sh AS BIGINT) AS cont_a_in_b_ppm,
           CAST(n_shared * 1000000 // sb.n_sh AS BIGINT) AS cont_b_in_a_ppm
    FROM p JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
    WHERE GREATEST(n_shared * 1000000 // sa.n_sh,
                   n_shared * 1000000 // sb.n_sh) >= 500000
    ORDER BY doc_a, doc_b
    """,
    doc="Asymmetric word-5-gram containment near-dup pairs: stop-filtered "
        "shingle equi-join, both directional containments in integer ppm, "
        "pair survives when either direction clears 50%.",
)
def q284(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import shingle_containment_pairs

    docs = tables(spark, sf_dir)["documents"]
    return shingle_containment_pairs(docs).orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# Q303 Flesch readability per source: reading-ease and Flesch-Kincaid
# grade from exact integer word / sentence / vowel-group-syllable
# counts — the classic quality-filter signal next to q45c's ratio panel
# and q221's Gopher rules (readability bands are a standard curation
# cut). Syllables use the deterministic vowel-group heuristic
# ([aeiouy]+ runs on the lowercased text, min 1 per word is NOT
# enforced — the raw run count keeps both engines trivially identical);
# sentences count [.!?]+ runs with a floor of 1 per document. One
# 2-column scan, one map-side-combinable aggregation; the two formula
# divisions happen once per source row.
@query(
    "q303_flesch",
    oracle=f"""
    WITH d AS (
      SELECT source,
             len(list_filter(string_split(text, ' '), w -> w <> ''))
               AS words,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS sents,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syll
      FROM documents),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(words) AS BIGINT) AS words,
             CAST(SUM(sents) AS BIGINT) AS sents,
             CAST(SUM(syll) AS BIGINT) AS syll
      FROM d GROUP BY source)
    SELECT source, n_docs, words, sents, syll,
           {r4("206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)"
               " - 84.6 * (CAST(syll AS DOUBLE) / words)")}
             AS flesch_ease,
           {r4("0.39 * (CAST(words AS DOUBLE) / sents)"
               " + 11.8 * (CAST(syll AS DOUBLE) / words) - 15.59")}
             AS fk_grade
    FROM s ORDER BY source
    """,
    doc="Flesch reading-ease and Flesch-Kincaid grade per source from "
        "exact integer word/sentence/vowel-group counts; deterministic "
        "regex heuristics identical in both engines.",
)
def q303(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"].select(
        "source",
        F.expr("size(filter(split(text, ' '), w -> w <> ''))")
        .alias("words"),
        F.expr("GREATEST(size(regexp_extract_all(text, '[.!?]+', 0)), 1)")
        .alias("sents"),
        F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))")
        .alias("syll"))
    s = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("sents").cast("bigint").alias("sents"),
        F.sum("syll").cast("bigint").alias("syll"))
    return s.select(
        "source", "n_docs", "words", "sents", "syll",
        r4c(F.expr("206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)"
                   " - 84.6 * (CAST(syll AS DOUBLE) / words)"))
        .alias("flesch_ease"),
        r4c(F.expr("0.39 * (CAST(words AS DOUBLE) / sents)"
                   " + 11.8 * (CAST(syll AS DOUBLE) / words) - 15.59"))
        .alias("fk_grade")).orderBy("source")


# --------------------------------------------------------------------------
# Q304 lexical-richness panel per source: vocabulary size, hapax and
# dis legomena counts (tokens seen exactly once/twice), type-token
# ratio, hapax share, and Sichel's S — the per-source slice of q301's
# corpus-wide Good-Turing classes and the standard "is this source
# templated or genuinely diverse" curation signal (low hapax share =
# boilerplate). Two plain aggregation levels ((source, token) ->
# count class -> source panel), all integer counts, exact ppm ratios.
@query(
    "q304_hapax",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({{words}}) AS tok FROM documents),
    vc AS (SELECT source, tok, COUNT(*) AS c FROM toks
           GROUP BY source, tok),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(c) AS BIGINT) AS tokens,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dis
      FROM vc GROUP BY source)
    SELECT source, vocab, tokens, hapax, dis,
           CAST(vocab * 1000000 // tokens AS BIGINT) AS ttr_ppm,
           CAST(hapax * 1000000 // vocab AS BIGINT) AS hapax_share_ppm,
           CAST(dis * 1000000 // vocab AS BIGINT) AS sichel_s_ppm
    FROM s ORDER BY source
    """.replace("{words}", "list_filter(string_split(text, ' '), w -> w <> '')"),
    doc="Per-source lexical richness: vocabulary, hapax/dis legomena, "
        "type-token ratio, hapax share and Sichel's S in exact integer "
        "ppm.",
)
def q304(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "source",
        F.explode(F.expr("filter(split(text, ' '), w -> w <> '')"))
        .alias("tok"))
    vc = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    s = vc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("vocab"),
        F.sum("c").cast("bigint").alias("tokens"),
        F.sum(F.expr("CASE WHEN c = 1 THEN 1 ELSE 0 END")).cast("bigint")
        .alias("hapax"),
        F.sum(F.expr("CASE WHEN c = 2 THEN 1 ELSE 0 END")).cast("bigint")
        .alias("dis"))
    return s.select(
        "source", "vocab", "tokens", "hapax", "dis",
        F.expr("vocab * 1000000 DIV tokens").alias("ttr_ppm"),
        F.expr("hapax * 1000000 DIV vocab").alias("hapax_share_ppm"),
        F.expr("dis * 1000000 DIV vocab").alias("sichel_s_ppm"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# Q350 metadata-filtered vector search: exact top-10 by cosine to the
# vec_id=0 query among ONLY the vectors whose document row is lang='en' —
# the standard production ANN requirement ("nearest English docs", not
# nearest overall). PRE-filter semantics: the filtered id set semi-joins
# the vector table before scoring, so this is the exact top-k of the
# allowed subset at any selectivity — post-filtering a fixed candidate
# list starves under selective filters (the failure mode the
# ivf_topk_filtered recall test quantifies on the index path; that
# variant commutes the same semi join with cell pruning). Predicate
# pushes into the documents scan, the id set broadcasts, scoring stays
# the zip_with/aggregate codegen expression, top-k is
# TakeOrderedAndProject.
@query(
    "q350_filtered_vector_search",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    f AS (SELECT e.vec_id, e.embedding FROM embeddings e
          JOIN documents d ON d.doc_id = e.vec_id WHERE d.lang = 'en'),
    z AS (
      SELECT f.vec_id, UNNEST(f.embedding) AS x, UNNEST(q.qe) AS y
      FROM f CROSS JOIN q),
    s AS (
      SELECT vec_id,
             SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS n1,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS n2
      FROM z GROUP BY vec_id)
    SELECT vec_id, {r4('dot / (SQRT(n1) * SQRT(n2))')} AS sim
    FROM s ORDER BY sim DESC, vec_id LIMIT 10
    """,
    doc="Exact metadata-filtered cosine top-10 (lang='en' documents "
        "only): pre-filter semi join, then the q43 scoring expression.",
)
def q350(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.similarity import filtered_cosine_topk

    t = tables(spark, sf_dir)
    e = t["embeddings"]
    qvec = [float(x) for x in
            e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return filtered_cosine_topk(e, t["documents"], F.col("lang") == "en",
                                qvec, k=10)


# --------------------------------------------------------------------------
# Q355 mean segmental type-token ratio (MSTTR, Johnson 1944): plain TTR is
# length-confounded (longer docs repeat more), so lexical diversity is
# measured on fixed 16-token segments and averaged — the
# length-controlled sibling of q262's token entropy and q304's hapax
# rate. Integer-exact: per-segment TTR in ppm (distinct DIV 16), per-lang
# mean as an integer DIV. Partial trailing segments are dropped (they
# would bias TTR upward — fewer chances to repeat).
# 100 TB story: posexplode is scan-side; one (doc, seg) group-by then one
# lang group-by, both map-side combinable; no windows, no joins.
@query(
    "q355_msttr",
    oracle="""
    WITH tk AS (
      SELECT doc_id, lang,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS tok
      FROM documents),
    g AS (
      SELECT doc_id, lang, CAST(pos // 16 AS INT) AS seg,
             COUNT(*) AS n, COUNT(DISTINCT tok) AS d
      FROM tk GROUP BY 1, 2, 3),
    full_seg AS (
      SELECT lang, doc_id, d * 1000000 // 16 AS ttr_ppm
      FROM g WHERE n = 16)
    SELECT lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(ttr_ppm) // COUNT(*) AS BIGINT) AS msttr_ppm
    FROM full_seg GROUP BY lang ORDER BY lang
    """,
    doc="Mean segmental TTR per language over complete 16-token segments "
        "(integer ppm): length-controlled lexical diversity.",
)
def q355(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id", "lang",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"))
    g = (tok.withColumn("seg", F.expr("CAST(pos DIV 16 AS INT)"))
         .groupBy("doc_id", "lang", "seg")
         .agg(F.count(F.lit(1)).alias("n"),
              F.countDistinct("tok").alias("d")))
    full_seg = (g.filter(F.col("n") == 16)
                .withColumn("ttr_ppm", F.expr("d * 1000000 DIV 16")))
    return (full_seg.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.expr("SUM(ttr_ppm) DIV COUNT(*)").cast("bigint")
        .alias("msttr_ppm"))
        .orderBy("lang"))


# --------------------------------------------------------------------------
# Q356 LSH bucket-skew audit (operators/dedup.py lsh_bucket_profile): the
# operational guardrail for every banding join in this package — the
# candidate join's output is EXACTLY sum(s*(s-1)/2) over bucket sizes s,
# so one hot bucket turns "O(collisions)" into a quadratic blowup at
# 100 TB. Per band: docs, buckets, the largest bucket, the exact candidate
# pair mass, and the top bucket's share (integer ppm). Same portable md5
# band keys as the oracled q114, so DuckDB re-derives the buckets
# themselves, not just the summary.
@query(
    "q356_lsh_bucket_skew",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      FROM toks WHERE len(w) >= 3),
    seeded AS (
      SELECT doc_id, unnest(generate_series(0, 7)) AS j, shingle FROM sh),
    sig AS (
      SELECT doc_id, j,
             MIN(md5(CAST(j AS VARCHAR) || '#' || shingle)) AS sig
      FROM seeded GROUP BY doc_id, j),
    keys AS (
      SELECT doc_id, CAST(j // 2 AS INT) AS band,
             md5(string_agg(sig, '|' ORDER BY j)) AS bk
      FROM sig GROUP BY doc_id, CAST(j // 2 AS INT)),
    buckets AS (
      SELECT band, bk, COUNT(*) AS s FROM keys GROUP BY band, bk)
    SELECT band,
           CAST(SUM(s) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(s) AS BIGINT) AS max_bucket,
           CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS candidate_pairs,
           CAST(MAX(s) * 1000000 // SUM(s) AS BIGINT) AS top_share_ppm
    FROM buckets GROUP BY band ORDER BY band
    """,
    doc="Per-band LSH bucket-size audit over the portable minhash band "
        "keys: exact candidate-pair mass sum(s*(s-1)/2) and top-bucket "
        "share — the skew signal that predicts banding-join blowup.",
)
def q356(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.dedup import lsh_bucket_profile

    d = tables(spark, sf_dir)["documents"]
    return lsh_bucket_profile(d).orderBy("band")
