"""Training-pipeline operator invariants (Q63–Q68 family): packing
conservation/budget/determinism, sampler reproducibility, chunk coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from inspectadb_spark.operators import pipeline as P
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_pack_conserves_tokens_and_respects_budget(spark):
    docs = _docs(spark)
    budget = 128
    bins = P.pack_sequences(docs, budget=budget).collect()
    # conservation: packed token totals == raw word counts, per language
    packed = {}
    for r in bins:
        packed[r.lang] = packed.get(r.lang, 0) + r.total_tokens
        assert r.total_tokens <= budget or r.n_docs == 1, r  # oversize docs solo
        assert r.n_docs >= 1
    raw = {
        r.lang: r.tok
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(P.words_col())).alias("tok"))
        .collect()
    }
    assert packed == raw


def test_pack_is_deterministic(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, P.pack_sequences(docs, budget=100).collect()))
    b = sorted(map(tuple, P.pack_sequences(docs, budget=100).collect()))
    assert a == b


def test_hash_sample_reproducible_and_salted(spark):
    docs = _docs(spark)
    n = docs.count()
    s1 = {r.doc_id for r in P.hash_sample(docs, "0123", salt="s1").select("doc_id").collect()}
    s1b = {r.doc_id for r in P.hash_sample(docs, "0123", salt="s1").select("doc_id").collect()}
    s2 = {r.doc_id for r in P.hash_sample(docs, "0123", salt="other").select("doc_id").collect()}
    assert s1 == s1b  # reproducible
    assert s1 != s2  # salt actually re-buckets
    # 4/16 nominal rate; md5 nibbles are uniform — generous 3σ-ish bounds
    assert 0.15 * n <= len(s1) <= 0.35 * n


def test_chunks_cover_text_exactly_when_non_overlapping(spark):
    docs = _docs(spark).limit(50)
    chunks = P.chunk_documents(docs, size=90, step=90)
    rebuilt = (
        chunks.orderBy("doc_id", "chunk_idx")
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.collect_list("chunk")).alias("rebuilt"))
    )
    joined = docs.join(rebuilt, "doc_id").select("doc_id", "text", "rebuilt").collect()
    assert len(joined) == 50
    for r in joined:
        assert r.rebuilt == r.text, r.doc_id


def test_tfidf_ranks_are_dense_and_ordered(spark):
    docs = _docs(spark).limit(100)
    out = P.tfidf_top_terms(docs, k=3).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True), doc_id


def test_resample_grid_contiguous_and_filled(spark):
    from inspectadb_spark.operators.timeseries import resample_ffill
    import datetime as dt

    from inspectadb_spark.catalog import load_table

    ev = load_table(spark, "events", SF_DIR)
    out = resample_ffill(ev, step="1 day").collect()
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    n_actual = ev.select("user_id", F.date_trunc("day", "ts").alias("b")).distinct().count()
    got_actual = 0
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r.bucket)
        # contiguous daily grid, no holes
        for a, b in zip(rows, rows[1:]):
            assert b.bucket - a.bucket == dt.timedelta(days=1), uid
        # first bucket is an observation; fill never leaves a null behind it
        assert rows[0].is_gap == 0, uid
        assert all(r.v_filled is not None for r in rows), uid
        got_actual += sum(1 for r in rows if r.is_gap == 0)
    assert got_actual == n_actual  # gaps are exactly the non-observed buckets


def test_cdc_chunking_shift_robust_vs_fixed(spark):
    """Prepending a prefix must preserve most content-defined chunk hashes
    (boundaries depend on local 3-grams), while fixed-stride chunk hashes
    all shift. This is the property that makes CDC chunking the right
    sub-document dedup key for near-duplicate corpora."""
    from inspectadb_spark.operators.pipeline import (
        chunk_documents, content_defined_chunks,
    )

    base = " ".join(f"tok{i % 97}x{(i * 7) % 31}" for i in range(400))
    shifted = "added prefix words here " + base
    docs = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id bigint, text string"
    )

    cdc = content_defined_chunks(docs).collect()
    h1 = {r.chunk_hash for r in cdc if r.doc_id == 1}
    h2 = {r.chunk_hash for r in cdc if r.doc_id == 2}
    assert len(h1) > 5, "document must split into several chunks"
    overlap = len(h1 & h2) / len(h1)
    assert overlap >= 0.5, f"CDC chunking overlap too low: {overlap}"

    fx = chunk_documents(docs, size=120, step=120).collect()
    f1 = {r.chunk for r in fx if r.doc_id == 1}
    f2 = {r.chunk for r in fx if r.doc_id == 2}
    fixed_overlap = len(f1 & f2) / max(len(f1), 1)
    assert fixed_overlap < overlap, (
        f"fixed chunking ({fixed_overlap}) should not beat CDC ({overlap})"
    )


def test_bm25_ranks_term_dense_docs_first(spark):
    from inspectadb_spark.operators.pipeline import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join filler " + "pad " * 20),
            (2, "spark join " + "pad " * 20),
            (3, "nothing relevant here " + "pad " * 20),
            (4, "join " + "pad " * 200),  # long doc: length-normalized down
            (5, "join " + "pad " * 3),    # short doc: same tf, higher score
        ],
        "doc_id bigint, text string",
    )
    rows = bm25_topk(docs, ["spark", "join"], k=10).collect()
    ids = [r.doc_id for r in rows]
    assert 3 not in ids, "doc without query terms must not score"
    assert ids[0] == 1, "highest-tf doc wins"
    s = {r.doc_id: r.score for r in rows}
    assert s[5] > s[4], "length normalization must favor the shorter doc"


def test_top_p_per_group_covers_at_most_p_and_is_greedy_maximal(spark):
    from inspectadb_spark.operators.pipeline import select_top_p_per_group

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", " ".join(f"w{j % (3 + i % 7)}" for j in range(10 + i)))
         for i in range(60)],
        "doc_id bigint, source string, text string",
    )
    kept = select_top_p_per_group(docs, "source", 1, 2).collect()
    from pyspark.sql import functions as F

    tot = {r.source: r.t for r in docs.select(
        "source", F.size(F.expr("filter(split(text,' '), w -> w <> '')")).alias("dl")
    ).groupBy("source").agg(F.sum("dl").alias("t")).collect()}
    by_src: dict = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == set(tot), "no group may be starved"
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r.cum)
        # exclusive-start nucleus rule: all but the boundary doc fit in p,
        # and the boundary doc started before the cutoff
        mass = sum(r.dl for r in rows)
        assert 2 * (mass - rows[-1].dl) < tot[src], f"{src}: cutoff crossed early"
        assert all(a.cum < b.cum for a, b in zip(rows, rows[1:]))


def test_top_p_never_starves_single_doc_group(spark):
    """A group whose sole (or dominant) document exceeds p of the mass must
    still keep its top document — regression for the <=-on-cum rule."""
    from inspectadb_spark.operators.pipeline import select_top_p_per_group

    docs = spark.createDataFrame(
        [(1, "solo", "a b c d e f"),
         (2, "duo", "x y z " * 30), (3, "duo", "p q")],
        "doc_id bigint, source string, text string",
    )
    kept = select_top_p_per_group(docs, "source", 1, 2).collect()
    sources = {r.source for r in kept}
    assert "solo" in sources and "duo" in sources


def test_mixture_rebalance_targets_uniform_and_is_deterministic(spark):
    from inspectadb_spark.operators.pipeline import rebalance_mixture

    # skewed corpus: 'big' has 900 docs, 'mid' 90, 'tiny' 10 (N=1000, S=3,
    # target ~333 per source)
    rows = [(i, "big", f"t{i}") for i in range(900)]
    rows += [(1000 + i, "mid", f"t{i}") for i in range(90)]
    rows += [(2000 + i, "tiny", f"t{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")

    out = rebalance_mixture(docs, "source")
    kept = {r.source: r.k for r in out.groupBy("source").agg(
        F.sum(F.col("_keep").cast("long")).alias("k")).collect()}
    # under-share groups keep everything
    assert kept["mid"] == 90 and kept["tiny"] == 10
    # over-share group downsamples toward N/S=333 (24-bit uniform: ±5σ bounds)
    assert 230 <= kept["big"] <= 440, kept
    # pure-hash: re-run keeps exactly the same rows
    ids1 = sorted(r.doc_id for r in out.filter("_keep").collect())
    ids2 = sorted(r.doc_id for r in rebalance_mixture(docs, "source")
                  .filter("_keep").collect())
    assert ids1 == ids2


def _h6(doc_id: int, salt: str = "mix") -> int:
    """Reference md5-uniform (first 6 hex nibbles), mirroring
    _md5_uniform_int_sql exactly."""
    import hashlib

    return int(hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:6], 16)


def _mix_corpus(spark):
    rows = [(i, "big", f"t{i}") for i in range(900)]
    rows += [(1000 + i, "mid", f"t{i}") for i in range(90)]
    rows += [(2000 + i, "tiny", f"t{i}") for i in range(10)]
    return rows, spark.createDataFrame(
        rows, "doc_id bigint, source string, text string")


def test_mixture_rebalance_threshold_equals_direct_predicate(spark):
    """The per-group threshold form must keep EXACTLY the rows the direct
    (overflow-prone) predicate h6*S*n_g < N*16^6 keeps — byte-identical
    acceptance, verified against an independent Python md5 reference."""
    from inspectadb_spark.operators.pipeline import rebalance_mixture

    rows, docs = _mix_corpus(spark)
    n, s = len(rows), 3
    n_g = {"big": 900, "mid": 90, "tiny": 10}
    expect = sorted(i for i, src, _ in rows
                    if _h6(i) * s * n_g[src] < n * 16 ** 6)
    got = sorted(r.doc_id for r in
                 rebalance_mixture(docs, "source").filter("_keep").collect())
    assert got == expect


def test_mixture_rebalance_weighted_tracks_targets(spark):
    from inspectadb_spark.operators.pipeline import rebalance_mixture

    rows, docs = _mix_corpus(spark)
    # big:1 → target 1000/10*1=100 of 900 (downsample); mid:9 → target 900
    # of 90 (keep all); tiny absent → weight 0 (drop all)
    weights = {"big": 1, "mid": 9}
    out = rebalance_mixture(docs, "source", target_weights=weights)
    kept = {r.source: r.k for r in out.groupBy("source").agg(
        F.sum(F.col("_keep").cast("long")).alias("k")).collect()}
    assert kept["mid"] == 90
    assert kept["tiny"] == 0
    # exact expected count from the independent md5 reference (threshold
    # = ceil(N*w*16^6/(W*n_g)) - 1 = ceil(1000*1*16^6/(10*900)) - 1)
    thr = -(-1000 * 1 * 16 ** 6 // (10 * 900)) - 1
    expect_big = sum(1 for i, src, _ in rows
                     if src == "big" and _h6(i) <= thr)
    assert kept["big"] == expect_big
    assert 50 <= kept["big"] <= 160  # ±5σ around the 100-doc target


def test_mixture_rebalance_weight_validation(spark):
    import pytest as _pytest

    from inspectadb_spark.operators.pipeline import rebalance_mixture

    _, docs = _mix_corpus(spark)
    with _pytest.raises(ValueError):
        rebalance_mixture(docs, "source", target_weights={"big": 0.5})
    with _pytest.raises(ValueError):
        rebalance_mixture(docs, "source", target_weights={"big": -1})
    with _pytest.raises(ValueError):
        rebalance_mixture(docs, "source", target_weights={"big": 0})


def test_group_kfold_entity_atomic_and_balanced(spark):
    """q192's leakage-safety contract: every user maps to exactly one fold;
    folds are roughly balanced; ppm shares sum to ~1e6."""
    from pyspark.sql import functions as F

    from inspectadb_spark.catalog import load_table
    from inspectadb_spark.queries.training import _FOLD, q192

    ev = load_table(spark, "events", SF_DIR)
    per_user = ev.select("user_id", F.expr(_FOLD).alias("fold")).distinct()
    n_users = ev.select("user_id").distinct().count()
    assert per_user.count() == n_users  # one fold per user, by construction
    out = q192(spark, SF_DIR).collect()
    assert [r["fold"] for r in out] == sorted({r["fold"] for r in out})
    assert sum(r["n_users"] for r in out) == n_users
    assert sum(r["events_ppm"] for r in out) >= 1_000_000 - len(out)
    # user balance: multinomial(n_users, 1/5) — allow a wide small-n band
    # (event balance is NOT asserted: a few heavy entities legitimately
    # skew it at tiny SF; entity atomicity above is the operator contract)
    for r in out:
        assert r["n_users"] <= 0.6 * n_users, r


# -- DSIR importance-resampling selection (q346) -----------------------------

def _dsir_python(rows, target_langs, n_buckets=256, salt="dsir"):
    """Pure-python full re-implementation of the weight contract: md5
    two-nibble bucket, add-one smoothing, per-bucket 6dp-quantize + 4dp
    round before the per-doc sum."""
    import hashlib
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    def bucket(tok):
        h = hashlib.md5(f"{tok}:{salt}".encode()).hexdigest()
        return (16 * int(h[0], 16) + int(h[1], 16)) % n_buckets

    toks = [(d, bucket(t), lang in target_langs)
            for d, text, lang in rows for t in text.split(" ")]
    cr = Counter(b for _, b, _ in toks)
    ct = Counter(b for _, b, t in toks if t)
    nr, nt = sum(cr.values()), sum(ct.values())
    lr = {}
    for b in cr:
        x = ((ct.get(b, 0) + 1) * (nr + n_buckets)) \
            / ((cr[b] + 1) * (nt + n_buckets))
        import math
        q = Decimal(repr(math.log(x))).quantize(Decimal("0.000001"))
        lr[b] = q.quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    out = {}
    for d, text, _ in rows:
        s = sum(lr[bucket(t)] for t in text.split(" "))
        out[d] = (len(text.split(" ")),
                  float(Decimal(s).quantize(Decimal("0.0001"),
                                            rounding=ROUND_HALF_UP)))
    return out


def test_dsir_weights_match_pure_python_on_planted_domains(spark):
    from inspectadb_spark.operators.pipeline import dsir_importance_weights

    # two domains with disjoint vocabulary + one mixed doc
    rows = ([(i, "alpha beta gamma delta", "en") for i in range(5)]
            + [(10 + i, "uno dos tres cuatro", "es") for i in range(5)]
            + [(99, "alpha dos beta tres", "es")])
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    got = {r.doc_id: (r.n_tokens, r.logw)
           for r in dsir_importance_weights(
               df, F.col("lang") == "en").collect()}
    assert got == _dsir_python(rows, {"en"})


def test_dsir_ranks_target_domain_first_and_mixed_between(spark):
    from inspectadb_spark.operators.pipeline import (
        dsir_importance_weights, dsir_select_topk,
    )

    rows = ([(i, "alpha beta gamma delta", "en") for i in range(5)]
            + [(10 + i, "uno dos tres cuatro", "es") for i in range(5)]
            + [(99, "alpha dos beta tres", "es")])
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    w = {r.doc_id: r.logw
         for r in dsir_importance_weights(df, F.col("lang") == "en").collect()}
    # every pure-target doc outscores the mixed doc, which outscores
    # every pure-off-domain doc
    assert min(w[i] for i in range(5)) > w[99]
    assert w[99] > max(w[10 + i] for i in range(5))
    # top-5 selection is exactly the target-domain docs
    sel = [r.doc_id
           for r in dsir_select_topk(df, F.col("lang") == "en", 5).collect()]
    assert sorted(sel) == [0, 1, 2, 3, 4]


def test_dsir_weights_are_partitioning_invariant(spark):
    from inspectadb_spark.operators.pipeline import dsir_importance_weights

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = dsir_importance_weights(docs, F.col("lang") == "en")
    b = dsir_importance_weights(docs.repartition(13), F.col("lang") == "en")
    rows = lambda df: sorted(tuple(r) for r in df.collect())
    assert rows(a) == rows(b)


def test_dsir_topk_plan_takeordered_and_broadcast_model(spark):
    from inspectadb_spark.operators.pipeline import dsir_select_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (dsir_select_topk(docs, F.col("lang") == "en", 100)
            ._jdf.queryExecution().executedPlan().toString())
    # global top-k never materializes a full sort
    assert "TakeOrderedAndProject" in plan, plan
    # the B-bucket score model joins broadcast, not shuffled
    assert "BroadcastHashJoin" in plan, plan


def test_dsir_frozen_model_scores_unseen_buckets_via_smoothing(spark):
    from inspectadb_spark.operators.pipeline import (
        dsir_bucket_model, dsir_weights_from_model,
    )

    # model trained WITHOUT the token 'zzz-unseen'; the scored shard
    # contains it — the smoothed spine must keep the token in n_tokens
    # and give it the zero-count log-ratio, not drop it
    train = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "uno dos", "es")],
        "doc_id int, text string, lang string")
    model = dsir_bucket_model(train, F.col("lang") == "en")
    shard = spark.createDataFrame(
        [(10, "alpha zzz-unseen")], "doc_id int, text string")
    got = dsir_weights_from_model(shard, model).first()
    assert got.n_tokens == 2      # the unseen-bucket token is not dropped
    # zero-count buckets contribute ln((nr+B)/(nt+B)) — finite, nonzero
    import math
    from decimal import ROUND_HALF_UP, Decimal
    zero_lr = Decimal(repr(math.log((0 + 1) * (4 + 256)
                                    / ((0 + 1) * (2 + 256))))).quantize(
        Decimal("0.000001")).quantize(Decimal("0.0001"),
                                      rounding=ROUND_HALF_UP)
    assert abs(got.logw) > 0 and float(zero_lr) != 0.0


def test_dsir_wide_bucket_spaces_are_reachable(spark):
    from inspectadb_spark.operators.pipeline import dsir_bucket_model

    rows = [(i, f"tok{i}", "en") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    m = dsir_bucket_model(df, F.col("lang") == "en", n_buckets=1024)
    mx = m.agg(F.max("bk"), F.min("bk")).first()
    # 400 distinct tokens over 1024 buckets: the upper range (>= 256,
    # unreachable under a two-nibble draw) must be populated
    assert mx[0] >= 256 and mx[1] >= 0
