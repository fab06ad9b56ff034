"""Unit/property tests for operators/linkage.py (blocked fuzzy join, star
entity resolution, fixed-point PageRank) — the q142–q144 operator layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from inspectadb_spark.operators.linkage import (
    _RANK_SCALE,
    blocked_fuzzy_pairs,
    pagerank,
    resolve_entities,
)


def _catalog(spark):
    rows = [
        (1, "red widget", "B1", "T1"),
        (2, "red widgit", "B1", "T1"),   # dist 1 from id 1, same block
        (3, "red widget", "B2", "T1"),   # identical name, DIFFERENT block
        (4, "blue bolt", "B1", "T1"),    # same block, far from everything
        (5, "red widgets", "B1", "T1"),  # dist 1 from id 1, dist 2 from id 2
        (9, "green gear", "B3", "T2"),   # alone in its block
    ]
    return spark.createDataFrame(rows, ["pk", "name", "brand", "ptype"])


def test_fuzzy_pairs_hand_case(spark):
    got = {
        (r.id1, r.id2, r.dist)
        for r in blocked_fuzzy_pairs(
            _catalog(spark), "pk", "name", ["brand", "ptype"], max_dist=2
        ).collect()
    }
    assert got == {(1, 2, 1), (1, 5, 1), (2, 5, 2)}


def test_fuzzy_pairs_never_cross_blocks(spark):
    # ids 1 and 3 have identical names but different blocks: no pair.
    pairs = blocked_fuzzy_pairs(
        _catalog(spark), "pk", "name", ["brand", "ptype"], max_dist=2
    )
    assert pairs.filter((F.col("id1") == 1) & (F.col("id2") == 3)).count() == 0


def test_fuzzy_pairs_complete_within_block(spark):
    """Blocking must lose nothing inside a block: compare against the
    unblocked all-pairs join restricted to the same block key."""
    df = _catalog(spark)
    blocked = blocked_fuzzy_pairs(df, "pk", "name", ["brand", "ptype"], max_dist=2)
    a = df.select(
        F.col("pk").alias("id1"), F.col("name").alias("n1"), "brand", "ptype"
    )
    b = df.select(
        F.col("pk").alias("id2"), F.col("name").alias("n2"),
        F.col("brand").alias("b2"), F.col("ptype").alias("t2"),
    )
    brute = (
        a.crossJoin(b)
        .filter(
            (F.col("id1") < F.col("id2"))
            & (F.col("brand") == F.col("b2"))
            & (F.col("ptype") == F.col("t2"))
            & (F.levenshtein("n1", "n2") <= 2)
        )
        .select("id1", "id2")
    )
    assert {tuple(r) for r in blocked.select("id1", "id2").collect()} == {
        tuple(r) for r in brute.collect()
    }


def test_resolve_entities_star_and_untouched(spark):
    df = _catalog(spark)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 5)], ["id1", "id2"]
    )
    got = {
        r.pk: r.canonical_id for r in resolve_entities(df, pairs, "pk").collect()
    }
    # star around 1 collapses; untouched records map to themselves
    assert got == {1: 1, 2: 1, 5: 1, 3: 3, 4: 4, 9: 9}


def _toy_edges(spark):
    # a -> b (3), a -> c (1), b -> a (2), c -> a (1)
    return spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1), ("b", "a", 2), ("c", "a", 1)],
        ["src", "dst", "w"],
    )


def test_pagerank_hand_computed_one_iteration(spark):
    got = {r.node: r.rank_ppb for r in pagerank(_toy_edges(spark), iterations=1).collect()}
    # N=3; r0 = 333333333 each; teleport = 15e8 // 300 = 50000000
    # p_ppm: a->b 750000, a->c 250000, b->a 1000000, c->a 1000000
    r0 = _RANK_SCALE // 3
    tp = (_RANK_SCALE * 15) // (100 * 3)

    def contrib(r, p):
        return r * p * 85 // (100 * 1_000_000)

    assert got["a"] == tp + contrib(r0, 1_000_000) * 2
    assert got["b"] == tp + contrib(r0, 750_000)
    assert got["c"] == tp + contrib(r0, 250_000)


def test_pagerank_mass_bounded_and_positive(spark):
    ranks = pagerank(_toy_edges(spark), iterations=3).collect()
    total = sum(r.rank_ppb for r in ranks)
    tp = (_RANK_SCALE * 15) // (100 * 3)
    assert all(r.rank_ppb >= tp for r in ranks)  # teleport floor
    assert total <= _RANK_SCALE  # floor divisions only ever drop mass


def test_pagerank_partitioning_invariant(spark):
    base = {r.node: r.rank_ppb for r in pagerank(_toy_edges(spark), 3).collect()}
    shuffled = {
        r.node: r.rank_ppb
        for r in pagerank(_toy_edges(spark).repartition(7), 3).collect()
    }
    assert base == shuffled
