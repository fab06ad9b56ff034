"""Record-linkage + graph queries (round-4 §2.2m additions): blocked fuzzy
join (q142), star entity resolution (q143), integer-exact PageRank (q144).

Oracle notes: ``levenshtein`` was probe-verified byte-identical between
Spark and DuckDB on this corpus (q72 has carried the parity since round 2).
PageRank avoids floats entirely — fixed-point BIGINT ranks with positive
floor division (Spark ``DIV`` ≡ DuckDB ``//``), so the oracle mirrors the
arithmetic term-for-term; DuckDB's SUM(BIGINT)→HUGEINT widening is cast
back to BIGINT (the q21 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspectadb_spark.operators.linkage import (
    blocked_fuzzy_pairs,
    pagerank,
    resolve_entities,
)
from inspectadb_spark.operators.sessionize import session_transitions
from inspectadb_spark.queries.registry import query, tables

_FUZZY_PAIRS = """
    SELECT a.p_partkey AS id1, b.p_partkey AS id2,
           a.p_name AS name1, b.p_name AS name2,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM part a
    JOIN part b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


# --------------------------------------------------------------------------
# Q142 blocked fuzzy self-join: candidate pairs share the (brand, type)
# blocking key — block sizes are bounded by catalog structure, so the
# levenshtein verifier touches B·k² candidates, never n². One shuffle on
# the block key; the verifier is JVM codegen (no Python).
@query(
    "q142_fuzzy_join",
    oracle=f"{_FUZZY_PAIRS} ORDER BY id1, id2",
    doc="Blocked fuzzy self-join on part names: (brand, type) blocking, "
        "levenshtein ≤ 2 verification.",
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tables(spark, sf_dir)["part"]
    return blocked_fuzzy_pairs(
        part, "p_partkey", "p_name", ["p_brand", "p_type"], max_dist=2
    ).orderBy("id1", "id2")


# --------------------------------------------------------------------------
# Q143 entity resolution: star canonicalization over the verified pairs —
# every record adopts min(self, fuzzy neighbours). Single-hop (no
# iteration): one symmetric union + groupBy-min + left join to the spine.
@query(
    "q143_entity_resolution",
    oracle=f"""
    WITH pr AS ({_FUZZY_PAIRS}),
    sym AS (
      SELECT id1 AS rec, id2 AS neigh FROM pr
      UNION ALL
      SELECT id2 AS rec, id1 AS neigh FROM pr),
    best AS (SELECT rec, MIN(neigh) AS min_neigh FROM sym GROUP BY rec)
    SELECT p.p_partkey,
           LEAST(p.p_partkey, COALESCE(best.min_neigh, p.p_partkey)) AS canonical_id
    FROM part p LEFT JOIN best ON p.p_partkey = best.rec
    ORDER BY p.p_partkey
    """,
    doc="Dirty-catalog reconciliation: canonical id per part via star "
        "canonicalization of the blocked fuzzy-match graph.",
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tables(spark, sf_dir)["part"]
    pairs = blocked_fuzzy_pairs(
        part, "p_partkey", "p_name", ["p_brand", "p_type"], max_dist=2
    )
    return resolve_entities(part, pairs, "p_partkey").orderBy("p_partkey")


# --------------------------------------------------------------------------
# Q144 PageRank over the session-transition graph (q82's edge list), 3
# unrolled power iterations in fixed-point BIGINT — deterministic in any
# engine with 64-bit floor division. Per-iteration cost: one node-sized
# join + one groupBy sum; the rank vector never leaves executors.
_Q82_EDGES = """
    x AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM x
    ), t AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type,
             session_id,
             LEAD(session_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_sess
      FROM s
    ), ed AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM t WHERE to_type IS NOT NULL AND to_sess = session_id
      GROUP BY from_type, to_type
    )
"""


def _pagerank_oracle(iterations: int = 3) -> str:
    head = f"""
    WITH {_Q82_EDGES},
    nodes AS (
      SELECT from_type AS node FROM ed UNION SELECT to_type FROM ed),
    outw AS (SELECT from_type, SUM(n) AS out_w FROM ed GROUP BY from_type),
    e AS (
      SELECT from_type, to_type,
             CAST(n * 1000000 // out_w AS BIGINT) AS p_ppm
      FROM ed JOIN outw USING (from_type)),
    nn AS (SELECT COUNT(*) AS c FROM nodes),
    r0 AS (
      SELECT node, CAST(1000000000 // (SELECT c FROM nn) AS BIGINT) AS rank_ppb
      FROM nodes)
    """
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f"""
    r{i} AS (
      SELECT nodes.node,
             CAST((SELECT CAST(1000000000 AS BIGINT) * 15 // (100 * c) FROM nn)
                  + COALESCE(i.inflow, 0) AS BIGINT) AS rank_ppb
      FROM nodes LEFT JOIN (
        SELECT e.to_type AS node,
               CAST(SUM(r{i - 1}.rank_ppb * e.p_ppm * 85 // 100000000) AS BIGINT)
                 AS inflow
        FROM e JOIN r{i - 1} ON e.from_type = r{i - 1}.node
        GROUP BY e.to_type) i
      ON nodes.node = i.node)
    """)
    return (
        head + "," + ",".join(steps)
        + f" SELECT node, rank_ppb FROM r{iterations} ORDER BY node"
    )


@query(
    "q144_pagerank",
    oracle=_pagerank_oracle(3),
    doc="Fixed-point PageRank (3 unrolled iterations) over the "
        "session-transition graph; exact BIGINT arithmetic on both engines.",
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir)["events"]
    edges = session_transitions(ev).select(
        F.col("from_type").alias("src"),
        F.col("to_type").alias("dst"),
        F.col("n").alias("w"),
    )
    return pagerank(edges, iterations=3, damping_pct=85).orderBy("node")


# --------------------------------------------------------------------------
# Q153 triangle count over the fuzzy-match graph: the (id1 < id2) pair
# orientation counts each triangle exactly once via two equi-joins —
# no enumeration of all node triples.
@query(
    "q153_triangles",
    oracle=f"""
    WITH pr AS ({_FUZZY_PAIRS}),
    e AS (SELECT id1 AS x, id2 AS y FROM pr)
    SELECT COUNT(*) AS n_triangles
    FROM e e1
    JOIN (SELECT x AS y, y AS z FROM e) e2 USING (y)
    JOIN (SELECT x, y AS z FROM e) e3 USING (x, z)
    """,
    doc="Exact triangle count of the q142 match graph — ordered-pair "
        "orientation, two equi-joins, zero triple enumeration.",
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.linkage import count_triangles

    part = tables(spark, sf_dir)["part"]
    pairs = blocked_fuzzy_pairs(
        part, "p_partkey", "p_name", ["p_brand", "p_type"], max_dist=2
    )
    return count_triangles(pairs)


# --------------------------------------------------------------------------
# Q154 market-basket co-occurrence: brand pairs sharing an order, support
# counted per distinct (order, brand) so line-item repeats never inflate
# it; top-20 by support. The association-rule support table.
@query(
    "q154_copurchase_pairs",
    oracle="""
    WITH base AS (
      SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
    SELECT a.item AS item1, b.item AS item2, COUNT(*) AS support
    FROM base a JOIN base b
      ON a.basket = b.basket AND a.item < b.item
    GROUP BY a.item, b.item
    ORDER BY support DESC, item1, item2 LIMIT 20
    """,
    doc="Top-20 co-purchased brand pairs across orders (market-basket "
        "support table; per-basket pair cost bounded by basket size).",
)
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    from inspectadb_spark.operators.linkage import cooccurrence_pairs

    t = tables(spark, sf_dir)
    items = t["lineitem"].join(
        t["part"], t["lineitem"]["l_partkey"] == t["part"]["p_partkey"]
    ).select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
    return cooccurrence_pairs(items, "ok", "brand", top_k=20)


# --------------------------------------------------------------------------
# Q216 association rules from the q154 support table: for each directed
# rule item1 → item2 the support, confidence = P(2|1), and
# lift = P(1,2)/(P(1)·P(2)), all integer ppm — the decision layer on top
# of raw co-occurrence counts. Everything after the per-basket distinct
# runs on |items| and |pairs|-sized tables (broadcast item counts).
# Arithmetic is BIGINT end to end (pair_n·N·1e6 overflows only past
# ~9e18, i.e. pair_n·N > 9e12 — beyond that promote the lift product to
# DECIMAL(38,0) ON BOTH ENGINES CAREFULLY: DuckDB silently widens an
# over-38-digit decimal product to DOUBLE, which cost this query an
# off-by-one ppm in development; both engines raise on BIGINT overflow,
# the honest failure mode).
@query(
    "q216_association_rules",
    oracle="""
    WITH base AS (
      SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM base),
    ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM base
           GROUP BY item),
    pairs AS (
      SELECT a.item AS item1, b.item AS item2,
             CAST(COUNT(*) AS BIGINT) AS pair_n
      FROM base a JOIN base b ON a.basket = b.basket AND a.item <> b.item
      GROUP BY a.item, b.item)
    SELECT item1, item2, pair_n,
           pair_n * 1000000 // c1.c AS confidence_ppm,
           pair_n * nb.n * 1000000 // (c1.c * c2.c) AS lift_ppm
    FROM pairs
    JOIN ic c1 ON c1.item = pairs.item1
    JOIN ic c2 ON c2.item = pairs.item2
    CROSS JOIN nb
    WHERE pair_n >= 5
    ORDER BY lift_ppm DESC, item1, item2 LIMIT 30
    """,
    doc="Directed association rules (support/confidence/lift in ppm) over "
        "co-purchased brands — the ranking layer on q154's support table; "
        "decimal-exact lift with BIGINT-overflow headroom.",
)
def q216(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    base = (t["lineitem"].join(
        t["part"], t["lineitem"]["l_partkey"] == t["part"]["p_partkey"])
        .select(F.col("l_orderkey").alias("basket"),
                F.col("p_brand").alias("item")).distinct())
    # r14 (guide §2.4): nb and ic used to be two separate aggregate
    # branches whose column prunes (basket-only / item-only) split the
    # shared distinct subtree into three lineitem scans; one ROLLUP(item)
    # pass computes both (per-item rows -> ic, the grand-total row ->
    # nb) over the SAME full (basket, item) projection the pair stage
    # consumes, so the distinct exchange is built once and stage-reused.
    stats = (base.rollup("item")
             .agg(F.count("*").alias("c"),
                  F.countDistinct("basket").alias("n"),
                  F.grouping("item").alias("_g")))
    ic = stats.filter(F.col("_g") == 0).select("item", "c")
    nb = stats.filter(F.col("_g") == 1).select("n")
    # pair generation: group each basket's items and double-explode —
    # Σ k_b² generated rows feeding a map-side-combinable 625-key
    # aggregate, replacing the old basket sort-merge SELF-JOIN (two sort
    # stages + the join over Σ k_b² output rows were the query's
    # heaviest stages)
    bk = base.groupBy("basket").agg(F.collect_list("item").alias("items"))
    pairs = (
        bk.select("basket", F.explode("items").alias("item1"), "items")
        .select("item1", F.explode("items").alias("item2"))
        .filter(F.col("item1") != F.col("item2"))
        .groupBy("item1", "item2")
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= 5)
    )
    return (
        pairs
        .join(F.broadcast(ic.select(F.col("item").alias("item1"),
                                    F.col("c").alias("c1"))), "item1")
        .join(F.broadcast(ic.select(F.col("item").alias("item2"),
                                    F.col("c").alias("c2"))), "item2")
        .join(F.broadcast(nb))
        .select(
            "item1", "item2", "pair_n",
            F.expr("pair_n * 1000000 DIV c1").alias("confidence_ppm"),
            F.expr("pair_n * n * 1000000 DIV (c1 * c2)")
            .alias("lift_ppm"))
        .orderBy(F.desc("lift_ppm"), "item1", "item2").limit(30)
    )


# --------------------------------------------------------------------------
# Q247 golden-record survivorship: q143 decides WHICH records are the same
# entity; this builds the merged record the MDM pipeline actually ships —
# per-attribute survivorship rules (anchor name from the canonical member,
# cheapest price, largest size, sorted member roster), all deterministic
# and engine-portable (min_by on the unique member id breaks every tie).
@query(
    "q247_golden_record",
    oracle=f"""
    WITH pr AS ({_FUZZY_PAIRS}),
    sym AS (
      SELECT id1 AS rec, id2 AS neigh FROM pr
      UNION ALL
      SELECT id2 AS rec, id1 AS neigh FROM pr),
    best AS (SELECT rec, MIN(neigh) AS min_neigh FROM sym GROUP BY rec),
    canon AS (
      SELECT p.p_partkey,
             LEAST(p.p_partkey, COALESCE(best.min_neigh, p.p_partkey))
               AS canonical_id
      FROM part p LEFT JOIN best ON p.p_partkey = best.rec)
    SELECT c.canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           min_by(p.p_name, p.p_partkey) AS golden_name,
           MIN(p.p_retailprice) AS golden_price,
           CAST(MAX(p.p_size) AS INT) AS golden_size,
           array_to_string(list_sort(list(p.p_partkey)), ',') AS member_ids
    FROM canon c JOIN part p ON p.p_partkey = c.p_partkey
    GROUP BY c.canonical_id
    HAVING COUNT(*) > 1
    ORDER BY c.canonical_id
    """,
    doc="Golden-record merge per resolved entity cluster (clusters of "
        "size > 1): anchor name (min-id member), min price, max size, "
        "sorted member roster — the survivorship half of MDM on top of "
        "q143's linkage half. One groupBy on canonical_id.",
)
def q247(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tables(spark, sf_dir)["part"]
    pairs = blocked_fuzzy_pairs(
        part, "p_partkey", "p_name", ["p_brand", "p_type"], max_dist=2)
    canon = resolve_entities(part, pairs, "p_partkey")
    j = part.join(canon, "p_partkey")
    return (
        j.groupBy("canonical_id")
        .agg(
            F.count("*").alias("n_members"),
            F.expr("min_by(p_name, p_partkey)").alias("golden_name"),
            F.min("p_retailprice").alias("golden_price"),
            F.max("p_size").cast("int").alias("golden_size"),
            F.concat_ws(",", F.sort_array(F.collect_list("p_partkey")))
            .alias("member_ids"),
        )
        .filter(F.col("n_members") > 1)
        .orderBy("canonical_id")
    )
