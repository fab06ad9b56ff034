"""Record linkage + graph ranking operators (SURVEY.md §2.2m round-4 set).

Three operators a curation/ETL pipeline runs against entity-shaped data:

- ``blocked_fuzzy_pairs``: the scalable shape of a fuzzy (edit-distance)
  self-join.  An all-pairs levenshtein join is O(n²) and dead at 100 TB; the
  standard fix is *blocking*: only rows sharing a cheap deterministic
  blocking key are compared.  Block sizes bound the per-block pair count
  (B·k² for k = max block size), and the expensive verifier (levenshtein —
  JVM codegen, no Python) runs only on candidates.  Hot blocks at scale are
  handled the same way as any skewed join key: salt the block key or cap
  block membership by df (documented in SCALE.md; the corpus blocking key
  (p_brand, p_type) is bounded by construction).
- ``resolve_entities``: star canonicalization — each record adopts the
  minimum record id among itself and its verified fuzzy neighbours.  This is
  the single-hop version of connected components (operators/cluster.py):
  one symmetric-closure union + one groupBy-min, zero iteration, which is
  the right cost point when match graphs are shallow stars (dirty-catalog
  reconciliation) rather than long chains.  Exactly SQL-expressible, so the
  full pipeline carries a DuckDB oracle (q143).
- ``pagerank``: damped PageRank by unrolled power iteration in pure BIGINT
  arithmetic.  Engine-portable determinism: float sums are order-dependent,
  so ranks are kept in integer parts-per-billion and every division is a
  positive integer floor division (Spark ``DIV`` ≡ DuckDB ``//``).
  Overflow-safe by construction — per-edge transition probabilities are
  normalized to ppm FIRST (bounded ≤ 1e6), so the per-iteration product
  r·p_ppm·17 is ≤ N·1e9 · 1e6 · 17 ≈ 8.5e16·N, far inside BIGINT for any
  corpus size; the only scale-bearing term is w_uv·1e6, safe to 9.2e12
  events per edge (beyond that, promote that one product to DECIMAL(38,0) —
  the ADVICE-r3 rebalance_mixture lesson applied here from the start).
  Each iteration is one broadcast-sized join + one groupBy sum; the rank
  vector is node-table-sized, never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Rank fixed-point scale: parts-per-billion of total rank mass 1.0.
_RANK_SCALE = 1_000_000_000
# Edge-probability fixed-point scale (parts-per-million).
_P_SCALE = 1_000_000


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_dist: int = 2,
) -> DataFrame:
    """Verified fuzzy-match pairs (id1 < id2) within deterministic blocks.

    One shuffle on the block key; levenshtein runs only on in-block
    candidate pairs (codegen'd, JVM-side). Output: id1, id2, name1, name2,
    dist.
    """
    a = df.select(
        F.col(id_col).alias("id1"),
        F.col(name_col).alias("name1"),
        *[F.col(c).alias(f"_blk_{c}") for c in block_cols],
    )
    b = df.select(
        F.col(id_col).alias("id2"),
        F.col(name_col).alias("name2"),
        *[F.col(c).alias(f"_blk_{c}") for c in block_cols],
    )
    cond = [f"_blk_{c}" for c in block_cols]
    return (
        a.join(b, on=cond)
        .filter(F.col("id1") < F.col("id2"))
        # length-difference lower-bounds edit distance, so this prunes
        # candidates BEFORE the O(len²) DP without changing results
        .filter(
            F.abs(F.length("name1") - F.length("name2")) <= max_dist
        )
        # r13: bounded levenshtein — the threshold form runs the banded
        # O(len·k) DP with early exit and returns -1 past the bound, so
        # kept pairs carry the same exact distance while rejected pairs
        # skip the full O(len²) table (A/B: 3.1 s → 1.4 s at sf0.1,
        # frames identical; q142/q143 oracle MATCH re-proved)
        .withColumn("dist", F.levenshtein("name1", "name2", max_dist))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .drop(*[f"_blk_{c}" for c in cond])
        .select("id1", "id2", "name1", "name2", F.col("dist").cast("int").alias("dist"))
    )


def resolve_entities(records: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Star canonicalization: canonical_id = min(self, verified neighbours).

    Single-hop entity resolution over a verified-pairs edge list — one
    symmetric union + one groupBy-min + one left join back to the record
    spine.  For deep match chains use cluster.connected_components; for the
    star-shaped match graphs of catalog reconciliation this is exact and
    iteration-free.
    """
    sym = pairs.select(
        F.col("id1").alias("rec"), F.col("id2").alias("neigh")
    ).unionByName(pairs.select(F.col("id2").alias("rec"), F.col("id1").alias("neigh")))
    best = sym.groupBy("rec").agg(F.min("neigh").alias("min_neigh"))
    return (
        records.select(F.col(id_col))
        .join(best, records[id_col] == best["rec"], "left")
        .select(
            F.col(id_col),
            F.least(F.col(id_col), F.coalesce("min_neigh", F.col(id_col))).alias(
                "canonical_id"
            ),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Weighted PageRank, ``iterations`` unrolled rounds, exact BIGINT math.

    Returns (node, rank_ppb) where rank_ppb is the fixed-point rank in
    parts-per-billion.  Node set = endpoints of the edge list.  Dangling
    mass is dropped (standard simplification; teleport keeps ranks
    positive), floor divisions make the result deterministic and identical
    in any engine with 64-bit integer division — the DuckDB oracle mirrors
    the arithmetic verbatim.
    """
    d_num, d_den = damping_pct, 100
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    # Per-source out-weight, then per-edge transition probability in ppm.
    # w*1e6 is the only term whose magnitude grows with data volume.
    out = edges.groupBy(src).agg(F.sum(weight).alias("out_w"))
    e = (
        edges.join(out, src)
        .select(
            F.col(src).alias("e_src"),
            F.col(dst).alias("e_dst"),
            F.expr(f"CAST({weight} AS BIGINT) * {_P_SCALE} DIV out_w").alias("p_ppm"),
        )
    )
    n_nodes = nodes.count()  # node-table-sized; the only driver-side value
    teleport = (_RANK_SCALE * (d_den - d_num)) // (d_den * n_nodes)
    ranks = nodes.withColumn("rank_ppb", F.lit(_RANK_SCALE // n_nodes).cast("long"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["e_src"] == ranks["node"])
            .select(
                F.col("e_dst").alias("node2"),
                # bounded: rank ≤ N·1e9, p_ppm ≤ 1e6, d_num ≤ 100
                F.expr(
                    f"rank_ppb * p_ppm * {d_num} DIV ({d_den} * {_P_SCALE}L)"
                ).alias("c"),
            )
            .groupBy("node2")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["node2"], "left")
            .select(
                "node",
                (F.lit(teleport) + F.coalesce("inflow", F.lit(0))).cast("long").alias(
                    "rank_ppb"
                ),
            )
        )
    return ranks


def count_triangles(pairs: DataFrame, a: str = "id1", b: str = "id2") -> DataFrame:
    """Exact triangle count over an undirected edge list stored as
    (a < b) pairs — the standard two-join formulation: a triangle
    {x < y < z} appears exactly once as E(x,y) ⋈ E(y,z) ⋈ E(x,z).

    Scale shape: the id-ordering IS the degree-style orientation that stops
    double counting; both joins are equi-joins on node ids (uniform keys).
    At 100 TB-scale graphs, pre-orient by degree instead of raw id (hub
    nodes get out-degree ≤ O(√m)) — same plan, different orientation
    column. Output: one row, n_triangles.
    """
    e1 = pairs.select(F.col(a).alias("x"), F.col(b).alias("y"))
    e2 = pairs.select(F.col(a).alias("y"), F.col(b).alias("z"))
    e3 = pairs.select(F.col(a).alias("x"), F.col(b).alias("z"))
    wedges = e1.join(e2, "y")
    tri = wedges.join(e3, ["x", "z"])
    return tri.agg(F.count("*").alias("n_triangles"))


def cooccurrence_pairs(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Market-basket co-occurrence: for each unordered pair of distinct
    items sharing a basket, the number of baskets containing both — the
    support table behind association-rule mining.

    Shape: distinct (basket, item) first (so quantity repeats never
    inflate support), then a self-equi-join on the basket key with
    item1 < item2 — per-basket pair count is |basket|², bounded by basket
    size, never corpus size. One groupBy on the pair, top-k via
    TakeOrderedAndProject. Hot baskets (one basket with 1e6 items) are the
    skew case: cap or salt the basket key — see SCALE.md.
    """
    base = items.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    a = base.select("basket", F.col("item").alias("item1"))
    bside = base.select("basket", F.col("item").alias("item2"))
    return (
        a.join(bside, "basket")
        .filter(F.col("item1") < F.col("item2"))
        .groupBy("item1", "item2")
        .agg(F.count("*").alias("support"))
        .orderBy(F.desc("support"), "item1", "item2")
        .limit(top_k)
    )
