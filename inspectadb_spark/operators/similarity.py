"""Vector similarity search (SURVEY.md §2.2i; EDBT'19/'20 lineage per PAPERS.md).

- ``cosine_topk``: brute-force cosine against a query vector using built-in
  higher-order functions (``zip_with`` + ``aggregate``) — no UDF, stays in
  codegen. O(n·d) per query; the correctness baseline.
- ``srp_ann_topk``: signed-random-projection LSH. Each vector gets a b-bit
  signature (sign of dot with deterministic seeded hyperplanes, broadcast as
  literal arrays); candidates = vectors sharing a signature in any of
  ``tables`` independent signature sets; exact cosine is computed only on
  candidates. At 100 TB this turns a full scan per query into a few
  bucket-joins on uniform integer keys.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column | str) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pair_dot(a: Column | str, b: Column | str) -> Column:
    """``_dot(a, b)`` for two vector COLUMNS via one Arrow-vectorized pass
    — the pair-join twin of ``srp_signatures`` (r13, guide §4): the
    interpreted zip_with/aggregate fold pays ~64 expression-tree steps per
    PAIR in every candidate/broadcast join of the pair-scoring family;
    this crosses the Python boundary once per Arrow batch and runs the
    same arithmetic as one numpy pass per dimension.

    Exactness argument (same as ``srp_signatures``): the fold
    ``acc ← acc + a[d]·b[d]`` ascending d is reproduced with the identical
    IEEE-754 operation sequence — ``acc += A[:, d] * B[:, d]`` one
    dimension at a time (numpy multiply and add are separate
    correctly-rounded float64 ufuncs; no FMA contraction, no pairwise
    re-association across d) — so the returned double is bit-identical to
    the fold for clean vectors, and every downstream ppm/DECIMAL
    quantization and comparison is therefore byte-identical.

    Null semantics: the fold returns NULL when either vector is NULL or
    the lengths differ (zip_with pads with nulls → null product → null
    fold); this returns NULL for those rows too. The one unobservable
    divergence (again as in ``srp_signatures``): a NaN product makes the
    fold return NaN while Arrow's float64 path surfaces it as NULL, and a
    NULL *element* inside a list is indistinguishable from NaN in Arrow —
    but every call site quantizes through DECIMAL (mapping NaN and NULL
    both to NULL) or filters on the quantized value (NULL and NaN compare
    the same 3VL way), so no declared result can observe it; the
    equivalence test pins the clean-input case bit-for-bit.
    """
    import pandas as pd

    def _dots(av, bv):
        a_np, b_np = av.to_numpy(), bv.to_numpy()
        n = len(a_np)
        out = np.full(n, np.nan, dtype=np.float64)
        by_dim: dict = {}
        for i in range(n):
            x, y = a_np[i], b_np[i]
            if x is None or y is None or len(x) != len(y):
                continue  # NULL result, like the padded zip_with fold
            by_dim.setdefault(len(x), []).append(i)
        for dim, idx in by_dim.items():
            ii = np.asarray(idx, dtype=np.int64)
            if dim == 0:
                out[ii] = 0.0  # empty fold → the 0.0 seed
                continue
            A = np.stack([np.asarray(a_np[i], dtype=np.float64)
                          for i in idx])
            B = np.stack([np.asarray(b_np[i], dtype=np.float64)
                          for i in idx])
            acc = np.zeros(len(idx), dtype=np.float64)
            for d in range(dim):
                acc += A[:, d] * B[:, d]
            out[ii] = acc
        return pd.Series(out)

    return F.pandas_udf(_dots, "double")(a, b)


def batch_cross_dots(
    cands: DataFrame,
    pass_cols: list[str],
    cand_vec_cols: list[str],
    batch: DataFrame,
    batch_id_col: str,
    batch_vec_cols: list[str],
    dot_cols: list[str],
) -> DataFrame:
    """All (candidate × batch-row) dot products in ONE candidate scan —
    the broadcast-join member of the r13 pair-dot family (guide §4).

    The pair-scoring audits broadcast a bounded query batch against the
    corpus and score each pair with the interpreted ``_dot`` fold; even
    with the fold Arrow-vectorized (``pair_dot``), the join materializes
    BOTH 0.5 KB vectors per pair and ships them to the Python worker —
    the transfer, not the arithmetic, dominates. This helper keeps the
    movement the old plan already paid ONCE (a Catalyst
    BroadcastExchange materializes the small side on the driver and on
    every executor — collecting the same bounded frame here is the
    identical movement and the identical scale bound) and crosses the
    Python boundary with each CANDIDATE once: per Arrow batch it
    computes dots against the whole collected batch and emits
    (pass_cols…, batch_id, dots…) rows — 3 scalars per pair out, no
    vectors per pair in either direction.

    Exactness: each dot uses the same fixed-order per-dimension
    accumulation as ``pair_dot``/``srp_signatures`` (ascending d,
    separate correctly-rounded float64 multiply and add, no FMA/
    re-association), so every emitted double is bit-identical to the
    ``_dot`` fold on the same pair. NULL/length-mismatch vectors on
    either side yield NULL dots exactly as the padded zip_with fold
    does (with the same NaN-vs-NULL caveat as ``pair_dot`` — every call
    site quantizes through DECIMAL, which maps both to NULL). Pair
    ORDER differs from the join's (candidate-major here); every
    consumer aggregates or windows with deterministic ties, so order
    is immaterial. Join CONDITIONS (``q_id != c_id`` etc.) are applied
    by the caller as post-filters — the same predicate on the same
    values drops the same pairs.
    """
    import pandas as pd

    brows = batch.select(batch_id_col, *batch_vec_cols).collect()
    m = len(brows)
    b_ids = np.array([r[0] for r in brows], dtype=np.int64)
    mats = []
    for vi in range(len(batch_vec_cols)):
        vecs = [r[vi + 1] for r in brows]
        dims = {len(v) for v in vecs if v is not None}
        dim = dims.pop() if len(dims) == 1 else None
        ok = np.array([v is not None and (dim is None or len(v) == dim)
                       for v in vecs], dtype=bool)
        if dim is None or not ok.all():
            # ragged/null batch vectors: mark rows whose dots are NULL
            good = [np.asarray(v, dtype=np.float64) if o else None
                    for v, o in zip(vecs, ok)]
            mats.append(("ragged", good))
        else:
            mats.append(("dense",
                         np.ascontiguousarray(
                             np.stack([np.asarray(v, dtype=np.float64)
                                       for v in vecs]))))

    c_schema = {f.name: f.dataType.simpleString() for f in cands.schema}
    b_id_type = dict(
        (f.name, f.dataType.simpleString()) for f in batch.schema
    )[batch_id_col]
    out_schema = ", ".join(
        [f"{c} {c_schema[c]}" for c in pass_cols]
        + [f"{batch_id_col} {b_id_type}"]
        + [f"{dc} double" for dc in dot_cols]
    )
    n_vec = len(cand_vec_cols)
    # cap each emitted frame near 64k rows regardless of batch width
    chunk = max(1, 65536 // max(m, 1))

    def _cross(frames):
        for pdf in frames:
            n = len(pdf)
            if n == 0 or m == 0:
                continue
            cvecs = [pdf[cv].to_numpy() for cv in cand_vec_cols]
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                nb = hi - lo
                out = {}
                for c in pass_cols:
                    out[c] = np.repeat(pdf[c].to_numpy()[lo:hi], m)
                out[batch_id_col] = np.tile(b_ids, nb)
                for vi in range(n_vec):
                    kind, Q = mats[vi]
                    vals = cvecs[vi][lo:hi]
                    acc = np.full((nb, m), np.nan, dtype=np.float64)
                    okc = np.fromiter(
                        (v is not None for v in vals), dtype=bool, count=nb)
                    if kind == "dense" and okc.any():
                        dim = Q.shape[1]
                        okd = okc & np.fromiter(
                            (v is not None and len(v) == dim for v in vals),
                            dtype=bool, count=nb)
                        if okd.any():
                            C = np.stack([np.asarray(v, dtype=np.float64)
                                          for v in vals[okd]])
                            a = np.zeros((C.shape[0], m), dtype=np.float64)
                            for d in range(dim):
                                a += C[:, d, None] * Q[None, :, d]
                            acc[okd] = a
                        # rows not in okd keep NaN (NULL) for ALL m dots:
                        # a length-mismatched candidate pairs NULL with
                        # every batch vector of that dim, like the fold
                    elif kind == "ragged":
                        for i in range(nb):
                            if not okc[i]:
                                continue
                            cv = np.asarray(vals[i], dtype=np.float64)
                            for j, qv in enumerate(Q):
                                if qv is None or len(qv) != len(cv):
                                    continue
                                s = 0.0
                                for d in range(len(cv)):
                                    s += cv[d] * qv[d]
                                acc[i, j] = s
                    out[dot_cols[vi]] = acc.reshape(-1)
                yield pd.DataFrame(out)

    return cands.mapInPandas(_cross, out_schema)


def cosine_expr(vec_col: str, query_vec: list[float]) -> Column:
    """Cosine similarity to a *literal* query vector, unrolled into
    ``element_at`` products.

    Unrolling keeps the whole computation inside whole-stage codegen —
    measured ~6× faster than the interpreted higher-order
    ``zip_with``/``aggregate`` form and ~3× faster than an Arrow pandas UDF
    at 64 dims (the UDF pays the Python-worker roundtrip). Term order is
    left-to-right ascending index, matching a sequential fold, so results
    are bit-identical to the lambda form.
    """
    import math

    qn = math.sqrt(sum(float(v) * float(v) for v in query_vec))
    dot = None
    nrm = None
    for j, q in enumerate(query_vec, start=1):
        ej = F.element_at(vec_col, j).cast("double")
        dterm = ej * F.lit(float(q))
        nterm = ej * ej
        dot = dterm if dot is None else dot + dterm
        nrm = nterm if nrm is None else nrm + nterm
    return dot / (F.sqrt(nrm) * F.lit(qn))


def cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec`` (deterministic
    tie-break on id). Rounded to 4 dp so ordering is engine-portable."""
    sim = cosine_expr(vec_col, query_vec)
    simr = F.round(sim.cast("decimal(18,6)"), 4).cast("double")
    return (
        vectors.select(F.col(id_col), simr.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def filtered_cosine_topk(
    vectors: DataFrame,
    meta: DataFrame,
    predicate,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    meta_id_col: str = "doc_id",
) -> DataFrame:
    """Metadata-filtered exact vector search: top-k by cosine among ONLY
    the vectors whose metadata row satisfies ``predicate`` — the standard
    production ANN requirement (serve "nearest English docs", not nearest
    overall). This is PRE-filtering: the allowed-id set semi-joins the
    vector table before scoring, so the result is the exact top-k of the
    filtered subset — no recall loss at any selectivity, unlike
    post-filtering a fixed candidate list, which starves when the filter
    is selective (the failure mode ``ivf_topk_filtered``'s recall test
    quantifies on the index path).

    Plan/scale: predicate pushes into the metadata scan; the filtered id
    set joins as a semi join (broadcast when small — the common case for
    selective filters); scoring stays the zip_with/aggregate codegen
    expression; top-k is TakeOrderedAndProject. At 100 TB the semi join is
    the same shuffle the serving query already pays for any join-shaped
    filter; nothing scores vectors the filter later discards."""
    allowed = meta.filter(predicate).select(
        F.col(meta_id_col).alias(id_col)).distinct()
    return cosine_topk(vectors.join(allowed, id_col, "semi"), query_vec,
                       k=k, vec_col=vec_col, id_col=id_col)


def ivf_topk_filtered(
    vectors: DataFrame,
    query_vec: list[float],
    allowed: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    centroids=None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Filtered serving on the IVF path. Cell pruning and the allowed-id
    filter are both set intersections, so they COMMUTE exactly — the semi
    join is declared before ``ivf_topk`` and Catalyst places it; on a
    cell-partitioned index the physical order is still prune-then-filter
    (partition pruning happens at the scan). Crucially the filter runs
    before the top-k cut, never on a fixed-size candidate list, so the
    only recall loss vs ``filtered_cosine_topk`` is the usual IVF cell
    miss: a selective filter thins the probed cells but never truncates
    the answer below k while matching candidates exist in them. Raise
    ``n_probe`` as filter selectivity drops — the recall property test
    pins probe-all ≡ exact filtered brute."""
    allowed_ids = allowed.select(
        F.col(allowed.columns[0]).alias(id_col)).distinct()
    return ivf_topk(vectors.join(allowed_ids, id_col, "semi"), query_vec,
                    k=k, n_probe=n_probe, centroids=centroids,
                    vec_col=vec_col, id_col=id_col)


def _hyperplanes(dim: int, bits: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, bits, dim))


def srp_signature(vec_col: str, planes: np.ndarray) -> Column:
    """b-bit signed-random-projection signature as a bigint, via built-ins.

    Deliberately NOT unrolled like ``cosine_expr``: one signature is
    bits×dim (512+) terms, which overflows the JIT/codegen method budget and
    falls back to interpreted expression trees — measured 7× SLOWER than
    this zip_with form at 8 bits × 64 dims. Unrolling only wins for small
    expressions (a single 64-dim query vector)."""
    bits = []
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(F.col(vec_col), lit_plane)
        bits.append(F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("bigint")


def srp_signatures(vec_col: str | Column, planes: np.ndarray) -> Column:
    """All ``tables`` SRP signatures at once as ``array<bigint>`` —
    ``element_at(result, t + 1) ≡ srp_signature(vec_col, planes[t])``
    bit-for-bit, via one Arrow-vectorized pass instead of
    tables × bits interpreted 64-element folds per row (r13, guide §4:
    the per-row signature stage was the dominant cost of the SRP family —
    4096 interpreted fold steps per row at 8 tables × 8 bits × 64 dims).

    Exactness argument (why this is bit-identical, not merely close):
    the fold ``acc ← acc + (v[d] · p[d])`` is reproduced with the same
    IEEE-754 operation sequence — one correctly-rounded float64 multiply
    then one add per dimension, ascending d — by accumulating with
    ``acc += V[:, d] * P[:, d]`` one dimension at a time (numpy multiply
    and add are separate correctly-rounded ufuncs; no FMA contraction,
    no pairwise re-association across d). float32 inputs are widened to
    float64 first, matching the fold's per-element ``cast("double")``.
    The sign test mirrors Spark comparison semantics: bit set iff
    ``d >= 0`` OR ``d`` is NaN (Spark orders NaN above all doubles).
    Rows whose vector is NULL or whose length differs from the plane
    dimension get signature 0, exactly like the fold (zip_with pads with
    nulls → null product → null fold → ``when`` falls to 0 for every
    bit). The one unobservable divergence: Arrow cannot distinguish a
    NULL *element* from NaN inside a list, so a vector containing null
    elements signs like a NaN vector — every downstream consumer drops
    such rows anyway (their cosine is null/NaN, and every call site casts
    through DECIMAL before use, which maps both to NULL); the equivalence
    test pins the clean-input case element-for-element against the fold.
    """
    import pandas as pd

    tables, bits, dim = planes.shape
    flat = np.ascontiguousarray(planes.reshape(tables * bits, dim),
                                dtype=np.float64)
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))

    def _sigs(vs):
        vals = vs.to_numpy()
        n = len(vals)
        ok = np.fromiter(
            (v is not None and len(v) == dim for v in vals),
            dtype=bool, count=n)
        sigs = np.zeros((n, tables), dtype=np.int64)
        if ok.any():
            V = np.stack([np.asarray(v, dtype=np.float64)
                          for v in vals[ok]])
            acc = np.zeros((V.shape[0], tables * bits), dtype=np.float64)
            for d in range(dim):
                acc += V[:, d, None] * flat[None, :, d]
            on = (acc >= 0) | np.isnan(acc)
            sigs[ok] = on.reshape(-1, tables, bits) @ weights
        return pd.Series(list(sigs))

    return F.pandas_udf(_sigs, "array<bigint>")(vec_col)


def cosine_pairs_exact(
    vectors: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 16,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: all (a, b) with a < b and
    cosine ≥ threshold. O(n²·d) — the correctness baseline; use
    ``srp_near_dup_pairs`` at scale.

    r13 shape: blocked matrix product instead of a pair-at-a-time theta
    join. The old form BroadcastNestedLoop-joined on ``v1 < v2`` and ran a
    ``zip_with``+``aggregate`` fold per pair — n²/2 interpreted 64-element
    folds (~40 µs each ≈ 76 s for n=2000 at sf0.1). Now each vector lands
    in one of ``n_blocks`` id-hash blocks, the n_blocks·(n_blocks+1)/2
    block PAIRS become one row each, and an Arrow-batched numpy pass runs
    the block GEMM at BLAS speed (guide §4: the Python boundary crosses
    once per block pair, not per element pair). Every unordered id pair
    lives in exactly one block pair, so nothing is double-counted.

    Exactness: norms stay the JVM fold (identical bits to the old plan);
    the numpy dot differs from the old sequential fold only in summation
    order (|err| ≲ 1e-13). The Python stage emits candidates at
    ``threshold − 1e-4`` and the authoritative filter — the same
    DECIMAL(18,6) → 4dp round-then-compare expression as before — runs in
    Spark SQL on the raw double, so the committed rounding semantics are
    byte-identical (re-proved vs the q43c oracle at sf0.001/0.01/0.1).
    Zero-norm rows are excluded (cosine undefined; under ANSI mode the 0/0
    would abort the job)."""
    import pandas as pd

    id_type = vectors.schema[id_col].dataType.simpleString()
    keyed = vectors.select(
        F.col(id_col).alias("v"),
        F.col(vec_col).alias("e"),
        F.sqrt(_norm2(vec_col)).alias("m"),
    ).filter(F.col("m") > 0)
    packed = keyed.groupBy(
        F.pmod(F.hash("v"), F.lit(n_blocks)).alias("g")
    ).agg(F.collect_list(F.struct("v", "e", "m")).alias("rows"))
    lhs = packed.select(F.col("g").alias("g1"), F.col("rows").alias("r1"))
    rhs = packed.select(F.col("g").alias("g2"), F.col("rows").alias("r2"))
    block_pairs = lhs.join(rhs, F.col("g1") <= F.col("g2")).repartition(
        n_blocks * (n_blocks + 1) // 2, "g1", "g2"
    )
    guard = threshold - 1e-4

    def gemm(batches):
        for pdf in batches:
            v1_out, v2_out, s_out = [], [], []
            for g1, g2, r1, r2 in zip(pdf["g1"], pdf["g2"],
                                      pdf["r1"], pdf["r2"]):
                i1 = np.asarray([x["v"] for x in r1])
                i2 = np.asarray([x["v"] for x in r2])
                m1 = np.asarray([x["m"] for x in r1], dtype=np.float64)
                m2 = np.asarray([x["m"] for x in r2], dtype=np.float64)
                e1 = np.asarray([x["e"] for x in r1], dtype=np.float64)
                e2 = np.asarray([x["e"] for x in r2], dtype=np.float64)
                sim = (e1 @ e2.T) / np.outer(m1, m2)
                keep = sim >= guard
                if g1 == g2:
                    keep &= i1[:, None] < i2[None, :]
                else:
                    keep &= i1[:, None] != i2[None, :]
                ii, jj = np.nonzero(keep)
                if not len(ii):
                    continue
                a, b = i1[ii], i2[jj]
                v1_out.append(np.minimum(a, b))
                v2_out.append(np.maximum(a, b))
                s_out.append(sim[ii, jj])
            if v1_out:
                yield pd.DataFrame({
                    "v1": np.concatenate(v1_out),
                    "v2": np.concatenate(v2_out),
                    "sim_raw": np.concatenate(s_out),
                })

    cand = block_pairs.mapInPandas(
        gemm, f"v1 {id_type}, v2 {id_type}, sim_raw double"
    )
    simr = F.round(F.col("sim_raw").cast("decimal(18,6)"), 4).cast("double")
    return (
        cand.select("v1", "v2", simr.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def sign_blocked_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.3,
    block_dims: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-duplicate pairs at scale with an ORACLE-EXPRESSIBLE blocking
    key: bit j of the key is ``[x_j >= 0]`` over the first ``block_dims``
    dimensions — axis-aligned signed random projection, so the candidate
    generation is an equi-join on a uniform small-int key (E[candidates] =
    n²/2^block_dims, never the O(n²) cross join) while staying free of RNG
    and float hyperplanes: float sign is exact, so Spark and any SQL engine
    compute byte-identical keys. Candidates are verified by exact
    r4-rounded cosine. Same recall trade-off as ``srp_near_dup_pairs``
    (per-dim agreement prob 1 - θ/π); axis planes trade a little recall
    isotropy for cross-engine verifiability."""
    bit = F.col(vec_col).getItem
    blk = sum(
        (F.when(bit(j) >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
        for j in range(block_dims)
    ).cast("int")
    # same zero-norm exclusion as cosine_pairs_exact (ANSI 0/0 guard).
    # r13: norms move scan-side (same sqrt(_norm2) expression on the same
    # vector values — bit-identical, computed once per VECTOR instead of
    # twice per PAIR) and the pair dot runs through the Arrow-vectorized
    # pair_dot (bit-identical to the fold — see its docstring).
    keyed = vectors.filter(F.sqrt(_norm2(vec_col)) > 0).select(
        F.col(id_col), F.col(vec_col),
        F.sqrt(_norm2(vec_col)).alias("_m"), blk.alias("_blk"))
    a = keyed.select(
        F.col(id_col).alias("v1"), F.col(vec_col).alias("e1"),
        F.col("_m").alias("m1"), "_blk"
    )
    b = keyed.select(
        F.col(id_col).alias("v2"), F.col(vec_col).alias("e2"),
        F.col("_m").alias("m2"), "_blk"
    )
    sim = pair_dot("e1", "e2") / (F.col("m1") * F.col("m2"))
    simr = F.round(sim.cast("decimal(18,6)"), 4).cast("double")
    return (
        a.join(b, "_blk")
        .filter(F.col("v1") < F.col("v2"))
        .select("v1", "v2", simr.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def srp_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs at scale: candidates = pairs sharing an SRP
    signature in ANY of ``tables`` hash tables (equi-join on (table, sig) —
    a shuffle on uniform integer keys instead of an O(n²) cross join), then
    exact cosine on candidates only. High-cosine pairs agree on sign bits
    with probability 1 - θ/π per bit, so recall rises with ``tables`` and
    falls with ``bits``; property tests pin the bound."""
    planes = _hyperplanes(vectors.select(F.size(vec_col)).first()[0], bits, tables, seed)
    # r13: all `tables` signatures in ONE Arrow pass (srp_signatures is
    # bit-identical to the per-table fold — see its docstring); posexplode
    # reproduces the old (lit(t), sig) struct-array explode exactly.
    # r13: norms scan-side (same expression, same values — computed once
    # per vector, not twice per pair); the candidate dot runs through the
    # Arrow-vectorized pair_dot AFTER the dedup (bit-identical to the fold
    # — see its docstring). NB: scoring before the dedup would shrink the
    # dedup shuffle, but a pandas-UDF column flowing through
    # dropDuplicates trips INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND under
    # set-operation rewrites (exceptAll) on Spark 4.1 — so the dedup keeps
    # carrying vectors exactly as before and only the fold is swapped.
    tagged = vectors.select(
        id_col,
        vec_col,
        F.sqrt(_norm2(vec_col)).alias("_m"),
        F.posexplode(srp_signatures(vec_col, planes)).alias("t", "sig"),
    )
    a = tagged.select(
        F.col(id_col).alias("v1"), F.col(vec_col).alias("e1"),
        F.col("_m").alias("m1"), "t", "sig"
    )
    b = tagged.select(
        F.col(id_col).alias("v2"), F.col(vec_col).alias("e2"),
        F.col("_m").alias("m2"), "t", "sig"
    )
    cand = (
        a.join(b, ["t", "sig"])
        .filter(F.col("v1") < F.col("v2"))
        .select("v1", "v2", "e1", "e2", "m1", "m2")
        .dropDuplicates(["v1", "v2"])
    )
    sim = pair_dot("e1", "e2") / (F.col("m1") * F.col("m2"))
    simr = F.round(sim.cast("decimal(18,6)"), 4).cast("double")
    return cand.select("v1", "v2", simr.alias("sim")).filter(F.col("sim") >= threshold)


def ivf_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style ANN: deterministic centroids partition the collection
    into inverted lists (cell = argmax centroid·v/|c||v|, computed scan-side
    in codegen); a query probes only the ``n_probe`` nearest cells, then runs
    exact cosine inside them. At 100 TB the cell id becomes a partition
    column, so probing prunes ~(1 - n_probe/n_centroids) of the data from
    the scan. Centroid assignment is a pure projection — no shuffle.

    ``centroids`` (rows = cells) overrides the default seeded-random set —
    pass ``kmeans_fit(...)``'s output for trained, balanced inverted lists."""
    dim = len(query_vec)
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64).copy()
        n_centroids = len(cents)
    else:
        rng = np.random.default_rng(seed)
        cents = rng.standard_normal((n_centroids, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    probe = _probe_cells(cents, query_vec, n_probe)

    assigned = ivf_assign(vectors, cents, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("_cell"))
    cand = assigned.filter(F.col("_cell").isin(probe)).drop("_cell")
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def ivf_assign(vectors: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Attach the IVF cell id (`_cell` = argmax cosine to a centroid) as a
    column. A pure scan-side codegen projection — at 100 TB, write the
    collection ``partitionBy("_cell")`` and a query's cell probe becomes a
    partition filter: non-probed inverted lists are never read
    (test_cluster::test_ivf_cell_partitioning_prunes_scan)."""
    cents = np.asarray(centroids, dtype=np.float64)
    # cell = argmax over centroids of cosine(v, c); greatest-of-structs gives
    # a deterministic argmax (score, then lower centroid id via -cid)
    vm = F.sqrt(_norm2(vec_col))
    choices = []
    for cid in range(len(cents)):
        lit_c = F.array(*[F.lit(float(x)) for x in cents[cid]])
        score = _dot(F.col(vec_col), lit_c) / vm
        choices.append(F.struct(score.alias("s"), F.lit(-cid).alias("nc")))
    return vectors.withColumn("_cell", -F.greatest(*choices).getField("nc"))


def _probe_cells(cents: np.ndarray, query_vec: list[float],
                 n_probe: int) -> list[int]:
    """The ``n_probe`` cells nearest the query (driver-side model math:
    O(n_centroids · dim), never touches the table). ``cents`` must already
    be row-normalized (as ``ivf_topk`` and ``save_ivf_index`` store them)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qsims = (cents @ qv) / np.linalg.norm(qv)
    return [int(c) for c in np.argsort(-qsims)[:n_probe]]


# -- Persisted IVF index: build once, serve many queries --------------------
#
# ``ivf_topk`` re-derives every vector's cell assignment per query — fine
# for one-off audits, wrong for a serving path: at 100 TB that is a full
# table scan per query. The persisted layout splits the index into
#   <path>/centroids   — the MODEL (n_centroids rows), read by the driver
#   <path>/lists       — the collection written partitionBy("_cell")
# so a query's probe becomes a PARTITION FILTER on the lists table: only
# n_probe/n_centroids of the files are ever opened (asserted via the scan's
# numPartitions metric in tests/test_cluster.py). Rebuild cadence is an offline
# concern — the index is immutable between builds, like any ANN index.

def _mark_rebuilding(path: str) -> None:
    """Sentinel for in-place index rebuilds: centroids and lists cannot be
    swapped atomically together, so the window (and any crash inside it)
    leaves a model/lists mix from DIFFERENT trainings — silently-wrong
    neighbors if served. The sentinel makes that state an explicit error
    at read time instead; it is cleared as the rebuild's last step."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "REBUILDING"), "w") as f:
        f.write("in-place rebuild in progress (or crashed mid-rebuild)\n")


def _clear_rebuilding(path: str) -> None:
    p = os.path.join(path, "REBUILDING")
    if os.path.exists(p):
        os.remove(p)


def _check_not_rebuilding(path: str) -> None:
    if os.path.exists(os.path.join(path, "REBUILDING")):
        raise RuntimeError(
            f"IVF index at {path} is mid-rebuild (or a rebuild crashed): "
            "centroids and lists may come from different models — refusing "
            "to serve. Re-run save_ivf_index/save_ivf_pq_index to "
            "completion (streamed deltas on the old pointer remain on "
            "disk), then retry."
        )


def save_ivf_index(
    vectors: DataFrame,
    centroids: np.ndarray,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize_bits: int | None = None,
) -> None:
    """Materialize the IVF index at ``path``. ``centroids`` is the trained
    model (``kmeans_fit`` output or any (n, dim) array); rows are stored
    unit-normalized so serving's probe ranking matches ``ivf_topk``'s.

    ``quantize_bits`` (e.g. 8) stores the inverted lists as per-dimension
    int codes instead of doubles — the 100 TB storage lever (embeddings
    dominate index bytes; smallint codes bit-pack in parquet). Cell
    assignment still happens on the FULL-PRECISION vectors; the
    (pos, lo, hi) codebook rides with the model and ``read_ivf_lists``
    dequantizes transparently, so every serving path works unchanged
    with the q43f-property error bound.

    A rebuild SUPERSEDES any streamed-in deltas: the INGEST pointer (if a
    StreamingIvfIngest ever committed here) is removed, because its delta
    lists were cell-assigned under the OLD centroid model — leaving it in
    place would make every reader prefer stale pre-rebuild lists whose
    cells no longer match the new probe ranking. The pointer is removed
    LAST, after the rebuilt centroids and lists have committed: a crash
    mid-rebuild then leaves the old pointer (and its delta lists) intact
    and recoverable, instead of orphaning every streamed delta while
    serving the stale build-time base. Because centroids/lists/pointer
    cannot all swap atomically, the whole rebuild runs under a
    ``REBUILDING`` sentinel that serving readers REFUSE (raising, not
    silently mixing models) — cleared as the final step. Stop (and
    re-seed) any live ingester before rebuilding in place."""
    # validate BEFORE marking: a shape/NaN error here must not brick a
    # healthy untouched index behind a sentinel nothing will clear
    cents = np.asarray(centroids, dtype=np.float64).copy()
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    spark = vectors.sparkSession
    model = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell INT, centroid ARRAY<DOUBLE>",
    )
    _mark_rebuilding(path)
    # a rebuild defines the index's ONE format: stale sibling artifacts
    # from a previous format (PQ code lists, an old quant codebook) would
    # otherwise be served against the new model after the sentinel clears
    shutil.rmtree(os.path.join(path, "pq_books"), ignore_errors=True)
    shutil.rmtree(os.path.join(path, "pq_lists"), ignore_errors=True)
    if not quantize_bits:
        shutil.rmtree(os.path.join(path, "quant"), ignore_errors=True)
    # r14: repartition(1), not coalesce(1) — the model frames are tiny
    # driver-local createDataFrames spread over defaultParallelism
    # mostly-EMPTY partitions, and a coalesce(1) task over those parents
    # measured a reproducible ~4 s stall per write on local[32] (vs
    # ~0.3 s for the one-row shuffle); same single output file
    model.repartition(1).write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = (ivf_assign(vectors, cents, vec_col)
                .select(F.col(id_col), F.col(vec_col), F.col("_cell")))
    if quantize_bits:
        lo, hi = embedding_ranges(vectors, vec_col)
        qmodel = spark.createDataFrame(
            [(p, float(l), float(h), int(quantize_bits))
             for p, (l, h) in enumerate(zip(lo, hi))],
            "pos INT, lo DOUBLE, hi DOUBLE, bits INT",
        )
        qmodel.repartition(1).write.mode("overwrite").parquet(f"{path}/quant")
        assigned = quantize_embeddings(assigned, lo, hi, vec_col,
                                       quantize_bits)
        if quantize_bits <= 15:
            assigned = assigned.withColumn(
                vec_col, F.col(vec_col).cast("array<smallint>"))
    (assigned.write.partitionBy("_cell").mode("overwrite")
     .parquet(f"{path}/lists"))
    ingest_ptr = os.path.join(path, "INGEST")
    if os.path.exists(ingest_ptr):
        os.remove(ingest_ptr)
    _clear_rebuilding(path)


def _load_quant_model(spark, path: str):
    """(lo, hi, bits) from the index's codebook, or None if unquantized."""
    if not os.path.exists(os.path.join(path, "quant")):
        return None
    rows = spark.read.parquet(f"{path}/quant").orderBy("pos").collect()
    return ([float(r.lo) for r in rows], [float(r.hi) for r in rows],
            int(rows[0].bits))


def load_ivf_centroids(spark, path: str) -> np.ndarray:
    """The index's centroid model, cell-ordered (driver-side, model-sized)."""
    _check_not_rebuilding(path)
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    return np.asarray([list(r["centroid"]) for r in rows], dtype=np.float64)


def read_ivf_lists(spark, path: str, vec_col: str = "embedding") -> DataFrame:
    """The index's inverted lists AS COMMITTED: the build-time base plus
    any streamed-in delta directories (streaming/ann_index.py's INGEST
    pointer). Every committed path is ``partitionBy("_cell")``, so a
    probe's cell filter prunes base and deltas alike."""
    _check_not_rebuilding(path)
    ptr = os.path.join(path, "INGEST")
    out = None
    if os.path.exists(ptr):
        with open(ptr) as f:
            lines = f.read().strip().splitlines()
        # a zero-byte pointer (crash between open and write — os.replace
        # commits are atomic, but a foreign writer may not be) means "no
        # committed ingest": fall through to the build-time base
        paths = [p for p in lines[0].split("|") if p] if lines else []
        if paths:
            # each committed dir is its own partitioned root — Spark
            # refuses multi-root partition discovery in one read, so
            # union per-path scans (the cell filter prunes each scan)
            out = spark.read.parquet(paths[0])
            for p in paths[1:]:
                out = out.unionByName(spark.read.parquet(p))
    if out is None:
        out = spark.read.parquet(f"{path}/lists")
    quant = _load_quant_model(spark, path)
    if quant is not None:
        lo, hi, bits = quant
        out = dequantize_embeddings(out, lo, hi, vec_col, bits)
    return out


def ivf_topk_from_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Serve top-k from a persisted IVF index: rank cells against the stored
    model (driver-side), then read ONLY the probed inverted lists (a
    partition filter — non-probed files are never opened) and rerank with
    exact cosine. Result-identical to ``ivf_topk`` over the same centroids
    and collection; only the scan footprint differs. ``allowed``
    (single-column id DataFrame) adds the metadata filter of
    ``ivf_topk_filtered`` at the index tier: the semi join lands between
    the partition-pruned list scan and the top-k cut, so selective
    filters never truncate the answer below k while matching candidates
    exist in the probed cells."""
    cents = load_ivf_centroids(spark, path)
    probe = _probe_cells(cents, query_vec, n_probe)
    cand = (read_ivf_lists(spark, path, vec_col)
            .filter(F.col("_cell").isin(probe)).drop("_cell"))
    if allowed is not None:
        ids = allowed.select(
            F.col(allowed.columns[0]).alias(id_col)).distinct()
        cand = cand.join(ids, id_col, "semi")
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def ivf_knn_join(
    queries: DataFrame,
    collection: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Batched IVF k-NN JOIN: every query row gets its top-k collection
    neighbors while touching only its ``n_probe`` inverted lists — the
    all-queries-at-once serving path beside ``ivf_topk_from_index``'s
    single-query one.

    Each side's cell ids are scan-side codegen projections (the query side
    gets its n_probe nearest cells via one sorted struct array — no extra
    pass, no shuffle); candidates come from an EQUI-JOIN on cell, so the
    pair count is ~|Q|·|C|·n_probe/n_centroids, never the |Q|·|C| cross
    join q224 permits itself on a broadcast sample. Winners by exact ppm
    cosine with id tie-break (the q193/q203/q224 convention). At 100 TB
    the collection side is the persisted cell-partitioned index and the
    join co-locates on the cell key.

    Returns (q_id, n_id, sim_ppm, rank<=k). Approximate exactly like
    ivf_topk: a true neighbor outside the probed cells is missed —
    recall/parity pinned in tests/test_cluster.py.
    """
    cents = np.asarray(centroids, dtype=np.float64).copy()
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    c = (ivf_assign(collection, cents, vec_col)
         .select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("ce"),
                 F.sqrt(_norm2(vec_col)).alias("cm"), "_cell")
         .filter(F.col("cm") > 0))
    return _knn_join_on_cells(queries, c, cents, k, n_probe, vec_col,
                              id_col, exclude_self)


def ivf_knn_join_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """``ivf_knn_join`` against a PERSISTED index: the collection side is
    the cell-partitioned lists table as written — its cell assignment is
    never recomputed, and the cell equi-join reads each query batch's
    probed lists only: the batch's distinct probed cells (bounded by
    n_centroids — one tiny query-side job) become a STATIC partition
    filter on the lists scan, so non-probed directories are never opened
    regardless of whether runtime pruning fires. The serving path for a
    stream of query vectors (S50): stateless per row, so foreachBatch
    over this function is batch ≡ stream by construction.

    ``allowed`` (first column taken as the id) PRE-filters the lists side
    before the cell equi-join — the filtered-serving shape (q350) on the
    batched path: the semi join commutes with cell pruning, each query's
    k-cut applies to allowed candidates only, and because the filter is a
    per-row predicate the stream ≡ batch identity is preserved exactly."""
    cents = load_ivf_centroids(spark, path)
    probed = _collect_probed_cells(queries, cents, vec_col, n_probe)
    lists = (read_ivf_lists(spark, path, vec_col)
             .filter(F.col("_cell").isin(probed))
             .select(F.col(id_col).alias("n_id"),
                     F.col(vec_col).alias("ce"),
                     F.sqrt(_norm2(vec_col)).alias("cm"),
                     F.col("_cell").cast("int").alias("_cell"))
             .filter(F.col("cm") > 0))
    if allowed is not None:
        allowed_ids = allowed.select(
            F.col(allowed.columns[0]).alias("n_id")).distinct()
        lists = lists.join(allowed_ids, "n_id", "semi")
    return _knn_join_on_cells(queries, lists, cents, k, n_probe, vec_col,
                              id_col, exclude_self)


def save_ivf_pq_index(
    vectors: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """IVF-PQ: the persisted index stores PQ CODES in its inverted lists —
    m smallints + one exact norm per row instead of the vector itself, the
    layout that makes a 100 TB embedding index fit hot storage. Cell
    assignment happens on the FULL-PRECISION vectors (like the int8 path);
    the codebook model rides beside the centroid model at
    ``<path>/pq_books``. Serving reranks against the BASE table, which is
    the other half of the design: the index carries only what ADC needs.
    Runs under the same ``REBUILDING`` sentinel as ``save_ivf_index`` —
    readers refuse the centroids/books/lists mixed-model window."""
    # validate BEFORE marking (bad shapes must not brick a healthy index)
    cents = np.asarray(centroids, dtype=np.float64).copy()
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    m, ks, dsub = codebooks.shape
    spark = vectors.sparkSession
    model = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell INT, centroid ARRAY<DOUBLE>",
    )
    _mark_rebuilding(path)
    # this rebuild defines the index as PQ-format: stale full-precision
    # artifacts from a previous save_ivf_index would otherwise serve
    # against the new model after the sentinel clears
    shutil.rmtree(os.path.join(path, "lists"), ignore_errors=True)
    shutil.rmtree(os.path.join(path, "quant"), ignore_errors=True)
    # repartition(1) not coalesce(1): see save_ivf_index (r14 tiny-write fix)
    model.repartition(1).write.mode("overwrite").parquet(f"{path}/centroids")
    books = spark.createDataFrame(
        [(j, c, [float(x) for x in codebooks[j, c]])
         for j in range(m) for c in range(ks)],
        "j INT, c INT, sub ARRAY<DOUBLE>",
    )
    books.repartition(1).write.mode("overwrite").parquet(f"{path}/pq_books")
    assigned = ivf_assign(vectors, cents, vec_col)
    codes = pq_encode(assigned, codebooks, vec_col, id_col, keep=("_cell",))
    (codes.write.partitionBy("_cell").mode("overwrite")
     .parquet(f"{path}/pq_lists"))
    # pointer removal LAST (crash symmetry with save_ivf_index): a
    # mid-rebuild crash leaves the old pointer on disk for inspection;
    # the sentinel already blocks every reader until a clean completion
    ingest_ptr = os.path.join(path, "INGEST")
    if os.path.exists(ingest_ptr):
        os.remove(ingest_ptr)
    _clear_rebuilding(path)


def load_pq_codebooks(spark, path: str) -> np.ndarray:
    """The index's PQ codebook model, (m, ks, dsub)-shaped (driver-side,
    model-sized — m·ks rows)."""
    _check_not_rebuilding(path)
    rows = spark.read.parquet(f"{path}/pq_books").orderBy("j", "c").collect()
    m = max(r.j for r in rows) + 1
    ks = max(r.c for r in rows) + 1
    dsub = len(rows[0].sub)
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for r in rows:
        books[r.j, r.c] = list(r.sub)
    return books


def read_ivf_pq_lists(spark, path: str) -> DataFrame:
    """The index's PQ CODE lists AS COMMITTED: the build-time
    ``pq_lists`` base plus any streamed-in delta directories
    (``StreamingIvfPqIngest``'s INGEST pointer — same wire format and
    crash story as the full-precision tier, the machinery is
    format-agnostic). Every committed path is ``partitionBy("_cell")``,
    so a probe's cell filter prunes base and deltas alike."""
    _check_not_rebuilding(path)
    ptr = os.path.join(path, "INGEST")
    out = None
    if os.path.exists(ptr):
        with open(ptr) as f:
            lines = f.read().strip().splitlines()
        # zero-byte pointer = "no committed ingest" (read_ivf_lists
        # contract): fall through to the build-time base
        paths = [p for p in lines[0].split("|") if p] if lines else []
        if paths:
            out = spark.read.parquet(paths[0])
            for p in paths[1:]:
                out = out.unionByName(spark.read.parquet(p))
    if out is None:
        out = spark.read.parquet(f"{path}/pq_lists")
    return out


def ivf_pq_topk_from_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    rerank: int | None = None,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Serve from a persisted IVF-PQ index: rank cells against the stored
    centroid model (driver-side), read ONLY the probed cells' code lists
    (a partition filter over rows that are ~10× narrower than vectors),
    ADC-score them, and — when ``vectors`` is given — exact-rerank the top
    ``rerank`` ids against the base table. With a full-size rerank budget
    this equals ``ivf_topk`` over the same centroids exactly (pinned
    in-test); smaller budgets trade recall for base-table lookups.

    ``allowed`` (any one-column id frame) pre-filters: the semi join runs
    against the CODE lists before ADC scoring — the same commutation as
    ``ivf_topk_filtered`` (cell pruning and the allowed-id filter are both
    set intersections), so the ADC top-k and the rerank budget are spent
    on allowed candidates only. Post-filtering the ADC candidate list
    would starve under selective filters exactly like q350's demonstrated
    brute-force failure mode."""
    cents = load_ivf_centroids(spark, path)
    books = load_pq_codebooks(spark, path)
    probe = _probe_cells(cents, query_vec, n_probe)
    codes = (read_ivf_pq_lists(spark, path)
             .filter(F.col("_cell").isin(probe)).drop("_cell"))
    return pq_adc_topk(codes, books, query_vec, k, rerank, vectors,
                       vec_col, id_col, allowed=allowed)


def pq_decode_expr(codebooks: np.ndarray, code_col: str = "_pq") -> Column:
    """Reconstruct the approximate vector from PQ codes, scan-side: one
    ``element_at`` into a literal (ks × dsub) table per subspace, arrays
    concatenated — no Python, no shuffle. dot(query, reconstruction) equals
    the ADC lookup-table sum by construction, so batched joins can score
    candidates from codes alone."""
    m, ks, dsub = codebooks.shape
    parts = []
    for j in range(m):
        table = F.array(*[
            F.array(*[F.lit(float(x)) for x in codebooks[j, c]])
            for c in range(ks)
        ])
        parts.append(
            F.element_at(table, F.element_at(code_col, j + 1).cast("int") + 1))
    return F.concat(*parts)


def ivf_pq_knn_join_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    rerank: int | None = None,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Batched k-NN join against a persisted IVF-PQ index: the collection
    side is the cell-partitioned CODE lists (~10× narrower rows than
    vectors — the shuffle that dominates a 100 TB batched join moves codes,
    never embeddings), candidates come from the same cell equi-join as
    ``ivf_knn_join``, and each pair is scored via scan-side PQ
    reconstruction (``pq_decode_expr`` — the batched form of ADC).

    Without ``vectors``: returns (q_id, n_id, sim_ppm approx, rank ≤ k).
    With ``vectors``: keeps the top ``rerank`` (default 5k) candidates per
    query, joins ONLY those ids back to the base table, and reranks with
    exact cosine — with a full-size budget this is byte-identical to
    ``ivf_knn_join`` over the same centroids (pinned in-test).

    ``allowed`` pre-filters the code lists before the cell join (the
    filtered-serving shape, same commutation as the single-query path),
    so per-query k-cuts and the rerank budget spend on allowed ids only."""
    from pyspark.sql import Window

    cents = load_ivf_centroids(spark, path)
    books = load_pq_codebooks(spark, path)
    probed = _collect_probed_cells(queries, cents, vec_col, n_probe)
    lists = (read_ivf_pq_lists(spark, path)
             .filter(F.col("_cell").isin(probed))
             .select(F.col(id_col).alias("n_id"), "_pq", "_vnorm",
                     F.col("_cell").cast("int").alias("_cell"))
             .filter(F.col("_vnorm") > 0))
    if allowed is not None:
        allowed_ids = allowed.select(
            F.col(allowed.columns[0]).alias("n_id")).distinct()
        lists = lists.join(allowed_ids, "n_id", "semi")

    vm = F.sqrt(_norm2(vec_col))
    probe_cells = _probe_cells_expr(cents, vec_col, n_probe)
    q = (queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("qe"),
            vm.alias("qm"), F.explode(probe_cells).alias("_cell"))
         .filter(F.col("qm") > 0))

    pairs = q.join(lists, "_cell")
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("n_id"))
    approx = _dot("qe", pq_decode_expr(books)) / (F.col("qm") * F.col("_vnorm"))
    scored = pairs.select(
        "q_id", "qe", "qm", "n_id",
        (approx.cast("decimal(18,6)") * 1_000_000).cast("bigint")
        .alias("sim_ppm"))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_ppm"), F.asc("n_id"))
    if vectors is None:
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("q_id", "n_id", "sim_ppm", "rank"))
    cand = (scored.withColumn("_arank", F.row_number().over(w))
            .filter(F.col("_arank") <= (rerank or 5 * k))
            .select("q_id", "qe", "qm", "n_id"))
    base = (vectors.select(F.col(id_col).alias("n_id"),
                           F.col(vec_col).alias("ne"),
                           F.sqrt(_norm2(vec_col)).alias("nm"))
            .filter(F.col("nm") > 0))
    exact = _dot("qe", "ne") / (F.col("qm") * F.col("nm"))
    rescored = cand.join(base, "n_id").select(
        "q_id", "n_id",
        (exact.cast("decimal(18,6)") * 1_000_000).cast("bigint")
        .alias("sim_ppm"))
    return (rescored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def knn_join(
    queries: DataFrame,
    collection: DataFrame,
    k: int = 5,
    centroids: np.ndarray | None = None,
    n_probe: int = 4,
    brute_threshold: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    collection_count: int | None = None,
) -> DataFrame:
    """Cost-routed k-NN join. Below ``brute_threshold`` collection rows the
    EXACT brute path runs (broadcast the collection, all-pairs window —
    the measured winner under ~10⁴ vectors, SCALE.md round-11 table);
    above it the IVF cell equi-join (requires ``centroids``), which
    generates ~n_probe/n_centroids of the pairs and is the only feasible
    shape once no side fits in one executor. Both paths share the ppm
    cosine + id tie-break contract and the (q_id, n_id, sim_ppm, rank)
    schema; the router prefers exact when affordable, approximate when
    exact stops scaling — pass ``collection_count`` when the size is
    already known to skip the count job."""
    n = collection_count if collection_count is not None else collection.count()
    if n <= brute_threshold:
        from pyspark.sql import Window

        c = (collection.select(
                F.col(id_col).alias("n_id"), F.col(vec_col).alias("ce"),
                F.sqrt(_norm2(vec_col)).alias("cm"))
             .filter(F.col("cm") > 0))
        q = (queries.select(
                F.col(id_col).alias("q_id"), F.col(vec_col).alias("qe"),
                F.sqrt(_norm2(vec_col)).alias("qm"))
             .filter(F.col("qm") > 0))
        cond = (F.col("q_id") != F.col("n_id")) if exclude_self else F.lit(True)
        sim = _dot("qe", "ce") / (F.col("qm") * F.col("cm"))
        pairs = q.join(F.broadcast(c), cond).select(
            "q_id", "n_id",
            (sim.cast("decimal(18,6)") * 1_000_000).cast("bigint")
            .alias("sim_ppm"))
        w = Window.partitionBy("q_id").orderBy(F.desc("sim_ppm"),
                                               F.asc("n_id"))
        return (pairs.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))
    if centroids is None:
        raise ValueError(
            f"collection has {n} rows (> brute_threshold={brute_threshold}):"
            " the cell-join path needs trained centroids (kmeans_fit)")
    return ivf_knn_join(queries, collection, centroids, k, n_probe,
                        vec_col, id_col, exclude_self)


def _probe_cells_expr(cents: np.ndarray, vec_col: str,
                      n_probe: int) -> Column:
    """Per-row top-``n_probe`` probe cells as an array column — the
    distributed twin of the driver-side ``_probe_cells``. Sort asc on
    (score, -cell), reverse → desc score, lower cell on ties: the same
    deterministic argmax order ``ivf_assign`` uses, extended to top-n.
    ``cents`` must be row-normalized."""
    vm = F.sqrt(_norm2(vec_col))
    choices = []
    for cid in range(len(cents)):
        lit_c = F.array(*[F.lit(float(x)) for x in cents[cid]])
        score = _dot(F.col(vec_col), lit_c) / vm
        choices.append(F.struct(score.alias("s"), F.lit(-cid).alias("nc")))
    return F.transform(
        F.slice(F.reverse(F.array_sort(F.array(*choices))), 1, n_probe),
        lambda st: -st.getField("nc"))


def _collect_probed_cells(queries: DataFrame, cents: np.ndarray,
                          vec_col: str, n_probe: int) -> list[int]:
    """The distinct cells ANY query in the batch probes — bounded by
    n_centroids (model-sized), collected in one tiny job so a persisted
    index's list scan can be statically partition-filtered to exactly
    those directories before the cell equi-join."""
    rows = (queries
            .select(F.explode(_probe_cells_expr(cents, vec_col, n_probe))
                    .alias("_cell"))
            .distinct().collect())
    return [int(r._cell) for r in rows]


def _knn_join_on_cells(
    queries: DataFrame,
    collection_assigned: DataFrame,
    cents: np.ndarray,
    k: int,
    n_probe: int,
    vec_col: str,
    id_col: str,
    exclude_self: bool,
) -> DataFrame:
    """Shared core: probe-cell explode on the query side, cell equi-join
    against a pre-assigned collection (n_id, ce, cm, _cell), ppm-cosine
    window top-k. ``cents`` must be row-normalized."""
    vm = F.sqrt(_norm2(vec_col))
    probe_cells = _probe_cells_expr(cents, vec_col, n_probe)

    q = (queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("qe"),
            vm.alias("qm"), F.explode(probe_cells).alias("_cell"))
         .filter(F.col("qm") > 0))
    pairs = q.join(collection_assigned, "_cell")
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("n_id"))
    sim = _dot("qe", "ce") / (F.col("qm") * F.col("cm"))
    # each collection vector lives in exactly one cell and (q_id, _cell)
    # rows are distinct, so no candidate pair can appear twice
    scored = pairs.select(
        "q_id", "n_id",
        (sim.cast("decimal(18,6)") * 1_000_000).cast("bigint")
        .alias("sim_ppm"))

    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("sim_ppm"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def srp_ann_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: union of LSH buckets matching the query's signature
    across ``tables`` hash tables, then exact cosine within candidates."""
    qv = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(len(query_vec), bits, tables, seed)

    # The query's per-table signatures are driver-side model math; the
    # collection's signatures come from ONE Arrow pass (bit-identical to
    # the per-table fold — srp_signatures docstring). r13: the old form
    # unioned `tables` full scans, each filtering on its own 512-term
    # interpreted signature expression; now one scan computes all table
    # signatures and a vector is a candidate iff ANY table matches —
    # the identical candidate set (dropDuplicates kept: ids are unique in
    # every corpus here, but the old union+dedup tolerated dup ids and
    # this stays faithful to it).
    qsigs = [
        int(sum((1 << j) for j in range(bits) if planes[t, j] @ qv >= 0))
        for t in range(tables)
    ]
    match_any = F.exists(
        F.zip_with(
            srp_signatures(vec_col, planes),
            F.array(*[F.lit(s).cast("bigint") for s in qsigs]),
            lambda s, q: s == q,
        ),
        lambda x: x,
    )
    cand = vectors.filter(match_any).dropDuplicates([id_col])
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


# --------------------------------------------------------------------------
# Label-centroid analytics: per-class mean vectors and distance-to-centroid
# outlier scoring. Cross-row float sums are order-dependent, so both run on
# exact DECIMAL accumulators (associative -> partial-agg order irrelevant),
# and the centroid is rounded to 4dp BEFORE the distance pass so every
# engine/run measures against bit-identical centroids.

def label_centroids(
    vectors: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-(label, dim) exact-mean centroid, 4dp. Plan: posexplode (zero
    shuffle, partition-local) + one hash agg on (label, dim) — the classic
    two-phase map-side-combine shape; 100 TB-safe because cardinality out is
    labels x dims, not rows."""
    return (
        vectors.select(F.col(label_col).alias("label"),
                       F.posexplode(vec_col).alias("pos", "x"))
        .select("label", (F.col("pos") + 1).alias("dim"),
                F.col("x").cast("double").alias("x"))
        .groupBy("label", "dim")
        .agg(
            F.round(
                (F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count("*"))
                .cast("decimal(18,6)"), 4
            ).cast("double").alias("centroid")
        )
    )


def centroid_outliers(
    vectors: DataFrame, k: int = 20,
    label_col: str = "label", vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Top-k vectors farthest from their own label centroid (Euclidean).

    The squared residual per dimension is rounded into DECIMAL(28,12) before
    the per-vector sum, keeping the reduce associative and the result
    engine-identical; final distance is 4dp. At scale the centroid side is
    labels x dims (tiny) and broadcasts."""
    cent = label_centroids(vectors, label_col, vec_col)
    expl = (
        vectors.select(F.col(id_col).alias("vec_id"),
                       F.col(label_col).alias("label"),
                       F.posexplode(vec_col).alias("pos", "x"))
        .select("vec_id", "label", (F.col("pos") + 1).alias("dim"),
                F.col("x").cast("double").alias("x"))
    )
    resid = ((F.col("x") - F.col("centroid")) * (F.col("x") - F.col("centroid")))
    return (
        expl.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sum(resid.cast("decimal(28,12)")).alias("ss"))
        .select("vec_id", "label",
                F.round(F.sqrt(F.col("ss").cast("double")).cast("decimal(18,6)"), 4)
                .cast("double").alias("dist"))
        .orderBy(F.desc("dist"), "vec_id")
        .limit(k)
    )


# --------------------------------------------------------------------------
# Distributed Lloyd's k-means (iterative-algorithm class; trains IVF cells).
# Determinism discipline: init = first k vectors in md5(id) order (data-
# dependent but engine/run/partitioning invariant); per-iteration means and
# inertia accumulate in exact DECIMAL, so no result depends on partial-agg
# order; assignment argmin uses greatest-of-structs with an id tiebreak.

def _argmin_cell(cents: np.ndarray, vec_col: str) -> Column:
    """argmin_c ||v - c||² as a codegen expression: maximizes 2·v·c - |c|²
    (the |v|² term is constant per row); ties break to the LOWER cell id."""
    choices = []
    for cid, c in enumerate(cents):
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        score = F.lit(2.0) * _dot(F.col(vec_col), lit_c) - F.lit(float(c @ c))
        choices.append(F.struct(score.alias("s"), F.lit(-cid).alias("nc")))
    return -F.greatest(*choices).getField("nc")


def _best_score(cents: np.ndarray, vec_col: str) -> Column:
    return F.greatest(*[
        F.struct(
            (F.lit(2.0) * _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
             - F.lit(float(c @ c))).alias("s"),
            F.lit(-cid).alias("nc"),
        )
        for cid, c in enumerate(cents)
    ]).getField("s")


def kmeans_fit(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, list[float]]:
    """Lloyd's k-means over a distributed vector table.

    Each iteration is one Spark job: assignment is a pure scan-side
    projection (k unrolled dot products in codegen, no shuffle), and the
    mean update is a single (cell, dim) aggregation — k·dim rows collected
    to the driver, which is the MODEL, not the data, so the collect stays
    O(k·dim) regardless of table size. Empty cells keep their previous
    centroid. Returns (centroids, per-iteration inertia); inertia is
    non-increasing by construction of Lloyd's algorithm.
    """
    from decimal import Decimal

    first = vectors.select(
        F.col(id_col), F.col(vec_col)
    ).orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)).limit(k).collect()
    cents = np.asarray([[float(x) for x in r[1]] for r in first], dtype=np.float64)

    inertia: list[float] = []
    for _ in range(iters):
        cell = _argmin_cell(cents, vec_col)
        # two selects: a generator (posexplode) in the same projection as the
        # greatest-of-structs argmin strips the struct field aliases
        # (FIELD_NOT_FOUND `nc`) — keep the argmin in its own projection
        stats = (
            vectors.select(cell.alias("_cell"), F.col(vec_col))
            .select("_cell", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("_cell", "pos")
            .agg(F.sum(F.col("x").cast("decimal(28,12)")).alias("s"),
                 F.count("*").alias("n"))
            .collect()
        )
        new = cents.copy()
        for r in stats:
            new[r._cell, r.pos] = float(Decimal(r.s) / r.n)
        cents = new

        # inertia under the JUST-UPDATED centroids: per-row dist² rounded to
        # an exact decimal before the sum, so the total is order-independent
        d2 = (_norm2(vec_col) - _best_score(cents, vec_col)).cast("decimal(28,10)")
        tot = vectors.agg(F.sum(d2).alias("i")).collect()[0].i
        inertia.append(float(tot))
    return cents, inertia


# --------------------------------------------------------------------------
# Scalar (per-dimension) int8 quantization: 4x storage vs float32 for the
# 100 TB embedding store; ANN probes run on dequantized values with bounded
# error (property-tested: cosine distortion < 1e-3 at 8 bits).

def embedding_ranges(vectors: DataFrame, vec_col: str = "embedding") -> tuple:
    """Per-dimension (lo, hi) over the collection — one posexplode
    aggregation, collecting only 2·dim floats (the codebook, not the data)."""
    rows = (
        vectors.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    dim = max(r.pos for r in rows) + 1
    lo = [0.0] * dim
    hi = [0.0] * dim
    for r in rows:
        lo[r.pos], hi[r.pos] = float(r.lo), float(r.hi)
    return lo, hi


def quantize_embeddings(vectors: DataFrame, lo: list, hi: list,
                        vec_col: str = "embedding", bits: int = 8) -> DataFrame:
    """Replace ``vec_col`` with int codes (0..2^bits-1) per dimension —
    pure zip_with against broadcast codebook literals, no Python."""
    levels = (1 << bits) - 1
    lit_lo = F.array(*[F.lit(v) for v in lo])
    lit_w = F.array(*[F.lit(max(h - l, 1e-30) / levels) for l, h in zip(lo, hi)])
    centered = F.zip_with(F.col(vec_col), lit_lo,
                          lambda x, l: x.cast("double") - l)
    codes = F.zip_with(centered, lit_w,
                       lambda c, w: F.round(c / w).cast("int"))
    return vectors.withColumn(vec_col, codes)


def dequantize_embeddings(vectors: DataFrame, lo: list, hi: list,
                          vec_col: str = "embedding", bits: int = 8) -> DataFrame:
    """Inverse of ``quantize_embeddings``: codes -> float midpoint values."""
    levels = (1 << bits) - 1
    lit_lo = F.array(*[F.lit(v) for v in lo])
    lit_w = F.array(*[F.lit(max(h - l, 1e-30) / levels) for l, h in zip(lo, hi)])
    scaled = F.zip_with(F.col(vec_col), lit_w,
                        lambda q, w: q.cast("double") * w)
    vals = F.zip_with(scaled, lit_lo, lambda s, l: s + l)
    return vectors.withColumn(vec_col, vals)


# -- Product quantization (PQ): the aggressive embedding-storage lever -----
#
# Scalar int8 quantization (above) keeps all d values per vector (4× saving
# vs float32); PQ keeps m CODES — each subspace of dsub = d/m dims is
# replaced by the id of its nearest codebook entry, so a 64-dim float32
# vector (256 B) becomes m=8 smallint codes plus one exact norm (~24 B,
# >10×). Serving is ADC (asymmetric distance computation): the query builds
# an (m, ks) lookup table of subspace dot products ONCE (driver-side model
# math), each stored vector's approximate dot is then m array lookups — a
# scan-side codegen projection, no Python, no shuffle — and the exact
# rerank touches only the top ``rerank`` candidates (point lookups into the
# base vector table at 100 TB). Codebooks are fitted on a deterministic
# sample, FAISS-style: the training set is O(sample) rows — model fitting,
# never a data-scale job.

def pq_fit(
    vectors: DataFrame,
    m: int = 8,
    ks: int = 16,
    iters: int = 5,
    sample: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Per-subspace Lloyd's k-means codebooks, shape (m, ks, d/m).

    The training sample is the first ``sample`` rows in md5(id) order (the
    ``kmeans_fit`` init convention — deterministic, order-independent of
    file layout); init per subspace is its first ``ks`` sample rows. Empty
    cells keep their previous centroid, mirroring ``kmeans_fit``."""
    rows = (vectors.select(F.col(id_col), F.col(vec_col))
            .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(sample).collect())
    X = np.asarray([[float(x) for x in r[1]] for r in rows], dtype=np.float64)
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    if n < ks:
        raise ValueError(f"sample of {n} rows cannot seed ks={ks} entries")
    dsub = d // m
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub:(j + 1) * dsub]
        C = S[:ks].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(ks):
                if (a == c).any():
                    C[c] = S[a == c].mean(axis=0)
        books[j] = C
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: tuple = (),
    method: str = "auto",
) -> DataFrame:
    """The persistable PQ code table: (id, _pq array<smallint> of length m,
    _vnorm double — the exact vector norm, kept so ADC can serve COSINE).

    Each code is argmin_c ||v_j − C_jc||², computed scan-side as
    argmax_c (v_j·C_jc − |C_jc|²/2) with a deterministic tie-break (lower
    code id). Two routes, both shuffle-free scan projections:

    - ``expr``: greatest-of-structs per subspace (the ``ivf_assign``
      pattern) — whole-stage codegen, no Python. Right for small
      codebooks; at production sizes (ks=256) the unrolled expression is
      m·ks structs × dsub-term dot products, which blows the JIT method
      budget and falls back to interpreted trees (the ``srp_signature``
      lesson above).
    - ``arrow``: mapInPandas batches through one numpy GEMM per subspace
      (V_j @ C_jᵀ) — vectorized-irreducible for large ks, the same
      justification as the package's other Arrow sites.

    ``auto`` routes on m·ks (≤ 256 → expr). Codes agree between routes
    (pinned in-test); prefer expr when both fit."""
    m, ks, dsub = codebooks.shape
    if method == "auto":
        method = "expr" if m * ks <= 256 else "arrow"
    if method == "arrow":
        return _pq_encode_arrow(vectors, codebooks, vec_col, id_col, keep)
    codes = []
    for j in range(m):
        sub = F.slice(F.col(vec_col), j * dsub + 1, dsub)
        choices = []
        for c in range(ks):
            cc = codebooks[j, c]
            lit = F.array(*[F.lit(float(x)) for x in cc])
            score = _dot(sub, lit) - F.lit(float((cc * cc).sum() / 2.0))
            choices.append(F.struct(score.alias("s"), F.lit(-c).alias("nc")))
        codes.append((-F.greatest(*choices).getField("nc")).cast("smallint"))
    return vectors.select(
        F.col(id_col),
        F.array(*codes).alias("_pq"),
        F.sqrt(_norm2(vec_col)).alias("_vnorm"),
        *[F.col(c) for c in keep],
    )


def _pq_encode_arrow(
    vectors: DataFrame,
    codebooks: np.ndarray,
    vec_col: str,
    id_col: str,
    keep: tuple,
) -> DataFrame:
    """Arrow route for ``pq_encode``: one numpy GEMM per subspace per
    batch. Output schema and tie-break (np.argmax keeps the FIRST maximum
    — lower code id) match the expr route exactly."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, ShortType, StructField, StructType,
    )

    m, ks, dsub = codebooks.shape
    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    half = (books ** 2).sum(axis=2) / 2.0  # (m, ks)
    in_fields = {f.name: f for f in vectors.schema.fields}
    out = StructType(
        [in_fields[id_col],
         StructField("_pq", ArrayType(ShortType())),
         StructField("_vnorm", DoubleType())]
        + [in_fields[c] for c in keep])

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            cols = {}
            codes = np.empty((len(pdf), m), dtype=np.int16)
            for j in range(m):
                sub = V[:, j * dsub:(j + 1) * dsub]
                codes[:, j] = np.argmax(sub @ books[j].T - half[j], axis=1)
            cols[id_col] = pdf[id_col]
            cols["_pq"] = list(codes)
            cols["_vnorm"] = np.sqrt((V * V).sum(axis=1))
            for c in keep:
                cols[c] = pdf[c]
            yield pd.DataFrame(cols)

    return vectors.mapInPandas(encode, out)


def pq_adc_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    rerank: int | None = None,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k over the PQ code table via ADC.

    The query's (m, ks) lookup table is built driver-side; each row's
    approximate dot is m ``element_at`` lookups summed in codegen, and
    approximate cosine divides by the stored exact norm. Without
    ``vectors``: returns (id, sim_adc) top-k — a zero-shuffle
    TakeOrderedAndProject over the (tiny) code table. With ``vectors``:
    two-stage serving — ADC keeps the top ``rerank`` (default 5k)
    candidate ids, the base table is joined semi-style for those ids only,
    and exact ``cosine_topk`` reranks, returning its (id, sim) contract.

    ``allowed`` (first column taken as the id) PRE-filters the code table
    before scoring: the k-cut and the rerank budget then apply to allowed
    candidates only, so a selective filter can never starve the answer
    while matches exist in the scanned cells."""
    m, ks, dsub = codebooks.shape
    qv = np.asarray(query_vec, dtype=np.float64)
    if qv.shape[0] != m * dsub:
        raise ValueError(f"query dim {qv.shape[0]} != {m * dsub}")
    qn = float(np.linalg.norm(qv))
    if allowed is not None:
        allowed_ids = allowed.select(
            F.col(allowed.columns[0]).alias(id_col)).distinct()
        codes = codes.join(allowed_ids, id_col, "semi")
    lut = np.array([codebooks[j] @ qv[j * dsub:(j + 1) * dsub]
                    for j in range(m)])  # (m, ks)
    adc = None
    for j in range(m):
        lit = F.array(*[F.lit(float(x)) for x in lut[j]])
        term = F.element_at(lit, F.element_at("_pq", j + 1).cast("int") + 1)
        adc = term if adc is None else adc + term
    sim = adc / (F.col("_vnorm") * F.lit(qn))
    scored = (codes.filter(F.col("_vnorm") > 0)
              .select(F.col(id_col),
                      F.round(sim.cast("decimal(18,6)"), 4).cast("double")
                      .alias("sim_adc")))
    if vectors is None:
        return scored.orderBy(F.desc("sim_adc"), F.asc(id_col)).limit(k)
    cand_ids = (scored.orderBy(F.desc("sim_adc"), F.asc(id_col))
                .limit(rerank or 5 * k).select(id_col))
    cand = vectors.join(cand_ids, id_col, "left_semi")
    return cosine_topk(cand, [float(x) for x in qv], k, vec_col, id_col)


def embedding_dim_stats(
    vectors: DataFrame,
    scale: int = 10_000,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension corpus statistics (count / mean / min / max) at
    1/``scale`` resolution — the model-sized profile a normalization or
    quantization step consumes (output is dim rows, not corpus rows).

    Cross-engine determinism is by construction: each float is quantized
    with ``ROUND(x * scale)`` into a BIGINT first, and every aggregate
    runs on integers (exact, associative). The rounding is boundary-free:
    a float32 value times 10^k can never be exactly n + 0.5 (that would
    require the non-dyadic rational (2n+1)/(2*10^k) to be a float), so
    half-up vs half-even tie rules can never disagree. Summing raw
    doubles instead would be partial-agg-order dependent, and casting
    them to DECIMAL rounds Spark's shortest-repr digits vs DuckDB's exact
    binary digits — the probed q-family divergence this avoids.

    The mean stays exact end-to-end too: mean rounded to 1/scale
    resolution is round_half(SUM(q)/n)/scale, and round-half-away of an
    integer quotient is pure integer arithmetic —
    ``(2*|S| + n) DIV (2*n)`` with the sign reapplied — so no
    double OR decimal division (whose result-scale rounding differs
    between engines) ever touches the value; the final cast to DOUBLE is
    exact for any |mean*scale| < 2^53.

    Plan/scale: posexplode + one hash-agg keyed on (dim) — map-side
    partial aggregation makes the shuffle O(dims x partitions).
    """
    scaled = F.round(F.col("x").cast("double") * scale).cast("bigint")
    mean_int = F.expr(
        "CASE WHEN SUM(q) >= 0"
        "  THEN (2 * SUM(q) + COUNT(*)) DIV (2 * COUNT(*))"
        "  ELSE -((2 * -SUM(q) + COUNT(*)) DIV (2 * COUNT(*))) END"
    )
    return (
        vectors.select(F.posexplode(vec_col).alias("pos", "x"))
        .select("pos", scaled.alias("q"))
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            (mean_int.cast("double") / scale).alias("mean_q"),
            (F.min("q").cast("double") / scale).alias("min_q"),
            (F.max("q").cast("double") / scale).alias("max_q"),
        )
        .orderBy("pos")
    )


def centroid_separation(
    vectors: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Cluster-separation diagnostics: pairwise cosine similarity between
    every pair of label centroids. High inter-centroid cosine flags label
    sets that an embedding-space router or semantic-dedup pass cannot
    separate. Built on the 4dp-pinned exact-decimal centroids
    (``label_centroids``), with per-dim products accumulated in
    DECIMAL(28,12) so the dot/norm sums are aggregation-order-exact.

    Plan/scale: the centroid frame is model-sized (labels x dims) — the
    pairwise self-join and aggregation never touch the corpus; the only
    corpus-scale work is the one (label, dim) agg inside label_centroids.
    """
    cent = label_centroids(vectors, label_col=label_col, vec_col=vec_col)
    a = cent.select(F.col("label").alias("la"), "dim",
                    F.col("centroid").alias("ca"))
    b = cent.select(F.col("label").alias("lb"), "dim",
                    F.col("centroid").alias("cb"))
    dec = "decimal(28,12)"
    agg = (
        a.join(b, "dim")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum((F.col("ca") * F.col("cb")).cast(dec)).alias("_dot"),
            F.sum((F.col("ca") * F.col("ca")).cast(dec)).alias("_na"),
            F.sum((F.col("cb") * F.col("cb")).cast(dec)).alias("_nb"),
        )
    )
    cos = (F.col("_dot").cast("double")
           / (F.sqrt(F.col("_na").cast("double"))
              * F.sqrt(F.col("_nb").cast("double"))))
    return agg.select(
        "la", "lb",
        F.round(cos.cast("decimal(18,6)"), 4).cast("double").alias("cos"),
    )


def embedding_covariance(
    vectors: DataFrame,
    dims: int = 16,
    scale: int = 10_000,
    vec_col: str = "embedding",
) -> DataFrame:
    """Upper-triangle covariance matrix of the first ``dims`` embedding
    dimensions, integer-exact until the final division — the input to a
    PCA/whitening step of an embedding pipeline.

    Uses the q125 quantization (ROUND(x·scale) → BIGINT, boundary-free for
    float32 inputs), then pure integer sufficient statistics per (i, j):
    cov_num = n·Σqiqj − Σqi·Σqj. Pair expansion is two chained explodes
    over index sequences — zero shuffle, dims·(dims−1)/2 rows per vector —
    and the aggregation is one map-side-combinable groupBy on (i, j), so
    the shuffle carries O(dims² × partitions) rows at any corpus size.
    BIGINT bounds: |q| ≤ scale·|x|; Σqiqj ≤ n·(scale·|x|)² — at 1e12 rows
    with |x| ≤ 1 that is 1e20, so promote the two SUMs to DECIMAL(38,0)
    beyond ~9e10 rows (same rule as elsewhere in this module).

    Output: (i, j, n, cov_q) with cov_q in quantized units² (divide by
    scale² for raw units), 4 dp.
    """
    q = F.expr(
        f"transform(slice({vec_col}, 1, {dims}),"
        f" x -> CAST(ROUND(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
    )
    e = vectors.select(q.alias("q"))
    pp = (
        e.select("q", F.expr(f"explode(sequence(0, {dims - 2}))").alias("i"))
        .select("q", "i", F.expr(f"explode(sequence(i + 1, {dims - 1}))").alias("j"))
    )
    s = pp.groupBy("i", "j").agg(
        F.count("*").alias("n"),
        F.expr("SUM(element_at(q, i + 1) * element_at(q, j + 1))").alias("sxy"),
        F.expr("SUM(element_at(q, i + 1))").alias("sx"),
        F.expr("SUM(element_at(q, j + 1))").alias("sy"),
    )
    return s.select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        "n",
        F.round(
            (F.expr("CAST(n * sxy - sx * sy AS DOUBLE)") / F.col("n") / F.col("n"))
            .cast("decimal(18,6)"), 4
        ).cast("double").alias("cov_q"),
    )


def hard_negatives(
    vectors: DataFrame,
    queries: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query vector
    the single most-similar vector with a DIFFERENT label — the negatives
    that actually move a contrastive loss, versus uniform sampling which
    mostly drafts easy negatives.

    Deterministic winner: per query the max over struct(sim, -candidate_id)
    — highest r4-rounded cosine, ties to the LOWEST candidate id — as one
    map-side-combinable aggregate (the q183 struct-packed max_by shape),
    so no window shuffle and no tie ambiguity between engines.

    Scale shape (100 TB): the query batch is the SMALL side (a training
    batch, thousands), broadcast against the corpus scan — per-executor
    cost O(|corpus_partition|·|batch|·d) with zero shuffle of the corpus;
    the only exchange is the final per-query aggregate, keyed on query id.
    For corpus-×-corpus mining swap the broadcast for the sign-blocked
    candidate join (``sign_blocked_near_dup_pairs``) and keep the same
    struct-max verifier.
    """
    # zero-norm rows (padded/failed encodes) are excluded on BOTH sides:
    # cosine is undefined for them, and under ANSI mode the 0/0 would
    # abort the whole batch instead of skipping the degenerate vector
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qe"),
        F.sqrt(_norm2(vec_col)).alias("qm"),
        F.col(label_col).alias("q_label"),
    ).filter(F.col("qm") > 0)
    c = vectors.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("ce"),
        F.sqrt(_norm2(vec_col)).alias("cm"),
        F.col(label_col).alias("c_label"),
    ).filter(F.col("cm") > 0)
    # r13: the broadcast query batch is scored against each candidate in
    # ONE corpus pass (batch_cross_dots — bit-identical fixed-order dots,
    # the same driver materialization the old BroadcastExchange paid);
    # q-side scalars re-attach by key and the label join condition becomes
    # the identical post-filter (same 3VL on the same values).
    raw = batch_cross_dots(c, ["c_id", "c_label", "cm"], ["ce"],
                           q, "q_id", ["qe"], ["_dotqc"])
    sim = F.col("_dotqc") / (F.col("qm") * F.col("cm"))
    simr = F.round(sim.cast("decimal(18,6)"), 4).cast("double")
    scored = (
        raw.join(F.broadcast(q.select("q_id", "qm", "q_label")), "q_id")
        .filter(F.col("q_label") != F.col("c_label"))
        .select("q_id", "q_label", "c_id", "c_label", simr.alias("sim"))
    )
    return (
        scored.groupBy("q_id", "q_label")
        .agg(F.max(F.struct(
            F.col("sim").alias("s"),
            (-F.col("c_id")).alias("nid"),
            # inert payload: (s, nid) is unique per candidate, so this
            # field never participates in the comparison
            F.col("c_label").alias("nl"),
        )).alias("w"))
        .select(
            "q_id", "q_label",
            (-F.col("w.nid")).alias("neg_id"),
            F.col("w.nl").alias("neg_label"),
            F.col("w.s").alias("sim"),
        )
    )


def pca_project(
    vectors: DataFrame,
    k: int = 2,
    dims: int = 16,
    scale: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project embeddings onto their top-k principal components — the
    dimensionality-reduction / whitening step of an embedding pipeline,
    Spark-first: the distributed part is ONE pass of integer-exact
    sufficient statistics (the q149 machinery, here the full i ≤ j
    triangle incl. variances); the eigendecomposition runs driver-side on
    the dims×dims matrix (model-sized — the same rule as k-means
    centroids), and the projection is a scan-side codegen expression over
    broadcast literal components. No shuffle ever carries embeddings.

    Determinism: sufficient sums are quantized integers (engine/partition
    invariant); eigenvectors get a sign convention (largest-|component|
    entry made positive) so the decomposition is unique up to eigenvalue
    ties; projections are left-assoc double chains of literal weights.

    Returns (id_col, pc1..pck).
    """
    import numpy as np

    # rows shorter than dims carry no full observation for the covariance
    # and would throw INVALID_ARRAY_INDEX under ANSI in the projection —
    # exclude them on both passes (documented contract: fixed-dim input)
    vectors = vectors.filter(F.size(vec_col) >= dims)
    q = F.expr(
        f"transform(slice({vec_col}, 1, {dims}),"
        f" x -> CAST(ROUND(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
    )
    e = vectors.select(q.alias("q"))
    pp = (
        e.select("q", F.expr(f"explode(sequence(0, {dims - 1}))").alias("i"))
        .select("q", "i", F.expr(f"explode(sequence(i, {dims - 1}))").alias("j"))
    )
    s = pp.groupBy("i", "j").agg(
        F.count("*").alias("n"),
        F.expr("SUM(element_at(q, i + 1) * element_at(q, j + 1))").alias("sxy"),
        F.expr("SUM(element_at(q, i + 1))").alias("sx"),
        F.expr("SUM(element_at(q, j + 1))").alias("sy"),
    ).collect()  # dims*(dims+1)/2 rows — model-sized
    if not s or s[0]["n"] < 2:
        raise ValueError(
            f"pca_project needs >= 2 vectors with >= {dims} dims; got "
            f"{s[0]['n'] if s else 0}")
    n = s[0]["n"]
    cov = np.zeros((dims, dims))
    mu = np.zeros(dims)
    for r in s:
        i, j = r["i"], r["j"]
        c = (r["sxy"] - r["sx"] * r["sy"] / n) / (n - 1) / (scale * scale)
        cov[i, j] = cov[j, i] = c
        if i == j:
            mu[i] = r["sx"] / (n * scale)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = []
    for idx in order:
        vec = v[:, idx]
        top = int(np.argmax(np.abs(vec)))
        if vec[top] < 0:
            vec = -vec
        comps.append(vec)
    cols = [F.col(id_col)]
    for ci, vec in enumerate(comps, start=1):
        expr = None
        for i in range(dims):
            term = (F.element_at(vec_col, i + 1).cast("double")
                    - F.lit(float(mu[i]))) * F.lit(float(vec[i]))
            expr = term if expr is None else expr + term
        cols.append(expr.alias(f"pc{ci}"))
    return vectors.select(*cols)


def margin_bitext(
    side_a: DataFrame,
    side_b: DataFrame,
    k: int = 4,
    threshold_ppm: int = 1_000_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Margin-based bitext mining (ratio margin): for each vector on side A,
    the best side-B candidate by cos(x,y) normalized by the mean of the two
    vectors' top-k neighborhood similarities — the standard score for mining
    parallel sentence pairs, which a raw cosine threshold gets wrong because
    hub vectors are near everything.

        margin(x,y) = cos(x,y) / ((avg_topk(x→B) + avg_topk(y→A)) / 2)

    Determinism: similarities are quantized to integer ppm via one
    DECIMAL(18,6) cast (the r4 idiom), top-k membership uses
    (sim_ppm DESC, id) row_number ties, neighborhood sums are exact BIGINTs,
    and the margin is a pure-integer DIV — byte-identical across engines.
    Non-positive similarities are excluded (not translation candidates, and
    they would poison the neighborhood denominator); zero-norm vectors are
    excluded on both sides (ANSI 0/0 guard, q193 rule).

    Scale shape (100 TB): side A is the mining batch (broadcast); side B is
    scanned once — pair generation never shuffles the corpus. The two
    neighborhood windows run on the candidate-pair table only. For
    corpus-×-corpus mining swap the broadcast for
    ``sign_blocked_near_dup_pairs`` candidates and keep the same margin
    verifier. sim_ppm <= 1e6 so sim_ppm * 2k * 1e6 stays far inside BIGINT.
    """
    from pyspark.sql import Window

    a = side_a.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("ae"),
        F.sqrt(_norm2(vec_col)).alias("am")).filter(F.col("am") > 0)
    b = side_b.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("be"),
        F.sqrt(_norm2(vec_col)).alias("bm")).filter(F.col("bm") > 0)
    # r13: the broadcast mining batch (side A) is scored against each
    # side-B vector in ONE B pass (batch_cross_dots — bit-identical
    # fixed-order dots, the same driver materialization the old
    # BroadcastExchange paid); A-side norms re-attach by key.
    raw = batch_cross_dots(b, ["b_id", "bm"], ["be"],
                           a, "a_id", ["ae"], ["_dotab"])
    sim = F.col("_dotab") / (F.col("am") * F.col("bm"))
    pairs = (
        raw.join(F.broadcast(a.select("a_id", "am")), "a_id")
        .select("a_id", "b_id",
                (sim.cast("decimal(18,6)") * 1_000_000)
                .cast("bigint").alias("sim_ppm"))
        .filter(F.col("sim_ppm") > 0)
    )
    # r13: the candidate-pair table (whose per-pair cosine fold is the
    # operator's dominant cost) was consumed THREE times — once per
    # neighborhood groupBy branch, once for the final join-back — so the
    # optimizer re-evaluated the pair build per branch. The two top-k
    # neighborhood sums now ride WINDOWS on the one pair stream: the
    # rank and the conditional sum share each side's partitioning (one
    # a_id sort, one b_id sort), and the old INNER join-backs dropped no
    # rows (every id owns a non-empty top-k), so values are identical
    # (q202 oracle MATCH re-proved at sf0.001/0.01).
    wa = Window.partitionBy("a_id").orderBy(F.desc("sim_ppm"), F.asc("b_id"))
    wb = Window.partitionBy("b_id").orderBy(F.desc("sim_ppm"), F.asc("a_id"))
    ua = Window.partitionBy("a_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    ub = Window.partitionBy("b_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    scored = (
        pairs
        .withColumn("_ra", F.row_number().over(wa))
        .withColumn("_rb", F.row_number().over(wb))
        .withColumn("ra_sum", F.sum(
            F.when(F.col("_ra") <= k, F.col("sim_ppm"))).over(ua))
        .withColumn("rb_sum", F.sum(
            F.when(F.col("_rb") <= k, F.col("sim_ppm"))).over(ub))
        .withColumn("margin_ppm",
                    F.expr(f"sim_ppm * {2 * k} * 1000000"
                           " DIV (ra_sum + rb_sum)"))
    )
    return (
        scored.groupBy("a_id")
        .agg(F.max(F.struct(
            F.col("margin_ppm").alias("m"),
            (-F.col("b_id")).alias("nid"),
            F.col("sim_ppm").alias("s"),
        )).alias("w"))
        .filter(F.col("w.m") >= threshold_ppm)
        .select("a_id", (-F.col("w.nid")).alias("b_id"),
                F.col("w.s").alias("sim_ppm"), F.col("w.m").alias("margin_ppm"))
        .orderBy("a_id")
    )


def truncated_recall(
    vectors: DataFrame,
    dims: int = 16,
    k: int = 10,
    sample_mod: int = 20,
    sample_rem: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Matryoshka-style truncation audit: for a deterministic sample of
    query vectors, recall@k of the top-k neighbor set computed on the first
    ``dims`` coordinates against the top-k on the full vector — the
    measurement that decides whether a cheaper truncated index tier (the
    standard MRL serving trick) is safe for a given corpus.

    Both similarity rankings are integer-ppm quantized with
    (sim DESC, id ASC) ties, so the two top-k sets — and therefore the
    overlap counts — are engine-exact, not estimate-vs-estimate.

    Scale shape (100 TB): the query sample is broadcast against one corpus
    scan (pairs never shuffle the corpus); the two rankings are windows
    over the per-query candidate table. A full-corpus audit would replace
    the broadcast with the SRP-bucketed candidate join and audit recall
    per bucket.
    """
    from pyspark.sql import Window

    full_norm = F.sqrt(_norm2(vec_col))
    trunc = F.slice(F.col(vec_col), 1, dims)
    q = vectors.filter(
        (F.col(id_col) % sample_mod) == sample_rem
    ).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qe"),
        full_norm.alias("qm"), trunc.alias("qt"),
        F.sqrt(_norm2(trunc)).alias("qtm"),
    ).filter((F.col("qm") > 0) & (F.col("qtm") > 0))
    c = vectors.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("ce"),
        full_norm.alias("cm"), trunc.alias("ct"),
        F.sqrt(_norm2(trunc)).alias("ctm"),
    ).filter((F.col("cm") > 0) & (F.col("ctm") > 0))
    ppm = lambda col: (col.cast("decimal(18,6)") * 1_000_000).cast("bigint")
    # r13: both dots (full + truncated) against the broadcast query batch
    # come from ONE corpus pass (batch_cross_dots — bit-identical
    # fixed-order dots; the truncated dot over the first `dims`
    # coordinates is the same ascending-d prefix); q-side norms re-attach
    # by key and the join condition becomes the identical post-filter.
    raw = batch_cross_dots(c, ["c_id", "cm", "ctm"], ["ce", "ct"],
                           q, "q_id", ["qe", "qt"], ["_dotf", "_dott"])
    pairs = (
        raw.join(F.broadcast(q.select("q_id", "qm", "qtm")), "q_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id",
            ppm(F.col("_dotf") / (F.col("qm") * F.col("cm")))
            .alias("sim_full"),
            ppm(F.col("_dott") / (F.col("qtm") * F.col("ctm")))
            .alias("sim_trunc"),
        )
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("sim_full"), F.asc("c_id"))
    wt = Window.partitionBy("q_id").orderBy(F.desc("sim_trunc"), F.asc("c_id"))
    top_full = (pairs.withColumn("r", F.row_number().over(wf))
                .filter(F.col("r") <= k).select("q_id", "c_id"))
    top_trunc = (pairs.withColumn("r", F.row_number().over(wt))
                 .filter(F.col("r") <= k).select("q_id", "c_id"))
    overlap = (top_full.join(top_trunc, ["q_id", "c_id"], "left_semi")
               .groupBy("q_id").agg(F.count("*").alias("n_overlap")))
    return (
        q.select("q_id").join(overlap, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            F.expr(f"coalesce(n_overlap, 0) * 1000000 DIV {k}")
            .alias("recall_ppm"),
        )
        .orderBy("q_id")
    )


def mmr_topk(
    vectors: DataFrame,
    k: int = 5,
    pool: int = 30,
    lam_ppm: int = 700_000,
    sample_mod: int = 20,
    sample_rem: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k: per query, greedily
    select k results maximizing ``λ·rel(c) − (1−λ)·max_{s∈selected}
    sim(c, s)`` — the standard redundancy-suppressing re-rank (a plain
    cosine top-k returns near-duplicates of the best hit; MMR spends the
    slots on coverage).

    Greedy selection is an inherently sequential recurrence over the
    selected set, so it runs per query group in a COGROUPED applyInPandas
    — the relevance pool and the candidate-candidate similarity edges are
    cogrouped by query id; Python only ever sees one query's O(pool²)
    edge table, never the corpus. Scores are integer ppm (λ in ppm, floor
    division), ties break to the lower candidate id — deterministic
    across engines, partitionings and runs. λ=1e6 degenerates to exact
    relevance order (tested); rows-only for the driver (greedy recurrence
    is not SQL-expressible) with property tests pinning the semantics.

    Scale shape (100 TB): the query sample is broadcast; the pool cut
    (row_number ≤ pool) bounds the per-query edge table at pool² rows,
    so the cogroup shuffle carries O(|queries|·pool²) — independent of
    corpus size. Corpus-wide MMR would take candidates from the SRP
    buckets instead of the brute-force pool, same greedy tail.
    """
    import pandas as pd
    from pyspark.sql import Window

    q = vectors.filter((F.col(id_col) % sample_mod) == sample_rem).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qe"),
        F.sqrt(_norm2(vec_col)).alias("qm")).filter(F.col("qm") > 0)
    c = vectors.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("ce"),
        F.sqrt(_norm2(vec_col)).alias("cm")).filter(F.col("cm") > 0)
    ppm = lambda col: (col.cast("decimal(18,6)") * 1_000_000).cast("bigint")
    # r13: relevance dots against the broadcast query batch come from ONE
    # corpus pass (batch_cross_dots — bit-identical fixed-order dots); the
    # pool window then ranks SCALAR rows (the old plan shuffled a 0.5 KB
    # vector per pair through the window exchange), and the pool²
    # candidate-candidate stage re-attaches vectors by key afterwards —
    # a broadcast join of |queries|·pool rows, each c_id unique in c, so
    # the enriched pool is row-identical.
    raw = batch_cross_dots(c, ["c_id", "cm"], ["ce"],
                           q, "q_id", ["qe"], ["_dotqc"])
    rel = (
        raw.join(F.broadcast(q.select("q_id", "qm")), "q_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id",
                ppm(F.col("_dotqc") / (F.col("qm") * F.col("cm")))
                .alias("sim_ppm"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim_ppm"), F.asc("c_id"))
    pool_cut = rel.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= pool)
    # r14 (guide §2.4/§4.2): the pool² candidate-candidate stage and the
    # greedy used to be a pair self-join (pair_dot per edge, ppm in SQL)
    # cogrouped with the pool — two more q_id exchanges and 43.5k edge
    # rows through Arrow at sf0.1. The enriched pool now packs per query
    # (groupBy on the window's own q_id partitioning) and ONE mapInPandas
    # computes the dense pool×pool dots — the same ascending-d
    # ``acc += X[:,d]·X[:,d]ᵀ`` accumulation as pair_dot, so every double
    # is bit-identical to the fold — quantizes them through Python
    # Decimal HALF_UP at 6 dp (exactly Spark's double→DECIMAL(18,6) cast:
    # both quantize the shortest-repr decimal of the double), and runs
    # the unchanged greedy recurrence. Row-identity vs the cogroup shape
    # is pinned by tests/test_corpus_ops.py.
    pool_df = (c.select("c_id", "ce", "cm")
               .join(F.broadcast(pool_cut.select("q_id", "c_id", "sim_ppm",
                                                 "r")), "c_id")
               .select("q_id", "c_id", "ce", "cm", "sim_ppm", "r"))
    packed = pool_df.groupBy("q_id").agg(
        F.collect_list(F.struct("c_id", "sim_ppm", "ce", "cm")).alias("rows"))

    mu = 1_000_000 - lam_ppm

    def greedy_packed(batches):
        from decimal import ROUND_HALF_UP, Decimal

        six = Decimal("0.000001")

        def q6(x: float) -> int:
            # CAST(x AS DECIMAL(18,6)) * 1e6 as BIGINT: Spark quantizes
            # BigDecimal(Double.toString(x)) at scale 6 HALF_UP; Python's
            # repr is the same shortest round-trip decimal
            return int(Decimal(repr(x)).quantize(six, ROUND_HALF_UP)
                       .scaleb(6))

        for pdf in batches:
            out = []
            for q_id, rows in zip(pdf["q_id"], pdf["rows"]):
                c_ids = [int(t["c_id"]) for t in rows]
                r = dict(zip(c_ids, (int(t["sim_ppm"]) for t in rows)))
                X = np.stack([np.asarray(t["ce"], dtype=np.float64)
                              for t in rows])
                cm = np.asarray([t["cm"] for t in rows], dtype=np.float64)
                n, dim = X.shape
                acc = np.zeros((n, n), dtype=np.float64)
                for d in range(dim):
                    col = X[:, d]
                    acc += col[:, None] * col[None, :]
                sim = acc / (cm[:, None] * cm[None, :])
                s = {}
                for i in range(n):
                    ci = c_ids[i]
                    for j in range(i + 1, n):
                        v = q6(float(sim[i, j]))
                        s[(ci, c_ids[j])] = v
                        s[(c_ids[j], ci)] = v
                selected: list = []
                while len(selected) < min(k, len(r)):
                    best = None
                    for cid, rv in r.items():
                        if cid in selected:
                            continue
                        mx = max((s.get((cid, sid), 0) for sid in selected),
                                 default=0)
                        score = (lam_ppm * int(rv) - mu * int(mx)) // 1_000_000
                        if best is None or score > best[0] or \
                                (score == best[0] and cid < best[1]):
                            best = (score, cid)
                    out.append((q_id, len(selected) + 1, best[1], best[0]))
                    selected.append(best[1])
            yield pd.DataFrame(
                out, columns=["q_id", "rank", "c_id", "mmr_ppm"])

    return (
        packed.mapInPandas(greedy_packed,
                           "q_id long, rank int, c_id long, mmr_ppm long")
        .orderBy("q_id", "rank")
    )


def label_silhouette(
    vectors: DataFrame, label_col: str = "label", vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Simplified silhouette per label: for each vector, a = distance to
    its OWN label centroid, b = min distance to any OTHER label centroid,
    s = (b-a)/max(a,b) — the standard embedding-space cluster-quality
    score (means near +1: compact and separated; negatives: vectors
    closer to a foreign class than their own). Complements the q224 1-NN
    probe with a geometry-level view.

    Determinism: centroids are the 4dp-pinned ``label_centroids``;
    per-dimension squared residuals accumulate in DECIMAL(28,12) (the
    centroid_outliers convention); a and b are 4dp distances, s is
    4dp-quantized per vector BEFORE the per-label decimal mean — nothing
    depends on aggregation order in either engine.

    Scale shape (100 TB): the centroid table is labels x dims and
    broadcasts; the explode+join is one partition-local pass with a
    (vector, candidate-label) aggregation — rows x labels intermediate,
    never vector x vector.
    """
    cent = label_centroids(vectors, label_col, vec_col).select(
        F.col("label").alias("cand"), "dim", "centroid")
    expl = (
        vectors.select(F.col(id_col).alias("vec_id"),
                       F.col(label_col).alias("label"),
                       F.posexplode(vec_col).alias("pos", "x"))
        .select("vec_id", "label", (F.col("pos") + 1).alias("dim"),
                F.col("x").cast("double").alias("x"))
    )
    resid = ((F.col("x") - F.col("centroid"))
             * (F.col("x") - F.col("centroid")))
    d = (
        expl.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "cand")
        .agg(F.sum(resid.cast("decimal(28,12)")).alias("ss"))
        .select("vec_id", "label", "cand",
                F.round(F.sqrt(F.col("ss").cast("double"))
                        .cast("decimal(18,6)"), 4)
                .cast("double").alias("dist"))
    )
    per_vec = d.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("cand") == F.col("label"), F.col("dist")))
        .alias("a"),
        F.min(F.when(F.col("cand") != F.col("label"), F.col("dist")))
        .alias("b"))
    s = F.when(
        F.greatest("a", "b") > 0,
        F.round(((F.col("b") - F.col("a")) / F.greatest("a", "b"))
                .cast("decimal(18,6)"), 4),
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        per_vec.select("vec_id", "label", s.alias("s"))
        .groupBy("label")
        .agg(F.count("*").alias("n_vectors"),
             F.round((F.sum(F.col("s").cast("decimal(18,6)"))
                      .cast("double") / F.count("*"))
                     .cast("decimal(18,6)"), 4)
             .cast("double").alias("mean_silhouette"),
             F.sum((F.col("s") < 0).cast("bigint")).alias("n_negative"))
    )


def mutual_nn(
    vectors: DataFrame, sample_mod: int = 10, sample_rem: int = 3,
    vec_col: str = "embedding", id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Mutual nearest neighbors over a deterministic sample: pairs (a, b)
    where b is a's cosine top-1 AND a is b's — the reciprocal-best-match
    criterion bitext mining and cross-encoder candidate generation use
    (one-directional top-1 is noise-prone; mutuality is the cheap
    precision filter). Returns (id_a, id_b, sim_ppm, label_a, label_b,
    same_label) with id_a < id_b.

    Determinism: ppm-quantized cosine (the q224 convention), id-ascending
    tie-break on equal similarity. Scale: this is an AUDIT over a bounded
    id-hash sample (sample x sample, broadcast one side); full-corpus
    mutual-NN routes through the ANN bucket paths (SRP/IVF) instead of
    exact all-pairs.
    """
    s = (
        vectors.filter(F.col(id_col) % sample_mod == sample_rem)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                F.sqrt(_norm2(vec_col)).alias("m"),
                F.col(label_col).alias("lab"))
        .filter(F.col("m") > 0)
    )
    a = s.select(F.col("id").alias("ida"), F.col("v").alias("va"),
                 F.col("m").alias("ma"))
    b = s.select(F.col("id").alias("idb"), F.col("v").alias("vb"),
                 F.col("m").alias("mb"))
    # r13: the broadcast sample side is scored against each sample vector
    # in ONE pass (batch_cross_dots — bit-identical fixed-order dots, the
    # same driver materialization the old BroadcastExchange paid); b-side
    # norms re-attach by key, the ida != idb condition becomes the
    # identical post-filter, and the unused la/lb passengers are dropped
    # (labels join on at the end from `lab`, as before).
    raw = batch_cross_dots(a, ["ida", "ma"], ["va"],
                           b, "idb", ["vb"], ["_dotv"])
    sim = F.col("_dotv") / (F.col("ma") * F.col("mb"))
    pairs = (
        raw.join(F.broadcast(b.select("idb", "mb")), "idb")
        .filter(F.col("ida") != F.col("idb"))
        .select("ida", "idb",
                (sim.cast("decimal(18,6)") * 1_000_000)
                .cast("bigint").alias("sim_ppm"))
    )
    best = pairs.groupBy("ida").agg(
        F.max(F.struct(F.col("sim_ppm").alias("s"),
                       (-F.col("idb")).alias("nid"))).alias("w"))
    nn = best.select("ida", (-F.col("w.nid")).alias("nn"),
                     F.col("w.s").alias("sim_ppm"))
    fwd = nn.filter(F.col("ida") < F.col("nn"))
    rev = nn.select(F.col("ida").alias("nn2"), F.col("nn").alias("ida2"))
    mutual = fwd.join(
        rev, (fwd["ida"] == rev["ida2"]) & (fwd["nn"] == rev["nn2"]))
    lab = s.select("id", "lab")
    return (
        mutual.select(F.col("ida").alias("id_a"), F.col("nn").alias("id_b"),
                      "sim_ppm")
        .join(lab.withColumnsRenamed({"id": "id_a", "lab": "label_a"}), "id_a")
        .join(lab.withColumnsRenamed({"id": "id_b", "lab": "label_b"}), "id_b")
        .select("id_a", "id_b", "sim_ppm", "label_a", "label_b",
                (F.col("label_a") == F.col("label_b")).alias("same_label"))
    )


def mutual_nn_ann(
    vectors: DataFrame, bits: int = 8, tables: int = 8, seed: int = 42,
    vec_col: str = "embedding", id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Full-corpus reciprocal best match — the production form whose
    bounded-sample audit is ``mutual_nn``: candidate edges come from SRP
    signature buckets (pairs sharing a ``bits``-bit signature in ANY of
    ``tables`` hash tables — an equi-join on (table, sig), never
    vector x vector), exact ppm-quantized cosine runs on candidates
    only, each id takes its best candidate (id-ascending tie-break), and
    only reciprocal bests survive. Same output schema and determinism
    conventions as ``mutual_nn``.

    Recall: a true nearest neighbor is a candidate with probability
    1 - (1 - (1 - θ/π)^bits)^tables — near 1 for the high-cosine pairs
    mutual-NN exists to find; a missed NN can surface a second-best pair,
    so results are exact-within-the-candidate-graph (property-tested
    equal to the exact form on separable data). Scale: shuffles are on
    uniform (table, sig) keys and on ids; per-bucket pair cost is
    2^-bits-selective, and ``bits`` trades bucket size against recall.
    """
    s = (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                       F.sqrt(_norm2(vec_col)).alias("m"),
                       F.col(label_col).alias("lab"))
        .filter(F.col("m") > 0)
    )
    dim = s.select(F.size("v")).first()[0]  # model-sized probe, one row
    planes = _hyperplanes(dim, bits, tables, seed)
    # r13: all `tables` signatures in ONE Arrow pass (bit-identical to the
    # per-table interpreted fold — srp_signatures docstring); the old
    # explode-of-structs becomes a posexplode of the signature array.
    tagged = s.select(
        "id", "v", "m",
        F.posexplode(srp_signatures("v", planes)).alias("t", "sig"),
    )
    a = tagged.select(F.col("id").alias("ida"), F.col("v").alias("va"),
                      F.col("m").alias("ma"), "t", "sig")
    b = tagged.select(F.col("id").alias("idb"), F.col("v").alias("vb"),
                      F.col("m").alias("mb"), "t", "sig")
    # r13: Arrow-vectorized pair dot (bit-identical to the fold)
    sim = pair_dot("va", "vb") / (F.col("ma") * F.col("mb"))
    # Compute the exact cosine INSIDE the bucket-join select so the
    # candidate-dedup shuffle below carries 3 bigints per row, not two
    # 0.5 KB vectors per duplicated candidate (a pair can surface in up
    # to ``tables`` buckets). sim_ppm is deterministic per (ida, idb),
    # so deduping after the projection keeps the same rows.
    und = (
        a.join(b, ["t", "sig"])
        .filter(F.col("ida") < F.col("idb"))
        .select("ida", "idb",
                (sim.cast("decimal(18,6)") * 1_000_000)
                .cast("bigint").alias("sim_ppm"))
        .dropDuplicates(["ida", "idb"])
    )
    edges = und.unionByName(
        und.select(F.col("idb").alias("ida"), F.col("ida").alias("idb"),
                   "sim_ppm"))
    best = edges.groupBy("ida").agg(
        F.max(F.struct(F.col("sim_ppm").alias("s"),
                       (-F.col("idb")).alias("nid"))).alias("w"))
    nn = best.select("ida", (-F.col("w.nid")).alias("nn"),
                     F.col("w.s").alias("sim_ppm"))
    fwd = nn.filter(F.col("ida") < F.col("nn"))
    rev = nn.select(F.col("ida").alias("nn2"), F.col("nn").alias("ida2"))
    mutual = fwd.join(
        rev, (fwd["ida"] == rev["ida2"]) & (fwd["nn"] == rev["nn2"]))
    lab = s.select("id", "lab")
    return (
        mutual.select(F.col("ida").alias("id_a"), F.col("nn").alias("id_b"),
                      "sim_ppm")
        .join(lab.withColumnsRenamed({"id": "id_a", "lab": "label_a"}), "id_a")
        .join(lab.withColumnsRenamed({"id": "id_b", "lab": "label_b"}), "id_b")
        .select("id_a", "id_b", "sim_ppm", "label_a", "label_b",
                (F.col("label_a") == F.col("label_b")).alias("same_label"))
    )
