"""Unit/property tests for the round-4 scale/layout/LM operators:
skew_profile, zorder_key/cluster_by_zorder (operators/scale.py) and
bigram_logprob (operators/text.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from inspectadb_spark.operators.scale import (
    cluster_by_zorder,
    skew_profile,
    zorder_key,
)
from inspectadb_spark.operators.text import bigram_logprob


def test_skew_profile_hand_case(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,)], ["k"])
    rows = {r.rank: r for r in skew_profile(df, "k", top_k=5).collect()}
    assert rows[1].key == "1" and rows[1].cnt == 3
    assert rows[1].share_ppm == 600000  # 3/5
    assert rows[1].x_avg_x100 == 180    # 3 vs avg 5/3
    assert rows[2].key == "2" and rows[2].share_ppm == 200000
    assert rows[3].key == "3" and rows[3].x_avg_x100 == 60


def _deinterleave(z: int) -> tuple[int, int]:
    x = y = 0
    for j in range(8):
        x |= ((z >> (2 * j)) & 1) << j
        y |= ((z >> (2 * j + 1)) & 1) << j
    return x, y


def test_zorder_key_roundtrips(spark):
    pts = [(i * 37 % 256, i * 91 % 256) for i in range(64)]
    df = spark.createDataFrame(pts, ["x", "y"]).withColumn(
        "z", zorder_key("x", "y", bits=8)
    )
    for r in df.collect():
        assert _deinterleave(r.z) == (r.x, r.y)


def test_cluster_by_zorder_partitions_are_compact(spark):
    """Every range partition of the z-ordered layout covers a compact
    rectangle: for 8-bit coords, a contiguous zkey run of length L spans at
    most ~2*sqrt(L) in each coordinate (quadrant nesting)."""
    pts = [(i % 256, (i * 7 + 3) % 256) for i in range(2048)]
    df = spark.createDataFrame(pts, ["x", "y"])
    part = cluster_by_zorder(df, "x", "y", bits=8, num_partitions=16)
    spans = (
        part.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    # 2048 points over 16 partitions → ~128 rows each; without z-ordering a
    # random split spans ~255 in both dims. Allow the quadrant-boundary 2×.
    assert all(r.dx <= 128 and r.dy <= 128 for r in spans if r.n >= 8)


def test_bigram_logprob_hand_case(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c c"), (3, "a")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    # corpus: c1(a)=2, c1(b)=2, c1(c)=3, tot=7
    # c2: (a,b)=1, (b,c)=2, (c,c)=1 — asymmetric on purpose.
    # Reference mirrors the engines' DECIMAL HALF_UP quantization (Python's
    # round() is half-even and drifts on the .xxxx5 boundaries).
    from decimal import ROUND_HALF_UP, Decimal

    def q4(v: float) -> float:
        return float(
            Decimal(str(round(v, 6))).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        )

    def lp(c2, c1p, c1c):
        return q4(math.log(0.7 * c2 / c1p + 0.3 * c1c / 7))

    d1 = q4((lp(1, 2, 2) + lp(2, 2, 3)) / 2)  # "a b" then "b c"
    d2 = q4((lp(2, 2, 3) + lp(1, 3, 3)) / 2)  # "b c" then "c c"
    assert got[1].n_bigrams == 2 and abs(got[1].mean_logprob - d1) < 1e-9
    assert got[2].n_bigrams == 2 and abs(got[2].mean_logprob - d2) < 1e-9
    assert 3 not in got  # single-token doc has no scored bigrams


def test_activity_streaks_hand_case(spark):
    import datetime as dt

    from inspectadb_spark.operators.timeseries import activity_streaks

    def t(day, h=0):
        return dt.datetime(2024, 1, day, h)

    rows = [
        # user 1: days 1,2,3 (two events on day 2), gap, day 6 → streaks 3+1
        (1, t(1)), (1, t(2)), (1, t(2, 5)), (1, t(3)), (1, t(6)),
        # user 2: single day
        (2, t(4)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {r.user_id: r for r in activity_streaks(df).collect()}
    assert (got[1].n_active_days, got[1].n_streaks, got[1].longest_streak) == (4, 2, 3)
    assert (got[2].n_active_days, got[2].n_streaks, got[2].longest_streak) == (1, 1, 1)


def test_cusum_hand_case(spark):
    import datetime as dt

    from inspectadb_spark.operators.timeseries import cusum_alerts

    rows = [
        # key A, k=10: x-k = -5, +5, +5, -10, +20 → P = -5,0,5,-5,15
        # min(0,runmin P) = -5 after t1 … S = 0,5,10,0,20 → max 20, alerts(>9)=2
        ("A", dt.datetime(2024, 1, 1, h), i, v)
        for h, (i, v) in enumerate([(1, 5.0), (2, 15.0), (3, 15.0),
                                    (4, 0.0), (5, 30.0)])
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id int, v double")
    got = cusum_alerts(df, "k", "ts", "v", "id", k=10.0, h=9.0).collect()[0]
    assert got["n_alerts"] == 2          # S=10 and S=20 exceed h=9
    assert abs(got["max_cusum"] - 20.0) < 1e-9
    assert got["n"] == 5


def test_weighted_sample_favors_heavy_rows_and_is_deterministic(spark):
    from inspectadb_spark.operators.pipeline import weighted_sample

    rows = [(i, 1000 if i % 10 == 0 else 10) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    picked = weighted_sample(df, "w", k=100).collect()
    heavy = sum(1 for r in picked if r.w == 1000)
    # heavy rows are 10% of the population but carry ~92% of total weight;
    # a uniform sample would pick ~10 of them — weighted must pick far more
    assert heavy > 40
    again = weighted_sample(df.repartition(13), "w", k=100).collect()
    assert sorted(r.doc_id for r in picked) == sorted(r.doc_id for r in again)


def test_skyline_matches_bruteforce_with_duplicates(spark):
    from inspectadb_spark.operators.skyline import skyline_2d

    rows = [(i, (i * 37) % 50 + ((i * 13) % 7) / 10.0, (i * 91) % 40)
            for i in range(300)]
    # inject duplicates of a frontier-ish point
    rows += [(900, 0.0, 39), (901, 0.0, 39)]
    df = spark.createDataFrame(rows, "id long, price double, size long")
    got = {r.id for r in skyline_2d(df, "price", "size").collect()}
    data = [(i, p, s) for i, p, s in rows]
    brute = {
        i for i, p, s in data
        if not any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for _, p2, s2 in data
        )
    }
    assert got == brute
    assert {900, 901} <= got  # equal frontier points both kept


def test_crosslingual_dup_detector_finds_planted_dup(spark):
    from inspectadb_spark.queries.registry import REGISTRY
    import inspectadb_spark.queries.training as _t  # noqa: F401 (registration)

    docs = spark.createDataFrame(
        [(1, "same body", "en", "s", 9), (2, "same body", "fr", "s", 9),
         (3, "same body", "en", "s", 9), (4, "unique", "en", "s", 6)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    # run the same pipeline the query builds, against the planted frame
    from pyspark.sql import functions as F

    got = (
        docs.select(F.md5("text").alias("th"), "lang", "doc_id")
        .groupBy("th")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct("lang").alias("n_langs"),
             F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_langs") > 1)
        .collect()
    )
    assert len(got) == 1
    assert (got[0].first_doc, got[0].n_docs, got[0].n_langs) == (1, 3, 2)


def test_gini_matches_python_reference(spark):
    """The q175 sorted-rank form vs the textbook pairwise definition,
    computed in exact integers on the Python side."""
    import itertools

    from inspectadb_spark.queries.registry import REGISTRY

    rows = {r.n_name: r for r in
            REGISTRY["q175_gini"].builder(spark, "/root/testdata/sf0.001").collect()}
    # independently recompute one nation's gini from raw data
    import duckdb

    con = duckdb.connect()
    data = con.execute("""
        SELECT c.c_nationkey, n.n_name,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM '/root/testdata/sf0.001/orders.parquet' o
        JOIN '/root/testdata/sf0.001/customer.parquet' c
          ON o.o_custkey = c.c_custkey
        JOIN '/root/testdata/sf0.001/nation.parquet' n
          ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2, o.o_custkey
    """).fetchall()
    by_nation: dict = {}
    for _, name, cents in data:
        by_nation.setdefault(name, []).append(cents)
    for name, xs in by_nation.items():
        xs.sort()
        n, tot = len(xs), sum(xs)
        # pairwise definition: G = sum|xi - xj| / (2 n^2 mu) = pair/(2*n*tot)
        pair = sum(abs(a - b) for a, b in itertools.product(xs, xs))
        want_ppm = (pair * 1_000_000) // (2 * n * tot)
        got = rows[name].gini_ppm
        # rank form floors once, the pairwise form floors once — equal up
        # to the single floor ulp
        assert abs(got - want_ppm) <= 1, (name, got, want_ppm)


def test_rle_matches_itertools_groupby(spark):
    import datetime as dt
    import itertools

    from inspectadb_spark.operators.timeseries import rle_compress

    states = ["a", "a", "b", "b", "b", "a", "c", "c", "a", "a"]
    rows = [(1, dt.datetime(2024, 1, 1, 0, i), i, s)
            for i, s in enumerate(states)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, id int, st string")
    got = sorted(
        (r.run_id, r.st, r.n)
        for r in rle_compress(df, "k", "st", "ts", "id").collect()
    )
    want = [(i + 1, s, len(list(g)))
            for i, (s, g) in enumerate(itertools.groupby(states))]
    assert got == [(rid, s, n) for rid, s, n in want]


def test_capped_sessionize_splits_on_cap_not_just_gap(spark):
    import datetime as dt

    from inspectadb_spark.operators.sessionize import capped_sessionize

    base = dt.datetime(2024, 1, 1)
    # events every 20 min (< 30 min gap) for 6 h: plain gap-sessionize
    # would yield ONE session; the 4 h cap must split it
    rows = [(1, base + dt.timedelta(minutes=20 * i), i) for i in range(19)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = sorted(
        (r.session_id, r.n_events)
        for r in capped_sessionize(df, gap_s=1800, cap_s=14400).collect()
    )
    # cap anchored at start: session 0 covers minutes 0..240 (13 events),
    # session 1 restarts at minute 260
    assert got == [(0, 13), (1, 6)]


def test_capped_sessionize_vectorized_matches_sequential_reference(spark):
    """The r13 mapInPandas rewrite must reproduce the row-at-a-time
    recurrence exactly — including for users whose rows span Arrow batch
    boundaries (the carry path), which default 10k-row batches never
    exercise on small frames. Tiny maxRecordsPerBatch forces every user
    across multiple batches."""
    import datetime as dt

    from inspectadb_spark.operators.sessionize import capped_sessionize

    base = dt.datetime(2024, 1, 1)
    rows = []
    # varied per-user shapes: gap breaks, cap breaks, singleton users,
    # duplicate timestamps
    for u in range(7):
        t, mins = base, 0
        for i in range(5 + 11 * (u % 3)):
            step = [5, 20, 45, 0][(u + i) % 4]  # includes >30min gaps + ties
            mins += step
            rows.append((u, base + dt.timedelta(minutes=mins), u * 1000 + i))
    # one user whose 20-min cadence never gap-breaks, so the 4 h cap is
    # the only splitter (the searchsorted jump path) — spanning batches
    rows += [(100, base + dt.timedelta(minutes=20 * i), 100_000 + i)
             for i in range(19)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long")

    def reference(rows):
        from collections import defaultdict
        by_user = defaultdict(list)
        for u, ts, i in rows:
            by_user[u].append((ts, i))
        out = []
        for u, evs in by_user.items():
            evs.sort()
            sid, start, prev, sess = 0, None, None, []
            for ts, _ in evs:
                if start is None:
                    start = ts
                elif ((ts - prev).total_seconds() > 1800
                      or (ts - start).total_seconds() > 14400):
                    sid += 1
                    start = ts
                sess.append((u, sid, ts))
                prev = ts
            from itertools import groupby
            for (uu, s), g in groupby(sess, key=lambda x: (x[0], x[1])):
                g = list(g)
                out.append((uu, s, len(g), g[0][2], g[-1][2]))
        return sorted(out)

    want = reference(rows)
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        got = sorted(
            (r.user_id, r.session_id, r.n_events, r.ts_start, r.ts_end)
            for r in capped_sessionize(df, gap_s=1800, cap_s=14400).collect()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       old_batch)
    assert got == want


def test_bloom_no_false_negatives_and_merge(spark):
    from pyspark.sql import functions as F

    from inspectadb_spark.operators.sketches import bloom_build, bloom_probe

    pop = spark.range(1000).select(F.col("id").alias("k"))
    mem_a = pop.filter(F.col("k") < 50)
    mem_b = pop.filter((F.col("k") >= 50) & (F.col("k") < 100))
    sk_a = bloom_build(mem_a, "k")
    sk_b = bloom_build(mem_b, "k")
    # no false negatives: every member of A flags in A's sketch
    flags = bloom_probe(sk_a, pop, "k").collect()
    assert all(r.maybe_member for r in flags if r.k < 50)
    # false positives exist but are bounded loosely (k=4, m=4096, n=50
    # → theoretical fp ≈ 5e-6; allow slack)
    fp = sum(1 for r in flags if r.maybe_member and r.k >= 50)
    assert fp <= 5
    # merge is a distinct union: sketch(A ∪ B) == union of sketches
    merged = sk_a.unionByName(sk_b).distinct()
    direct = bloom_build(mem_a.unionByName(mem_b), "k")
    assert sorted(r.bit for r in merged.collect()) == \
        sorted(r.bit for r in direct.collect())


def test_repair_changelog_roundtrip_converges_replica(spark):
    """Applying q182's changelog to the corrupted replica must reproduce
    the source EXACTLY — the property that makes the diff a repair plan."""
    from pyspark.sql import functions as F

    from inspectadb_spark.operators.cdc import diff_to_changelog
    from inspectadb_spark.queries.cdc_time import _q182_dst
    from inspectadb_spark.queries.registry import tables

    src = tables(spark, "/root/testdata/sf0.001")["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    dst = _q182_dst(src)
    log = diff_to_changelog(
        src, dst, ["o_orderkey"],
        ["o_custkey", "o_orderstatus", "o_totalprice"])
    dels = log.filter(F.col("op") == "d").select("o_orderkey")
    upserts = log.filter(F.col("op") != "d").drop("op")
    repaired = (
        dst.join(log.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(upserts)
    )
    assert sorted(map(tuple, repaired.collect())) == \
        sorted(map(tuple, src.collect()))
    assert dels.count() > 0  # the corruption actually exercised deletes


def test_vhist_merge_lossless_and_quantile_bounded(spark):
    from pyspark.sql import functions as F

    from inspectadb_spark.operators.sketches import (
        vhist_merge, vhist_quantile, vhist_sketch,
    )
    from inspectadb_spark.queries.registry import tables

    ev = tables(spark, "/root/testdata/sf0.001")["events"]
    daily = vhist_sketch(ev, "value", width=25, n_bins=20,
                         bucket_cols=[F.to_date("ts").alias("day")])
    merged = vhist_merge(daily.drop("day"))
    direct = vhist_sketch(ev, "value", width=25, n_bins=20)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))
    est = {r.p: r.est for r in
           vhist_quantile(merged, [50, 95], width=25).collect()}
    exact = ev.agg(
        F.expr("percentile(value, 0.50)").alias("e50"),
        F.expr("percentile(value, 0.95)").alias("e95")).collect()[0]
    assert 0 <= est[50] - exact.e50 <= 25
    assert 0 <= est[95] - exact.e95 <= 25


def test_lww_merge_winner_row_is_atomic_even_with_nulls(spark):
    """A winning row with a NULL payload field must keep that NULL — the
    loser's non-NULL value must not leak in (max_by skips NULL values, so
    per-column picking would corrupt the winner)."""
    from inspectadb_spark.operators.cdc import lww_merge

    a = spark.createDataFrame([(1, "old", 2.0, 1)], "k long, s string, x double, v int")
    b = spark.createDataFrame([(1, None, 9.0, 5)], "k long, s string, x double, v int")
    got = lww_merge(a, b, ["k"], "v").collect()[0]
    assert got.v == 5 and got.x == 9.0
    assert got.s is None  # the b-row won; its NULL s survives


# --- binned interval join -----------------------------------------------------
def test_binned_interval_join_equals_theta_join(spark):
    """Row-identical to the naive theta join across bin sizes smaller than,
    near, and larger than the interval spans (incl. boundary-inclusive
    endpoints and intervals shorter than one bin)."""
    import datetime as dt

    from inspectadb_spark.operators.scale import binned_interval_join

    t0 = dt.datetime(2024, 3, 1)
    ivs = [(i, t0 + dt.timedelta(minutes=7 * i),
            t0 + dt.timedelta(minutes=7 * i + 11 + (i % 5) * 30))
           for i in range(40)]
    pts = [(100 + j, t0 + dt.timedelta(minutes=3 * j + (j % 2)))
           for j in range(120)]
    intervals = spark.createDataFrame(
        ivs, "iv_id long, start_ts timestamp, end_ts timestamp")
    points = spark.createDataFrame(pts, "p_id long, ts timestamp")

    naive = sorted(
        (r.p_id, r.iv_id)
        for r in points.join(
            intervals,
            (F.col("ts") >= F.col("start_ts"))
            & (F.col("ts") <= F.col("end_ts"))).collect())
    assert naive  # non-trivial overlap structure
    for bin_s in (60, 900, 3600, 86400):
        got = sorted(
            (r.p_id, r.iv_id)
            for r in binned_interval_join(
                points, intervals, bin_seconds=bin_s).collect())
        assert got == naive, f"bin={bin_s}"


def test_global_rank_equals_global_window(spark):
    """Bit-identical to ROW_NUMBER() OVER (ORDER BY value, id) across
    bucket widths, including heavy ties and negative values."""
    from pyspark.sql import Window

    from inspectadb_spark.operators.scale import global_rank

    rows = [(i, (i * 37) % 100 - 50) for i in range(500)]
    rows += [(1000 + j, 7) for j in range(40)]  # heavy tie block
    df = spark.createDataFrame(rows, "id long, v long").repartition(13)
    want = {
        (r.id, r.rank)
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("v", "id"))).collect()
    }
    for width in (1, 10, 1000, 10**9):
        got = {(r.id, r.rank)
               for r in global_rank(df, "v", "id", bucket_width=width).collect()}
        assert got == want, f"width={width}"


def test_global_running_max_parity_with_naive_window(spark):
    """Distributed bucket-offset running high-watermark (q246's scale
    path) is bit-identical to the single-task global window, including
    NULL for the first row and across bucket boundaries."""
    from pyspark.sql import Window

    from inspectadb_spark.operators.scale import global_running_max

    rows = [(i, float((i * 37) % 101)) for i in range(5000)]
    df = spark.createDataFrame(rows, "seq bigint, v double").repartition(13)
    got = global_running_max(df, "seq", "v", bucket_width=250)
    naive = df.withColumn(
        "run_max",
        F.max("v").over(Window.orderBy("seq")
                        .rowsBetween(Window.unboundedPreceding, -1)))
    key = lambda r: r["seq"]  # noqa: E731
    g = sorted(got.collect(), key=key)
    n = sorted(naive.collect(), key=key)
    assert [(r["seq"], r["run_max"]) for r in g] == \
        [(r["seq"], r["run_max"]) for r in n]
    assert g[0]["run_max"] is None


def test_global_ntile_parity_with_naive_window(spark):
    """Closed-form bucket-offset NTILE (q156's scale path) is
    bit-identical to F.ntile over a single-task global window — ASC and
    DESC primary sorts, heavy ties, n < k, and uneven-tile remainders."""
    from pyspark.sql import Window

    from inspectadb_spark.operators.scale import global_ntile

    rows = [(i, (i * 37) % 23) for i in range(503)]  # 503 % 5 = 3 uneven
    rows += [(1000 + j, 7) for j in range(40)]       # heavy tie block
    df = spark.createDataFrame(rows, "id long, v long").repartition(13)

    naive_asc = {(r.id, r.t) for r in df.withColumn(
        "t", F.ntile(5).over(Window.orderBy("v", "id")).cast("int")
    ).collect()}
    naive_desc = {(r.id, r.t) for r in df.withColumn(
        "t", F.ntile(5).over(Window.orderBy(F.desc("v"), "id")).cast("int")
    ).collect()}
    for width in (1, 4, 1000):
        got_asc = {(r.id, r.t) for r in global_ntile(
            df, 5, F.expr(f"v DIV {width}"),
            [F.col("v"), F.col("id")], "t").collect()}
        assert got_asc == naive_asc, f"asc width={width}"
        got_desc = {(r.id, r.t) for r in global_ntile(
            df, 5, F.expr(f"(-v) DIV {width}"),
            [F.desc("v"), F.col("id")], "t").collect()}
        assert got_desc == naive_desc, f"desc width={width}"

    # n < k: each row gets its own tile, exactly like SQL NTILE
    tiny = spark.createDataFrame([(1, 10), (2, 20), (3, 30)],
                                 "id long, v long")
    got = {(r.id, r.t) for r in global_ntile(
        tiny, 5, F.expr("v DIV 100"), [F.col("v"), F.col("id")],
        "t").collect()}
    assert got == {(1, 1), (2, 2), (3, 3)}


def test_vocabulary_growth_bucketed_parity(spark):
    """The bucket-offset cumulative vocab_size (q136's scale path) is
    bit-identical to the naive global running sum across bucket widths."""
    from inspectadb_spark.operators.text import vocabulary_growth

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(6)))
         for i in range(120)],
        "doc_id bigint, text string")
    want = None
    for width in (1, 7, 1024, 10**9):
        got = sorted(
            (r.doc_id, r.n_new, r.vocab_size)
            for r in vocabulary_growth(docs, bucket_width=width).collect())
        if want is None:
            want = got
        assert got == want, f"width={width}"
    assert want[-1][2] == 40  # cumulative vocab reaches the full vocab


def test_global_avg_rank2_parity_with_naive_window(spark):
    """Distributed tie-averaged rank (x2) — the q273/q274 rank-statistic
    backbone — is bit-identical to the single-task global-window form
    rank2 = 2*RANK() + COUNT(*) OVER (PARTITION BY v) - 1, including
    heavy ties, negatives, and degenerate bucket widths."""
    from pyspark.sql import Window

    from inspectadb_spark.operators.scale import global_avg_rank2

    rows = [(i, (i * 37) % 100 - 50) for i in range(500)]
    rows += [(1000 + j, 7) for j in range(40)]  # heavy tie block
    df = spark.createDataFrame(rows, "id long, v long").repartition(13)
    want = {
        (r.id, r.rank2)
        for r in df.withColumn(
            "rank2",
            (F.lit(2) * F.rank().over(Window.orderBy("v"))
             + F.count("*").over(Window.partitionBy("v")) - 1)
            .cast("bigint")).collect()
    }
    for width in (1, 10, 1000, 10**9):
        got = {(r.id, r.rank2)
               for r in global_avg_rank2(df, "v", bucket_width=width).collect()}
        assert got == want, f"width={width}"


def test_with_group_stats_equals_groupby_joinback(spark):
    """r14 helper pin: with_group_stats ≡ the groupBy + inner-join-back it
    mechanizes (row-for-row), and its plan scans the input ONCE (the
    join-back shape pays one base scan per branch)."""
    from inspectadb_spark.operators.scale import with_group_stats
    from tests.conftest import SF_DIR

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    got = with_group_stats(
        df, ["o_custkey"],
        total=F.sum("o_totalprice"),
        n=F.count(F.lit(1)),
    )
    want = df.join(
        df.groupBy("o_custkey").agg(
            F.sum("o_totalprice").alias("total"),
            F.count(F.lit(1)).alias("n")),
        "o_custkey",
    ).select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    plan = got._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    assert final.count("Scan parquet") == 1
    assert "Join" not in final
