"""End-to-end pipeline integration: the reference product's core workflow
(CDC snapshot+incremental -> current state -> quality gate -> downstream
analytics/sink) and an LLM-data curation pass (blobs -> dedup -> stats ->
partitioned corpus), each chained through the engine's own operators."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_cdc_snapshot_plus_incremental_to_quality_gate(spark):
    from inspectadb_spark.operators.cdc import apply_changelog
    from inspectadb_spark.operators.quality import referential_orphans, uniqueness
    from inspectadb_spark.queries.registry import tables
    from inspectadb_spark.sources.cdc import derive_cdc_orders

    t = tables(spark, SF_DIR)
    cdc = derive_cdc_orders(t["orders"])

    # split the log at a point: the prefix acts as the initial snapshot load,
    # the suffix as incremental redelivery (with overlap = at-least-once)
    mid = cdc.approxQuantile("lsn", [0.6], 0.0)[0]
    snapshot = cdc.filter(F.col("lsn") <= mid)
    incremental = cdc.filter(F.col("lsn") >= mid - 5)  # overlapping redelivery
    merged = snapshot.unionByName(incremental)
    state = apply_changelog(merged, ["o_orderkey"])

    # idempotence under redelivery: same state as applying the whole log once
    direct = apply_changelog(cdc, ["o_orderkey"])
    assert sorted(map(tuple, state.collect())) == sorted(map(tuple, direct.collect()))

    # quality gate over the current state
    u = uniqueness(state, ["o_orderkey"]).first()
    assert u["n_dup"] == 0
    orphans = referential_orphans(state, t["customer"], "o_custkey", "c_custkey")
    assert orphans.count() == 0


def test_document_curation_pipeline(spark, tmp_path):
    from inspectadb_spark.operators.cluster import dedup_keep_canonical
    from inspectadb_spark.operators.dedup import jaccard_similar_pairs
    from inspectadb_spark.operators.multimodal import attach_image_blobs
    from inspectadb_spark.operators.text import token_stats
    from inspectadb_spark.sources.files import write_partitioned

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. near-dup removal (blocked Jaccard -> components -> canonical keep)
    pairs = jaccard_similar_pairs(docs, block_col="lang", threshold=0.8)
    deduped = dedup_keep_canonical(docs, pairs)
    assert deduped.count() <= docs.count()
    assert deduped.select("doc_id").distinct().count() == deduped.count()

    # 2. enrich: token accounting + multimodal payloads survive the chain
    enriched = attach_image_blobs(deduped, width=8, height=8).join(
        token_stats(deduped), "doc_id"
    )
    assert enriched.filter(F.col("n_ws") <= 0).count() == 0

    # 3. partitioned corpus sink; reading one lang partition prunes the rest
    out = str(tmp_path / "corpus")
    write_partitioned(enriched.select("doc_id", "lang", "n_ws", "n_bpe"), out, ["lang"])
    langs_on_disk = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    assert langs_on_disk == {r["lang"] for r in deduped.select("lang").distinct().collect()}
    en = spark.read.parquet(out).filter(F.col("lang") == "en")
    assert en.count() == deduped.filter(F.col("lang") == "en").count()


# -- replication verification (operators/cdc.py::table_diff/table_checksum) --

def test_table_diff_classifies_all_three_drifts(spark):
    from inspectadb_spark.operators.cdc import table_diff

    before = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k int, s string, v int",
    )
    after = spark.createDataFrame(
        [(1, "a", 10),          # same -> excluded
         (2, "B", 20),          # update
         (4, None, 40),         # same incl. NULL column -> excluded
         (5, "e", 50)],         # insert
        "k int, s string, v int",
    )
    got = {r["k"]: r["change"]
           for r in table_diff(before, after, ["k"], ["s", "v"]).collect()}
    assert got == {2: "update", 3: "delete", 5: "insert"}


def test_table_diff_null_vs_value_is_an_update(spark):
    from inspectadb_spark.operators.cdc import table_diff

    before = spark.createDataFrame([(1, None)], "k int, s string")
    after = spark.createDataFrame([(1, "x")], "k int, s string")
    rows = table_diff(before, after, ["k"], ["s"]).collect()
    assert [(r["k"], r["change"]) for r in rows] == [(1, "update")]


def test_table_checksum_is_order_and_partitioning_invariant(spark):
    from inspectadb_spark.operators.cdc import table_checksum

    rows = [(i, f"s{i % 7}", i * 3) for i in range(200)]
    a = spark.createDataFrame(rows, "k bigint, s string, v bigint")
    b = spark.createDataFrame(rows[::-1], "k bigint, s string, v bigint").repartition(13)
    ca = sorted(map(tuple, table_checksum(a, "k", ["s", "v"]).collect()))
    cb = sorted(map(tuple, table_checksum(b, "k", ["s", "v"]).collect()))
    assert ca == cb


def test_table_checksum_localizes_a_single_row_change(spark):
    from inspectadb_spark.operators.cdc import table_checksum

    rows = [(i, f"s{i}", i) for i in range(64)]
    a = spark.createDataFrame(rows, "k bigint, s string, v bigint")
    tampered = [(k, s, v + 1 if k == 37 else v) for k, s, v in rows]
    b = spark.createDataFrame(tampered, "k bigint, s string, v bigint")
    ca = {r["bucket"]: tuple(r)[1:] for r in table_checksum(a, "k", ["s", "v"]).collect()}
    cb = {r["bucket"]: tuple(r)[1:] for r in table_checksum(b, "k", ["s", "v"]).collect()}
    diff_buckets = [bkt for bkt in ca if ca[bkt] != cb[bkt]]
    assert diff_buckets == [37 % 16]


def test_merge_apply_row_fates(spark):
    from inspectadb_spark.operators.cdc import merge_apply
    from pyspark.sql import functions as F

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k bigint, s string, v double"
    )
    source = spark.createDataFrame(
        [(2, "B", 200.0), (3, "C", 300.0), (4, "d", 40.0)], "k bigint, s string, v double"
    )
    out = merge_apply(
        target, source, ["k"],
        update_cols={"v": F.expr("s.v")},
        delete_condition=F.expr("s.s = 'C'"),
    )
    got = {r["k"]: (r["s"], r["v"]) for r in out.collect()}
    # 1: target-only kept; 2: matched updated (v from source, s from target);
    # 3: matched + delete condition -> gone; 4: source-only inserted.
    assert got == {1: ("a", 10.0), 2: ("b", 200.0), 4: ("d", 40.0)}


def test_merge_apply_no_insert(spark):
    from inspectadb_spark.operators.cdc import merge_apply

    target = spark.createDataFrame([(1, 10.0)], "k bigint, v double")
    source = spark.createDataFrame([(1, 100.0), (9, 90.0)], "k bigint, v double")
    out = merge_apply(target, source, ["k"], insert_unmatched=False)
    assert {r["k"]: r["v"] for r in out.collect()} == {1: 10.0}


def test_merge_apply_null_delete_condition_falls_through_to_update(spark):
    """SQL MERGE 3VL: a NULL WHEN-MATCHED-AND condition is NOT a delete —
    the matched row must fall through to the update."""
    from inspectadb_spark.operators.cdc import merge_apply
    from pyspark.sql import functions as F

    target = spark.createDataFrame([(1, "a", 10.0)], "k bigint, s string, v double")
    source = spark.createDataFrame(
        [(1, None, 100.0)], "k bigint, s string, v double"
    )
    out = merge_apply(
        target, source, ["k"],
        update_cols={"v": F.expr("s.v")},
        delete_condition=F.expr("s.s = 'DELETE'"),  # NULL for this row
    )
    assert {r["k"]: (r["s"], r["v"]) for r in out.collect()} == {1: ("a", 100.0)}


def test_merge_apply_null_keys(spark):
    """eqNullSafe joins NULL<=>NULL keys: such a pair is a MATCH (updated),
    a target-only NULL-key row is kept, and classification never keys off
    key nullability."""
    from inspectadb_spark.operators.cdc import merge_apply
    from pyspark.sql import functions as F

    target = spark.createDataFrame(
        [(None, "t-null", 1.0), (1, "a", 10.0)], "k bigint, s string, v double"
    )
    # source matches the NULL key; no source row for k=1
    source = spark.createDataFrame([(None, "s-null", 99.0)], "k bigint, s string, v double")
    out = merge_apply(target, source, ["k"], update_cols={"v": F.expr("s.v")})
    got = {r["s"]: (r["k"], r["v"]) for r in out.collect()}
    # NULL-key pair matched -> v updated, s kept from target; k=1 kept as-is
    assert got == {"t-null": (None, 99.0), "a": (1, 10.0)}
    # target-only NULL-key row when source is empty: kept unchanged
    empty = spark.createDataFrame([], "k bigint, s string, v double")
    out2 = merge_apply(target, empty, ["k"])
    got2 = {r["s"]: (r["k"], r["v"]) for r in out2.collect()}
    assert got2 == {"t-null": (None, 1.0), "a": (1, 10.0)}
