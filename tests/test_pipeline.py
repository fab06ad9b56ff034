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
