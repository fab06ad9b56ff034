"""Schema-inspection audits (operators/quality.py discovery surface):
planted-violation hand cases proving every flag actually flips, plus the
NULL semantics the docstrings promise. Corpus-level correctness of
q240/q241/q242 is the DuckDB hash match in test_correctness.py.
"""

from __future__ import annotations

from pyspark.sql import Row

from inspectadb_spark.operators.quality import (
    fd_audit,
    inclusion_audit,
    key_candidates,
)


def test_inclusion_audit_flags_orphans_and_ignores_null_fks(spark):
    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=1), Row(fk=2), Row(fk=99), Row(fk=None)])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    good_parent = spark.createDataFrame(
        [Row(pk=1), Row(pk=2), Row(pk=99)])
    got = {r["relation"]: r for r in inclusion_audit([
        ("bad", child, "fk", parent, "pk"),
        ("good", child, "fk", good_parent, "pk"),
    ]).collect()}
    bad = got["bad"]
    # NULL fk contributes to neither rows nor keys
    assert bad["n_child_rows"] == 4 and bad["n_child_keys"] == 3
    assert bad["n_matched_keys"] == 2 and bad["n_orphan_keys"] == 1
    assert bad["containment_ppm"] == 2 * 1000000 // 3
    assert not bad["holds"]
    good = got["good"]
    assert good["holds"] and good["containment_ppm"] == 1000000


def test_inclusion_audit_all_null_fk_is_not_certified(spark):
    """Zero child keys = vacuous, not verified: holds must be false and
    the containment rate NULL, never a div-0 or a spurious green edge
    (ADVICE r05 item 4)."""
    child = spark.createDataFrame([Row(fk=None), Row(fk=None)], "fk int")
    parent = spark.createDataFrame([Row(pk=1)])
    row = inclusion_audit([("vacuous", child, "fk", parent, "pk")]).collect()[0]
    assert row["n_child_rows"] == 0 and row["n_child_keys"] == 0
    assert row["containment_ppm"] is None
    assert not row["holds"]


def test_fd_audit_counts_violating_groups_and_fanout(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=1, b="x"),      # consistent group
         Row(a=2, b="x"), Row(a=2, b="y"), Row(a=2, b="z"),  # fan-out 3
         Row(a=3, b="y")])
    got = {r["fd"]: r for r in fd_audit([
        ("a->b", df, ["a"], "b"),
        ("b->a", df, ["b"], "a"),
    ]).collect()}
    ab = got["a->b"]
    assert ab["n_groups"] == 3 and ab["n_violating"] == 1
    assert ab["max_rhs_per_group"] == 3 and not ab["holds"]
    # b->a: x -> {1,2}, y -> {2,3}, z -> {2}
    ba = got["b->a"]
    assert ba["n_groups"] == 3 and ba["n_violating"] == 2 and not ba["holds"]


def test_fd_audit_holds_on_determined_column(spark):
    df = spark.createDataFrame([Row(k=i, v=i % 2) for i in range(10)])
    row = fd_audit([("k->v", df, ["k"], "v")]).collect()[0]
    assert row["holds"] and row["n_violating"] == 0
    assert row["max_rhs_per_group"] == 1 and row["n_groups"] == 10


def test_key_candidates_composite_and_negative(spark):
    df = spark.createDataFrame(
        [Row(o=1, ln=1), Row(o=1, ln=2), Row(o=2, ln=1)])
    got = {r["key"]: r for r in key_candidates([
        ("composite", df, ["o", "ln"]),
        ("o_alone", df, ["o"]),
    ]).collect()}
    assert got["composite"]["is_key"] and got["composite"]["n_dup"] == 0
    assert not got["o_alone"]["is_key"] and got["o_alone"]["n_dup"] == 1


def test_enforce_inclusion_splits_and_null_policy(spark):
    from pyspark.sql import Row

    from inspectadb_spark.operators.quality import enforce_inclusion

    child = spark.createDataFrame(
        [Row(fk=1, v="a"), Row(fk=99, v="b"), Row(fk=None, v="c")])
    parent = spark.createDataFrame([Row(pk=1)])
    clean, quar = enforce_inclusion(child, parent, "fk", "pk")
    assert {r["v"] for r in clean.collect()} == {"a", "c"}
    assert {r["v"] for r in quar.collect()} == {"b"}
    strict_clean, strict_quar = enforce_inclusion(
        child, parent, "fk", "pk", null_is_valid=False)
    assert {r["v"] for r in strict_clean.collect()} == {"a"}
    assert {r["v"] for r in strict_quar.collect()} == {"b", "c"}
    # columns are passed through unchanged (no probe residue)
    assert clean.columns == child.columns
