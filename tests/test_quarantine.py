"""Corrupt-record quarantine ingest (sources/files.py): every input line
lands in exactly one of (good, quarantined); quarantined lines keep their
raw bytes for replay; the split is total-preserving at any scale."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType,
)

from inspectadb_spark.sources.files import (
    read_csv_with_quarantine,
    read_json_with_quarantine,
)

SCHEMA = StructType([
    StructField("id", IntegerType()),
    StructField("name", StringType()),
])


def test_json_quarantine_total_preserving(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    good_lines = [f'{{"id": {i}, "name": "row{i}"}}' for i in range(20)]
    bad_lines = ['{"id": 3, "name": "unclosed',
                 'not json at all',
                 '[1, 2, 3]']  # an array is not an object row
    lines = good_lines[:10] + bad_lines + good_lines[10:]
    src.write_text("\n".join(lines) + "\n")

    qdir = str(tmp_path / "quarantine")
    good, bad = read_json_with_quarantine(
        spark, str(src), SCHEMA, quarantine_path=qdir)

    assert good.count() == 20
    assert {r.id for r in good.collect()} == set(range(20))
    got_bad = sorted(r.value for r in bad.collect())
    assert got_bad == sorted(bad_lines)
    # the quarantine sink holds the same raw bytes (bad side re-reads it)
    replay = sorted(r.value for r in spark.read.text(qdir).collect())
    assert replay == sorted(bad_lines)
    # total-preserving: every non-empty input line is in exactly one side
    assert good.count() + bad.count() == len(lines)


def test_json_quarantine_is_strict_about_field_types(spark, tmp_path):
    src = tmp_path / "typed.jsonl"
    src.write_text('{"id": "NaN-ish", "name": "x"}\n{"id": 7, "name": "y"}\n')
    good, bad = read_json_with_quarantine(spark, str(src), SCHEMA)
    # STRICT contract: a wrong-typed field quarantines the whole line (the
    # plain PERMISSIVE reader would keep it with a silently-nulled field)
    assert {(r.id, r.name) for r in good.collect()} == {(7, "y")}
    assert [r.value for r in bad.collect()] == ['{"id": "NaN-ish", "name": "x"}']


def test_csv_quarantine_total_preserving(spark, tmp_path):
    src = tmp_path / "in.csv"
    good_lines = [f"{i},row{i}" for i in range(15)]
    # the classes univocity flags: extra column, wrong-typed field, missing
    # column. (An unclosed quote is NOT flagged — the parser consumes to
    # end-of-line and yields the unquoted text, CSV's usual leniency.)
    bad_lines = ["91,row91,extra", "xx,badtype", "92"]
    lines = good_lines[:7] + bad_lines + good_lines[7:]
    src.write_text("\n".join(lines) + "\n")

    good, bad = read_csv_with_quarantine(spark, str(src), SCHEMA)
    assert good.count() == 15
    assert {r.id for r in good.collect()} == set(range(15))
    assert sorted(r.value for r in bad.collect()) == sorted(bad_lines)
    assert good.count() + bad.count() == len(lines)


def test_quarantine_split_is_scan_side(spark, tmp_path):
    from inspectadb_spark.operators.scale import explain_str

    src = tmp_path / "plan.jsonl"
    src.write_text('{"id": 1, "name": "a"}\n')
    good, _ = read_json_with_quarantine(spark, str(src), SCHEMA)
    # one text scan + codegen projection/filter: no exchange, no Python
    plan = explain_str(good, "simple")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_blank_lines_quarantine_not_vanish(spark, tmp_path):
    """Whitespace-only lines are malformed records, not invisible: they
    must land in quarantine (from_csv('') would even parse to a silent
    all-null 'good' row), so count(good) + count(bad) equals the raw line
    count with no exception for blanks."""
    src = tmp_path / "in.jsonl"
    lines = ['{"id": 1, "name": "a"}', '', '   ', '{"id": 2, "name": "b"}']
    src.write_text("\n".join(lines) + "\n")
    good, bad = read_json_with_quarantine(spark, str(src), SCHEMA)
    n_raw = spark.read.text(str(src)).count()
    assert good.count() == 2
    assert good.count() + bad.count() == n_raw
    assert sorted(r.value for r in bad.collect()) == ["", "   "]

    csv_src = tmp_path / "in.csv"
    csv_src.write_text("1,a\n\n2,b\n")
    goodc, badc = read_csv_with_quarantine(spark, str(csv_src), SCHEMA)
    # the empty line must NOT become an all-null good row
    assert goodc.count() == 2
    assert goodc.filter("id IS NULL").count() == 0
    assert badc.count() == spark.read.text(str(csv_src)).count() - 2
