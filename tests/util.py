"""Order-insensitive result comparison mimicking the driver's check:
row count + column names + canonicalized value multiset."""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math


def canon_value(v):
    """Canonicalize a cell so Spark- and DuckDB-collected values compare equal.

    Type-STRICT between int and float: the driver canonicalizes through
    pandas, where a DuckDB HUGEINT becomes float64 and renders ``123.0``
    against Spark's bigint ``123`` — a hash mismatch. Merging them here
    (the pre-r05 behavior) hid exactly that defect class in CI
    (VERDICT r04 "What's wrong" #2/#3), so ints and floats now render
    distinctly and any cross-side int-vs-float divergence fails in-repo
    the way it would fail driver-side.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, _decimal.Decimal):
        f = float(v)
        return canon_value(f)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return f"{int(v)}.0"
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(columns, rows):
    """Sort columns by name, canonicalize cells, sort rows → list of tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in columns), out


def spark_result(df):
    rows = df.collect()
    return canon_rows(df.columns, [tuple(r) for r in rows])


def duckdb_result(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return canon_rows(cols, cur.fetchall())


def assert_matches(df, con, sql, name=""):
    scols, srows = spark_result(df)
    dcols, drows = duckdb_result(con, sql)
    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    for i, (a, b) in enumerate(zip(srows, drows)):
        assert a == b, f"{name}: row {i} differs:\n  spark={a}\n  duck ={b}"
