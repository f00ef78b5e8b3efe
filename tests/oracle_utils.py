"""Local mirror of the driver's DuckDB-oracle comparison.

The driver sorts columns by name, then compares row-count + schema +
order-insensitive value hash. We reproduce that: sort columns by name,
normalize values, compare sorted row multisets with EXACT equality (floats
included — the queries themselves are responsible for rounding away
partial-aggregation noise, same contract as the driver's hash).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    # None is not orderable against floats/strs: sort on (is_none, repr)
    return tuple((v is None, str(v)) for v in row)


def spark_rows(df):
    cols = sorted(df.columns)
    data = df.select(*cols).collect()
    return sorted((tuple(_norm(v) for v in row) for row in data), key=_sort_key), cols


def duck_rows(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = cur.fetchall()
    return (
        sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=_sort_key),
        sorted(names),
    )


def assert_same(df, con, sql, name=""):
    s_rows, s_cols = spark_rows(df)
    d_rows, d_cols = duck_rows(con, sql)
    assert s_cols == d_cols, f"{name}: column names differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"
