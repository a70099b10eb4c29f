"""Date-prefix predicates, expressed as sargable ranges.

The reference implements "ship date matches '1996', '1996-01', or
'1996-01-15'" by splitting the date string on '-' and comparing components
in a loop (``src/main/scala/.../assignment5/Q1.scala:42-51``, repeated in
Q2-Q6). Semantically that is a prefix-equality test.

We compile the prefix to a half-open timestamp range ``[start, end)``
instead of ``startswith`` on a formatted string: the range form is sargable,
so it reaches the Parquet scan as a min/max-prunable pushed filter — at
100 TB this is the difference between scanning one month and scanning the
whole fact table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def prefix_bounds(prefix: str) -> tuple[str, str]:
    """'1996' | '1996-03' | '1996-03-15' → half-open [start, end) bounds."""
    parts = prefix.split("-")
    if len(parts) == 1:
        y = int(parts[0])
        return f"{y:04d}-01-01", f"{y + 1:04d}-01-01"
    if len(parts) == 2:
        y, m = int(parts[0]), int(parts[1])
        ny, nm = (y + 1, 1) if m == 12 else (y, m + 1)
        return f"{y:04d}-{m:02d}-01", f"{ny:04d}-{nm:02d}-01"
    if len(parts) == 3:
        y, m, d = int(parts[0]), int(parts[1]), int(parts[2])
        # next day without datetime import edge cases: lean on days-in-month
        import calendar

        last = calendar.monthrange(y, m)[1]
        if d < last:
            return f"{y:04d}-{m:02d}-{d:02d}", f"{y:04d}-{m:02d}-{d + 1:02d}"
        ny, nm = (y + 1, 1) if m == 12 else (y, m + 1)
        return f"{y:04d}-{m:02d}-{d:02d}", f"{ny:04d}-{nm:02d}-01"
    raise ValueError(f"bad date prefix {prefix!r}")


def date_prefix_filter(col: Column, prefix: str) -> Column:
    """Spark predicate equivalent to the reference's prefix-equality check."""
    lo, hi = prefix_bounds(prefix)
    return (col >= F.lit(lo).cast("timestamp")) & (col < F.lit(hi).cast("timestamp"))


def date_prefix_sql(col: str, prefix: str) -> str:
    """Same predicate as ANSI SQL (DuckDB oracle)."""
    lo, hi = prefix_bounds(prefix)
    return f"({col} >= TIMESTAMP '{lo} 00:00:00' AND {col} < TIMESTAMP '{hi} 00:00:00')"
