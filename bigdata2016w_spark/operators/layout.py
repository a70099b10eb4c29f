"""Portable Z-order (Morton) layout arithmetic as shared SQL text.

The production Z-order write path lives in
``sources/sinks.py`` (``zorder_value`` + ``write_zordered``:
range-partition + sort by the Morton key so parquet footer min/max
stats prune scans on EVERY clustered column; row-group skipping is
measured directly in tests/test_zorder.py). What that path cannot give
is an external correctness proof — ``repartitionByRange`` samples its
bounds and the column-expression Morton key lives only in Spark.

This module generates the SAME layout arithmetic as engine-portable
SQL TEXT: ``& | << >>`` parse identically in Spark and DuckDB and the
scaling uses exact bigint multiply-before-divide (no floats), so the
one generated string drives both the Spark plan and the DuckDB oracle
of ``plans/layout.py``'s skipping-stats query — only the integer-
division token differs between engines (Spark ``DIV``, DuckDB ``//``).

No reference analog (the reference never controls physical layout);
extends SURVEY §2.13 partition control the way bucketed/salted joins
extend §2.4.
"""

from __future__ import annotations

# default geometry: 8 bits per dimension (z fits in 16 bits for 2 dims);
# chunk id = top CHUNK_BITS of the z value -> 2^CHUNK_BITS fixed grid
# cells, the deterministic stand-in for "one parquet file/row-group"
BITS = 8
CHUNK_BITS = 8


def scaled_sql(col: str, cmin: str, cmax: str, bits: int, div: str) -> str:
    """Portable SQL scaling ``col`` from [cmin, cmax] onto the integer
    grid [0, 2^bits): exact bigint arithmetic (multiply before divide),
    no floats, so Spark and DuckDB agree bit-for-bit. ``div`` is the
    engine's integer-division token (``DIV`` for Spark, ``//`` for
    DuckDB) — the single syntax difference in this expression family.
    Every in-domain value lands in [0, 2^bits); when the domain span is
    at least the grid width the max value hits 2^bits - 1 exactly
    (range*width DIV (range+1)); narrower domains map monotonically
    onto a sparse prefix of the grid (fewer occupied cells — harmless,
    the envelope stats just cover fewer chunks)."""
    width = 1 << bits
    return f"((({col} - {cmin}) * {width}) {div} (({cmax} - {cmin}) + 1))"


def interleave_sql(x: str, y: str, bits: int) -> str:
    """Portable SQL Morton interleave of two ``bits``-wide non-negative
    ints: x's bit b lands at position 2b+1, y's at 2b (x is the high
    interleave; same curve family as ``sources.sinks.zorder_value``,
    column order reversed). Fully
    parenthesized so operator precedence cannot differ between engines;
    the OR-fold is exact because the per-term masks are disjoint."""
    terms = []
    for b in range(bits):
        terms.append(f"(((({x}) >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"(((({y}) >> {b}) & 1) << {2 * b})")
    return "(" + " | ".join(terms) + ")"
