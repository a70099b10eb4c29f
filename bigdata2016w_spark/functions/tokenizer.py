"""Tokenizers — JVM-side column expressions, no Python UDFs.

The reference has two variants:
- a0/a1/a2: whitespace split → lowercase → strip leading/trailing
  non-``[a-z]`` → drop empties (``JAVA/assignment0/WordCount.java:46-49``,
  ``SCALA/assignment2/Tokenizer.scala:7-13``);
- a5: strips ALL non-letters (``SCALA/assignment5/Tokenizer.scala:8-12``).

Both are pure ``pyspark.sql.functions`` compositions, so they stay inside
whole-stage codegen; ``*_sql`` twins build the identical DuckDB expression
for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_STRIP = r"(^[^a-z]+|[^a-z]+$)"


def tokenize(col: Column | str) -> Column:
    """a2-style tokens: array<string> of non-empty cleaned tokens."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(F.lower(col), r"\s+"),
                    lambda x: F.regexp_replace(x, _STRIP, "")),
        lambda x: x != F.lit(""),
    )


def tokenize_letters(col: Column | str) -> Column:
    """a5-style tokens: strip every non-letter character."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(F.split(F.lower(col), r"\s+"),
                    lambda x: F.regexp_replace(x, r"[^a-z]", "")),
        lambda x: x != F.lit(""),
    )


def tokenize_sql(col: str) -> str:
    """DuckDB expression computing exactly ``tokenize(col)``."""
    return (
        "list_filter(list_transform("
        f"string_split_regex(lower({col}), '\\s+'), "
        "x -> regexp_replace(x, '(^[^a-z]+|[^a-z]+$)', '', 'g')), "
        "x -> x <> '')"
    )


def tokenize_letters_sql(col: str) -> str:
    """DuckDB expression computing exactly ``tokenize_letters(col)``."""
    return (
        "list_filter(list_transform("
        f"string_split_regex(lower({col}), '\\s+'), "
        "x -> regexp_replace(x, '[^a-z]', '', 'g')), "
        "x -> x <> '')"
    )
