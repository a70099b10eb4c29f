"""Keyed upsert / slowly-changing-dimension operators.

SURVEY §2.1 maps the reference's HBase sink (one Put per key,
``JAVA/assignment7/BuildInvertedIndexHBase.java:100-107``) to "a keyed
upsert table" capability. Without a transactional table format (Delta /
Iceberg jars are not in this image), MERGE semantics are composed from
anti-join + union — the standard emulation, expressed so the whole thing
is one shuffle per side on the key:

- ``upsert``: last-writer-wins merge of an updates batch into a current
  snapshot (HBase Put semantics);
- ``scd2_apply``: type-2 history — updated keys close their current row
  (valid_to = batch version) and append a new open row; full history is
  preserved with an ``is_current`` flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Last-writer-wins: rows from ``updates`` replace same-key rows in
    ``current``; unmatched current rows pass through. Columns must match."""
    untouched = current.join(updates.select(key), key, "left_anti")
    return untouched.unionByName(updates)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    version: int,
    version_col: str = "valid_from",
    end_col: str = "valid_to",
    flag_col: str = "is_current",
) -> DataFrame:
    """Apply an updates batch (payload columns only + key) to an SCD2
    history table at ``version``. Current rows for updated keys are closed
    (``valid_to = version``, flag dropped); updates append as new open
    rows (``valid_from = version``, ``valid_to`` null)."""
    upd_keys = updates.select(key)
    closed = (
        history.where(F.col(flag_col))
        .join(upd_keys, key, "left_semi")
        .withColumn(end_col, F.lit(version).cast("long"))
        .withColumn(flag_col, F.lit(False))
    )
    unchanged_current = history.where(F.col(flag_col)).join(
        upd_keys, key, "left_anti"
    )
    past = history.where(~F.col(flag_col))
    fresh = (
        updates.withColumn(version_col, F.lit(version).cast("long"))
        .withColumn(end_col, F.lit(None).cast("long"))
        .withColumn(flag_col, F.lit(True))
    )
    return past.unionByName(closed).unionByName(unchanged_current).unionByName(fresh)


def scd2_init(snapshot: DataFrame, version: int = 0,
              version_col: str = "valid_from", end_col: str = "valid_to",
              flag_col: str = "is_current") -> DataFrame:
    """Bootstrap an SCD2 history from a plain snapshot."""
    return (
        snapshot.withColumn(version_col, F.lit(version).cast("long"))
        .withColumn(end_col, F.lit(None).cast("long"))
        .withColumn(flag_col, F.lit(True))
    )


def scd2_point_in_time(
    history: DataFrame,
    probes: DataFrame,
    key: str,
    as_of_col: str = "as_of",
    version_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Feature-store point-in-time lookup: for each (key, as_of) probe,
    the SCD2 row whose validity range covers ``as_of`` (half-open
    [valid_from, valid_to), open rows = NULL valid_to).

    Physical shape: an equi-join on the key with the range predicate as
    a residual filter — per-key fanout is the key's version count
    (bounded by update history, never data volume), so this is a plain
    hash join at 100 TB, not a range/interval join problem. Each probe
    matches at most one version because SCD2 ranges partition the
    version axis per key — the training-set correctness property
    (no feature leakage from the future) that motivates PIT joins."""
    return (
        probes.join(history, key)
        .where(
            (F.col(version_col) <= F.col(as_of_col))
            & (F.col(end_col).isNull()
               | (F.col(as_of_col) < F.col(end_col)))
        )
    )
