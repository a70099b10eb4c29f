"""Merkle-style table reconciliation: order-independent per-partition
content digests + the digest diff that pinpoints divergent partitions.

The generic operator half of ``plans/maintenance.orders_replica_reconcile``
(which supplies its own md5-portable hasher so the DuckDB oracle replays
it); the default hasher here is one-pass xxhash64 — the production
family, like every other operator's scale path. At 100 TB two replicas
reconcile by exchanging the digest table (one row per partition, KB not
TB) and re-syncing only partitions whose digests differ.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_digests(
    df: DataFrame,
    partition_col: Column,
    canon: Column,
    hasher: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """(part, n, digest): row count + order-independent content digest
    per partition. ``canon`` is the caller's canonical row string (the
    caller owns canonicalization — key order, money-as-cents, timestamp
    formatting); the digest is the SUM of row hashes in DECIMAL(38,0),
    commutative and associative, so replicas with different partition
    layouts / merge orders still agree bit-for-bit."""
    h = (hasher or F.xxhash64)(canon)
    return (
        df.select(partition_col.alias("part"),
                  h.cast("decimal(38,0)").alias("h"))
        .groupBy("part")
        .agg(F.count("*").alias("n"), F.sum("h").alias("digest"))
    )


def reconcile_digests(a: DataFrame, b: DataFrame) -> DataFrame:
    """FULL OUTER diff of two digest tables → one row per partition:
    (part, n_primary, n_replica, digests_match, rows_missing). A
    partition missing on either side surfaces with its full row
    delta; equal counts with different content still mismatch (the
    content digest, not the count, is the verdict)."""
    aa, bb = a.alias("a"), b.alias("b")
    return (
        aa.join(bb, F.col("a.part") == F.col("b.part"), "full_outer")
        .select(
            F.coalesce(F.col("a.part"), F.col("b.part")).alias("part"),
            F.coalesce(F.col("a.n"), F.lit(0)).alias("n_primary"),
            F.coalesce(F.col("b.n"), F.lit(0)).alias("n_replica"),
            F.col("a.digest").eqNullSafe(F.col("b.digest"))
            .alias("digests_match"),
            (F.coalesce(F.col("a.n"), F.lit(0))
             - F.coalesce(F.col("b.n"), F.lit(0))).alias("rows_missing"),
        )
    )


def default_canon(df: DataFrame) -> Column:
    """Deterministic whole-row canonical string: every column cast to
    string in NAME order, NULLs as an explicit sentinel (concat_ws
    would silently skip them, making (NULL,'x') collide with ('x',)).
    Single-engine use (the CLI compares two parquet dirs with the same
    Spark) — cross-engine oracles supply their own canon."""
    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL\x00"))
        for c in sorted(df.columns)
    ]
    return F.concat_ws("|", *cols)
