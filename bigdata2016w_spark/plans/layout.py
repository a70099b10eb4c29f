"""Z-order layout: file-skipping effectiveness query.

``lineitem_zorder_skipping`` compares three physical layouts of
``lineitem`` — Z-order on (l_partkey, l_suppkey), linear sort on
l_partkey alone, and natural (orderkey arrival) order — by the only
metric that matters to a 100-TB reader: how many file-sized chunks a
min/max-pruning scan skips for range predicates on each dimension, and
how many rows the conjunctive predicate still has to scan. Z-order
skips on BOTH dimensions; the linear layout only on its sort column;
natural order on neither. No reference analog (the reference never
controls layout); extends SURVEY §2.13 partition control. The
production write path is ``sources/sinks.write_zordered`` (range-
partition + sort by the Morton key; row-group skipping measured from
parquet footers in tests/test_zorder.py) — this query is its
deterministic, oracle-verifiable twin: fixed-grid chunking stands in
for the sampled range bounds, and the skip counts externally prove the
multi-dimension pruning claim the sink's docstring makes.

The entire layout arithmetic (scale, Morton interleave, chunking) is
generated as portable SQL text shared verbatim with the DuckDB oracle —
only the integer-division token differs (Spark ``DIV``, DuckDB ``//``).
Plan shape: one map-only 3x stack expansion over the scan + two hash
aggs on at most strategies x 2^CHUNK_BITS groups. No global sort, no
window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.operators.layout import (
    BITS,
    CHUNK_BITS,
    interleave_sql,
    scaled_sql,
)
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

# range predicates the skipping stats evaluate: the 10%..30% band of
# each key's observed domain, derived with exact integer arithmetic so
# they are meaningful at every SF (key domains shrink with the
# generator's scale factor — fixed literals would go degenerate)
PRED_LO_PCT, PRED_HI_PCT = 10, 30

_Z_SHIFT = 2 * BITS - CHUNK_BITS  # top CHUNK_BITS of the 2*BITS z value


def _bound_sql(lo: str, hi: str, pct: int, div: str) -> str:
    return f"({lo} + ((({hi} - {lo}) * {pct}) {div} 100))"


def _pred_bounds_sql(div: str) -> dict[str, str]:
    return {
        "plo": _bound_sql("_xmin", "_xmax", PRED_LO_PCT, div),
        "phi": _bound_sql("_xmin", "_xmax", PRED_HI_PCT, div),
        "slo": _bound_sql("_ymin", "_ymax", PRED_LO_PCT, div),
        "shi": _bound_sql("_ymin", "_ymax", PRED_HI_PCT, div),
    }


def _chunk_exprs(div: str) -> tuple[str, str, str]:
    """(linear, natural, zorder) chunk-id SQL over the stats-joined scan
    — shared text between the Spark plan and the DuckDB oracle."""
    ps = scaled_sql("l_partkey", "_xmin", "_xmax", BITS, div)
    ss = scaled_sql("l_suppkey", "_ymin", "_ymax", BITS, div)
    oc = scaled_sql("l_orderkey", "_omin", "_omax", CHUNK_BITS, div)
    z_chunk = f"({interleave_sql(ps, ss, BITS)} >> {_Z_SHIFT})"
    return ps, oc, z_chunk


# skip tests run against the per-chunk envelope JOINED BACK to the
# 1-row bounds frame (256·strategies rows — trivial broadcast)
_SKIP_PART = "pxmax < plo OR pxmin > phi"
_SKIP_SUPP = "symax < slo OR symin > shi"


def lineitem_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    stats = li.agg(
        F.min("l_partkey").alias("_xmin"), F.max("l_partkey").alias("_xmax"),
        F.min("l_suppkey").alias("_ymin"), F.max("l_suppkey").alias("_ymax"),
        F.min("l_orderkey").alias("_omin"), F.max("l_orderkey").alias("_omax"),
    )
    lin, nat, zor = _chunk_exprs("DIV")
    tagged = li.crossJoin(F.broadcast(stats)).selectExpr(
        "l_partkey",
        "l_suppkey",
        f"stack(3, 'linear_partkey', {lin},"
        f" 'natural_orderkey', {nat},"
        f" 'zorder_part_supp', {zor}) AS (strategy, chunk)",
    )
    bounds = stats.selectExpr(
        *[f"{sql} AS {name}" for name, sql in _pred_bounds_sql("DIV").items()]
    )
    env = tagged.groupBy("strategy", "chunk").agg(
        F.min("l_partkey").alias("pxmin"), F.max("l_partkey").alias("pxmax"),
        F.min("l_suppkey").alias("symin"), F.max("l_suppkey").alias("symax"),
        F.count("*").alias("nrows"),
    ).crossJoin(F.broadcast(bounds))
    skip_part = F.expr(_SKIP_PART)
    skip_supp = F.expr(_SKIP_SUPP)
    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    return (
        env.groupBy("strategy")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(skip_part, one).otherwise(zero)).alias("skip_part"),
            F.sum(F.when(skip_supp, one).otherwise(zero)).alias("skip_supp"),
            F.sum(F.when(skip_part | skip_supp, one).otherwise(zero))
            .alias("skip_conj"),
            F.sum(F.when(~(skip_part | skip_supp), F.col("nrows"))
                  .otherwise(zero)).alias("rows_scanned_conj"),
        )
        .orderBy("strategy")
    )


def _oracle() -> str:
    lin, nat, zor = _chunk_exprs("//")
    pb = _pred_bounds_sql("//")
    return f"""
WITH stats AS (
  SELECT min(l_partkey) AS _xmin, max(l_partkey) AS _xmax,
         min(l_suppkey) AS _ymin, max(l_suppkey) AS _ymax,
         min(l_orderkey) AS _omin, max(l_orderkey) AS _omax
  FROM lineitem
), bounds AS (
  SELECT {', '.join(f"{sql} AS {name}" for name, sql in pb.items())}
  FROM stats
), joined AS (
  SELECT l_orderkey, l_partkey, l_suppkey,
         _xmin, _xmax, _ymin, _ymax, _omin, _omax
  FROM lineitem CROSS JOIN stats
), tagged AS (
  SELECT 'linear_partkey' AS strategy, {lin} AS chunk,
         l_partkey, l_suppkey FROM joined
  UNION ALL
  SELECT 'natural_orderkey', {nat}, l_partkey, l_suppkey FROM joined
  UNION ALL
  SELECT 'zorder_part_supp', {zor}, l_partkey, l_suppkey FROM joined
), env AS (
  SELECT strategy, chunk,
         min(l_partkey) AS pxmin, max(l_partkey) AS pxmax,
         min(l_suppkey) AS symin, max(l_suppkey) AS symax,
         count(*) AS nrows
  FROM tagged GROUP BY strategy, chunk
), env_b AS (
  SELECT * FROM env CROSS JOIN bounds
)
SELECT strategy,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN {_SKIP_PART} THEN 1 ELSE 0 END) AS BIGINT)
         AS skip_part,
       CAST(sum(CASE WHEN {_SKIP_SUPP} THEN 1 ELSE 0 END) AS BIGINT)
         AS skip_supp,
       CAST(sum(CASE WHEN ({_SKIP_PART}) OR ({_SKIP_SUPP}) THEN 1 ELSE 0 END)
            AS BIGINT) AS skip_conj,
       CAST(sum(CASE WHEN NOT (({_SKIP_PART}) OR ({_SKIP_SUPP}))
                THEN nrows ELSE 0 END) AS BIGINT) AS rows_scanned_conj
FROM env_b GROUP BY strategy ORDER BY strategy
"""


register(QuerySpec(
    "lineitem_zorder_skipping",
    lineitem_zorder_skipping,
    _oracle(),
    doc="Z-order vs linear vs natural layout: min/max chunk-skipping "
        "counts and conjunctive-scan row cost (operators/layout.py; "
        "portable bit-arithmetic oracle).",
))
