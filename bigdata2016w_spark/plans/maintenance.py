"""Table-maintenance queries: ANALYZE-style column statistics.

Registered from a module appended last in the registry (after
plans.traversal) so the round driver's position-sensitive 50-query
correctness window is not displaced — see registry._SPEC_MODULES.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata2016w_spark.operators.dedup import portable_hash60
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

_STAT_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
              "o_orderpriority"]


def orders_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE equivalent: per-column row/null/exact-distinct
    counts in ONE scan — a single aggregate computes every column's
    stats, then an in-plan stack pivots them to rows. The numbers the
    cost-based optimizer (and any data-quality monitor) needs; at scale
    swap exact count(distinct) for approx_count_distinct per column."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _STAT_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    wide = orders.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _STAT_COLS
    )
    return wide.selectExpr(
        f"stack({len(_STAT_COLS)}, {stack}) AS (column, n_nulls, n_distinct)",
        "n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct")


_STATS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", (SELECT count(*) FROM orders) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct
FROM orders"""
    for c in _STAT_COLS
)

register(QuerySpec("orders_column_stats", orders_column_stats, _STATS_SQL,
                   doc=orders_column_stats.__doc__))


# ---------------------------------------------------------------------------
# Deequ-style constraint audit
# ---------------------------------------------------------------------------

# (constraint name, violation predicate over the orders scan). Everything
# below is evaluated in ONE aggregate pass — a violation count per rule —
# so adding a rule never adds a scan. The price-cap rule is a deliberately
# tight business threshold (25% of the generator's price domain) so the
# audit demonstrably reports non-zero violations and a failing verdict;
# the structural rules all pass on the clean synthetic tables.
_SCAN_RULES = [
    ("not_null:o_custkey", "o_custkey IS NULL"),
    ("not_null:o_orderdate", "o_orderdate IS NULL"),
    ("domain:o_orderstatus", "o_orderstatus NOT IN ('O', 'F', 'P')"),
    ("range:o_totalprice_positive", "o_totalprice <= 0"),
    ("rule:o_totalprice_cap_125k", "o_totalprice > 125000"),
]


def orders_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite (Deequ/Great-Expectations style):
    per-rule violation counts + pass verdicts as ONE small DataFrame.

    Three physical shapes, each the cheapest that can prove its rule at
    100 TB: (1) row-level rules fold into a single aggregate over one
    scan of ``orders`` (a violation is `sum(predicate)` — adding rules
    is free); (2) key uniqueness is `count(*) - count(distinct key)`
    in the same pass; (3) referential integrity is a LEFT ANTI join
    against the referenced key set (shuffle- or broadcast-hash per
    Catalyst/AQE; never a driver-side lookup). The three 1-row frames
    cross-join (broadcast, 1x1 rows) and an in-plan ``stack`` pivots to
    one row per rule. No reference analog — the reference never audits
    its inputs; extends SURVEY §2.13 infrastructure the way a
    production ingest gate would."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    aggs = [F.count("*").alias("n_rows"),
            (F.count("*") - F.count_distinct(F.col("o_orderkey")))
            .alias("v_unique")]
    for i, (_, pred) in enumerate(_SCAN_RULES):
        # coalesce: an EMPTY batch has zero violations and passes the
        # gate — sum-over-nothing must not yield NULL verdicts
        aggs.append(
            F.coalesce(F.sum(F.expr(pred).cast("long")), F.lit(0))
            .alias(f"v_{i}")
        )
    scan_stats = orders.agg(*aggs)
    fk_stats = (
        orders.join(customer,
                    orders.o_custkey == customer.c_custkey, "left_anti")
        .agg(F.count("*").alias("v_fk"))
    )
    stack = ", ".join(
        ["'unique:o_orderkey', v_unique",
         "'fk:o_custkey->customer', v_fk"]
        + [f"'{name}', v_{i}" for i, (name, _) in enumerate(_SCAN_RULES)]
    )
    n_rules = 2 + len(_SCAN_RULES)
    return (
        scan_stats.crossJoin(F.broadcast(fk_stats))
        .selectExpr(
            f"stack({n_rules}, {stack}) AS (rule, n_violations)",
            "n_rows",
        )
        .select(
            "rule", "n_rows", "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("rule")
    )


_AUDIT_SQL = f"""
WITH scan AS (
  SELECT count(*) AS n_rows,
         count(*) - count(DISTINCT o_orderkey) AS v_unique,
         {', '.join(
             "CAST(coalesce(sum(CASE WHEN " + pred
             + " THEN 1 ELSE 0 END), 0) AS BIGINT)"
             f" AS v_{i}" for i, (_, pred) in enumerate(_SCAN_RULES))}
  FROM orders
), fk AS (
  SELECT count(*) AS v_fk
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL
), rules AS (
  SELECT 'unique:o_orderkey' AS rule, v_unique AS n_violations,
         n_rows FROM scan
  UNION ALL
  SELECT 'fk:o_custkey->customer', v_fk, n_rows FROM scan CROSS JOIN fk
  {''.join(
      f"UNION ALL SELECT '{name}', v_{i}, n_rows FROM scan "
      for i, (name, _) in enumerate(_SCAN_RULES))}
)
SELECT rule, n_rows, n_violations,
       n_violations = 0 AS passed
FROM rules ORDER BY rule
"""

register(QuerySpec("orders_constraint_audit", orders_constraint_audit,
                   _AUDIT_SQL, doc=orders_constraint_audit.__doc__))


# ---------------------------------------------------------------------------
# Incremental view maintenance (delta-join algebra)
# ---------------------------------------------------------------------------

# deterministic 15% "new arrivals" slice — the delta batch an ingest
# cycle would append; pure key arithmetic so the Spark plan and the
# DuckDB oracle split identically
_DELTA_PRED = "o_orderkey % 20 IN (7, 11, 19)"


def nation_revenue_delta(
    part: DataFrame, dim: DataFrame, bcast_dim: bool = True
) -> DataFrame:
    """ΔV of the customer⋈orders nation-revenue view over one batch of
    order rows: (c_nationkey, revenue DECIMAL(18,2), n_orders). THE
    single definition of the view's delta — shared by the batch IVM
    query below and the streaming sink (streaming/ivm.py), so the
    "same view" contract between them is enforced by construction."""
    dimc = dim.select("c_custkey", "c_nationkey")
    d = F.broadcast(dimc) if bcast_dim else dimc
    return (
        part.select(
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .join(d, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            F.sum("price").cast("decimal(18,2)").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def orders_ivm_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN-aggregate view: revenue and
    order count per customer nation, maintained as V_base ⊕ ΔV rather
    than recomputed.

    The view is ``customer ⋈ orders → groupBy(c_nationkey)``; orders
    split into a base load and a 15% delta batch (`o_orderkey`
    arithmetic — deterministic at every SF). Delta algebra for a
    static dimension: ΔV = customer ⋈ Δorders aggregated, then merged
    into V_base with a full-outer coalesce-sum on the group key. At
    100 TB the delta batch is orders of magnitude smaller than the
    base, so ΔV is a broadcast-joined agg over just the new rows and
    the merge shuffles only |distinct keys| rows — the whole point vs
    a from-scratch rebuild that re-shuffles the full fact table. Money
    math in DECIMAL(18,2): exact, order-independent, so the
    incrementally-maintained view must equal the oracle's from-scratch
    recompute bit-for-bit — which is exactly what the oracle checks.
    The DECIMAL total is cast to DOUBLE only at the output boundary,
    the convention every other money query in the registry follows
    (plans/analytics.py _ROLLUP_SQL) so external hash canonicalization
    sees one numeric type; the merge algebra stays exact inside.
    No reference analog; extends SURVEY §2.5 aggregation toward the
    incremental pipelines a daily 100-TB ingest needs."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    is_delta = F.expr(_DELTA_PRED)

    v_base = nation_revenue_delta(orders.where(~is_delta), customer,
                                  bcast_dim=False)
    dv = nation_revenue_delta(orders.where(is_delta), customer,
                              bcast_dim=True)
    b, d = v_base.alias("b"), dv.alias("d")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        b.join(d, F.col("b.c_nationkey") == F.col("d.c_nationkey"),
               "full_outer")
        .select(
            F.coalesce(F.col("b.c_nationkey"), F.col("d.c_nationkey"))
            .alias("c_nationkey"),
            (F.coalesce(F.col("b.revenue"), zero)
             + F.coalesce(F.col("d.revenue"), zero))
            .cast("decimal(18,2)").cast("double").alias("revenue"),
            (F.coalesce(F.col("b.n_orders"), F.lit(0))
             + F.coalesce(F.col("d.n_orders"), F.lit(0)))
            .alias("n_orders"),
        )
        .orderBy("c_nationkey")
    )


# the oracle recomputes the view FROM SCRATCH over all orders — equality
# proves the delta-merge algebra, not just the arithmetic. The exact
# DECIMAL(18,2) sum is cast to DOUBLE at the output edge on BOTH sides
# (cent totals ≪ 2^53, so the cast is lossless).
_IVM_SQL = """
SELECT c_nationkey,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
ORDER BY c_nationkey
"""

register(QuerySpec("orders_ivm_nation_revenue", orders_ivm_nation_revenue,
                   _IVM_SQL, doc=orders_ivm_nation_revenue.__doc__))


# retraction split: inserts arrive, AND some base rows are deleted —
# the full delta-algebra case (insert-only above is its special case).
# Pure key arithmetic so both engines split identically.
_IVM_INS_PRED = "o_orderkey % 20 IN (11, 19)"
_IVM_DEL_PRED = "o_orderkey % 20 IN (2, 5)"


def nation_revenue_signed_delta(
    part: DataFrame, dim: DataFrame, bcast_dim: bool = True
) -> DataFrame:
    """ΔV under SIGNED multiplicities: ``part`` carries ``__sgn`` ∈
    {+1, −1} (insert / retraction) next to the order columns; revenue
    sums sign·price in DECIMAL (a retraction cancels its insertion
    bit-for-bit) and the count sums the signs. THE single signed-delta
    definition — shared by the batch retraction query below and the
    streaming CDC sink (streaming/ivm.apply_cdc_ivm_batch), the
    nation_revenue_delta convention."""
    dimc = dim.select("c_custkey", "c_nationkey")
    d = F.broadcast(dimc) if bcast_dim else dimc
    return (
        part.select(
            "o_custkey",
            "__sgn",
            (F.col("o_totalprice").cast("decimal(18,2)")
             * F.col("__sgn")).alias("sprice"),
        )
        .join(d, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            F.sum("sprice").cast("decimal(18,2)").alias("revenue"),
            F.sum("__sgn").cast("long").alias("n_orders"),
        )
    )


def orders_ivm_retractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance WITH RETRACTIONS: the nation-revenue
    join-aggregate view maintained under a delta batch that both INSERTS
    new orders and DELETES existing base rows — the signed-multiplicity
    delta algebra (inserts +1, deletes −1) that insert-only IVM
    (orders_ivm_nation_revenue) special-cases.

    ΔV = groupBy(key) over the SIGNED union of the insert and delete
    batches: revenue_delta = Σ sign·price (DECIMAL — exact, so a
    retraction cancels its insertion bit-for-bit), n_delta = Σ sign.
    Merge is the same full-outer coalesce-sum as the insert-only view,
    plus the retraction-specific step: keys whose merged count reaches
    ZERO leave the view (HAVING n > 0) — without it a fully-retracted
    group would linger as a (key, 0.00, 0) tombstone the from-scratch
    rebuild never shows. At 100 TB both delta sides are broadcast-joined
    aggs over just the changed rows; the merge still shuffles only
    |distinct keys| rows. Oracle: from-scratch recompute over
    (base − deletes + inserts). No reference analog; extends SURVEY
    §2.5 toward CDC-fed materialized views."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    is_ins = F.expr(_IVM_INS_PRED)
    is_del = F.expr(_IVM_DEL_PRED)
    is_base = ~F.expr(_DELTA_PRED)  # deletes retract rows FROM this set

    v_base = nation_revenue_delta(orders.where(is_base), customer,
                                  bcast_dim=False)
    signed = (
        orders.where(is_ins).withColumn("__sgn", F.lit(1))
        .unionByName(
            orders.where(is_base & is_del).withColumn("__sgn", F.lit(-1))
        )
    )
    dv = nation_revenue_signed_delta(signed, customer, bcast_dim=True)
    b, d = v_base.alias("b"), dv.alias("d")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        b.join(d, F.col("b.c_nationkey") == F.col("d.c_nationkey"),
               "full_outer")
        .select(
            F.coalesce(F.col("b.c_nationkey"), F.col("d.c_nationkey"))
            .alias("c_nationkey"),
            (F.coalesce(F.col("b.revenue"), zero)
             + F.coalesce(F.col("d.revenue"), zero))
            .cast("decimal(18,2)").cast("double").alias("revenue"),
            (F.coalesce(F.col("b.n_orders"), F.lit(0))
             + F.coalesce(F.col("d.n_orders"), F.lit(0)))
            .alias("n_orders"),
        )
        .where(F.col("n_orders") > 0)
        .orderBy("c_nationkey")
    )


# from-scratch rebuild over the POST-CHANGE row set: base minus deletes
# plus inserts = NOT IN the never-inserted slice (7) and NOT IN the
# deleted slices (2, 5)
_IVM_RETRACT_SQL = """
SELECT c_nationkey,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey % 20 NOT IN (2, 5, 7)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""

register(QuerySpec("orders_ivm_retractions", orders_ivm_retractions,
                   _IVM_RETRACT_SQL,
                   doc=orders_ivm_retractions.__doc__))


# join-VIEW maintenance deltas: both sides of the join change. Pure key
# arithmetic (20% of orders, 12.5% of customers) so both engines split
# identically; each order joins exactly ONE customer, so the three delta
# terms partition the new view rows — provenance is well-defined.
_JIVM_ORD_PRED = "o_orderkey % 10 IN (3, 7)"
_JIVM_CUST_PRED = "c_custkey % 8 = 5"
# output bound: only the high-value slice of the delta view is emitted
# (the maintenance algebra runs over the full delta; this is a
# reporting projection, not part of the delta rule)
_JIVM_PRICE_MIN = 450000


def orders_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a non-aggregated JOIN view under
    deltas on BOTH inputs — the bilinear delta rule the agg-IVM family
    (orders_ivm_nation_revenue / _retractions / _cdc_streamed)
    special-cases away by aggregating immediately:

        Δ(R ⋈ S) = ΔR ⋈ S_old  ∪  R_old ⋈ ΔS  ∪  ΔR ⋈ ΔS

    Here R = orders (fact), S = customer (dimension); ΔR is a 20% batch
    of new orders, ΔS a 12.5% batch of new customers. The three terms
    are disjoint because each order matches exactly one customer, so
    every view row gained by the cycle carries an unambiguous
    ``delta_source`` ∈ {'order', 'customer', 'both'} — the output is the
    delta view itself (high-value slice), tagged with which term
    produced it, which makes the decomposition externally checkable
    instead of vanishing into a union.

    100-TB shape: the dimension terms broadcast — ΔR ⋈ S_old and
    ΔR ⋈ ΔS probe broadcast customer snapshots with ZERO shuffle of the
    fact delta, and the one full-fact term (R_old ⋈ ΔS) is a single
    map-side scan of the fact with a broadcast probe of the tiny
    customer delta (the broadcast hash-set doubles as a semi-join
    filter, so non-matching fact rows die in the scan stage). Nothing
    re-joins R_old ⋈ S_old — that rebuild, a full shuffle of the 100-TB
    fact, is exactly what the delta rule exists to avoid. Oracle:
    from-scratch join, filtered to rows touched by either delta, with
    provenance re-derived independently from the split predicates.
    No reference analog; completes SURVEY §2.4/§2.5's IVM story for
    views that keep row grain (CDC-fed enriched feeds, not rollups)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    o_new = orders.where(F.expr(_JIVM_ORD_PRED))
    o_old = orders.where(~F.expr(_JIVM_ORD_PRED))
    cust = customer.select("c_custkey", "c_nationkey")
    c_new = cust.where(F.expr(_JIVM_CUST_PRED))
    c_old = cust.where(~F.expr(_JIVM_CUST_PRED))

    def term(fact: DataFrame, dim: DataFrame, tag: str) -> DataFrame:
        return (
            fact.join(F.broadcast(dim),
                      F.col("o_custkey") == F.col("c_custkey"))
            .select(
                "o_orderkey", "c_custkey", "c_nationkey",
                F.col("o_totalprice").cast("double").alias("price"),
                F.lit(tag).alias("delta_source"),
            )
        )

    dv = (
        term(o_new, c_old, "order")
        .unionByName(term(o_old, c_new, "customer"))
        .unionByName(term(o_new, c_new, "both"))
    )
    return (
        dv.where(F.col("price") > _JIVM_PRICE_MIN)
        .orderBy("o_orderkey")
    )


# from-scratch recompute: every view row touched by either delta, with
# provenance derived from the split predicates alone — equality proves
# the three-term decomposition is complete, disjoint, and correctly
# attributed, not just that the union has the right cardinality.
_JIVM_SQL = f"""
SELECT o_orderkey, c_custkey, c_nationkey,
       CAST(o_totalprice AS DOUBLE) AS price,
       CASE
         WHEN ({_JIVM_ORD_PRED}) AND NOT ({_JIVM_CUST_PRED}) THEN 'order'
         WHEN NOT ({_JIVM_ORD_PRED}) AND ({_JIVM_CUST_PRED}) THEN 'customer'
         ELSE 'both'
       END AS delta_source
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE (({_JIVM_ORD_PRED}) OR ({_JIVM_CUST_PRED}))
  AND o_totalprice > {_JIVM_PRICE_MIN}
ORDER BY o_orderkey
"""

register(QuerySpec("orders_ivm_join_delta", orders_ivm_join_delta,
                   _JIVM_SQL, doc=orders_ivm_join_delta.__doc__))


# ---------------------------------------------------------------------------
# Schema evolution: read a drifted lake directory through one contract
# ---------------------------------------------------------------------------
#
# Three physical generations of the same logical table, carved
# deterministically from orders (o_orderkey % 3) and written once per
# (session, sf_dir) under a temp root:
#   v1 (%3=0): o_orderkey, o_custkey as INT32, o_totalprice
#   v2 (%3=1): + o_orderpriority (custkey still INT32)
#   v3 (%3=2): o_custkey widened to BIGINT, + o_orderstatus
# mergeSchema cannot read this directory at all (int32/int64 conflict);
# sources/catalog.read_conformed reads it through the declared v3+
# contract. The oracle replays the generation split statically.
_EVOLVE_CACHE: dict[tuple[str, str], str] = {}


def _evolving_orders_root(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import types as T

    key = (spark.sparkContext.applicationId, sf_dir)
    root = _EVOLVE_CACHE.get(key)
    if root is not None:
        return root
    root = tempfile.mkdtemp(prefix="bigdata2016w_evolve_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    gen = F.col("o_orderkey") % 3
    orders.where(gen == 0).select(
        "o_orderkey",
        F.col("o_custkey").cast(T.IntegerType()).alias("o_custkey"),
        "o_totalprice",
    ).write.parquet(f"{root}/batch=v1")
    orders.where(gen == 1).select(
        "o_orderkey",
        F.col("o_custkey").cast(T.IntegerType()).alias("o_custkey"),
        "o_totalprice", "o_orderpriority",
    ).write.parquet(f"{root}/batch=v2")
    orders.where(gen == 2).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
        "o_orderstatus",
    ).write.parquet(f"{root}/batch=v3")
    _EVOLVE_CACHE[key] = root
    return root


def orders_schema_evolution_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Read three schema generations of the orders table — a column
    added in v2, an int widened and another column added in v3 —
    through ONE declared contract via sources/catalog.read_conformed,
    then aggregate across all generations.

    This is the read path a drifted 100-TB lake actually needs:
    ``mergeSchema`` hard-fails on the int32→int64 widening (a merge
    conflict, not a merge), so the contract must be declared, not
    inferred. Conformance: pre-v2 rows surface o_orderpriority as the
    declared default '__pre_v2__' (typed, not NULL-punned), pre-v3 rows
    surface o_orderstatus as NULL; the int32 custkey widens losslessly.
    The aggregate proves all three generations land in one plan:
    per-priority order counts, DECIMAL-exact revenue (DOUBLE at the
    boundary), the widened custkey summed as BIGINT, and the count of
    v3-only 'F'-status rows. One plan-level union — pruning and
    pushdown reach each generation's scan. Oracle: replays the
    generation split statically from the base table."""
    from pyspark.sql import types as T

    from bigdata2016w_spark.sources.catalog import read_conformed

    root = _evolving_orders_root(spark, sf_dir)
    target = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderpriority", T.StringType()),
        T.StructField("o_orderstatus", T.StringType()),
    ])
    df = read_conformed(
        spark,
        [f"{root}/batch=v1", f"{root}/batch=v2", f"{root}/batch=v3"],
        target,
        defaults={"o_orderpriority": "__pre_v2__"},
    )
    return (
        df.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)").cast("double").alias("revenue"),
            F.sum("o_custkey").alias("custkey_sum"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("n_status_f"),
        )
        .orderBy("priority")
    )


_EVOLVE_SQL = """
WITH conformed AS (
  SELECT o_orderkey,
         o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         CASE WHEN o_orderkey % 3 = 0 THEN '__pre_v2__'
              ELSE o_orderpriority END AS priority,
         CASE WHEN o_orderkey % 3 = 2 THEN o_orderstatus
              ELSE NULL END AS status
  FROM orders
)
SELECT priority, count(*) AS n_orders,
       CAST(CAST(sum(price) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
       CAST(sum(o_custkey) AS BIGINT) AS custkey_sum,
       CAST(sum(CASE WHEN status = 'F' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_status_f
FROM conformed GROUP BY priority ORDER BY priority
"""

register(QuerySpec("orders_schema_evolution_read",
                   orders_schema_evolution_read, _EVOLVE_SQL,
                   doc=orders_schema_evolution_read.__doc__))


# ---------------------------------------------------------------------------
# Small-file compaction planning
# ---------------------------------------------------------------------------

# target bin capacity = ceil(total_rows / TARGET_BINS): scale-relative so
# the plan is meaningful at every SF (fixed row literals would put the
# whole table in one bin at sf0.001 and one file per bin at sf10)
_TARGET_BINS = 16


def events_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE-style small-file compaction planner over the
    ``events`` table's (event_type, hour) partition grain.

    Stage 1 collapses the data to file-level metadata — one row per
    (event_type, hour) "file" with its row count — which is the only
    part that touches the 100-TB table (a single hash agg; in a real
    lakehouse this comes free from the manifest/footers). Stage 2 is
    pure metadata planning: order files largest-first with a
    deterministic tiebreak, take a running sum, and cut next-fit bins
    at capacity ceil(total/16) — a cumulative-sum window over
    thousands of metadata rows, trivially single-partition. Returns
    one row per planned bin (file count, row total, fill ratio in
    basis points) — the rewrite job this plan feeds would read exactly
    the multi-file bins. Same maintenance family as
    ivfpq_index_compact / compact_sketch_batches (bounding read-side
    fan-in), lifted to table partitions; no reference analog."""
    events = load_table(spark, sf_dir, "events")
    files = (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
        )
        .agg(F.count("*").alias("file_rows"))
    )
    w = (
        Window.orderBy(F.desc("file_rows"), F.asc("event_type"),
                       F.asc("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total_w = Window.partitionBy()
    # all planning arithmetic is exact integer (ceil-div and floor-div
    # spelled with DIV) so the DuckDB oracle — same expressions with
    # `//` — is bit-identical; no float rounding to diverge on
    binned = files.select(
        "file_rows",
        F.sum("file_rows").over(w).alias("cum_rows"),
        F.sum("file_rows").over(total_w).alias("total_rows"),
    ).selectExpr(
        "file_rows",
        f"(total_rows + {_TARGET_BINS - 1}) DIV {_TARGET_BINS} AS cap",
        f"(cum_rows - 1) DIV ((total_rows + {_TARGET_BINS - 1})"
        f" DIV {_TARGET_BINS}) AS bin",
    )
    grouped = (
        binned.groupBy("bin", "cap")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("file_rows").alias("bin_rows"),
            F.max("file_rows").alias("largest_file_rows"),
        )
    )
    # dense renumbering over the ≤ _TARGET_BINS metadata rows: a single
    # hot file larger than cap makes cum_rows skip raw bin indices, and
    # consumers index bins 0..n-1 — contiguity must hold on skewed
    # layouts too, not just uniform ones
    dense = (F.row_number().over(Window.orderBy("bin")) - 1).cast("bigint")
    return (
        grouped.select(
            dense.alias("bin"),
            "n_files", "bin_rows", "largest_file_rows",
            F.expr("(bin_rows * 10000) DIV cap").alias("fill_bp"),
        )
        .orderBy("bin")
    )


_COMPACTION_SQL = f"""
WITH files AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         count(*) AS file_rows
  FROM events GROUP BY 1, 2
), planned AS (
  SELECT file_rows,
         sum(file_rows) OVER (
           ORDER BY file_rows DESC, event_type ASC, hr ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_rows,
         (sum(file_rows) OVER () + {_TARGET_BINS - 1}) // {_TARGET_BINS}
           AS cap
  FROM files
)
, grouped AS (
  SELECT (cum_rows - 1) // cap AS raw_bin, cap,
         count(*) AS n_files,
         CAST(sum(file_rows) AS BIGINT) AS bin_rows,
         max(file_rows) AS largest_file_rows
  FROM planned
  GROUP BY raw_bin, cap
)
SELECT CAST(row_number() OVER (ORDER BY raw_bin) - 1 AS BIGINT) AS bin,
       n_files, bin_rows, largest_file_rows,
       CAST((bin_rows * 10000) // cap AS BIGINT) AS fill_bp
FROM grouped ORDER BY bin
"""

register(QuerySpec("events_compaction_plan", events_compaction_plan,
                   _COMPACTION_SQL, doc=events_compaction_plan.__doc__))


# ---------------------------------------------------------------------------
# Replica reconciliation via partition digests
# ---------------------------------------------------------------------------

# the simulated replica silently lost a scattered ~0.1% of rows — the
# drift class (partial ingest, bad segment) digest exchange must catch
_TAMPER_PRED = "o_orderkey % 1000 = 42"


def orders_replica_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style replica reconciliation: per-month row counts and
    order-independent content digests for a primary and a (simulated)
    replica of ``orders``, full-outer merged so divergent partitions
    surface with their row deltas.

    Each row canonicalizes to a '|'-joined string of exact fields
    (keys as decimal strings, money as integer cents, timestamps
    formatted — never raw float repr), hashes through the portable
    60-bit family, and the partition digest is the SUM of row hashes
    in DECIMAL(38,0) — commutative, so the digest is partition-order-
    and merge-order-independent, and two replicas can compute it with
    different partitioning/cluster layouts and still agree. At 100 TB
    the exchange is the digest table (one row per partition, KB not
    TB); only months with digests_match = false need block-level
    resync. The oracle replays both sides' digests from the same md5
    arithmetic."""
    from bigdata2016w_spark.operators.reconcile import (
        reconcile_digests,
        table_digests,
    )

    orders = load_table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.col("o_orderpriority"),
    )
    month = F.date_format("o_orderdate", "yyyy-MM")

    def digests(side: DataFrame) -> DataFrame:
        return table_digests(
            side, month, canon,
            hasher=lambda c: portable_hash60(c, "DIG"),
        )

    return (
        reconcile_digests(digests(orders),
                          digests(orders.where(~F.expr(_TAMPER_PRED))))
        .withColumnRenamed("part", "month")
        .orderBy("month")
    )


_CANON_SQL = (
    "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)"
    " || '|' || o_orderstatus || '|' ||"
    " CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)"
    " || '|' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')"
    " || '|' || o_orderpriority"
)

_RECONCILE_SQL = f"""
WITH a AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         count(*) AS n,
         CAST(sum(CAST(('0x' || substr(md5('DIG:' || {_CANON_SQL}), 1, 15))::BIGINT
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS digest
  FROM orders GROUP BY 1
), b AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         count(*) AS n,
         CAST(sum(CAST(('0x' || substr(md5('DIG:' || {_CANON_SQL}), 1, 15))::BIGINT
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS digest
  FROM orders WHERE NOT ({_TAMPER_PRED}) GROUP BY 1
)
SELECT coalesce(a.month, b.month) AS month,
       coalesce(a.n, 0) AS n_primary,
       coalesce(b.n, 0) AS n_replica,
       (a.digest IS NOT DISTINCT FROM b.digest) AS digests_match,
       coalesce(a.n, 0) - coalesce(b.n, 0) AS rows_missing
FROM a FULL OUTER JOIN b ON a.month = b.month
ORDER BY month
"""

register(QuerySpec("orders_replica_reconcile", orders_replica_reconcile,
                   _RECONCILE_SQL, doc=orders_replica_reconcile.__doc__))


# ---------------------------------------------------------------------------
# Streamed IVM certification: the delta path itself, end to end
# ---------------------------------------------------------------------------
#
# orders_ivm_nation_revenue above certifies the DELTA ALGEBRA (V_base ⊕ ΔV
# == from-scratch recompute); this query certifies the STREAMED surface
# that applies it: streaming/ivm.ivm_view_sink maintains the view over a
# real two-micro-batch orders stream (foreachBatch → batch-stamped delta
# subdirs → merge-on-read), and the oracle recomputes the view from
# scratch over all orders. Equality proves the whole streamed chain —
# per-batch ΔV, replay-safe batch=N overwrite layout, read_view's
# merge-on-read — not just the delta arithmetic. Temp view dirs are built
# once per (session, sf_dir); DECIMAL money math keeps the streamed merge
# bit-equal to the one-shot rebuild.
_IVM_STREAM_CACHE: dict[tuple[str, str], str] = {}


def _streamed_ivm_view(spark: SparkSession, sf_dir: str) -> str:
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from bigdata2016w_spark.streaming.ingest import _batch_dirs
    from bigdata2016w_spark.streaming.ivm import ivm_view_sink

    key = (spark.sparkContext.applicationId, sf_dir)
    view = _IVM_STREAM_CACHE.get(key)
    if view is not None:
        return view
    root = tempfile.mkdtemp(prefix="bigdata2016w_ivm_stream_")
    view = f"{root}/view"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer")
    src_dir = f"{root}/in"
    os.makedirs(src_dir)
    # two single-file inputs + maxFilesPerTrigger=1 → exactly two
    # micro-batches under the availableNow trigger (the
    # _streamed_ivfpq_index convention); the view merge is commutative,
    # but the batch COUNT is asserted so this always exercises the
    # multi-batch merge, never a degenerate single-delta read
    for j, m in ((1, 0), (2, 1)):
        w = f"{root}/w{j}"
        orders.where(F.col("o_orderkey") % 2 == m).coalesce(1) \
            .write.parquet(w)
        shutil.copy(next(Path(w).glob("part-*.parquet")),
                    f"{src_dir}/{j}.parquet")
    stream = (
        spark.readStream
        .schema("o_orderkey bigint, o_custkey bigint, o_totalprice double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    ivm_view_sink(stream, customer, view, f"{root}/ckpt") \
        .awaitTermination()
    n_batches = len(_batch_dirs(spark, view))
    if n_batches != 2:
        raise AssertionError(
            f"expected 2 streamed delta batches, got {n_batches}"
        )
    _IVM_STREAM_CACHE[key] = view
    return view


def orders_ivm_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nation-revenue view maintained BY THE STREAM: two order
    micro-batches through streaming/ivm.ivm_view_sink (foreachBatch ΔV →
    batch-stamped overwrite subdirs), then read_view's merge-on-read.
    The oracle recomputes the view from scratch over all orders, so a
    MATCH certifies the streamed maintenance path end to end. At 100 TB
    each delta batch is a broadcast-joined agg over just the new rows
    and the merged view reads keys × batches rows of metadata — the
    point of IVM vs a nightly full rebuild. No reference analog
    (extends SURVEY §2.11 streaming)."""
    from bigdata2016w_spark.streaming.ivm import read_view

    view = _streamed_ivm_view(spark, sf_dir)
    # DECIMAL merge inside, DOUBLE at the output edge — same boundary
    # convention as the batch IVM query above (lossless: cents ≪ 2^53)
    return (
        read_view(spark, view)
        .withColumn("revenue", F.col("revenue").cast("double"))
        .orderBy("c_nationkey")
    )


register(QuerySpec("orders_ivm_streamed", orders_ivm_streamed, _IVM_SQL,
                   doc=orders_ivm_streamed.__doc__))


# ----------------------------------------------------- streamed CDC ivm

_CDC_STREAM_CACHE: dict[tuple[str, str], str] = {}


def _streamed_cdc_view(spark: SparkSession, sf_dir: str) -> str:
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from bigdata2016w_spark.streaming.ingest import _batch_dirs
    from bigdata2016w_spark.streaming.ivm import cdc_ivm_view_sink

    key = (spark.sparkContext.applicationId, sf_dir)
    view = _CDC_STREAM_CACHE.get(key)
    if view is not None:
        return view
    root = tempfile.mkdtemp(prefix="bigdata2016w_cdc_stream_")
    view = f"{root}/view"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer")
    src_dir = f"{root}/in"
    os.makedirs(src_dir)
    # batch 1: the base load as inserts. batch 2: the change batch —
    # new arrivals as inserts PLUS retractions of base rows as deletes.
    # The signed merge is commutative, but two real micro-batches are
    # asserted (the _streamed_ivm_view convention).
    b1 = orders.where(~F.expr(_DELTA_PRED)).withColumn("op", F.lit("I"))
    b2 = (
        orders.where(F.expr(_IVM_INS_PRED)).withColumn("op", F.lit("I"))
        .unionByName(
            orders.where((~F.expr(_DELTA_PRED)) & F.expr(_IVM_DEL_PRED))
            .withColumn("op", F.lit("D"))
        )
    )
    for j, part in ((1, b1), (2, b2)):
        w = f"{root}/w{j}"
        part.coalesce(1).write.parquet(w)
        shutil.copy(next(Path(w).glob("part-*.parquet")),
                    f"{src_dir}/{j}.parquet")
    stream = (
        spark.readStream
        .schema("o_orderkey bigint, o_custkey bigint, "
                "o_totalprice double, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    cdc_ivm_view_sink(stream, customer, view, f"{root}/ckpt") \
        .awaitTermination()
    n_batches = len(_batch_dirs(spark, view))
    if n_batches != 2:
        raise AssertionError(
            f"expected 2 streamed CDC batches, got {n_batches}"
        )
    _CDC_STREAM_CACHE[key] = view
    return view


def orders_ivm_cdc_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nation-revenue view maintained by a CDC STREAM: a base-load
    micro-batch of inserts, then a change micro-batch mixing inserts
    and deletes, through streaming/ivm.cdc_ivm_view_sink (signed ΔV per
    batch → batch-stamped overwrite subdirs) and read back with the
    merged-count>0 gate. The oracle recomputes the view from scratch
    over the POST-CHANGE row set (base − deletes + inserts) — the same
    oracle the batch retraction query proves — so a MATCH certifies the
    streamed CDC path end to end, including that a retraction cancels
    its insertion bit-for-bit across micro-batch boundaries. At 100 TB
    each change batch is a broadcast-joined agg over just the changed
    rows; the merged view reads keys × batches rows of metadata. No
    reference analog (extends SURVEY §2.11 streaming toward CDC-fed
    materialized views)."""
    from bigdata2016w_spark.streaming.ivm import read_view

    view = _streamed_cdc_view(spark, sf_dir)
    return (
        read_view(spark, view, drop_empty=True)
        .withColumn("revenue", F.col("revenue").cast("double"))
        .orderBy("c_nationkey")
    )


register(QuerySpec("orders_ivm_cdc_streamed", orders_ivm_cdc_streamed,
                   _IVM_RETRACT_SQL,
                   doc=orders_ivm_cdc_streamed.__doc__))
