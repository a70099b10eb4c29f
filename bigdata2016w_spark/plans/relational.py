"""Relational query library — the reference's assignment-5 surface (Q1–Q7).

Semantics follow the reference queries (cited per function); the physical
strategy is Catalyst's, not hand-rolled:

- The reference hand-broadcasts dimensions via ``collectAsMap`` +
  ``sc.broadcast`` (``SCALA/assignment5/Q3.scala:42-57``); here small dims
  get a ``broadcast()`` hint and AQE can also switch strategies at runtime.
- The reference cogroups fact-fact joins (``Q2.scala:63-68``); here Catalyst
  picks sort-merge/shuffled-hash on the join key.
- Date-prefix filters (``Q1.scala:42-51``) compile to sargable timestamp
  ranges so they push down to the Parquet scan (see functions/dates.py).
- Money math runs in DECIMAL(18,2) — exact, order-independent aggregation
  that fixes the reference's float-precision bug class (``Q6.scala:55-57``)
  and makes results bit-stable across engines and partitionings.

Each query is parameterized (mirroring the reference's ``--date`` Scallop
option, ``SCALA/assignment5/Conf.scala:12-17``) with defaults matched to the
registered DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from bigdata2016w_spark.functions.dates import date_prefix_filter, date_prefix_sql
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

# Default parameters shared by Spark fns and oracle SQL.
Q1_PREFIX = "1996-03"
Q2_PREFIX = "1996-03"
Q3_PREFIX = "1996-03"
Q4_PREFIX = "1996"
Q5_NATIONS = ("NATION_3", "NATION_7")
Q6_PREFIX = "1996"
Q7_DATE = "1997-06-30"

_DEC = "decimal(18,2)"


def _dec(col):
    return F.col(col).cast(_DEC)


def q1(spark: SparkSession, sf_dir: str, date: str = Q1_PREFIX) -> DataFrame:
    """Q1: count lineitems shipped in a date prefix.

    Parity: scan → prefix filter → global count
    (``SCALA/assignment5/Q1.scala:39-53``).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(date_prefix_filter(F.col("l_shipdate"), date))
        .agg(F.count("*").alias("count_shipped"))
    )


def q2(spark: SparkSession, sf_dir: str, date: str = Q2_PREFIX) -> DataFrame:
    """Q2: order status + key of orders with a lineitem shipped in the prefix.

    Parity: orders ⋈ lineitem cogroup, first-20 by orderkey
    (``SCALA/assignment5/Q2.scala:42-74``). The reference reads ``o_clerk``,
    absent from the driver testdata; ``o_orderstatus`` substitutes
    (documented in FIXTURES.md). Distinct gives the cogroup's
    one-row-per-order behavior deterministically.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.where(date_prefix_filter(F.col("l_shipdate"), date))
        .select("l_orderkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_orderstatus").alias("clerk"), F.col("o_orderkey"))
        .distinct()
        .orderBy("o_orderkey")
        .limit(20)
    )


def q3(spark: SparkSession, sf_dir: str, date: str = Q3_PREFIX) -> DataFrame:
    """Q3: (orderkey, part name, supplier name) for lineitems in the prefix.

    Parity: broadcast map-side hash join of part & supplier dims
    (``SCALA/assignment5/Q3.scala:42-75``) — here an explicit
    ``broadcast()`` hint on both dims.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        li.where(date_prefix_filter(F.col("l_shipdate"), date))
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .join(broadcast(part.select("p_partkey", "p_name")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "p_name", "s_name")
        .orderBy("l_orderkey", "p_name", "s_name")
        .limit(20)
    )


def q4(spark: SparkSession, sf_dir: str, date: str = Q4_PREFIX) -> DataFrame:
    """Q4: lineitems shipped in the prefix, counted per customer nation.

    Parity: orders ⋈ lineitem ⋈ broadcast(custkey→nationkey) ⋈ nation,
    grouped count sorted by nationkey
    (``SCALA/assignment5/Q4.scala:43-97``).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.where(date_prefix_filter(F.col("l_shipdate"), date))
        .select("l_orderkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("*").alias("count_lineitem"))
        .orderBy("n_nationkey")
    )


def q5(spark: SparkSession, sf_dir: str,
       nations: tuple[str, str] = Q5_NATIONS) -> DataFrame:
    """Q5: monthly lineitem counts for two nations' customers.

    Parity: Q4's join path, no date filter, month key via string prefix
    ``substring(0,7)`` (``SCALA/assignment5/Q5.scala:66-121``) — here
    ``date_format('yyyy-MM')``; nation-name value filter
    (``Q5.scala:82-84``; testdata has NATION_* names, not CANADA/US).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dim = (
        customer.select("c_custkey", "c_nationkey")
        .join(broadcast(nation.where(F.col("n_name").isin(*nations))
                        .select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
    )
    return (
        li.select("l_orderkey", F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name", "ship_month")
        .agg(F.count("*").alias("count_lineitem"))
        .orderBy("n_name", "ship_month")
    )


def q6(spark: SparkSession, sf_dir: str, date: str = Q6_PREFIX) -> DataFrame:
    """Q6: TPC-H Q1-shape multi-aggregate over (returnflag, linestatus).

    Parity: the reference folds a 6-element list elementwise
    (``SCALA/assignment5/Q6.scala:53-64``) in Float — a precision bug class.
    Here one hash-aggregate pass with DECIMAL(18,2) money math (exact and
    partition-order-independent), cast to double at the edge.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    charge = disc_price.cast("decimal(18,4)") * (F.lit(1).cast(_DEC) + _dec("l_tax"))
    return (
        li.where(date_prefix_filter(F.col("l_shipdate"), date))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q7(spark: SparkSession, sf_dir: str, date: str = Q7_DATE) -> DataFrame:
    """Q7: TPC-H Q3 shape — top-10 unshipped-revenue orders.

    Parity: broadcast customer, o_orderdate < D, l_shipdate > D, revenue =
    sum(extprice·(1−disc)), top-10 by revenue
    (``SCALA/assignment5/Q7.scala:44-90``). The reference reads
    ``o_shippriority``; driver testdata substitutes ``o_orderpriority``.
    DECIMAL revenue; deterministic tiebreak on orderkey.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    return (
        li.where(F.col("l_shipdate") > F.lit(date).cast("timestamp"))
        .select("l_orderkey", revenue.alias("rev"))
        .join(orders.where(F.col("o_orderdate") < F.lit(date).cast("timestamp"))
              .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "l_orderkey",
                 F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                 "o_orderpriority")
        .agg(F.sum("rev").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --- DuckDB oracle SQL (same constants, same aliases, same decimal math) ---

_Q1_SQL = f"""
SELECT count(*) AS count_shipped
FROM lineitem
WHERE {date_prefix_sql('l_shipdate', Q1_PREFIX)}
"""

_Q2_SQL = f"""
SELECT DISTINCT o.o_orderstatus AS clerk, o.o_orderkey
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE {date_prefix_sql('l.l_shipdate', Q2_PREFIX)}
ORDER BY o.o_orderkey
LIMIT 20
"""

_Q3_SQL = f"""
SELECT l.l_orderkey, p.p_name, s.s_name
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE {date_prefix_sql('l.l_shipdate', Q3_PREFIX)}
ORDER BY l.l_orderkey, p.p_name, s.s_name
LIMIT 20
"""

_Q4_SQL = f"""
SELECT n.n_nationkey, n.n_name, count(*) AS count_lineitem
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE {date_prefix_sql('l.l_shipdate', Q4_PREFIX)}
GROUP BY n.n_nationkey, n.n_name
ORDER BY n.n_nationkey
"""

_Q5_SQL = f"""
SELECT n.n_name, strftime(l.l_shipdate, '%Y-%m') AS ship_month,
       count(*) AS count_lineitem
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE n.n_name IN ('{Q5_NATIONS[0]}', '{Q5_NATIONS[1]}')
GROUP BY n.n_name, ship_month
ORDER BY n.n_name, ship_month
"""

_Q6_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(18,4))
           * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
    AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE {date_prefix_sql('l_shipdate', Q6_PREFIX)}
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

_Q7_SQL = f"""
SELECT c.c_name, l.l_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_shipdate > TIMESTAMP '{Q7_DATE} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{Q7_DATE} 00:00:00'
GROUP BY c.c_name, l.l_orderkey, orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""

register(QuerySpec("q1_count_shipped", q1, _Q1_SQL, doc=q1.__doc__))
register(QuerySpec("q2_order_status", q2, _Q2_SQL, doc=q2.__doc__))
register(QuerySpec("q3_part_supplier", q3, _Q3_SQL, doc=q3.__doc__))
register(QuerySpec("q4_nation_counts", q4, _Q4_SQL, doc=q4.__doc__))
register(QuerySpec("q5_monthly_nation", q5, _Q5_SQL, doc=q5.__doc__))
register(QuerySpec("q6_lineitem_agg", q6, _Q6_SQL, doc=q6.__doc__))
register(QuerySpec("q7_top_revenue", q7, _Q7_SQL, doc=q7.__doc__))


def q4_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (the reference never got to it): order counts per
    priority for orders with at least one LATE lineitem — the classic
    correlated EXISTS, expressed Spark-first as a left-semi join whose
    condition carries the correlated inequality (Catalyst's own EXISTS
    decorrelation target). 'Late' = shipped > 60 days after the order
    date (the snapshot schema has no commit/receipt dates)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late_exists = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late_exists.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_EXISTS_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

register(QuerySpec("q4_priority_late_exists", q4_priority_late_exists,
                   _Q4_EXISTS_SQL, doc=q4_priority_late_exists.__doc__))


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the hardest classic join pattern (EXISTS +
    NOT EXISTS over the same fact): suppliers who were the ONLY late
    shipper on multi-supplier orders, ranked by how often. Spark-first:
    the late set is built once, NOT EXISTS becomes a left-anti self-join
    on (same order, different supplier), EXISTS(multi-supplier) an inner
    join against a grouped filter — no correlated subqueries survive in
    the plan."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("ns"))
        .where(F.col("ns") > 1)
        .select("l_orderkey")
    )
    solo_late = late.alias("x").join(
        late.alias("y"),
        (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("x.l_suppkey") != F.col("y.l_suppkey")),
        "left_anti",
    )
    return (
        solo_late.join(multi, "l_orderkey")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("l_suppkey"))
        .limit(20)
    )


_Q21_SQL = """
WITH late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
),
multi AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1
)
SELECT x.l_suppkey, count(*) AS numwait
FROM late x
JOIN multi USING (l_orderkey)
WHERE NOT EXISTS (
  SELECT 1 FROM late y
  WHERE y.l_orderkey = x.l_orderkey AND y.l_suppkey <> x.l_suppkey
)
GROUP BY x.l_suppkey
ORDER BY numwait DESC, x.l_suppkey ASC
LIMIT 20
"""

register(QuerySpec("q21_waiting_supplier", q21_waiting_supplier,
                   _Q21_SQL, doc=q21_waiting_supplier.__doc__))

def q10_returned_revenue(spark: SparkSession, sf_dir: str,
                         date: str = "1996") -> DataFrame:
    """TPC-H Q10 shape: top customers by revenue lost to returned items
    (``l_returnflag = 'R'``) for orders placed in the year. Fact-fact join
    shuffles on the order key; customer and nation dims ride broadcast
    hash joins (same dim policy as ``Q3.scala:42-57``)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (_dec("l_extendedprice")
           * (F.lit(1).cast(_DEC) - _dec("l_discount")))
    return (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", rev.alias("rev"))
        .join(orders.where(date_prefix_filter(F.col("o_orderdate"), date))
              .select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum("rev").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R' AND {date_prefix_sql('o_orderdate', '1996')}
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""

register(QuerySpec("q10_returned_revenue", q10_returned_revenue,
                   _Q10_SQL, doc=q10_returned_revenue.__doc__))


def q12_priority_shipping(spark: SparkSession, sf_dir: str,
                          date: str = "1996") -> DataFrame:
    """TPC-H Q12 shape: per lineitem status, how many late-shipped lines
    belong to critical- vs normal-priority orders. The snapshot schema has
    no ``l_shipmode``, so ``l_linestatus`` carries the GROUP BY; the
    conditional counts stay a single hash aggregate of CASE expressions —
    one shuffle total, both counts map-side partial-aggregated."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(date_prefix_filter(F.col("l_shipdate"), date))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q12_SQL = f"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE {date_prefix_sql('l_shipdate', '1996')}
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

register(QuerySpec("q12_priority_shipping", q12_priority_shipping,
                   _Q12_SQL, doc=q12_priority_shipping.__doc__))


def q14_promo_revenue(spark: SparkSession, sf_dir: str,
                      date: str = "1996-03") -> DataFrame:
    """TPC-H Q14 shape: promo-part revenue share for one ship month.
    Broadcast hash join against the part dim, then a single global
    aggregate with both the conditional and total sums in DECIMAL —
    the ratio is one exact decimal division cast to double at the edge."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (_dec("l_extendedprice")
           * (F.lit(1).cast(_DEC) - _dec("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(_DEC))
    return (
        li.where(date_prefix_filter(F.col("l_shipdate"), date))
        .join(broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double")
             / F.sum(rev).cast("double")).alias("promo_revenue_pct")
        )
    )


_Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
              AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {date_prefix_sql('l_shipdate', '1996-03')}
"""

register(QuerySpec("q14_promo_revenue", q14_promo_revenue,
                   _Q14_SQL, doc=q14_promo_revenue.__doc__))


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    for selected part attributes, excluding distrusted suppliers
    (``NOT IN`` → broadcast left-anti join; the snapshot's stand-in for
    the comment-based complaint filter is a negative account balance).
    The part dim broadcasts; the only shuffle is the final distinct
    aggregate. ``lineitem`` (l_partkey, l_suppkey) stands in for the
    absent ``partsupp`` table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    bad_supp = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(broadcast(bad_supp),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(broadcast(
            part.where(
                (F.col("p_brand") != "Brand#1")
                & (~F.col("p_type").startswith("PROMO"))
                & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
            ).select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"),
                 F.asc("p_type"), F.asc("p_size"))
        .limit(20)
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
LIMIT 20
"""

register(QuerySpec("q16_supplier_count", q16_supplier_count,
                   _Q16_SQL, doc=q16_supplier_count.__doc__))


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing part
    attributes and lineitem quantity — the classic disjunctive-pushdown
    test. Expressed as one boolean expression on a broadcast part join so
    Catalyst can extract the common ``p_partkey`` join and push each
    brand/size conjunct into the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 15)
           & qty.between(20, 30))
    )
    rev = (_dec("l_extendedprice")
           * (F.lit(1).cast(_DEC) - _dec("l_discount")))
    return (
        li.join(broadcast(part.select("p_partkey", "p_brand", "p_size")),
                F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count("*").alias("n_lines"))
    )


_Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

register(QuerySpec("q19_disjunctive_revenue", q19_disjunctive_revenue,
                   _Q19_SQL, doc=q19_disjunctive_revenue.__doc__))


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per customer nation, count and balance of
    above-average-balance customers with no RECENT order (none since
    1999 — Q22's "no orders for 7 years" predicate). The scalar AVG
    subquery is a 1-row aggregate joined by broadcast (no driver
    round-trip); NOT EXISTS is a left-anti join against the date-filtered
    orders — the filter pushes to the scan before the anti-join.

    The above-average test is multiplied out into exact arithmetic
    (``bal * n_pos > sum_pos`` in DECIMAL) like q11: an AVG over DOUBLE
    is summation-order-dependent, so a balance within float error of the
    mean could flip the strict ``>`` between engines or reruns."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal_stats = (
        customer.where(F.col("c_acctbal") > 0)
        .agg(F.sum(_dec("c_acctbal")).alias("sum_pos"),
             F.count("*").alias("n_pos"))
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        customer.join(broadcast(bal_stats))
        .where(_dec("c_acctbal") * F.col("n_pos") > F.col("sum_pos"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


_Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
CROSS JOIN (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos,
                   COUNT(*) AS n_pos
            FROM customer WHERE c_acctbal > 0) s
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""

register(QuerySpec("q22_sales_opportunity", q22_sales_opportunity,
                   _Q22_SQL, doc=q22_sales_opportunity.__doc__))


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value exceeds 1.5x the MEAN
    part value — grouped HAVING against a global scalar. Both the
    per-part aggregate and the 1-row (total, n_parts) come from the SAME
    shuffled aggregate (self-reused plan); the scalar joins by broadcast,
    so no second scan of the fact. The threshold is scale-free (Q11's
    fixed fraction divided by table size), expressed multiply-only in
    exact DECIMAL/int math — 2*n*value > 3*total — because a small
    fraction literal cast to DECIMAL(18,2) rounds to 0.00 and would
    degenerate the filter. ``lineitem`` stands in for the absent
    ``partsupp``."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_d"))
    )
    total = per_part.agg(F.sum("value_d").alias("total_d"),
                         F.count("*").alias("n_parts"))
    return (
        per_part.join(broadcast(total))
        .where(F.col("value_d") * F.col("n_parts") * 2
               > F.col("total_d") * 3)
        .select("l_partkey", F.col("value_d").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_d
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(value_d AS DOUBLE) AS part_value
FROM per_part
WHERE value_d * (SELECT COUNT(*) FROM per_part) * 2
      > (SELECT SUM(value_d) FROM per_part) * 3
ORDER BY part_value DESC, l_partkey ASC
"""

register(QuerySpec("q11_important_stock", q11_important_stock,
                   _Q11_SQL, doc=q11_important_stock.__doc__))


def q15_top_supplier(spark: SparkSession, sf_dir: str,
                     date: str = "1996") -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in the year
    — the classic view + scalar-MAX + equality pattern, ties kept. The
    revenue view aggregates once; MAX is a broadcast 1-row aggregate of
    that same view (no re-scan); exact DECIMAL revenue makes the
    equality tie-safe across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.where(date_prefix_filter(F.col("l_shipdate"), date))
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast(_DEC) - _dec("l_discount"))
            ).alias("rev_d")
        )
    )
    mx = rev.agg(F.max("rev_d").alias("max_d"))
    return (
        rev.join(broadcast(mx))
        .where(F.col("rev_d") == F.col("max_d"))
        .join(broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.col("rev_d").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
           AS rev_d
  FROM lineitem
  WHERE {date_prefix_sql('l_shipdate', '1996')}
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.rev_d AS DOUBLE) AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rev_d = (SELECT MAX(rev_d) FROM rev)
ORDER BY s.s_suppkey
"""

register(QuerySpec("q15_top_supplier", q15_top_supplier,
                   _Q15_SQL, doc=q15_top_supplier.__doc__))


def q20_surplus_suppliers(spark: SparkSession, sf_dir: str,
                          date: str = "1996") -> DataFrame:
    """TPC-H Q20 shape: suppliers holding 'surplus' positions in
    small-size parts — nested IN subqueries become a chain of semi-joins:
    (part filter) → (supplier, part) shipped-quantity aggregate with a
    threshold → left-semi into supplier. No correlated subquery survives;
    the quantity aggregate shuffles once on (suppkey, partkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    small_parts = part.where(F.col("p_size") <= 5).select("p_partkey")
    qty = (
        li.where(date_prefix_filter(F.col("l_shipdate"), date))
        .join(broadcast(small_parts),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_d"))
        .where(F.col("qty_d") > F.lit(80).cast(_DEC))
        .select("l_suppkey")
    )
    return (
        supplier.join(qty, F.col("s_suppkey") == F.col("l_suppkey"),
                      "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


_Q20_SQL = f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
    AND {date_prefix_sql('l_shipdate', '1996')}
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 80
)
ORDER BY s_suppkey
"""

register(QuerySpec("q20_surplus_suppliers", q20_surplus_suppliers,
                   _Q20_SQL, doc=q20_surplus_suppliers.__doc__))


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer INCLUDING
    zero-order customers — the outer-join-then-histogram pattern. The
    left outer join keeps every customer; the two-level aggregate
    (per-customer count, then histogram) is two shuffles, the second over
    at most |distinct counts| rows."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey,
                      "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

register(QuerySpec("q13_customer_distribution", q13_customer_distribution,
                   _Q13_SQL, doc=q13_customer_distribution.__doc__))


def q18_large_volume_customers(spark: SparkSession, sf_dir: str,
                               qty: int = 250) -> DataFrame:
    """TPC-H Q18 shape: customers with any single order totalling more
    than ``qty`` units — a grouped-HAVING filter on the fact that then
    drives the joins. The heavy groupBy runs FIRST and its tiny survivor
    set broadcasts into orders/customer, so the dimensional joins never
    see the full fact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty_d"))
        .where(F.col("sum_qty_d") > F.lit(qty).cast(_DEC))
    )
    return (
        orders.join(broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice"),
            F.col("sum_qty_d").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


_Q18_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_totalprice,
       CAST(b.sum_qty_d AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_d
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
) b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 20
"""

register(QuerySpec("q18_large_volume_customers", q18_large_volume_customers,
                   _Q18_SQL, doc=q18_large_volume_customers.__doc__))


def q8_market_share(spark: SparkSession, sf_dir: str,
                    nation: str = "NATION_7", region: str = "ASIA",
                    ptype: str = "ECONOMY") -> DataFrame:
    """TPC-H Q8 shape (national market share): for orders placed 1995-1996
    by customers in ``region`` on parts of ``ptype``, the share of revenue
    supplied by ``nation``, per order year.

    Star-join plan: the fact scan (lineitem) keeps only its join keys and
    revenue inputs; part, supplier->nation, and orders->customer->
    nation->region dims all broadcast (each is a small filtered dim — at
    cluster scale the orders leg would exceed the broadcast threshold and
    AQE falls back to a shuffled hash join on o_orderkey, the same plan
    the reference's cogroup would pick). Both the conditional
    (target-nation) and total revenue sums run in DECIMAL; the share is
    one exact decimal pair cast to double for the final division.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")

    supp_nat = supplier.join(
        broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_region = (
        customer.join(broadcast(nat),
                      F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(reg.where(F.col("r_name") == region)),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    ord_in = (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
        )
        .join(broadcast(cust_region),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == nation, rev) \
        .otherwise(F.lit(0).cast(_DEC))
    return (
        li.join(broadcast(part.where(F.col("p_type") == ptype)
                          .select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ord_in, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_year")
        .agg(
            (F.sum(nat_rev).cast("double")
             / F.sum(rev).cast("double")).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q8_SQL = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
           AS volume,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
  WHERE o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
)
GROUP BY o_year
ORDER BY o_year
"""

register(QuerySpec("q8_market_share", q8_market_share, _Q8_SQL,
                   doc=q8_market_share.__doc__))


def q9_product_profit(spark: SparkSession, sf_dir: str,
                      name_part: str = "red") -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit by supplier nation and
    order year over parts whose name contains ``name_part``. The snapshot
    has no ``partsupp``, so supply cost is the adapted proxy
    ``p_retailprice`` per unit (same query shape: revenue minus
    quantity-scaled cost).

    profit = SUM(extprice*(1-disc)) - SUM(retailprice*quantity), both
    sums in DECIMAL with the products widened to DECIMAL(18,4)/(38,4)
    BEFORE summation (identical fixed-point values in both engines), the
    subtraction exact, and one cast to double at the edge. Part and
    supplier->nation dims broadcast; orders joins shuffled on o_orderkey
    with AQE sizing.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")

    supp_nat = supplier.join(
        broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    rev = (_dec("l_extendedprice")
           * (F.lit(1).cast(_DEC) - _dec("l_discount"))).cast("decimal(18,4)")
    cost = (_dec("p_retailprice") * _dec("l_quantity")).cast("decimal(18,4)")
    return (
        li.join(broadcast(part.where(F.col("p_name").contains(name_part))
                          .select("p_partkey", "p_retailprice")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", "o_year")
        .agg((F.sum(rev) - F.sum(cost)).cast("double").alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


_Q9_SQL = """
SELECT nation, o_year,
       CAST(SUM(rev) - SUM(cost) AS DOUBLE) AS profit
FROM (
  SELECT sn.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,2))
                 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
           AS rev,
         CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
              * CAST(l.l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS cost
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
)
GROUP BY nation, o_year
ORDER BY nation ASC, o_year DESC
"""

register(QuerySpec("q9_product_profit", q9_product_profit, _Q9_SQL,
                   doc=q9_product_profit.__doc__))
