"""Registered upsert / SCD2 queries. Update batches are derived
deterministically from orders (modulo-selected keys, decimal price bump),
so the merge results are oracle-checkable with plain SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.operators.upsert import scd2_apply, scd2_init, upsert
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

_DEC = "decimal(18,2)"


def _orders_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast(_DEC).alias("price"),
    )


def _updates(snapshot: DataFrame, mod: int) -> DataFrame:
    return snapshot.where(F.col("o_orderkey") % mod == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("price") * F.lit(2)).cast(_DEC).alias("price"),
    )


def orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins merge of a derived updates batch (every 10th key,
    doubled price, status 'U') into the orders snapshot — the keyed-upsert
    capability SURVEY §2.1 maps the HBase sink to."""
    snap = _orders_snapshot(spark, sf_dir)
    merged = upsert(snap, _updates(snap, 10), "o_orderkey")
    return merged.select(
        "o_orderkey", "o_orderstatus", F.col("price").cast("double").alias("price")
    )


def orders_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two SCD2 batches (v1: every 10th key, v2: every 20th) over the
    orders snapshot; full history with validity range + current flag."""
    snap = _orders_snapshot(spark, sf_dir)
    hist = scd2_init(snap, version=0)
    hist = scd2_apply(hist, _updates(snap, 10), "o_orderkey", version=1)
    v2 = _updates(snap, 20).withColumn(
        "price", (F.col("price") * F.lit(2)).cast(_DEC)
    )
    hist = scd2_apply(hist, v2, "o_orderkey", version=2)
    return hist.select(
        "o_orderkey", "o_orderstatus",
        F.col("price").cast("double").alias("price"),
        "valid_from", "valid_to", "is_current",
    )


_UPSERT_SQL = """
WITH snap AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
upd AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         CAST(price * 2 AS DECIMAL(18,2)) AS price
  FROM snap WHERE o_orderkey % 10 = 0
)
SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price FROM (
  SELECT * FROM snap WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
  UNION ALL
  SELECT * FROM upd
)
"""

_SCD2_SQL = """
WITH snap AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
u1 AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         CAST(price * 2 AS DECIMAL(18,2)) AS price
  FROM snap WHERE o_orderkey % 10 = 0
),
u2 AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         CAST(CAST(price * 2 AS DECIMAL(18,2)) * 2
              AS DECIMAL(18,2)) AS price
  FROM snap WHERE o_orderkey % 20 = 0
)
SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price,
       valid_from, valid_to, is_current
FROM (
  -- v0 rows closed at v1 (keys updated in batch 1)
  SELECT o_orderkey, o_orderstatus, price, CAST(0 AS BIGINT) AS valid_from,
         CAST(1 AS BIGINT) AS valid_to, FALSE AS is_current
  FROM snap WHERE o_orderkey % 10 = 0
  UNION ALL
  -- v0 rows never updated
  SELECT o_orderkey, o_orderstatus, price, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), TRUE
  FROM snap WHERE o_orderkey % 10 <> 0
  UNION ALL
  -- v1 rows closed at v2 (keys updated again in batch 2)
  SELECT o_orderkey, o_orderstatus, price, CAST(1 AS BIGINT), CAST(2 AS BIGINT), FALSE
  FROM u1 WHERE o_orderkey % 20 = 0
  UNION ALL
  -- v1 rows still current (updated once, not twice)
  SELECT o_orderkey, o_orderstatus, price, CAST(1 AS BIGINT), CAST(NULL AS BIGINT), TRUE
  FROM u1 WHERE o_orderkey % 20 <> 0
  UNION ALL
  -- v2 rows (current)
  SELECT o_orderkey, o_orderstatus, price, CAST(2 AS BIGINT), CAST(NULL AS BIGINT), TRUE FROM u2
)
"""

register(QuerySpec("orders_upsert", orders_upsert, _UPSERT_SQL,
                   doc=orders_upsert.__doc__))
register(QuerySpec("orders_scd2", orders_scd2, _SCD2_SQL,
                   doc=orders_scd2.__doc__))


DIFF_CUTOFF = "1998-01-01"


def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style table diff between two derived order snapshots (per-
    customer order counts before vs including 1998+): every customer row
    classified added / removed / changed / unchanged with both values.
    One FULL OUTER equi-join on the key after each side pre-aggregates —
    the standard snapshot-reconciliation shape for pipelines without a
    changelog. Counts per class are exact, so the whole diff is oracle-
    checkable."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(DIFF_CUTOFF).cast("timestamp")
    old = orders.where(F.col("o_orderdate") < cutoff).groupBy(
        "o_custkey"
    ).agg(F.count("*").alias("n_old"))
    new = orders.groupBy("o_custkey").agg(F.count("*").alias("n_new"))
    j = old.join(new, "o_custkey", "full_outer")
    status = (
        F.when(F.col("n_old").isNull(), "added")
        .when(F.col("n_new").isNull(), "removed")
        .when(F.col("n_old") != F.col("n_new"), "changed")
        .otherwise("unchanged")
    )
    # key named "custkey" so it sorts first in column-name order:
    # order-insensitive row compares then never tie-break on the
    # nullable count columns
    return j.select(F.col("o_custkey").alias("custkey"),
                    "n_old", "n_new", status.alias("status"))


_SNAPSHOT_DIFF_SQL = f"""
WITH old AS (
  SELECT o_custkey, count(*) AS n_old FROM orders
  WHERE o_orderdate < TIMESTAMP '{DIFF_CUTOFF} 00:00:00' GROUP BY 1
),
new AS (SELECT o_custkey, count(*) AS n_new FROM orders GROUP BY 1)
SELECT coalesce(old.o_custkey, new.o_custkey) AS custkey, n_old, n_new,
       CASE WHEN n_old IS NULL THEN 'added'
            WHEN n_new IS NULL THEN 'removed'
            WHEN n_old <> n_new THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old FULL OUTER JOIN new ON old.o_custkey = new.o_custkey
"""

register(QuerySpec("orders_snapshot_diff", orders_snapshot_diff,
                   _SNAPSHOT_DIFF_SQL, doc=orders_snapshot_diff.__doc__))


# ------------------------------------------------------------ purge audit

# right-to-be-forgotten tombstones: a deterministic ~1% of customers
_TOMBSTONE_PRED = "c_custkey % 97 = 13"


def customers_purge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style cascading delete audit: purge a tombstoned customer
    set and propagate through the foreign-key chain
    (customer → orders → lineitem), reporting per-table before/purged/
    after counts plus the post-purge orphan count — which must be 0,
    and the query PROVES it rather than asserting it.

    Physical shapes: the tombstone set (≈1% of a dimension) broadcasts;
    customer purge is a LEFT ANTI against it, orders purge a LEFT SEMI
    of o_custkey into it, lineitem purge a LEFT SEMI into the purged
    orders' keys (fact-to-fact semi-join — shuffle-hash on l_orderkey,
    the only step that touches the big table, one pass). The orphan
    check re-joins the surviving orders against surviving customers
    LEFT ANTI: at 100 TB every step is a semi/anti join on the key
    chain — no row is ever rewritten, which is exactly how delete
    vectors/tombstones defer physical rewrites in a lakehouse."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    tomb = customer.where(F.expr(_TOMBSTONE_PRED)).select("c_custkey")
    purged_orders_keys = (
        orders.join(F.broadcast(tomb),
                    orders.o_custkey == tomb.c_custkey, "left_semi")
        .select("o_orderkey")
    )

    def counts(name, total_df, purged_df, orphans_df):
        t = total_df.agg(F.count("*").alias("rows_before"))
        p = purged_df.agg(F.count("*").alias("rows_purged"))
        o = orphans_df.agg(F.count("*").alias("orphans_after"))
        return (
            t.crossJoin(F.broadcast(p)).crossJoin(F.broadcast(o))
            .select(
                F.lit(name).alias("table"),
                "rows_before",
                "rows_purged",
                (F.col("rows_before") - F.col("rows_purged"))
                .alias("rows_after"),
                "orphans_after",
            )
        )

    surviving_customer = customer.join(
        F.broadcast(tomb), "c_custkey", "left_anti"
    )
    surviving_orders = orders.join(
        F.broadcast(tomb), orders.o_custkey == tomb.c_custkey, "left_anti"
    )
    empty = spark.range(0)

    cust_row = counts(
        "customer", customer,
        customer.join(F.broadcast(tomb), "c_custkey", "left_semi"),
        empty,
    )
    ord_row = counts(
        "orders", orders,
        orders.join(F.broadcast(tomb),
                    orders.o_custkey == tomb.c_custkey, "left_semi"),
        surviving_orders.join(
            surviving_customer.select("c_custkey"),
            surviving_orders.o_custkey == surviving_customer.c_custkey,
            "left_anti",
        ),
    )
    surviving_lineitem = lineitem.join(
        purged_orders_keys,
        lineitem.l_orderkey == purged_orders_keys.o_orderkey, "left_anti"
    )
    li_row = counts(
        "lineitem", lineitem,
        lineitem.join(purged_orders_keys,
                      lineitem.l_orderkey == purged_orders_keys.o_orderkey,
                      "left_semi"),
        # real referential check: every surviving lineitem must still
        # resolve to a surviving order
        surviving_lineitem.join(
            surviving_orders.select("o_orderkey"),
            surviving_lineitem.l_orderkey == surviving_orders.o_orderkey,
            "left_anti",
        ),
    )
    return cust_row.unionByName(ord_row).unionByName(li_row).orderBy("table")


_PURGE_SQL = f"""
WITH tomb AS (SELECT c_custkey FROM customer WHERE {_TOMBSTONE_PRED}),
po AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM tomb)
),
cust AS (
  SELECT 'customer' AS "table",
         (SELECT count(*) FROM customer) AS rows_before,
         (SELECT count(*) FROM customer
           WHERE c_custkey IN (SELECT c_custkey FROM tomb)) AS rows_purged,
         CAST(0 AS BIGINT) AS orphans_after
),
ords AS (
  SELECT 'orders',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders
           WHERE o_custkey IN (SELECT c_custkey FROM tomb)),
         (SELECT count(*) FROM orders o
           WHERE o.o_custkey NOT IN (SELECT c_custkey FROM tomb)
             AND o.o_custkey NOT IN
                 (SELECT c_custkey FROM customer
                   WHERE NOT ({_TOMBSTONE_PRED})))
),
li AS (
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM po)),
         (SELECT count(*) FROM lineitem l
           WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM po)
             AND l.l_orderkey NOT IN
                 (SELECT o_orderkey FROM orders
                   WHERE o_custkey NOT IN (SELECT c_custkey FROM tomb)))
)
SELECT "table", rows_before, rows_purged,
       rows_before - rows_purged AS rows_after, orphans_after
FROM (SELECT * FROM cust UNION ALL SELECT * FROM ords
      UNION ALL SELECT * FROM li)
ORDER BY "table"
"""

register(QuerySpec("customers_purge_audit", customers_purge_audit,
                   _PURGE_SQL, doc=customers_purge_audit.__doc__))


# --------------------------------------------------------- PIT lookup

def orders_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature lookup against the SCD2 history: every
    50th order key probed at versions 0, 1, 2 returns the price/status
    that was valid THEN — the no-future-leakage join a feature store
    runs when assembling training sets
    (operators/upsert.scd2_point_in_time)."""
    from bigdata2016w_spark.operators.upsert import scd2_point_in_time

    hist = orders_scd2(spark, sf_dir)
    probes = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            F.explode(
                F.array(*[F.lit(v).cast("long") for v in (0, 1, 2)])
            ).alias("as_of"),
        )
    )
    return (
        scd2_point_in_time(hist, probes, "o_orderkey")
        .select("o_orderkey", "as_of", "o_orderstatus", "price")
        .orderBy("o_orderkey", "as_of")
    )


_PIT_SQL = f"""
WITH probes AS (
  SELECT o_orderkey, unnest([0, 1, 2]) AS as_of
  FROM orders WHERE o_orderkey % 50 = 0
)
SELECT p.o_orderkey, CAST(p.as_of AS BIGINT) AS as_of,
       h.o_orderstatus, h.price
FROM probes p JOIN ({_SCD2_SQL}) h ON p.o_orderkey = h.o_orderkey
WHERE h.valid_from <= p.as_of
  AND (h.valid_to IS NULL OR p.as_of < h.valid_to)
ORDER BY p.o_orderkey, as_of
"""

register(QuerySpec("orders_scd2_pit", orders_scd2_pit, _PIT_SQL,
                   doc=orders_scd2_pit.__doc__))
