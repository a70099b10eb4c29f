"""Standard-SQL analytics surface the reference lacks but a Spark engine
ships for free (SURVEY §2.5/§2.8 'absent' rows): rollup/cube grouping
sets, ranking/frame window functions, exact distinct counts, and a
map-typed (stripes) PMI physical variant.

All oracle-backed: these exist so a reference user migrating to this
engine gets the full relational feature set, checked with the same rigor
as the parity queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from bigdata2016w_spark.plans.text_analytics import PMI_MIN_COOCCUR, PMI_TOKEN_CAP
from bigdata2016w_spark.functions.tokenizer import tokenize
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

_DEC = "decimal(18,2)"


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (status, priority): subtotal hierarchy with exact sums."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double")
            .alias("total_price"),
        )
    )


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (status, priority): all grouping-set combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def customer_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + lag frame windows per nation (SURVEY §2.8 — no reference
    counterpart): account-balance rank and gap to the previous customer."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return customer.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),  # DuckDB rank is int64
        (F.col("c_acctbal") - F.lag("c_acctbal").over(w)).alias("gap_to_prev"),
    )


def nation_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (DISTINCT was absent in the reference)."""
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_nationkey")
    )


def customer_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quartile bucketing of account balances per nation — the
    QuantileDiscretizer-shaped feature-engineering op as a window fn."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    return customer.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


def pmi_stripes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a1 StripesPMI physical variant: co-occurrence counts pass through a
    per-word ``map<neighbor,int>`` stripe (``HMapStFW`` of
    StripesPMI.java:105-130 as ``map_from_entries``), then explode back —
    identical output/oracle to pmi_pairs, different aggregation layout.
    """
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.slice(tokenize("text"), 1, PMI_TOKEN_CAP)))
        .alias("w"),
    )
    a, b = x.alias("a"), x.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.w") != F.col("b.w")),
    ).select(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
    # stripes: per-w1 map of neighbor→count, thresholded inside the map.
    # r13 (guide §2.3 — shuffle fewer bytes): the ≥ PMI_MIN_COOCCUR cut
    # runs BEFORE the stripe reshape, so the collect_list exchange and
    # the map build carry only surviving neighbors (~2% of distinct
    # pairs at sf0.1), not every co-occurring pair. The filter commutes
    # with the reshape (it reads only the (w1, w2, cnt) entry it keeps),
    # so the exploded output — and the declared result — is unchanged;
    # this is also what "thresholded inside the map" (StripesPMI's
    # in-reducer cut) always meant.
    stripes = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= PMI_MIN_COOCCUR)
        .groupBy("w1")
        .agg(F.map_from_entries(F.collect_list(F.struct("w2", "cnt"))).alias("stripe"))
    )
    pc = stripes.select("w1", F.explode("stripe").alias("w2", "cnt"))
    wc = x.groupBy("w").agg(F.count("*").alias("cw"))
    n = docs.agg(F.count("*").alias("n_lines"))
    return (
        pc.join(broadcast(wc.selectExpr("w AS w1", "cw AS c1")), "w1")
        .join(broadcast(wc.selectExpr("w AS w2", "cw AS c2")), "w2")
        .crossJoin(broadcast(n))
        .select(
            "w1", "w2", "cnt",
            F.round(
                F.log10((F.col("n_lines") * F.col("cnt")).cast("double")
                        / (F.col("c1") * F.col("c2")).cast("double")),
                6,
            ).alias("pmi"),
        )
    )


_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

_WINDOW_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       rank() OVER w AS bal_rank,
       c_acctbal - lag(c_acctbal) OVER w AS gap_to_prev
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
"""

_DISTINCT_SQL = """
SELECT c_nationkey, count(DISTINCT c_mktsegment) AS n_segments,
       count(*) AS n_customers
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""

register(QuerySpec("orders_rollup", orders_rollup, _ROLLUP_SQL,
                   doc=orders_rollup.__doc__))
register(QuerySpec("orders_cube", orders_cube, _CUBE_SQL, doc=orders_cube.__doc__))
register(QuerySpec("customer_rank_window", customer_rank_window, _WINDOW_SQL,
                   doc=customer_rank_window.__doc__))
register(QuerySpec("nation_distinct_counts", nation_distinct_counts, _DISTINCT_SQL,
                   doc=nation_distinct_counts.__doc__))

def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — independent subtotal shapes in one pass,
    through the engine's spark.sql surface over registered views."""
    from bigdata2016w_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


def totalprice_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram of o_totalprice (10 × 50k-wide bins,
    top bin open) — the scan-once profiling op."""
    orders = load_table(spark, sf_dir, "orders")
    bin_ = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("long")
    return (
        orders.groupBy(bin_.alias("bin"))
        .agg(F.count("*").alias("n"))
        .orderBy("bin")
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

_HISTOGRAM_SQL = """
SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bin,
       count(*) AS n
FROM orders GROUP BY bin ORDER BY bin
"""

register(QuerySpec("orders_grouping_sets", orders_grouping_sets,
                   _GROUPING_SETS_SQL, doc=orders_grouping_sets.__doc__))
register(QuerySpec("totalprice_histogram", totalprice_histogram,
                   _HISTOGRAM_SQL, doc=totalprice_histogram.__doc__))

_QUARTILE_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       ntile(4) OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
FROM customer
"""

register(QuerySpec("customer_acctbal_quartiles", customer_acctbal_quartiles,
                   _QUARTILE_SQL, doc=customer_acctbal_quartiles.__doc__))
# pmi_stripes shares pmi_pairs' oracle (same semantics, different layout)
from bigdata2016w_spark.plans.text_analytics import _PMI_SQL  # noqa: E402

register(QuerySpec("pmi_stripes", pmi_stripes, _PMI_SQL, doc=pmi_stripes.__doc__))


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of their part's average quantity — the classic *correlated scalar
    subquery*, decorrelated Spark-first into a per-part aggregate joined
    back (what Catalyst's RewriteCorrelatedScalarSubquery does, written
    explicitly). The threshold compare runs in exact DECIMAL integer
    space (qty < 0.2·sum/cnt ⇔ 5·qty·cnt < sum, all operands exact), so
    no float crosses the predicate. Per-part agg shuffles once on
    l_partkey; the join reuses that key."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
        F.col("l_extendedprice").cast(_DEC).alias("price"),
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("cnt_qty")
    )
    return (
        li.join(per_part, "l_partkey")
        .where(F.lit(5) * F.col("qty") * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            F.sum("price").alias("total_revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


_Q17_SQL = """
WITH li AS (
  SELECT l_partkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price
  FROM lineitem
),
per_part AS (
  SELECT l_partkey, sum(qty) AS sum_qty, count(*) AS cnt_qty
  FROM li GROUP BY l_partkey
)
SELECT CAST(sum(price) AS DECIMAL(28,2)) AS total_revenue,
       count(*) AS n_lineitems
FROM li JOIN per_part USING (l_partkey)
WHERE 5 * qty * cnt_qty < sum_qty
"""

register(QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue,
                   _Q17_SQL, doc=q17_small_quantity_revenue.__doc__))


def supplier_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: supplier-name pairs within Levenshtein
    distance 1, blocked by nation so the pairwise distance computation
    never goes corpus-quadratic (the blocked-join pattern every
    record-linkage pipeline uses at scale; tighten blocks — prefix keys,
    sorted-neighborhood — as volume grows)."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    a, b = sup.alias("a"), sup.alias("b")
    return (
        a.join(b, "s_nationkey")
        .where(F.col("a.s_suppkey") < F.col("b.s_suppkey"))
        .select(
            F.col("a.s_suppkey").alias("supp_a"),
            F.col("b.s_suppkey").alias("supp_b"),
            F.levenshtein(F.col("a.s_name"), F.col("b.s_name")).alias("dist"),
        )
        .where(F.col("dist") <= 1)
    )


_FUZZY_SQL = """
SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS dist
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""

register(QuerySpec("supplier_fuzzy_name_pairs", supplier_fuzzy_name_pairs,
                   _FUZZY_SQL, doc=supplier_fuzzy_name_pairs.__doc__))


# ------------------------------------------------- half-sample bootstrap

R_BOOT = 32
# 1-based index of the q-quantile in the sorted 32 replicate means,
# ceil(q·R) — the hash_sample_quantiles convention
_BQ = {q: -(-int(q * 100) * R_BOOT // 100) for q in (0.05, 0.50, 0.95)}


def orders_halfsample_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap-style confidence interval for mean(o_totalprice) from
    32 deterministic half-sample replicates — the error bar a 100-TB
    metric pipeline attaches to every estimate, without resampling
    passes or RNG state.

    Replicate r includes a row iff bit r of the row's 60-bit portable
    hash is 0 (independent fair coin flips per replicate from ONE hash
    evaluation per row — not 32 hash passes). The plan is a single
    scan + a 32× integer bit-test expand + one partial-agg shuffle of
    (replicate → cents-sum, count): replicate means are single IEEE
    divisions of exact int64 sums, the quantile picks index into the
    sorted 32-value array — everything deterministic and bit-identical
    in the oracle, which replays the same bits from the same md5
    family. Half-sampling (the random-group method; cf. Poisson
    bootstrap at scale) estimates the sampling spread at n/2, a
    conservative (≈√2-wide) CI — documented, deterministic, mergeable."""
    from bigdata2016w_spark.operators.dedup import portable_hash60

    orders = load_table(spark, sf_dir, "orders").select(
        portable_hash60(F.col("o_orderkey").cast("string"), "BOOT")
        .alias("h"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # one pass: replicate R_BOOT is the SENTINEL full-table replicate
    # (no bit filter), so the full-data stats ride the same expand +
    # partial-agg shuffle as the 32 half-samples; ONE final aggregate
    # separates sentinel from replicates with CASE (collect_list drops
    # the sentinel's NULL mu) — one orders scan total, plan-pinned. A
    # two-consumer formulation re-scans: Catalyst pushes each r-filter
    # below its aggregate, so the exchanges diverge and can't be reused.
    per = (
        orders.select(
            "h", "cents", F.explode(F.sequence(F.lit(0), F.lit(R_BOOT)))
            .alias("r")
        )
        .where(F.expr(f"r = {R_BOOT} OR (shiftright(h, r) & 1) = 0"))
        .groupBy("r")
        .agg(F.sum("cents").alias("sc"), F.count("*").alias("nc"))
    )
    is_rep = F.col("r") < R_BOOT
    mu = F.when(
        is_rep,
        F.col("sc").cast("double") / (F.col("nc") * 100).cast("double"),
    )
    stats = per.agg(
        # coalesce: an empty orders table has no sentinel row — report
        # n_rows = 0 (the oracle's count(*)), not NULL
        F.coalesce(F.max(F.when(~is_rep, F.col("nc"))),
                   F.lit(0).cast("long")).alias("n_rows"),
        F.count(F.when(is_rep, F.lit(1))).alias("n_replicates"),
        F.max(F.when(~is_rep, F.col("sc"))).alias("sc_full"),
        F.sort_array(F.collect_list(mu)).alias("xs"),
    )
    return stats.select(
        "n_rows",
        "n_replicates",
        F.round(F.col("sc_full").cast("double")
                / (F.col("n_rows") * 100).cast("double"), 6)
        .alias("mean_totalprice"),
        # try_element_at: NULL (like DuckDB list indexing) on an empty
        # replicate table — an empty orders scan must yield a NULL CI,
        # not an index error
        F.round(F.try_element_at("xs", F.lit(_BQ[0.05])), 6)
        .alias("boot_p05"),
        F.round(F.try_element_at("xs", F.lit(_BQ[0.50])), 6)
        .alias("boot_p50"),
        F.round(F.try_element_at("xs", F.lit(_BQ[0.95])), 6)
        .alias("boot_p95"),
    )


_BOOT_SQL = f"""
WITH h AS (
  SELECT ('0x' || substr(md5('BOOT:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
           AS h,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), reps AS (
  SELECT r.r, cents
  FROM h CROSS JOIN (SELECT unnest(range({R_BOOT})) AS r) r
  WHERE ((h >> r.r) & 1) = 0
), m AS (
  SELECT r, CAST(sum(cents) AS BIGINT) AS sc, count(*) AS nc
  FROM reps GROUP BY r
), means AS (
  SELECT CAST(sc AS DOUBLE) / CAST(nc * 100 AS DOUBLE) AS mu FROM m
), arr AS (
  SELECT list_sort(list(mu)) AS xs, CAST(count(*) AS BIGINT) AS n_replicates
  FROM means
), f AS (
  SELECT count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS sc_full FROM h
)
SELECT n_rows, n_replicates,
       round(CAST(sc_full AS DOUBLE) / CAST(n_rows * 100 AS DOUBLE), 6)
         AS mean_totalprice,
       round(xs[{_BQ[0.05]}], 6) AS boot_p05,
       round(xs[{_BQ[0.50]}], 6) AS boot_p50,
       round(xs[{_BQ[0.95]}], 6) AS boot_p95
FROM arr CROSS JOIN f
"""

register(QuerySpec("orders_halfsample_ci", orders_halfsample_ci,
                   _BOOT_SQL, doc=orders_halfsample_ci.__doc__))


# --------------------------------------------------- basket co-occurrence

PAIR_MIN_SUPPORT = 2
PAIR_TOP_K = 20


def parts_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the top-20 part pairs co-purchased in
    the most orders (support ≥ 2). r13 shape (guide §2.4 — remove
    shuffles outright): one scan of lineitem folds into per-order
    DISTINCT baskets (``collect_set`` IS the per-basket distinct, done
    inside the aggregation), pairs are generated in-plan from the
    sorted basket array (two codegen'd Generates — no self-join, no
    second scan), and one more exchange aggregates pair support. The
    former A-Priori semi-join prune was measured a no-op on this data
    shape (min support 2 and ~30 orders/part leave ~every part
    frequent) while its distinct+freq+semi-join chain was rebuilt on
    BOTH sides of the self-join — 10 Exchanges and two lineitem scans
    for the same rows this plan produces with 2 Exchanges and one.
    Basket width bounds the per-order pair fanout (TPC-H baskets are
    ≤ 7 lines), so candidate generation is linear in orders, never
    corpus-quadratic — a corpus with unbounded baskets would cap/salt
    the basket before expansion. The final top-k is a
    TakeOrderedAndProject over the pair-support agg with a
    deterministic (count, p1, p2) tiebreak."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    pairs = (
        baskets.select(F.posexplode("ps").alias("i", "p1"), "ps")
        .select(
            "p1",
            F.explode(
                F.slice("ps", F.col("i") + 2, F.size("ps"))
            ).alias("p2"),
        )
    )
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= PAIR_MIN_SUPPORT)
        .orderBy(F.desc("n_orders"), "p1", "p2")
        .limit(PAIR_TOP_K)
    )


_PAIRS_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), freq AS (
  SELECT l_partkey FROM li GROUP BY l_partkey
  HAVING count(*) >= {PAIR_MIN_SUPPORT}
), pruned AS (
  SELECT li.l_orderkey, li.l_partkey FROM li
  WHERE li.l_partkey IN (SELECT l_partkey FROM freq)
)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
FROM pruned a JOIN pruned b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= {PAIR_MIN_SUPPORT}
ORDER BY n_orders DESC, p1, p2
LIMIT {PAIR_TOP_K}
"""

register(QuerySpec("parts_cooccurrence_topk", parts_cooccurrence_topk,
                   _PAIRS_SQL, doc=parts_cooccurrence_topk.__doc__))
