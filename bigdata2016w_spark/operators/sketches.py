"""Probabilistic sketches and document fingerprints — LLM-pipeline
extension (no reference counterpart; the reference's only cardinality
work is exact distinct counting, e.g. ``SCALA/assignment5`` GROUP BYs).

Four operators, all single-pass, mergeable, and deterministic:

- **Winnowing fingerprints** (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  the MOSS algorithm): per document, hash every token k-gram, then keep
  the minimum hash of each window of ``w`` consecutive k-grams. Any
  shared substring of ≥ ``k + w - 1`` tokens is *guaranteed* to share a
  fingerprint, so fingerprint collisions are a lossless candidate
  generator for long-span plagiarism/dup detection at a density of
  ~2/(w+1) of the k-grams.
- **KMV distinct sketch** (Bar-Yossef et al., RANDOM'02): the k smallest
  distinct hash values; distinct-count estimate (k−1)/max_k normalized
  to the hash range. Mergeable by taking the k smallest of a union —
  exactly what Spark's ``TakeOrderedAndProject`` does per partition, so
  the sketch IS the physical plan of ``ORDER BY h LIMIT k``.
- **HyperLogLog** (Flajolet et al., AofA'07): 2^p max-rank registers.
  Register build is one hash-partial-agg pass (map-side combine on the
  bucket key); the harmonic sum is kept in EXACT integer arithmetic —
  Σ 2^(53−rho) as int64 (max 2^61, no overflow) — so the estimate is a
  single double division, bit-identical across engines regardless of
  aggregation order.
- **Count-Min sketch** (Cormode/Muthukrishnan, J.Alg'05): d×w counter
  matrix via one explode+groupBy pass; point estimates join the d·w-row
  counter table back broadcast. Estimates always ≥ true counts (pinned
  in tests); heavy-hitter report compares both.

All hashes are ``portable_hash60`` (``operators.dedup``), so every
operator replays bit-for-bit in the DuckDB oracle. The xxhash64 family
would be the one-line swap for a throughput-critical deployment, at the
cost of oracle replayability (same trade as the dedup tiers).

100-TB notes: winnowing is per-row expression work after an explicit
repartition (single-file corpora otherwise tokenize in one task);
candidate pairing is bounded by the MOSS-style stop-fingerprint cap
(``max_df``), so no fingerprint fans out quadratically. KMV's sort-limit
and HLL's 2^p-row agg shuffle O(k)/O(2^p) bytes per partition, not
corpus bytes. CMS counters are d·w rows total — broadcastable forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from bigdata2016w_spark.functions.tokenizer import tokenize
from bigdata2016w_spark.operators.dedup import portable_hash60

WINNOW_K = 5       # tokens per k-gram (guarantee threshold = k + w - 1)
WINNOW_W = 4       # consecutive k-gram hashes per fingerprint window
WINNOW_MAX_DF = 20  # MOSS stop-fingerprints: ignore fps in > max_df docs
WINNOW_MIN_SHARED = 2  # candidate pairs need this many shared rare fps

KMV_K = 64

HLL_P = 8
HLL_M = 1 << HLL_P            # 256 registers
_HLL_REST_BITS = 60 - HLL_P   # 52 rank bits above the bucket field
# rho ∈ [1, 53]; Σ 2^(53-rho) ≤ m·2^52 = 2^60 — exact in int64.
_HLL_RHO_MAX = _HLL_REST_BITS + 1   # 53: rho of an all-zero rest field
_HLL_SCALE = float(1 << _HLL_RHO_MAX)
# alpha_m · m² · 2^53, folded to ONE python double so both engines do a
# single division — no engine-side multiply-order divergence possible.
HLL_EST_NUMERATOR = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * _HLL_SCALE

CMS_D, CMS_W = 4, 256


# ---------------------------------------------------------------- winnow
def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, fingerprint): distinct winnowing fingerprints per doc.

    One row in, one array-expression chain out — k-gram hashing and the
    per-window min both stay inside whole-stage codegen (no shuffle at
    all until a consumer aggregates). Docs shorter than ``k + w - 1``
    tokens have no complete window and are dropped (both engines,
    structurally). The repartition exists because document corpora are
    often few/unsplittable files and this is regex-heavy per-row work
    (same rationale as ``dedup.shingle_sets``)."""
    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    toks = docs.select("doc_id", tokenize("text").alias("t")).where(
        F.size("t") >= k + w - 1
    )
    # every array expression below is guarded with F.when so it stays
    # TOTAL on short rows: the optimizer may collapse these projections
    # with the length filter and evaluate them on unfiltered rows, where
    # sequence(1, n<1) runs DESCENDING into slice(t, 0, k), which throws
    grams = toks.select(
        "doc_id",
        F.when(
            F.size("t") >= k + w - 1,
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (k - 1)),
                lambda i: portable_hash60(
                    F.concat_ws(" ", F.slice("t", i, k)), "WN"
                ),
            ),
        ).otherwise(F.array().cast("array<bigint>")).alias("g"),
    )
    fps = grams.select(
        "doc_id",
        F.array_distinct(
            F.when(
                F.size("g") >= w,
                F.transform(
                    F.sequence(F.lit(1), F.size("g") - (w - 1)),
                    lambda i: F.array_min(F.slice("g", i, w)),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("fps"),
    )
    return fps.select("doc_id", F.explode("fps").alias("fingerprint"))


def winnow_dup_candidates(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_df: int = WINNOW_MAX_DF,
    min_shared: int = WINNOW_MIN_SHARED,
) -> DataFrame:
    """(doc_a, doc_b, n_shared): doc pairs sharing ≥ ``min_shared``
    *rare* fingerprints (document frequency ≤ ``max_df`` — MOSS's
    stop-fingerprint rule: boilerplate every doc contains carries no
    dup signal AND is exactly the key that would fan out quadratically
    in the self-join, so dropping it is both the right semantics and
    the skew bound: ≤ max_df² pair rows per fingerprint)."""
    fps = winnow_fingerprints(docs, k, w)
    rare = (
        fps.groupBy("fingerprint")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_df)
        .select("fingerprint")
    )
    # fingerprint-keyed equi-join; the df filter and the self-join hash
    # on the same key, so AQE coalesces them into one exchange lineage
    fr = fps.join(rare, "fingerprint")
    a = fr.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = fr.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# ------------------------------------------------------------------ KMV
def kmv_distinct(
    values: DataFrame, col: str = "s", k: int = KMV_K, seed: str = "KMV"
) -> DataFrame:
    """One row (k_used, kth_min, est_distinct, exact_distinct): K-minimum-
    values distinct-count sketch over ``values[col]`` (duplicates fine —
    hashing dedups). ``ORDER BY h LIMIT k`` compiles to per-partition
    top-k + a k-row merge (TakeOrderedAndProject): the sketch's merge
    operation is the physical plan, no custom state anywhere.
    ``exact_distinct`` rides along (same distinct pass feeds both) so
    the query doubles as its own error report. An under-filled sketch
    (k_used < k) has seen EVERY distinct hash, so the estimate is the
    exact count k_used (standard KMV small-stream regime — the
    (k-1)·2^60/kth_min cap formula applies only to a full sketch, and
    would report 0.0 for a single-value stream)."""
    h = (
        values.select(portable_hash60(F.col(col), seed).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
    )
    kmin = h.orderBy("h").limit(k)
    agg = kmin.agg(
        F.count("*").cast("int").alias("k_used"),
        F.max("h").alias("kth_min"),
    )
    exact = h.agg(F.count("*").alias("exact_distinct"))
    return (
        agg.crossJoin(broadcast(exact))  # two 1-row frames
        .select(
            "k_used",
            "kth_min",
            # under-filled sketch saw everything: exact k_used (this
            # also makes the empty stream 0.0, not NULL — consumers
            # threshold on it); the cap formula is full-sketch-only
            F.when(
                F.col("k_used") < F.lit(k), F.col("k_used").cast("double")
            ).otherwise(
                F.round(
                    (F.col("k_used") - F.lit(1)).cast("double")
                    * F.lit(float(1 << 60))
                    / F.col("kth_min").cast("double"),
                    4,
                )
            ).alias("est_distinct"),
            "exact_distinct",
        )
    )


# ------------------------------------------------------------------ HLL
def hll_registers_by(
    values: DataFrame, keys: list[str], col: str = "s", seed: str = "HLL"
) -> DataFrame:
    """(*keys, bucket, rho): one 2^p max-rank register table PER key
    group, built in one hash-partial-agg pass. Mergeable across any
    coarser grain by ``groupBy(coarser_keys, bucket).max(rho)`` — max
    is associative, so hourly partials fold losslessly into daily/
    weekly registers without revisiting the raw data. This is the
    re-aggregable-cube path at 100 TB: store fine-grain partials
    (keys × 256 rows), answer every coarser distinct-count by merging
    metadata-sized register tables."""
    h = values.select(
        *keys, portable_hash60(F.col(col), seed).alias("h")
    ).where(F.col("h").isNotNull())
    buckets = h.select(
        *keys,
        F.col("h").bitwiseAND(F.lit(HLL_M - 1)).cast("int").alias("bucket"),
        F.shiftright("h", HLL_P).alias("rest"),
    ).select(
        *keys,
        "bucket",
        F.when(F.col("rest") == 0, F.lit(_HLL_REST_BITS + 1))
        .otherwise(F.lit(_HLL_REST_BITS + 1) - F.length(F.bin("rest")))
        .cast("int")
        .alias("rho"),
    )
    return buckets.groupBy(*keys, "bucket").agg(F.max("rho").alias("rho"))


def hll_registers(
    values: DataFrame, col: str = "s", seed: str = "HLL"
) -> DataFrame:
    """(bucket, rho): the 2^p max-rank register table — the HLL sketch
    state itself, built in one hash-partial-agg pass. Mergeable by
    ``groupBy(bucket).max(rho)``: per-partition partials, per-batch
    streaming partials, and cross-corpus combines are all the same
    max-merge (used by ``streaming.sketch_sink``)."""
    return hll_registers_by(values, [], col, seed)


def hll_estimate_by(regs: DataFrame, keys: list[str]) -> DataFrame:
    """(*keys, m_filled, isum, est_distinct): per-group estimates from
    a keyed register table. Same exact-int64 harmonic sum and
    single-division estimate as documented on hll_distinct, evaluated
    once per key group."""
    agg = regs.groupBy(*keys).agg(
        F.count("*").cast("int").alias("m_filled"),
        (
            # empty register table: sum is NULL — coalesce to 0 so the
            # all-empty isum (m·2^53) and estimate 0.0 come out, not NULL
            F.coalesce(
                F.sum(F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - rho)"
                )),
                F.lit(0).cast("long"),
            )
            + (F.lit(HLL_M) - F.count("*")) * F.lit(1 << _HLL_RHO_MAX)
        ).alias("isum"),
    )
    raw = F.lit(HLL_EST_NUMERATOR) / F.col("isum").cast("double")
    v = F.lit(HLL_M) - F.col("m_filled")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *keys, "m_filled", "isum", F.round(est, 4).alias("est_distinct")
    )


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """One row (m_filled, isum, est_distinct) from a register table —
    the read-side half of the sketch, shared by :func:`hll_distinct`
    and the streaming merge reader."""
    return hll_estimate_by(regs, [])


def hll_distinct(
    values: DataFrame, col: str = "s", seed: str = "HLL"
) -> DataFrame:
    """One row (m_filled, isum, est_distinct, exact_distinct):
    HyperLogLog with 2^p = 256 registers over the 60-bit portable hash —
    bucket = low p bits, rho = leading-zero count of the remaining 52
    bits + 1 (computed integer-exactly via the binary-string length:
    ``length(bin(rest))`` = floor(log2)+1 in both engines; rest = 0 ⇒
    rho = 53). The harmonic denominator is the int64 ``isum`` =
    Σ 2^(53−rho) with empty registers contributing 2^53, so the raw
    estimate is ONE double division of a python-folded constant — no
    float accumulation order anywhere. Linear counting takes over below
    2.5·m when empty registers exist (the standard small-range branch;
    ln is rounded like every libm call in the engine)."""
    regs = hll_registers(values, col, seed)
    exact = values.select(F.col(col)).where(
        F.col(col).isNotNull()
    ).distinct().agg(F.count("*").alias("exact_distinct"))
    return hll_estimate_from_registers(regs).crossJoin(
        broadcast(exact)
    ).select("m_filled", "isum", "est_distinct", "exact_distinct")


# ------------------------------------------------------------------ CMS
def _cms_slots(df: DataFrame) -> DataFrame:
    """Append (j, slot) — the d seeded hash positions of string column
    ``k`` — one explode per input row, passthrough columns kept. ONE
    definition shared by the counter build and the point-estimate probe:
    if build and probe hashed differently, every estimate would read
    the wrong cells with nothing pointing at the divergence."""
    return df.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    (portable_hash60(F.col("k"), f"CMS{j}") % CMS_W)
                    .cast("int")
                    .alias("slot"),
                )
                for j in range(CMS_D)
            ])
        ).alias("s"),
    ).select(*df.columns, "s.j", "s.slot")


def cms_counters(keys: DataFrame, col: str = "k") -> DataFrame:
    """(j, slot, cnt): the d×w Count-Min counter matrix — one
    explode+hash-agg pass over the stream (partial aggregation does the
    map-side combine; at any corpus size the result is d·w rows)."""
    rows = keys.select(F.col(col).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    return _cms_slots(rows).groupBy("j", "slot").agg(
        F.count("*").alias("cnt")
    )


def cms_heavy_keys(
    keys: DataFrame, col: str = "k", above_mean: float = 1.15
) -> DataFrame:
    """(key, est_count, true_count): keys whose Count-Min point estimate
    (min over the d rows of the broadcast counter matrix) exceeds
    ``above_mean`` × the mean per-key count. The mean-relative threshold
    keeps selectivity stable as BOTH stream length and key cardinality
    scale (a fixed fraction of the stream selects everything when keys
    are few and nothing when keys are many). CMS never underestimates,
    so the report can only over-include — the join back to true counts
    makes the false-positive rate visible in the result itself. The
    counter matrix is d·w rows regardless of scale; the only full-width
    work is the distinct-key pass every heavy-hitter definition needs."""
    rows = keys.select(F.col(col).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    counters = cms_counters(keys, col)
    true_counts = rows.groupBy("k").agg(F.count("*").alias("true_count"))
    probes = _cms_slots(true_counts)
    est = (
        probes.join(broadcast(counters), ["j", "slot"])
        .groupBy("k", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    mean = true_counts.agg(
        F.sum("true_count").alias("total"),
        F.count("*").alias("n_keys"),
    )
    return (
        est.crossJoin(broadcast(mean))
        .where(
            F.col("est_count").cast("double")
            >= F.col("total").cast("double") / F.col("n_keys").cast("double")
            * F.lit(above_mean)
        )
        .select(F.col("k").alias("key"), "est_count", "true_count")
    )


# ------------------------------------------------------------ KMV algebra
def kmv_set_ops(
    va: DataFrame, vb: DataFrame, col: str = "s", k: int = KMV_K,
    seed: str = "KMV",
) -> DataFrame:
    """One row (k_union, kth_union, n_common, est_union,
    est_intersection, exact_union, exact_intersection): KMV sketch
    ALGEBRA over two value streams (Beyer et al., SIGMOD'07). The union
    sketch is the k smallest of the two k-min sets' union — computable
    from the sketches alone, which is the point: at 100 TB each source
    keeps a k-row sketch and the combine is driver-trivial. The
    intersection estimate is (|L ∩ A_k ∩ B_k| / |L|) x est_union —
    the Jaccard-via-union-sketch estimator, again sketch-only. Exact
    union/intersection ride along as the error report (they, not the
    sketches, are the full-width passes). An under-filled union sketch
    (k_union < k) implies BOTH input sketches were complete sets, so
    the union estimate is exactly k_union and n_common IS the
    intersection — the cap formulas apply only to a full sketch."""
    hA = (
        va.select(portable_hash60(F.col(col), seed).alias("h"))
        .where(F.col("h").isNotNull()).distinct()
    )
    hB = (
        vb.select(portable_hash60(F.col(col), seed).alias("h"))
        .where(F.col("h").isNotNull()).distinct()
    )
    kA = hA.orderBy("h").limit(k)
    kB = hB.orderBy("h").limit(k)
    lu = kA.union(kB).distinct().orderBy("h").limit(k)
    ua = lu.agg(
        F.count("*").cast("int").alias("k_union"),
        F.max("h").alias("kth_union"),
    )
    common = (
        lu.join(kA, "h", "left_semi")
        .join(kB, "h", "left_semi")
        .agg(F.count("*").cast("int").alias("n_common"))
    )
    exact_u = hA.union(hB).distinct().agg(
        F.count("*").alias("exact_union")
    )
    exact_i = hA.join(hB, "h", "left_semi").agg(
        F.count("*").alias("exact_intersection")
    )
    est_u = (
        (F.col("k_union") - F.lit(1)).cast("double")
        * F.lit(float(1 << 60))
        / F.col("kth_union").cast("double")
    )
    # under-filled union sketch = both input sketches were complete
    # sets: k_union and n_common are exact (covers the empty stream
    # too — 0.0, not NULL); the cap formulas are full-sketch-only
    underfilled = F.col("k_union") < F.lit(k)
    return (
        ua.crossJoin(broadcast(common))
        .crossJoin(broadcast(exact_u))
        .crossJoin(broadcast(exact_i))
        .select(
            "k_union", "kth_union", "n_common",
            F.when(underfilled, F.col("k_union").cast("double")).otherwise(
                F.round(est_u, 4)
            ).alias("est_union"),
            F.when(underfilled, F.col("n_common").cast("double")).otherwise(
                F.round(
                    F.col("n_common").cast("double")
                    / F.col("k_union").cast("double")
                    * est_u,
                    4,
                )
            ).alias("est_intersection"),
            "exact_union", "exact_intersection",
        )
    )


# ------------------------------------------------------------------ bloom
BLOOM_WORDS, BLOOM_WORD_BITS, BLOOM_D = 64, 62, 3
BLOOM_BITS = BLOOM_WORDS * BLOOM_WORD_BITS  # 3968


def _bloom_words(df: DataFrame) -> DataFrame:
    """Append (word, mask) — the d seeded bit positions of string column
    ``k`` split into word index and in-word mask — passthrough columns
    kept. ONE definition shared by the filter build and the probe (same
    rationale as :func:`_cms_slots`: diverging hash arithmetic between
    the two sides would silently break every membership answer)."""
    ex = df.select(
        "*",
        F.explode(
            F.array(*[
                (portable_hash60(F.col("k"), f"BL{j}") % BLOOM_BITS)
                .alias("p")
                for j in range(BLOOM_D)
            ])
        ).alias("pos"),
    )
    return ex.select(
        *df.columns,
        (F.col("pos") / BLOOM_WORD_BITS).cast("int").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pos % {BLOOM_WORD_BITS} AS INT))"
        ).alias("mask"),
    )


def bloom_bitmap(keys: DataFrame, col: str = "k") -> DataFrame:
    """(word, w): a Bloom filter over ``keys[col]`` as BLOOM_WORDS rows
    of 62-bit int64 words (62, not 64 — bit 63 is the sign and DuckDB
    refuses the 1<<63 overflow, so the portable word is sign-free by
    construction). Built in one explode+hash-agg pass (bit_or partials
    combine map-side); the result is ~0.5 KB at any corpus size — the
    runtime-filter artifact a 100-TB join prunes its probe side with."""
    rows = keys.select(F.col(col).cast("string").alias("k")).where(
        F.col("k").isNotNull()
    )
    return _bloom_words(rows).groupBy("word").agg(
        F.bit_or("mask").alias("w")
    )


def bloom_probe_summary(
    build_keys: DataFrame, probe_keys: DataFrame,
    build_col: str = "k", probe_col: str = "k",
) -> DataFrame:
    """One row (n_probe_keys, n_passed, n_members, n_false_positives,
    n_false_negatives): probe a key stream against the Bloom filter of
    another and report the confusion counts. A key passes iff ALL d bit
    probes hit; membership ground truth joins back so the false-positive
    rate is visible in the result — and n_false_negatives is structurally
    0 (a Bloom filter never drops a member), pinned by the oracle. The
    bitmap reaches the probe join broadcast (it is 64 rows); this is the
    runtime-filter shape Spark's own bloom-join uses, made portable."""
    bitmap = bloom_bitmap(build_keys, build_col)
    bk = build_keys.select(
        F.col(build_col).cast("string").alias("k")
    ).where(F.col("k").isNotNull()).distinct()
    pk = probe_keys.select(
        F.col(probe_col).cast("string").alias("k")
    ).where(F.col("k").isNotNull()).distinct()
    probes = _bloom_words(pk)
    hits = (
        probes.join(broadcast(bitmap), "word", "left")
        .select(
            "k",
            (
                F.coalesce(F.col("w"), F.lit(0).cast("long"))
                .bitwiseAND(F.col("mask"))
                == F.col("mask")
            ).cast("int").alias("hit"),
        )
        .groupBy("k")
        .agg((F.min("hit") == 1).alias("passed"))
    )
    flagged = hits.join(
        bk.withColumn("is_member", F.lit(True)), "k", "left"
    ).select(
        "passed", F.coalesce("is_member", F.lit(False)).alias("member")
    )
    return flagged.agg(
        F.count("*").alias("n_probe_keys"),
        F.sum(F.col("passed").cast("long")).alias("n_passed"),
        F.sum(F.col("member").cast("long")).alias("n_members"),
        F.sum((F.col("passed") & ~F.col("member")).cast("long"))
        .alias("n_false_positives"),
        F.sum((F.col("member") & ~F.col("passed")).cast("long"))
        .alias("n_false_negatives"),
    )


def winnow_cross_candidates(
    index_docs: DataFrame,
    probe_docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_df: int = WINNOW_MAX_DF,
    min_shared: int = 1,
) -> DataFrame:
    """(probe_id, index_id, n_shared): incremental dup candidates — each
    PROBE doc paired with every INDEX doc it shares ≥ ``min_shared``
    rare fingerprints with, probe-vs-index only (never intra-side; the
    ``jaccard_cross_near_dupes`` admission convention). ``min_shared``
    defaults to 1 because one shared fingerprint is already the winnow
    guarantee for any shared span of ≥ k+w-1 tokens crossing the corpus
    boundary — the lossless candidate tier an ingest gate needs.
    Stop-fingerprints are judged on INDEX document frequency (the
    corpus knows what its boilerplate is; a probe batch is too small
    to), which is also the skew bound: ≤ max_df index rows per
    fingerprint reach the join."""
    fpi = winnow_fingerprints(index_docs, k, w)
    fpp = winnow_fingerprints(probe_docs, k, w)
    rare = (
        fpi.groupBy("fingerprint")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_df)
        .select("fingerprint")
    )
    fi = fpi.join(rare, "fingerprint").select(
        F.col("doc_id").alias("index_id"), "fingerprint"
    )
    fp = fpp.join(rare, "fingerprint").select(
        F.col("doc_id").alias("probe_id"), "fingerprint"
    )
    return (
        fp.join(fi, "fingerprint")
        .groupBy("probe_id", "index_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# --------------------------------------------------------- hash-sample
QSK_K = 128
QSK_QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def hash_sample_quantiles(
    rows: DataFrame,
    key: str,
    col: str,
    k: int = QSK_K,
    quantiles: tuple[float, ...] = QSK_QUANTILES,
    seed: str = "QSK",
) -> DataFrame:
    """(q, est, k_used, n_rows): quantile estimates from a k-minimum-hash
    uniform sample — the quantile member of the KMV family. The sample
    is the k rows whose ``portable_hash60(key)`` values are smallest
    (ties broken by the value itself so both engines cut identically):
    a without-replacement uniform row sample whose merge operation —
    exactly like KMV — is "keep the k smallest of the union", and whose
    physical plan IS ``ORDER BY h LIMIT k`` = per-partition top-k +
    a k-row merge (TakeOrderedAndProject). Each estimate is the
    ⌈q·k_used⌉-th order statistic of the sampled values — an actual
    data value, no interpolation arithmetic, so the oracle replays it
    bit-for-bit. ``n_rows`` (one cheap count) rides along as sampling
    context; state is O(k) at any corpus size. Out-of-range order
    statistics (empty input) surface as NULL via the non-throwing
    ``F.get`` — never ``element_at``, which raises under ANSI when the
    optimizer evaluates a collapsed projection on unguarded rows."""
    samp = hash_sample_rows(rows, key, col, k, seed)
    n = rows.agg(F.count("*").alias("n_rows"))
    return (
        quantile_rows_from_sample(samp, quantiles)
        .crossJoin(broadcast(n))
        .select("q", "est", "k_used", "n_rows")
    )


def hash_sample_rows(
    rows: DataFrame, key: str, col: str, k: int = QSK_K, seed: str = "QSK"
) -> DataFrame:
    """(h, x): the k-minimum-hash sample itself — the mergeable state of
    :func:`hash_sample_quantiles` (merge = the k smallest (h, x) of any
    union of samples, which is again ``ORDER BY h, x LIMIT k``). ``key``
    must identify rows uniquely (event_id, o_orderkey) or the sample is
    biased toward repeated keys; the streaming maintenance sink persists
    exactly this frame per micro-batch."""
    s = rows.select(
        # explicit string cast: the DuckDB twin's `seed || ':' || key`
        # stringifies a numeric key the same way
        portable_hash60(F.col(key).cast("string"), seed).alias("h"),
        F.col(col).cast("double").alias("x"),
    ).where(F.col("h").isNotNull() & F.col("x").isNotNull())
    return s.orderBy("h", "x").limit(k)


def quantile_rows_from_sample(
    samp: DataFrame, quantiles: tuple[float, ...] = QSK_QUANTILES
) -> DataFrame:
    """(q, est, k_used) from a (h, x) sample frame — the read-side half,
    shared by :func:`hash_sample_quantiles` and the streaming merge
    reader (same split as hll_estimate_from_registers)."""
    agg = samp.agg(
        F.sort_array(F.collect_list("x")).alias("xs"),
        F.count("*").cast("int").alias("k_used"),
    )
    qcols = F.explode(
        F.array(*[
            F.struct(
                F.lit(float(q)).alias("q"),
                F.get(
                    F.col("xs"),
                    F.ceil(F.lit(float(q)) * F.col("k_used")).cast("int")
                    - F.lit(1),
                ).alias("est"),
            )
            for q in quantiles
        ])
    ).alias("s")
    return agg.select(qcols, "k_used").select("s.q", "s.est", "k_used")
