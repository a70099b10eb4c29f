"""Deduplication operators — LLM-training-pipeline extension (SURVEY §7.1
step 8; no reference counterpart — the reference's only set-dedup is the
per-line HashSet in ``JAVA/assignment1/PairsPMI.java:56-66``).

Four tiers, all DataFrame-native and shuffle-scalable:

- exact: hash-groupBy on normalized text — one shuffle, no driver state;
- n-gram Jaccard: *exact* near-dup semantics (all pairs with shingle-set
  Jaccard ≥ t). Candidate generation is an EQUI-join on log₂ size-bucket
  keys: J(A,B) ≥ t implies |B|/|A| ≤ 1/t, which bounds the bucket distance
  by d = ceil(log2(1/t)) — so each doc emits 2d+1 keys, the join never goes
  cartesian, and the blocking provably drops nothing. Verification is
  ``array_intersect`` on distinct word-3-gram shingle sets;
- MinHash + LSH banding: the approximate scale path for unbounded corpora —
  P xxhash64 min-hash aggregates per doc, banded signatures, equi-join on
  (band, band_hash), then exact-Jaccard verification of candidates only;
- SimHash: 64-bit signatures, 16-bit chunk blocking (pigeonhole: hamming
  ≤ 3 ⇒ ≥ 1 of 4 chunks equal), verify with ``bit_count(xor)``.

Everything uses deterministic JVM hashes (xxhash64) — results are stable
across runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata2016w_spark.functions.tokenizer import tokenize


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """(keep_id, n_docs) per distinct text: survivor = min doc_id."""
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
        .select("keep_id", "n_docs")
    )


def shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, n_tokens, shingles): distinct word n-gram shingles."""
    toks = docs.select("doc_id", tokenize("text").alias("t")).where(F.size("t") >= n)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at("t", i + j) for j in range(n)]
            ),
        )
    )
    return toks.select("doc_id", F.size("t").alias("n_tokens"),
                       shingles.alias("shingles"))


def _jaccard(sa, sb):
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(sa) + F.size(sb) - inter
    return inter.cast("double") / union.cast("double")


def jaccard_near_dupes(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact near-dup pairs: shingle-set Jaccard ≥ threshold.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b. Complete: J ≥ t
    implies a size ratio ≤ 1/t between the shingle sets, which bounds the
    log₂ size-bucket distance by d = ceil(log2(1/t)) — so the bucket
    blocking provably drops nothing and the result equals the all-pairs
    join (the oracle can be plain O(n²) SQL).
    """
    import math

    d = math.ceil(math.log2(1.0 / threshold)) if threshold < 1.0 else 0
    s = shingle_sets(docs)
    bucket = F.floor(F.log2(F.size("shingles"))).cast("int")
    a = s.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.explode(F.array(*[bucket + F.lit(o) for o in range(-d, d + 1)])).alias("k"),
    )
    b = s.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        bucket.alias("k"),
    )
    return (
        a.join(b, "k")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(shingled: DataFrame, num_perm: int = 16) -> DataFrame:
    """(doc_id, mh_0..mh_{P-1}): per-doc min of seeded xxhash64 per perm."""
    exploded = shingled.select("doc_id", F.explode("shingles").alias("sh"))
    return exploded.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(p), F.col("sh"))).alias(f"mh_{p}")
            for p in range(num_perm)
        ]
    )


def minhash_lsh_near_dupes(
    docs: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Approximate near-dup pairs via MinHash banding, then exact-Jaccard
    verification of candidates. Same output schema as jaccard_near_dupes —
    a subset of it with high probability (LSH recall)."""
    rows = num_perm // bands
    s = shingle_sets(docs)
    sig = minhash_signatures(s, num_perm)
    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col(f"mh_{bi * rows + r}") for r in range(rows)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.bh")
    cand = (
        band_rows.alias("x")
        .join(band_rows.alias("y"), ["band", "bh"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sh = s.select("doc_id", "shingles")
    return (
        cand.join(sh.withColumnsRenamed({"doc_id": "doc_a", "shingles": "sh_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_b", "shingles": "sh_b"}), "doc_b")
        .select("doc_a", "doc_b", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash over token xxhash64 bit votes."""
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("w"))
    h = F.xxhash64("w")
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    sim = None
    for i in range(64):
        bit = F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_near_dupes(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with hamming(simhash) ≤ k (k < 4).

    Blocking on 16-bit chunks: hamming ≤ 3 over 4 chunks forces ≥ 1 equal
    chunk, so candidates come from 4 equi-joins, not a cross product.
    """
    sig = simhash_signatures(docs)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.chunk", "b.cv")
    return (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk", "cv"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
