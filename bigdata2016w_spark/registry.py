"""Central query registry.

Every implemented operator/query registers a ``QuerySpec`` here:
- ``fn(spark, sf_dir) -> DataFrame`` — the Spark implementation,
- ``oracle`` — equivalent ANSI SQL for the DuckDB correctness oracle
  (``None`` only for genuinely non-SQL-expressible ops: iterative
  algorithms, sequential ML, custom stateful streaming).

``__spark_entry__.py`` (the driver contract) is a thin view over this.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register specs on import (import order no longer encodes
# the driver window — see _WINDOW_FRONT below).
_SPEC_MODULES = [
    "bigdata2016w_spark.plans.temporal",
    "bigdata2016w_spark.plans.analytics",
    "bigdata2016w_spark.plans.joins_setops",
    "bigdata2016w_spark.plans.reshape",
    "bigdata2016w_spark.plans.sampling",
    "bigdata2016w_spark.plans.upsert_plans",
    "bigdata2016w_spark.plans.curation",
    "bigdata2016w_spark.plans.lm_quality",
    "bigdata2016w_spark.plans.multimodal_plans",
    # graph before pipeline: pagerank_top10's oracle upgrade (r03) needs a
    # driver row; its r02 record predates the unrolled-CTE oracle
    "bigdata2016w_spark.plans.graph",
    "bigdata2016w_spark.plans.pipeline",
    "bigdata2016w_spark.plans.relational",
    "bigdata2016w_spark.plans.text_analytics",
    "bigdata2016w_spark.plans.retrieval",
    "bigdata2016w_spark.plans.ml",
    "bigdata2016w_spark.plans.events",
    # appended last deliberately — must not displace queries still
    # awaiting their first driver verdict inside the 50-query window
    "bigdata2016w_spark.plans.traversal",
    "bigdata2016w_spark.plans.maintenance",
    "bigdata2016w_spark.plans.corpus_ext",
    "bigdata2016w_spark.plans.sketches",
]


# ORDER MATTERS for external verification: the round driver samples the
# FIRST 50 names returned by all_specs() for its DuckDB-oracle correctness
# file. _WINDOW_FRONT pins that window explicitly (finer-grained than
# module import order — e.g. relational mixes long-green q1–q9 with the
# never-checked q10–q22).
#
# ROUND 6 window (26 front + 24 fillers = 50): first the 8 queries with
# NO driver verdict in r01–r05 plus bpe_apply_closed_form (new in r6),
# then the 17 queries whose only green rows are r02 — including the three
# events-window queries whose SQL changed in r4 AFTER their last green
# (plans/events.py NULL-ts filter), so their certificates are void.
# Fillers: the 24 oldest r03-only greens in registration order. The 5
# rows-only no-oracle queries (ann_ivf, sgd_scores, sgd_ensemble,
# sgd_auc, bpe_merge_table) sit BEHIND the window — an oracle slot spent
# on a rows-only check is wasted.
#
# ROUND 7 window (21 + 2 + 26 + 1 filler = 50), executing the plan the
# r6 verdict signed off on: first the 21 oracle-backed queries added in
# r6 with NO driver verdict yet (registration order), then the 2 queries
# whose oracle SQL text changed AFTER their last green (corpus_curation:
# quality_sql interpolation refactor; ann_ivf_flat: e0 NULL-embedding
# filter — both value-equivalent, locally re-verified at sf0.01), then
# the 26 remaining r03-only greens in registration order (this set
# includes corpus_datacard, the third stale-SQL certificate), and one
# filler from the oldest r05 greens (ann_bruteforce). After a green r7
# every oracle-backed query EXCEPT the queries added in r7 itself
# (ann_ivf_pq_residual, graph_lpa_communities,
# orders_price_quantile_sketch, ann_ivf_pq_rerank — local gate green,
# no driver slot left) is
# driver-certified on SQL text no older than the certificate. The 5
# rows-only no-oracle queries (ann_ivf, sgd_scores, sgd_ensemble,
# sgd_auc, bpe_merge_table) stay BEHIND the window — an oracle slot
# spent on a rows-only check is wasted.
#
# ROUND 8 window was never rotated (no-op round; CORRECTNESS_r08 re-ran
# the r7 window). ROUND 9 window below executes the deferred plan: lead
# with the 4 r7-new oracle-backed queries that have NO driver verdict in
# r01–r08, then the 42 queries whose latest green is r05 (three rounds
# stale), then 4 fillers from the oldest r06 greens in registration
# order. A green r9 makes all 146 oracle-backed queries driver-certified
# for the first time (latest-green distribution becomes 50 r9 / 46 r6 /
# 50 r8).
#
# ROUND 10 TODO: lead with corpus_curation_semdedup (added in r9, no
# driver verdict yet), then rotate the 46 remaining r06-latest greens;
# fillers (3) from the oldest r08 greens.
_WINDOW_FRONT = [
    # --- r7-new, oracle-backed, never driver-sampled (4) ---
    "ann_ivf_pq_residual", "ann_ivf_pq_rerank", "graph_lpa_communities",
    "orders_price_quantile_sketch",
    # --- r05-latest greens, three rounds stale (42) ---
    "ann_lsh", "doc_stats", "doc_lang_id", "dedup_clusters",
    "dedup_clusters_star", "embedding_label_centroids",
    "embedding_nearest_centroid", "embedding_hard_negatives",
    "q4_priority_late_exists", "q21_waiting_supplier",
    "q10_returned_revenue", "q12_priority_shipping", "q14_promo_revenue",
    "q16_supplier_count", "q19_disjunctive_revenue",
    "q22_sales_opportunity", "q11_important_stock", "q15_top_supplier",
    "q20_surplus_suppliers", "q13_customer_distribution",
    "q18_large_volume_customers", "retrieval_phrase",
    "sgd_score_closed_form", "sgd_ensemble_closed_form", "auc_rank_check",
    "events_funnel", "user_retention_cohorts", "events_hourly_gapfill",
    "graph_sssp_hops", "orders_column_stats",
    "documents_reservoir_by_source", "events_user_value_anomalies",
    "doc_bigram_surprisal", "documents_pack_sequences",
    "media_audio_features", "embedding_covariance_stats",
    "hybrid_search_rrf", "skipgram_training_pairs",
    "orders_incremental_daily_agg", "events_trending_keys",
    "documents_chunk_for_rag", "events_hourly_unique_users",
    # --- fillers: oldest r06 greens, registration order (4) ---
    "view_purchase_attribution", "asof_purchase_view",
    "events_close_pairs", "word_count",
]


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name {spec.name!r}")
    REGISTRY[spec.name] = spec
    return spec


def all_specs() -> dict[str, QuerySpec]:
    """Import all plan modules (idempotent) and return the full registry,
    reordered so _WINDOW_FRONT leads (the driver's 50-query correctness
    window), followed by the rest in registration order."""
    for mod in _SPEC_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not built yet (incremental rounds) — skip only if it is
            # the plan module itself that is missing.
            if mod not in str(e):
                raise
    missing = [n for n in _WINDOW_FRONT if n not in REGISTRY]
    if missing:  # fail loudly: a rename must update the window, not hide
        raise KeyError(f"_WINDOW_FRONT names not registered: {missing}")
    front = {n: REGISTRY[n] for n in _WINDOW_FRONT}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    return {**front, **rest}
