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
]


# ORDER MATTERS for external verification: the round driver samples the
# FIRST 50 names returned by all_specs() for its DuckDB-oracle correctness
# file. _WINDOW_FRONT pins that window explicitly (finer-grained than
# module import order — e.g. relational mixes long-green q1–q9 with the
# never-checked q10–q22).
#
# ROUND 4 window: the 35 queries with no driver verdict in r01–r03
# (enumerated from CORRECTNESS_r0{1,2,3}.json), then 15 queries whose only
# green rows are r01/r02 (similarity/dedup-cluster/curation/events picks).
#
# ROUND 5 TODO: rotate again — the remaining 15 r02-only greens
# (q1–q7_*, index_stats, term_postings, retrieval_and/or_and/bm25,
# events_tumbling_hour/sliding/sessions) go to the front, the r04 window
# moves behind them. After r05 every registered query holds a green row
# from r03, r04, or r05.
_WINDOW_FRONT = [
    # --- never driver-checked as of r03 (35) ---
    # similarity remainder
    "ann_ivf", "ann_ivf_flat", "embedding_hard_negatives",
    # TPC-H shapes added r2/r3
    "q4_priority_late_exists", "q21_waiting_supplier",
    "q10_returned_revenue", "q12_priority_shipping", "q14_promo_revenue",
    "q16_supplier_count", "q19_disjunctive_revenue", "q22_sales_opportunity",
    "q11_important_stock", "q15_top_supplier", "q20_surplus_suppliers",
    "q13_customer_distribution", "q18_large_volume_customers",
    # ml (the *_closed_form pair are r04 additions — oracle-backed twins
    # of the score/ensemble machinery behind the rows-only sgd_* queries)
    "sgd_scores", "sgd_ensemble", "sgd_auc", "auc_rank_check",
    "sgd_score_closed_form", "sgd_ensemble_closed_form",
    # traversal / maintenance
    "graph_sssp_hops", "orders_column_stats",
    # corpus_ext (all)
    "documents_reservoir_by_source", "events_user_value_anomalies",
    "doc_bigram_surprisal", "documents_pack_sequences",
    "media_audio_features", "bpe_merge_table",
    "embedding_covariance_stats", "hybrid_search_rrf",
    "skipgram_training_pairs", "orders_incremental_daily_agg",
    "events_trending_keys", "documents_chunk_for_rag",
    "events_hourly_unique_users",
    # --- oldest greens (r01/r02 only), 15 picks to fill the window ---
    "ann_bruteforce", "ann_lsh", "dedup_clusters", "dedup_clusters_star",
    "embedding_label_centroids", "embedding_nearest_centroid",
    "doc_stats", "doc_lang_id", "corpus_curation", "retrieval_phrase",
    "events_funnel", "user_retention_cohorts", "events_hourly_gapfill",
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
