"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 + the
LLM-pipeline extensions, as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — matching DuckDB SQL for the driver's differential gate;
omitted only for hash-algorithm-specific / streaming-stateful ops where no
portable SQL equivalent exists (driver records rows-only checks for those).

Implementations live in ``alibaba_cppfeaturestore_spark.plans.catalog``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shaped
    scan→filter→agg over lineitem."""
    return QUERIES["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


# The first 50 entries are the driver's check window (the driver runs a
# 50-query prefix; every one of the 50 carries a DuckDB oracle). Round-9
# rotation, FINAL (the find-and-fix campaigns reshaped the plan):
#   (a) the 36 entries whose code or oracle changed this round — the
#       ring-2 extremes guards, the PPJoin index split consumers, and
#       the duplicate-id / NULL-id / order-totality / decimal-revenue
#       campaigns (see COVERAGE.md round-9 record). Changed entries
#       always outrank merely-stale ones.
#   (b) 13 of the 14 remaining r03-cohort entries — promised first by
#       the r08 rotation note; txlog_time_travel lost its slot to the
#       final changed entry and heads the r10 window together with all
#       28 unrefreshed r04 rows (the find-and-fix campaigns crowded the
#       r04 refresh out of this window entirely).
_DRIVER_WINDOW = [
    # (a) r09 CHANGED ENTRIES — every entry whose code or oracle moved
    # this round gets a fresh driver row before anything merely stale.
    # (a1) five-way / widened-ids finds (seeds 71, 73, 79):
    "ann_ivf_portable_topk",
    "agg_pivot_user_event_values",
    "asof_last_view_before_click",
    "asof_join_with_ttl",
    "feature_store_historical_retrieval",
    "stream_dedup_exact",
    "attribution_first_vs_last_touch",
    # (a2) the (ts, event_id) order-totality batch (seed 79 twap find +
    # proactive class closure: payload column joins every event-sequence
    # window order; latest-per-key oracles extended to the operator's
    # full-struct order):
    "timeseries_twap_user",
    "latest_event_per_user",
    "online_lookup_latest_features",
    "stream_online_upsert",
    "window_running_user_spend",
    "scd2_user_event_history",
    "scd2_interval_lookup",
    "ewma_user_value",
    "path_top_event_sequences",
    "feature_lag_rolling",
    "markov_event_transitions",
    "window_value_functions",
    # (a2b) the decimal-revenue class closure (seed-83 q7 find + the
    # q3/q14/q8/q15 hardening; q7/q8 sit in the r03 cohort below) and
    # the seed-113 cadence-order fix and the quantile-normalize
    # NULL-order pinning (proactive review of the same class):
    "dq_event_order_cadence",
    "feature_quantile_normalize",
    "q3_shipping_priority",
    "q14_promo_revenue_share",
    "q15_top_revenue_supplier",
    # (a3) ring-2 extremes campaign + binned_histogram clamp contract:
    "q9_product_type_profit",
    "q5_local_supplier_volume",
    "proj_select_cast",
    "scalar_math_funcs",
    "feature_correlations",
    "q2_min_cost_supplier",
    "sample_weighted_bernoulli",
    "histogram_percentile_estimate",
    # (a4) PPJoin index split consumers + the winnow NULL-id gate:
    "dedup_ngram_jaccard_indexed",
    "dedup_clusters",
    "llm_corpus_curation_e2e",
    "llm_corpus_curation_funnel",
    "dedup_winnow_containment",
    # (b) the final r03-cohort refresh
    "q21_sole_late_suppliers",
    "q22_dormant_high_balance",
    "q4_late_order_priority",
    "q7_nation_volume_shipping",
    "q8_market_share",
    "quality_unigram_logprob",
    "sample_stratified",
    "session_window_stats",
    "sort_global_topn",
    "stream_checkpoint_restart",
    "stream_sliding_window_counts",
    "token_count_bpe",
    "txlog_merge_upsert",
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
