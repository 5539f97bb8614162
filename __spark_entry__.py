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
# 50-query prefix; every one of the 50 carries a DuckDB oracle). Changed
# entries always outrank merely-stale ones; the rest rotate oldest
# driver row first (tools/freshness.py --plan emits the list).
# Deliberate window omissions for CHANGED entries (r10 verdict item 8:
# the changed-set was hand-assembled and missed three oracle fixes; now
# tools/freshness.py diffs catalog.py against the last round-close
# commit, auto-promotes forgotten entries, and
# tests/test_driver_window.py fails the round if a git-touched oracled
# entry is neither windowed nor spelled here WITH a reason).
_WINDOW_EXEMPT_CHANGED: dict[str, str] = {}

_DRIVER_WINDOW = [
    # Round-12 rotation (tools/freshness.py --plan, self-checking):
    # (a) 40 changed entries — stream_asof_enrich (new, r11 item 7),
    #     ann_ivf_topk's greedy-quantizer full oracle (item 6: zero
    #     oracle-less entries), the twap DECIMAL(19,0) widening (r11
    #     advice), the --perturb-kv campaign finds (seed 479), the
    #     --perturb-decimal-edge campaign finds (seed 491), the 18-mode
    #     stack finds (salted-join conversion route seed 503, ab_test
    #     exact-decimal moments seed 509), plus module dependents
    #     auto-promoted by the import-graph map (item 4).
    # (b) the oldest unchanged driver rows (the 10-row r05 cohort).
    "ab_test_cuped_adjusted",  # changed
    "ab_test_group_summary",  # changed
    "aliccp_bronze_to_silver_e2e",  # changed
    "ann_ivf_topk",  # changed
    "ann_quantized_topk",  # changed
    "anomaly_seasonal_residuals",  # changed
    "feature_lag_rolling",  # changed
    "join_salted_skew_enrich",  # changed
    "kv_parse_roundtrip",  # changed
    "q19_bracketed_revenue",  # changed
    "q6_forecast_revenue",  # changed
    "record_linkage_customers",  # changed
    "regression_daily_trend",  # changed
    "seasonal_decompose_daily",  # changed
    "set_except_keys",  # changed
    "stream_asof_enrich",  # changed
    "timeseries_twap_user",  # changed
    "write_ignore_roundtrip",  # changed
    "aliccp_silver_to_gold_e2e",  # changed
    "ann_brute_force_topk",  # changed
    "ann_index_occupancy_audit",  # changed
    "ann_ivf_portable_topk",  # changed
    "ann_lsh_bucketed_topk",  # changed
    "ann_recall_audit",  # changed
    "dedup_semantic_embedding",  # changed
    "embedding_threshold_pairs",  # changed
    "ewma_user_value",  # changed
    "kmeans_lloyd_step",  # changed
    "kv_merge_lastwin",  # changed
    "multimodal_embed_topk",  # changed
    "stream_dedup_exact",  # changed
    "stream_interval_join_attribution",  # changed
    "stream_online_upsert",  # changed
    "stream_session_window_stats",  # changed
    "stream_sliding_window_counts",  # changed
    "stream_topk_trending",  # changed
    "stream_tumbling_window_counts",  # changed
    "timeseries_gap_fill",  # changed
    "timeseries_rollup_cascade",  # changed
    "window_range_moving_avg",  # changed
    "lang_id_heuristic",  # r05
    "ml_fold_assignment",  # r05
    "quality_bigram_logprob",  # r05
    "scalar_date_funcs",  # r05
    "scalar_string_funcs",  # r05
    "sequence_packing_plan",  # r05
    "set_intersect_keys",  # r05
    "set_union_keys",  # r05
    "text_quality_filter",  # r05
    "text_stats",  # r05
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
