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
# 50-query prefix; every one of the 50 carries a DuckDB oracle). Round-5
# rotation, executed as planned in round 4:
#   (a) sequence_packing_plan leads — the only never-green entry across
#       four rounds. Round 4's whitespace-class fix was sound but fixed a
#       different bug; the remaining divergence was the cumulative-sum
#       window ordering by doc_id alone (NOT a total order — duplicate
#       doc_ids in driver-regenerated data let Spark and DuckDB break the
#       tie differently: same rows, same schema, different
#       start_offsets). The order is now total — (doc_id, n_tokens,
#       md5(text)) with explicit NULLS FIRST, spelled identically on both
#       sides — and reproduced green via the new
#       `driver_sim --strict --perturb-ids` mode (seeds 7/13, ~26
#       duplicated doc_ids each).
#   (b) the 16 never-driver-checked oracle-backed entries that did not
#       fit round 4's window.
#   (c) 33 of the 41 r01-green entries — multiple data-regenerations
#       stale (kv_parse_roundtrip, asof_join_with_ttl, agg_vocab_sizes,
#       the set ops, the scalar batteries, ...).
# Left for the r06 window: the remaining 8 r01 entries
# (case_when_bucketing, dict_apply_lang, feature_quantile_bins,
# filter_theta_or, join_left_enrich, profile_events_table,
# proj_select_cast, q14_promo_revenue_share), the round-5 additions
# dedup_paragraph_exact, llm_corpus_curation_e2e and
# llm_corpus_curation_funnel (each strict-green locally on clean data
# plus --perturb-ids 7/13 and --perturb-text seeds), and then the r02
# cohort. Everything rotated out stays green in CORRECTNESS_r01..r04 and
# remains pinned by pytest oracle-parity over the full 207-entry catalog. The
# only oracle-less entry is ann_ivf_topk (learned KMeans centroids —
# permanently pytest-pinned, see its docstring); it sits in the tail,
# outside the window.
_DRIVER_WINDOW = [
    "sequence_packing_plan",
    # (b) never driver-checked
    "corpus_drift_js_divergence",
    "feature_quantile_normalize",
    "ml_fold_assignment",
    "pareto_revenue_concentration",
    "quality_bigram_logprob",
    "graph_link_prediction_cn",
    "customer_tier_migration",
    "agg_ratio_to_report",
    "dq_key_skew_report",
    "attribution_first_vs_last_touch",
    "feature_hashing_trick",
    "lang_id_confusion_matrix",
    "ann_recall_audit",
    "ann_index_occupancy_audit",
    "group_percentile_exact",
    "cohort_repeat_rate",
    # (c) r01-stale refresh
    "agg_cube_event_matrix",
    "agg_pivot_user_event_values",
    "agg_quantiles_order_value",
    "agg_rollup_order_revenue",
    "agg_vocab_sizes",
    "asof_join_with_ttl",
    "asof_last_view_before_click",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dict_encode_event_type",
    "feature_standard_scale",
    "feature_winsorize",
    "join_anti_not_exists",
    "join_broadcast_dim_agg",
    "kv_parse_roundtrip",
    "lang_id_heuristic",
    "latest_event_per_user",
    "online_lookup_latest_features",
    "q10_returned_items",
    "q18_large_orders",
    "q19_bracketed_revenue",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "sessionize_events",
    "set_except_keys",
    "set_intersect_keys",
    "set_union_keys",
    "text_quality_filter",
    "text_stats",
    "topk_orders_per_priority",
    "topk_salted_orders_per_priority",
    "window_running_user_spend",
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
