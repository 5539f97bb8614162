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
# 50-query prefix; every one of the 50 carries a DuckDB oracle). Round-4
# rotation, executed as planned in round 3: sequence_packing_plan leads
# (the only entry ever driver-checked that had never been green — its
# divergence was Java-regex \s vs RE2 \s on \x0B plus DuckDB's
# unicode-stripping one-arg TRIM; both sides now share one explicit
# whitespace class and an explicit trim set, fuzzed green via
# `driver_sim --strict --perturb-text` on seeds 7/13), followed by 49 of
# the 64 oracle-backed entries the driver has never seen: the 10 carried
# from early round 3 and the first 39 late-round-3 additions. Everything
# rotated out stays green in CORRECTNESS_r01/r02/r03 and remains pinned
# by pytest oracle-parity over the full 203-entry catalog.
#
# Round-5 rotation plan: (a) the 15 never-driver-checked entries that
# did not fit this window (corpus_drift_js_divergence,
# feature_quantile_normalize, ml_fold_assignment,
# pareto_revenue_concentration, quality_bigram_logprob,
# graph_link_prediction_cn, customer_tier_migration, agg_ratio_to_report,
# dq_key_skew_report, attribution_first_vs_last_touch,
# feature_hashing_trick, lang_id_confusion_matrix, ann_recall_audit,
# ann_index_occupancy_audit, group_percentile_exact, cohort_repeat_rate);
# then (b) the OLDEST green rows — r01 entries are multiple
# data-regenerations stale (kv_parse_roundtrip, asof_join_with_ttl,
# agg_vocab_sizes, the set ops, scalar batteries) — so no catalog entry's
# latest driver row is >2 rounds old by end of r05. The only oracle-less
# entry is ann_ivf_topk (learned KMeans centroids — permanently
# pytest-pinned, see its docstring); it sits in the tail, outside the
# window.
_DRIVER_WINDOW = [
    "sequence_packing_plan",
    "dedup_winnow_containment",
    "chunk_documents_rag",
    "jdbc_roundtrip_derby",
    "partition_pruned_read",
    "join_full_outer_reconcile",
    "grouped_mode_bucket",
    "window_rank_functions",
    "join_null_safe_eq",
    "schema_evolution_union_read",
    "ann_ivf_portable_topk",
    "timeseries_twap_user",
    "assoc_event_type_pairs",
    "graph_bfs_trade_hops",
    "path_top_event_sequences",
    "join_bloom_prefilter",
    "ids_stable_assign",
    "sketch_countmin_freqs",
    "cooccurrence_skipgram_pairs",
    "graph_triangle_count",
    "sample_weighted_bernoulli",
    "tfidf_top_terms_per_doc",
    "bpe_merge_pair_counts",
    "inverted_index_postings",
    "ab_test_cuped_adjusted",
    "gdpr_forget_cascade",
    "histogram_percentile_estimate",
    "agg_grouping_sets_revenue",
    "running_distinct_users",
    "kmeans_lloyd_step",
    "variant_shred_props",
    "feature_lag_rolling",
    "negative_sampling_pairs",
    "markov_event_transitions",
    "funnel_time_to_convert",
    "seasonal_decompose_daily",
    "rfm_customer_segments",
    "itemsim_copurchase_topk",
    "vocab_oov_rate",
    "dq_feature_leakage_audit",
    "window_value_functions",
    "text_token_entropy",
    "hybrid_rrf_retrieval",
    "stream_topk_trending",
    "dq_event_order_cadence",
    "txlog_wap_publish",
    "dedup_lsh_recall_audit",
    "anomaly_seasonal_residuals",
    "corpus_data_card",
    "txlog_checkpointed_read",
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
