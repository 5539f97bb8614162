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
# 50-query prefix; every one of the 50 carries a DuckDB oracle). Round-3
# rotation, executed as planned in round 2: the r02-green entries yielded
# their slots to the 39 entries with no green driver row yet — the 2
# non-green from r02 (timeseries_rollup_cascade, now decimal+integer-
# exact; dedup_minhash_lsh, now portable-hash oracle-backed), the newly
# oracle-backed dedup_minhash_incremental/dedup_simhash, the new S3/ST3
# round-trip proofs (write_ignore_roundtrip, stream_checkpoint_restart),
# the Delta-semantics txlog entries (time travel + MERGE upsert),
# incremental-agg maintenance, percentile bands, all 14
# never-checked TPC-H shapes, and the round-2 additions (BM25, bottom-k,
# JL projection, EWMA, packing, resample, unigram-LM, CSV codec,
# sliding/session windows, embedding pairs/stats, stratified sample,
# global top-n), plus the nine late round-3 additions (integer-exact
# PageRank, event-time RANGE-frame moving aggregates, BPE pre-token
# budgeting, Z-order layout, exact grouped OLS, exact median/MAD
# outliers, grid-binned interval-overlap join, Misra-Gries heavy
# hitters, salted skew join). The remaining 2 slots keep the flagship
# Ali-CCP e2e pair as regression pins. Entries rotated out stay
# green in CORRECTNESS_r01/r02 and remain pinned by pytest oracle-parity
# over the full catalog. The only oracle-less entry left is
# ann_ivf_topk (learned KMeans centroids — permanently pytest-pinned,
# see its docstring); it sits in the tail, outside the window.
# dedup_winnow_containment gained a portable-md5 full oracle late in
# round 3 (window-minimum selection picks minimum VALUES, so a portable
# gram hash makes the whole selection SQL-replayable), and the IVF
# family gained ann_ivf_portable_topk (deterministic int8 quantizer —
# integer-exact end to end) alongside the learned-KMeans production
# path.
#
# Round-4 rotation plan: swap in the entries still never
# driver-checked with their current oracles — the 10 carried from
# early round 3 (chunk_documents_rag, jdbc_roundtrip_derby,
# partition_pruned_read, window_rank_functions, join_null_safe_eq,
# join_full_outer_reconcile, grouped_mode_bucket,
# schema_evolution_union_read, dedup_winnow_containment,
# ann_ivf_portable_topk) and the 54 late-round-3 additions
# (timeseries_twap_user, assoc_event_type_pairs, graph_bfs_trade_hops,
# path_top_event_sequences, join_bloom_prefilter, ids_stable_assign,
# sketch_countmin_freqs, cooccurrence_skipgram_pairs,
# graph_triangle_count, sample_weighted_bernoulli,
# tfidf_top_terms_per_doc, bpe_merge_pair_counts,
# inverted_index_postings, ab_test_cuped_adjusted,
# gdpr_forget_cascade, histogram_percentile_estimate,
# agg_grouping_sets_revenue, running_distinct_users,
# kmeans_lloyd_step, variant_shred_props, feature_lag_rolling,
# negative_sampling_pairs, markov_event_transitions,
# funnel_time_to_convert, seasonal_decompose_daily,
# rfm_customer_segments, itemsim_copurchase_topk, vocab_oov_rate,
# dq_feature_leakage_audit, window_value_functions,
# text_token_entropy, hybrid_rrf_retrieval, stream_topk_trending,
# dq_event_order_cadence, txlog_wap_publish,
# dedup_lsh_recall_audit, anomaly_seasonal_residuals,
# corpus_data_card, corpus_drift_js_divergence,
# feature_quantile_normalize, ml_fold_assignment,
# pareto_revenue_concentration, quality_bigram_logprob,
# graph_link_prediction_cn, customer_tier_migration,
# agg_ratio_to_report, dq_key_skew_report,
# attribution_first_vs_last_touch, feature_hashing_trick,
# lang_id_confusion_matrix, ann_recall_audit,
# ann_index_occupancy_audit, group_percentile_exact,
# cohort_repeat_rate) —
# then fill the
# remaining slots with the OLDEST green rows first (r01 entries — the
# data regenerates every round, so a green from two rounds ago is a
# green on stale data), keeping the Ali-CCP e2e pins.
_DRIVER_WINDOW = [
    # -- never green before round 3 (39) --
    "timeseries_rollup_cascade",
    "dedup_minhash_lsh", "dedup_minhash_incremental", "dedup_simhash",
    "write_ignore_roundtrip", "stream_checkpoint_restart",
    "txlog_time_travel", "txlog_merge_upsert",
    "incremental_agg_maintenance", "analytics_percentile_bands",
    "q2_min_cost_supplier", "q4_late_order_priority",
    "q7_nation_volume_shipping", "q8_market_share", "q9_product_type_profit",
    "q11_important_part_values", "q12_priority_line_mix",
    "q13_customer_order_distribution", "q15_top_revenue_supplier",
    "q16_brand_supplier_counts", "q17_small_quantity_revenue",
    "q20_dominant_part_suppliers", "q21_sole_late_suppliers",
    "q22_dormant_high_balance",
    "csv_codec_roundtrip",
    "bm25_topk_retrieval", "corpus_top_terms", "quality_unigram_logprob",
    "dedup_bottomk_sketch",
    "embedding_random_projection", "embedding_threshold_pairs",
    "embedding_stats_by_label",
    "ewma_user_value",
    "sort_global_topn", "sample_stratified",
    "corpus_mixture_resample", "sequence_packing_plan",
    "stream_sliding_window_counts", "session_window_stats",
    # -- round-3 late additions, never driver-checked (9) --
    "graph_pagerank_trade_network", "window_range_moving_avg",
    "token_count_bpe", "layout_zorder_clustering",
    "regression_daily_trend", "anomaly_mad_outliers",
    "interval_overlap_sessions",
    "heavy_hitter_tokens", "join_salted_skew_enrich",
    # -- r02-proven flagship e2e regression pins (2) --
    "aliccp_bronze_to_silver_e2e", "aliccp_silver_to_gold_e2e",
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
