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


# The first 50 entries form a COVERING SET across every SURVEY.md §2
# operator family and every LLM-pipeline extension (the driver checks a
# 50-query prefix): TPC-H relational core, joins, sketch/exact aggregates,
# kv parsing+merge, exact/indexed/clustered dedup, fingerprints, ANN
# (exact, quantized, LSH), embedding pairs, JSON codecs, every streaming
# family, sessionization, timeseries rollup/gap-fill, range join, CDC,
# SCD2, data quality, record linkage, feature engineering, reshape,
# analytics (WoW/corr/AB/funnel/cohort), feature-store retrieval, both
# Ali-CCP end-to-end pipelines, multimodal plumbing, sampling, text
# cleaning, PII redaction, repetition quality gates, and benchmark
# contamination. Every one of the 50 carries a DuckDB oracle. Entries
# whose outputs are inherently non-portable (minhash/simhash/winnow
# signatures, KMeans cells) follow after, in catalog order; family
# variants already driver-green in round 1 (q14, join_broadcast_dim_agg,
# sample_stratified, q10/q18/q19, text_stats…) yielded their slots to
# never-driver-checked entries — their green rows stand in
# CORRECTNESS_r01 and their semantics stay pinned by pytest parity.
# Round-3 rotation note: once CORRECTNESS_r02 lands green for this
# window, rotate in the round-2 additions that have never had a driver
# row (csv_codec_roundtrip, bm25_topk_retrieval, corpus_top_terms,
# embedding_random_projection, ewma_user_value, dedup_bottomk_sketch) in
# place of entries r02 just proved, keeping one representative per family.
_DRIVER_WINDOW = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "join_semi_in_subquery",
    "agg_approx_stats",
    "kv_merge_lastwin",
    "dedup_ngram_jaccard_indexed", "dedup_clusters", "doc_fingerprint",
    "ann_brute_force_topk", "ann_quantized_topk", "ann_lsh_bucketed_topk",
    "dedup_semantic_embedding",
    "json_codec_roundtrip",
    "stream_tumbling_window_counts", "stream_online_upsert",
    "stream_dedup_exact", "stream_interval_join_attribution",
    "stream_session_window_stats",
    "timeseries_rollup_cascade", "timeseries_gap_fill",
    "range_join_pre_purchase_views",
    "snapshot_diff_cdc", "scd2_user_event_history", "scd2_interval_lookup",
    "dq_key_violations", "dq_referential_violations",
    "record_linkage_customers",
    "feature_impute_missing", "feature_one_hot_events", "feature_target_encoding",
    "melt_lineitem_charges",
    "wow_revenue_change", "feature_correlations", "ab_test_group_summary",
    "histogram_order_values",
    "funnel_view_click_purchase", "cohort_weekly_retention",
    "feature_store_historical_retrieval",
    "aliccp_bronze_to_silver_e2e", "aliccp_silver_to_gold_e2e",
    "multimodal_decode_metadata", "multimodal_frame_sample", "multimodal_embed_topk",
    "sample_deterministic",
    "text_clean_normalize",
    "text_pii_redact", "text_repetition_rules", "contamination_ngram_overlap",
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
