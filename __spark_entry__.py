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
# 50-query prefix; every one of the 50 carries a DuckDB oracle). Round-7
# rotation, executed exactly as the round-6 verdict planned:
#   (a) the 12 entries deferred from r06 (last driver row r02,
#       pytest-pinned meanwhile): the five stream_* rows, the three
#       multimodal rows, sample_deterministic, json_codec_roundtrip,
#       histogram_order_values, melt_lineitem_charges. After this
#       window lands, no entry's latest driver row is older than r03.
#   (b) the 8 entries whose SPARK IMPLEMENTATION or ORACLE changed this
#       round and therefore need fresh driver rows regardless of age:
#       the five de-single-partitioned rank/NTILE/median rewrites
#       (rfm_customer_segments, customer_tier_migration,
#       pareto_revenue_concentration, corpus_data_card,
#       funnel_time_to_convert — operators/ranks.py::two_phase_rank),
#       the two dictionary-rank consumers (dict_apply_lang,
#       dict_encode_event_type — fit_dictionary now two-phase), and
#       feature_hashing_trick (oracle null-policy alignment). All 8
#       re-verified this round under driver_sim --strict clean +
#       perturb/nulls/order seeds.
#   (b2) 6 more entries whose implementation or oracle changed in the
#       round-7 continuation session (empty-feed/skew fuzz fixes):
#       agg_cube_event_matrix (grand-total row from a global agg),
#       txlog_wap_publish (poison-row audit + schema-in-log read),
#       dedup_lsh_recall_audit (try_divide recall),
#       partition_pruned_read (declared-schema read-back),
#       feature_quantile_bins + feature_impute_missing (empty-fit
#       degradation), plus contamination_ngram_overlap (per-id merged
#       gram sets — the stacked skew+ids sweep found the old
#       (doc_id, n_sh) grouping diverging from the row-paired oracle
#       exactly when duplicate ids carry identical texts;
#       embedding_random_projection yielded its slot), and the three
#       as-of consumers whose ORACLES moved off DuckDB's native ASOF
#       JOIN onto the tie-pinned window formulation
#       (asof_last_view_before_click, asof_join_with_ttl,
#       feature_store_historical_retrieval — the stacked skew+ts sweep
#       showed native ASOF picks an engine-arbitrary row among tied
#       timestamps; layout_zorder_clustering, q7_nation_volume_shipping
#       and q8_market_share yielded their slots).
#   (b3) 10 entries re-verified after the extremes-regime
#       (--perturb-extremes: NaN/±Inf/±1e300 in events.value)
#       finite-domain campaign — out-of-domain measurements become
#       missing at every decimal ingestion point, fits, moments and the
#       profiler; profile_events_table is the only one whose CLEAN-data
#       values changed (fixed-scale decimal min/max rendering).
#       jdbc_roundtrip_derby and seasonal_decompose_daily carry the same
#       clean-identical cast change without slots — they head the r08
#       window with the other deferred r03 rows.
#       Four more changed entries were ALREADY windowed:
#       corpus_data_card (top_lang as global min-struct agg),
#       q9_product_type_profit (decimal profit arithmetic),
#       ewma_user_value (pinned grouped-pandas parallelism),
#       stream_tumbling_window_counts (state store sizing).
#   (c) 24 of the 49 r03-cohort entries (the oldest remaining rows),
#       leading with the four touched by this round's dictionary/minhash
#       changes (aliccp_*_e2e, dedup_minhash_lsh/incremental); the 25
#       r03 entries left over stay r03-green and head the r08 window
#       (csv_codec_roundtrip, sample_stratified, regression_daily_trend,
#       timeseries_rollup_cascade, q2_min_cost_supplier and
#       q4_late_order_priority yielded their slots to (b2)).
# The only oracle-less entry is ann_ivf_topk (learned KMeans centroids —
# permanently pytest-pinned, see its docstring); it sits in the tail,
# outside the window.
_DRIVER_WINDOW = [
    # (a) the 12 r02-deferred entries
    "stream_tumbling_window_counts",
    "stream_online_upsert",
    "stream_dedup_exact",
    "stream_interval_join_attribution",
    "stream_session_window_stats",
    "multimodal_decode_metadata",
    "multimodal_frame_sample",
    "multimodal_embed_topk",
    "sample_deterministic",
    "json_codec_roundtrip",
    "histogram_order_values",
    "melt_lineitem_charges",
    # (b) round-7 implementation/oracle changes
    "rfm_customer_segments",
    "customer_tier_migration",
    "pareto_revenue_concentration",
    "corpus_data_card",
    "funnel_time_to_convert",
    "dict_apply_lang",
    "dict_encode_event_type",
    "feature_hashing_trick",
    # (b2) continuation-session changes
    "agg_cube_event_matrix",
    "txlog_wap_publish",
    "dedup_lsh_recall_audit",
    "partition_pruned_read",
    "feature_quantile_bins",
    "feature_impute_missing",
    "contamination_ngram_overlap",
    # (b3) extremes-regime (NaN/Inf/1e300) finite-domain fixes
    "profile_events_table",
    "regression_daily_trend",
    "grouped_mode_bucket",
    "ab_test_group_summary",
    "ab_test_cuped_adjusted",
    "timeseries_twap_user",
    "window_range_moving_avg",
    "timeseries_rollup_cascade",
    "write_ignore_roundtrip",
    "anomaly_seasonal_residuals",
    "asof_last_view_before_click",
    "asof_join_with_ttl",
    "feature_store_historical_retrieval",
    # (c) r03 refresh — change-affected first, then oldest alphabetical
    "aliccp_bronze_to_silver_e2e",
    "aliccp_silver_to_gold_e2e",
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "anomaly_mad_outliers",
    "bm25_topk_retrieval",
    "ewma_user_value",
    "incremental_agg_maintenance",
    "join_salted_skew_enrich",
    "q9_product_type_profit",
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
