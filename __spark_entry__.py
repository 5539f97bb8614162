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
# 50-query prefix; every one of the 50 carries a DuckDB oracle). Round-8
# rotation:
#   (a) the 29 entries whose SPARK IMPLEMENTATION or ORACLE changed this
#       round in the widened-extremes campaign (--perturb-extremes now
#       seeds NaN/±Inf/±1e300 into orders.o_totalprice and
#       lineitem.l_extendedprice and NaN/±Inf/±3e38 into
#       embeddings.embedding components): 19 scalar decimal/percentile/
#       histogram/correlation/render ingestion points moved onto the
#       _dec_value/_finite_value policy, 9 embedding consumers moved
#       onto the _EMB_FINITE_WHERE vector policy, plus
#       window_running_user_spend (seed-23 find). All 29 verified this
#       session: full catalog 209/209 strict green under extremes seeds
#       11 and 23, clean-data values bit-identical (strict re-runs).
#       ann_ivf_topk also gained the finite filter but remains the one
#       documented oracle-less entry (tail, outside the window).
#   (b) jdbc_roundtrip_derby and seasonal_decompose_daily — the two
#       clean-identical extremes-cast changes from round 7 whose slots
#       the r07 window could not fit (promised first in this window).
#   (c) 19 of the 33 remaining r03-cohort entries (oldest rows),
#       alphabetical; the 14 left over (q21_sole_late_suppliers …
#       txlog_time_travel) stay r03-green and head the r09 window.
# Clean-identical changes NOT windowed (values and plans of the catalog
# entries unchanged, noted for the record): bm25_topk_retrieval (the
# bm25_scores empty/duplicate-term guard is identity for the entry's
# fixed distinct term list; r07-fresh row), multimodal_decode_metadata /
# multimodal_frame_sample (catalog now pins decode_fn=_fake_decode
# explicitly — the previous default — so codec-capability detection
# cannot move driver values; r07-fresh rows), rfm_customer_segments IS
# windowed (persist restructure changed its physical plan).
_DRIVER_WINDOW = [
    # (a) widened-extremes campaign — scalar decimal ingestion
    "histogram_order_values",
    "rfm_customer_segments",
    "customer_tier_migration",
    "pareto_revenue_concentration",
    "aliccp_bronze_to_silver_e2e",
    "q9_product_type_profit",
    "q5_local_supplier_volume",
    "proj_select_cast",
    "scalar_math_funcs",
    "agg_quantiles_order_value",
    "feature_standard_scale",
    "feature_winsorize",
    "kv_parse_roundtrip",
    "wow_revenue_change",
    "feature_correlations",
    "q2_min_cost_supplier",
    "histogram_percentile_estimate",
    "agg_ratio_to_report",
    "group_percentile_exact",
    "window_running_user_spend",
    # (a) widened-extremes campaign — embedding finite-domain
    "ann_brute_force_topk",
    "ann_lsh_bucketed_topk",
    "embedding_threshold_pairs",
    "dedup_semantic_embedding",
    "ann_quantized_topk",
    "ann_ivf_portable_topk",
    "hybrid_rrf_retrieval",
    "ann_recall_audit",
    "ann_index_occupancy_audit",
    # (b) the two r07 clean-identical changes owed slots
    "jdbc_roundtrip_derby",
    "seasonal_decompose_daily",
    # (c) r03 refresh — oldest rows, alphabetical
    "analytics_percentile_bands",
    "corpus_mixture_resample",
    "corpus_top_terms",
    "csv_codec_roundtrip",
    "dedup_bottomk_sketch",
    "dedup_simhash",
    "embedding_random_projection",
    "embedding_stats_by_label",
    "graph_pagerank_trade_network",
    "heavy_hitter_tokens",
    "interval_overlap_sessions",
    "layout_zorder_clustering",
    "q11_important_part_values",
    "q12_priority_line_mix",
    "q13_customer_order_distribution",
    "q15_top_revenue_supplier",
    "q16_brand_supplier_counts",
    "q17_small_quantity_revenue",
    "q20_dominant_part_suppliers",
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
