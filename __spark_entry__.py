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
# 50-query prefix; every one of the 50 carries a DuckDB oracle). Round-6
# rotation, executed exactly as round 5 planned:
#   (a) the 11 never/oldest-checked entries named in the round-5 plan:
#       the three round-5 curation/dedup additions plus the 8 remaining
#       r01-stale entries — all 11 independently strict-verified by the
#       round-5 judge AND re-verified this round under
#       driver_sim --strict (clean + perturb seeds);
#   (b) this round's four NEW entries (ann_ivf_portable_topk — the
#       value-oracle IVF sibling that retires ann_ivf_topk's no-oracle
#       gap; llm_corpus_curation_lsh_counts — the 100 TB LSH curation
#       path as a counts/predicate row; dedup_exact_substring_spans and
#       dedup_exact_substring_scrub — the ExactSubstr pair, each green
#       across the full TEN-mode battery on landing), all strict-green
#       on clean + perturb seeds;
#   (c) 35 of the 47 r02-cohort entries (the oldest remaining rows;
#       never-checked new entries outrank refreshing r02-green rows, so
#       histogram_order_values and melt_lineitem_charges yield their
#       slots and stay r02-green).
# Deferred to r07 (stay r02-green, pytest-pinned meanwhile): the five
# stream_* rows, the three multimodal rows, sample_deterministic,
# json_codec_roundtrip, histogram_order_values, melt_lineitem_charges.
# After this window lands, every oracle-backed entry has a driver row
# and no entry's latest row is older than r02.
# The only oracle-less entry is ann_ivf_topk (learned KMeans centroids —
# permanently pytest-pinned, see its docstring); it sits in the tail,
# outside the window.
_DRIVER_WINDOW = [
    # (a) round-5 additions + r01-stale
    "dedup_paragraph_exact",
    "llm_corpus_curation_e2e",
    "llm_corpus_curation_funnel",
    "case_when_bucketing",
    "dict_apply_lang",
    "feature_quantile_bins",
    "filter_theta_or",
    "join_left_enrich",
    "profile_events_table",
    "proj_select_cast",
    "q14_promo_revenue_share",
    # (b) round-6 additions
    "ann_ivf_portable_topk",
    "llm_corpus_curation_lsh_counts",
    "dedup_exact_substring_spans",
    "dedup_exact_substring_scrub",
    # (c) r02 refresh
    "ab_test_group_summary",
    "agg_approx_stats",
    "ann_brute_force_topk",
    "ann_lsh_bucketed_topk",
    "ann_quantized_topk",
    "cohort_weekly_retention",
    "contamination_ngram_overlap",
    "dedup_clusters",
    "dedup_ngram_jaccard_indexed",
    "dedup_semantic_embedding",
    "doc_fingerprint",
    "dq_key_violations",
    "dq_referential_violations",
    "feature_correlations",
    "feature_impute_missing",
    "feature_one_hot_events",
    "feature_store_historical_retrieval",
    "feature_target_encoding",
    "funnel_view_click_purchase",
    "join_semi_in_subquery",
    "kv_merge_lastwin",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "range_join_pre_purchase_views",
    "record_linkage_customers",
    "scd2_interval_lookup",
    "scd2_user_event_history",
    "snapshot_diff_cdc",
    "text_clean_normalize",
    "text_pii_redact",
    "text_repetition_rules",
    "timeseries_gap_fill",
    "wow_revenue_change",
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
