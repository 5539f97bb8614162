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
_WINDOW_EXEMPT_CHANGED: dict[str, str] = {
    # (r12 close: the two additive-module exemptions that briefly lived
    # here are retired — tools/freshness.py now attributes diffs at
    # FUNCTION granularity, so an additive-only module change promotes
    # no dependents mechanically, with the coarse module-level answer
    # printed by --plan as the audit trail.)
}

_DRIVER_WINDOW = [
    # Round-12 rotation (tools/freshness.py --plan, self-checking):
    # (a) 20 changed entries — the function-level attribution (r12: per-def
    #     diff spans + cross-module call-graph reverse closure) promotes
    #     exactly the entries whose USED DEFS changed: the new
    #     stream_asof_enrich + ann_ivf_topk oracle rewrites, the twap
    #     widening, the kv / decimal-edge / stack campaign fixes, and the
    #     kv.py+aliccp.py preamble dependents — while the 20 entries the
    #     coarse module rule over-promoted (additive-only streaming/
    #     similarity functions, non-twap timeseries defs) stay out, with
    #     the subtraction printed by --plan as the audit trail.
    # (b) the oldest unchanged driver rows: the full 10-row r05 cohort and
    #     the full 20-row r06 residual cohort (item 1's rotation target —
    #     after r12 no union row is older than r07).
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
    "kv_merge_lastwin",  # changed
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
    "agg_approx_stats",  # r06
    "case_when_bucketing",  # r06
    "dedup_exact_substring_scrub",  # r06
    "dedup_exact_substring_spans",  # r06
    "dedup_paragraph_exact",  # r06
    "dq_key_violations",  # r06
    "dq_referential_violations",  # r06
    "feature_one_hot_events",  # r06
    "filter_theta_or",  # r06
    "funnel_view_click_purchase",  # r06
    "join_left_enrich",  # r06
    "join_semi_in_subquery",  # r06
    "llm_corpus_curation_lsh_counts",  # r06
    "q1_pricing_summary",  # r06
    "range_join_pre_purchase_views",  # r06
    "snapshot_diff_cdc",  # r06
    "text_clean_normalize",  # r06
    "text_pii_redact",  # r06
    "text_repetition_rules",  # r06
    "timeseries_gap_fill",  # r06
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
