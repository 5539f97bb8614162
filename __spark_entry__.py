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
    # Module-path exemptions (r12): both diffs vs the r11 round-close
    # commit are PURELY ADDITIVE — `git diff ae9697b -- <module>` shows
    # zero removed/modified lines, only new functions (run_stream_enrich;
    # ivf_greedy_topk) — so no existing dependent entry's code path
    # changed. Exempting them frees 16 window slots for the r06
    # freshness tail (r11 verdict item 1's done-criterion); the
    # dependents are additionally certified green by every r12
    # full-catalog strict run (vanilla, kv 479/487, decimal-edge
    # 491/499, 18-mode stacks 523/541 — COVERAGE.md closing cert).
    # The non-additive modules this round (functions/kv.py,
    # plans/aliccp.py, operators/timeseries.py) are NOT exempted: their
    # dependents stay windowed.
    "alibaba_cppfeaturestore_spark/streaming/pipeline.py":
        "additive-only diff (run_stream_enrich added; zero existing "
        "lines touched); dependents certified by the r12 full-run suite",
    "alibaba_cppfeaturestore_spark/operators/similarity.py":
        "additive-only diff (ivf_greedy_topk added; zero existing "
        "lines touched); dependents certified by the r12 full-run suite",
}

_DRIVER_WINDOW = [
    # Round-12 rotation (tools/freshness.py --plan, self-checking):
    # (a) 23 changed entries — stream_asof_enrich (new, r11 item 7),
    #     ann_ivf_topk's greedy-quantizer full oracle (item 6: zero
    #     oracle-less entries), the twap DECIMAL(19,0) widening + its
    #     timeseries module dependents (non-additive module: windowed),
    #     the --perturb-kv campaign finds (seed 479) + functions/kv.py /
    #     plans/aliccp.py dependents, the --perturb-decimal-edge campaign
    #     finds (seed 491), and the 18-mode stack finds (seeds 503/509).
    #     The two purely-additive modules (streaming/pipeline.py,
    #     operators/similarity.py) are exempted with written reasons in
    #     _WINDOW_EXEMPT_CHANGED, freeing 16 slots for the freshness tail.
    # (b) the oldest unchanged driver rows: the full 10-row r05 cohort and
    #     17 of the 20 remaining r06 rows (item 1's rotation target).
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
    "ewma_user_value",  # changed
    "kv_merge_lastwin",  # changed
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
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
