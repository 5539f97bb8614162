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
    # Round-11 rotation (tools/freshness.py --plan, self-checking):
    # (a) 42 changed entries — the three r10 oracle fixes never
    #     driver-verified post-fix, the q16 NULL-suppkey symmetry +
    #     q3/q10/q18 NULLS FIRST pins (r10 advice), the 14-entry
    #     guarded-decimal batch (r10 verdict item 2), and this round's
    #     four fuzz campaigns' finds: --perturb-ts-nulls (13, seed 337),
    #     the stacked-mode dedup_exact tie-break (349),
    #     --perturb-date-nulls (wow, 367), --perturb-props-json (2 JSON
    #     policies, 389), --perturb-neg-ids (9 sign-proofing fixes,
    #     419 — the two multimodal entries whose fix lives in
    #     operators/multimodal.py are hand-listed; the planner's git
    #     diff only sees catalog.py). Everything else auto-promoted.
    # (b) the oldest unchanged driver rows (r05 cohort first).
    "q16_brand_supplier_counts",  # changed
    "session_window_stats",  # changed
    "stream_session_window_stats",  # changed
    "multimodal_embed_topk",  # changed
    "multimodal_frame_sample",  # changed
    "agg_cube_event_matrix",  # changed
    "agg_grouping_sets_revenue",  # changed
    "agg_rollup_order_revenue",  # changed
    "cohort_weekly_retention",  # changed
    "corpus_mixture_resample",  # changed
    "dedup_exact",  # changed
    "dedup_minhash_incremental",  # changed
    "embedding_stats_by_label",  # changed
    "feature_target_encoding",  # changed
    "interval_overlap_sessions",  # changed
    "join_bloom_prefilter",  # changed
    "join_broadcast_dim_agg",  # changed
    "json_codec_roundtrip",  # changed
    "multimodal_decode_metadata",  # changed
    "q10_returned_items",  # changed
    "q11_important_part_values",  # changed
    "q17_small_quantity_revenue",  # changed
    "q18_large_orders",  # changed
    "q19_bracketed_revenue",  # changed
    "q22_dormant_high_balance",  # changed
    "q3_shipping_priority",  # changed
    "q6_forecast_revenue",  # changed
    "running_distinct_users",  # changed
    "sample_deterministic",  # changed
    "sample_stratified",  # changed
    "sessionize_events",  # changed
    "stream_dedup_exact",  # changed
    "stream_interval_join_attribution",  # changed
    "stream_sliding_window_counts",  # changed
    "stream_topk_trending",  # changed
    "stream_tumbling_window_counts",  # changed
    "timeseries_rollup_cascade",  # changed
    "timeseries_twap_user",  # changed
    "txlog_checkpointed_read",  # changed
    "txlog_time_travel",  # changed
    "variant_shred_props",  # changed
    "wow_revenue_change",  # changed
    "agg_vocab_sizes",  # r05
    "cohort_repeat_rate",  # r05
    "corpus_drift_js_divergence",  # r05
    "dedup_ngram_jaccard",  # r05
    "dq_key_skew_report",  # r05
    "graph_link_prediction_cn",  # r05
    "join_anti_not_exists",  # r05
    "lang_id_confusion_matrix",  # r05
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
