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
# 50-query prefix; every one of the 50 carries a DuckDB oracle). Round-10
# rotation:
#   (a) the 24 entries whose code or oracle changed this round — the
#       finds of the degraded-key campaigns (tpch-ids seed 137, six-way
#       seeds 149/157/167/179/181/191, fk-ids seed 233) plus the
#       explicit-tiebreak and _events_unique structural fixes. Changed
#       entries always outrank merely-stale ones.
#   (b) txlog_time_travel — the catalog's last r03 row, promised this
#       window by the r09 rotation note — then all 27 unrefreshed
#       r04-cohort rows. After this window lands, no driver row is
#       older than r05.
# Deliberate window omissions for CHANGED entries (r10 verdict item 8:
# the changed-set was hand-assembled and missed three oracle fixes; now
# tools/freshness.py diffs catalog.py against the last round-close
# commit, auto-promotes forgotten entries, and
# tests/test_driver_window.py fails the round if a git-touched oracled
# entry is neither windowed nor spelled here WITH a reason).
_WINDOW_EXEMPT_CHANGED: dict[str, str] = {}

_DRIVER_WINDOW = [
    # (a) r10 CHANGED ENTRIES
    # (a1) --perturb-tpch-ids finds (seed 137):
    "sample_weighted_bernoulli",
    "set_except_keys",
    "ids_stable_assign",
    "aliccp_bronze_to_silver_e2e",
    # (a2) explicit full tie order at the latest-per-key call sites
    # (online_lookup_latest_features / stream_online_upsert share the
    # change but yield their slots to the unicode-fold entries — both
    # are r09-fresh and the explicit tiebreak is behavior-identical):
    "latest_event_per_user",
    # (a3) _events_unique props-guard drop (structural twin symmetry;
    # attribution_first_vs_last_touch shares the change but yields its
    # slot to the fk-ids finds — it is r09-fresh and the guard drop is
    # behavior-identical on the full schema the driver always feeds):
    "asof_last_view_before_click",
    "asof_join_with_ttl",
    "feature_store_historical_retrieval",
    # (a4) six-way finds (seed 149): NULLS-FIRST tie-break pins, plus
    # q20's decimal quantity sums (raw double sums were run-flaky under
    # ±1e300 extremes — order-dependent absorption at the 0.3x boundary)
    "window_rank_functions",
    "topk_orders_per_priority",
    "topk_salted_orders_per_priority",
    "sort_global_topn",
    "q20_dominant_part_suppliers",
    # (a5) six-way find (seed 157): q2's oracle detail join repeated the
    # EUROPE restriction (duplicate-suppkey fanout to the non-EU copy)
    "q2_min_cost_supplier",
    # (a6) six-way find (seed 167): dictionary-fit oracles pin value ASC
    # NULLS FIRST (a NULL group's count can tie a real group's)
    "aliccp_silver_to_gold_e2e",
    "dict_encode_event_type",
    # (a7) six-way find (seed 179): q10's LIMIT boundary split a
    # duplicate-custkey tie differing only in c_name; order made total
    # over the output + guarded-decimal revenue. q3/q18 closed by class
    # (q18 also moves its HAVING quantity sums onto decimals).
    "q10_returned_items",
    "q18_large_orders",
    "q3_shipping_priority",
    # (a8) fk-ids finds (seed 233): NULL-safe NOT IN in the gdpr and
    # merge oracles (gdpr sits in the r04 cohort below), NULL-entity
    # gates in ewma/rfm, merge_upsert's delete flag fires only on
    # explicit TRUE.
    "txlog_merge_upsert",
    "ewma_user_value",
    "rfm_customer_segments",
    # (a9) unicode case-fold class closure (full-BMP sweep): the two
    # fingerprint oracles move to the portable_lower spelling — bare
    # lower() diverges on İ / final sigma / 13 modern cased letters.
    "doc_fingerprint",
    "dedup_winnow_containment",
    # (b) freshness rotation: final r03 row, the r04 cohort, oldest r05
    "txlog_time_travel",
    "agg_grouping_sets_revenue",
    "assoc_event_type_pairs",
    "bpe_merge_pair_counts",
    "chunk_documents_rag",
    "cooccurrence_skipgram_pairs",
    "dq_feature_leakage_audit",
    "gdpr_forget_cascade",
    "graph_bfs_trade_hops",
    "graph_triangle_count",
    "inverted_index_postings",
    "itemsim_copurchase_topk",
    "join_bloom_prefilter",
    "join_full_outer_reconcile",
    "join_null_safe_eq",
    "kmeans_lloyd_step",
    "negative_sampling_pairs",
    "running_distinct_users",
    "schema_evolution_union_read",
    "sketch_countmin_freqs",
    "stream_topk_trending",
    "text_token_entropy",
    "tfidf_top_terms_per_doc",
    "txlog_checkpointed_read",
    "variant_shred_props",
    "vocab_oov_rate",
]


def _ordered():
    head = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    tail = {n: qd for n, qd in QUERIES.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None}
