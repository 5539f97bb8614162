"""Semantic invariants for the late-round-3 catalog entries that have no
dedicated operator module — each asserts a MEANING-level property the
oracle comparison alone wouldn't catch (the oracle proves both engines
agree; these prove they agree on something sensible)."""

from __future__ import annotations

import math

import pytest

from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def run(spark):
    def _run(name):
        return QUERIES[name].spark(spark, SF).collect()

    return _run


def test_pareto_shares_monotone_and_complete(run):
    rows = sorted(run("pareto_revenue_concentration"), key=lambda r: r.decile)
    shares = [r.revenue_share for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-12  # decile 10 == everyone
    assert shares[0] > 0.1  # top decile holds MORE than its uniform share


def test_tier_migration_preserves_customers(run, spark):
    rows = run("customer_tier_migration")
    total = sum(r.n_customers for r in rows)
    # every counted customer sits in exactly one (tier_a, tier_b) cell
    from alibaba_cppfeaturestore_spark.plans.views import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, SF, "orders")
    both = (
        o.groupBy("o_custkey")
        .agg(F.countDistinct((F.col("o_orderkey") % 2)).alias("h"))
        .where(F.col("h") == 2)
        .count()
    )
    assert total == both
    assert all(1 <= r.tier_a <= 5 and 1 <= r.tier_b <= 5 for r in rows)


def test_ratio_to_report_sums_to_one_per_region(run):
    rows = run("agg_ratio_to_report")
    by_region = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r.share_of_region)
    for region, shares in by_region.items():
        assert abs(sum(shares) - 1.0) < 1e-9, region


def test_key_skew_report_orders_and_bounds(run):
    rows = sorted(run("dq_key_skew_report"), key=lambda r: r.rnk)
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(r.skew_ratio >= 1.0 for r in rows)  # max ≥ mean always


def test_attribution_matrix_counts_every_windowed_purchase(run, spark):
    rows = run("attribution_first_vs_last_touch")
    assert sum(r.n_purchases for r in rows) > 0
    assert all(
        r.first_touch in ("view", "click") and r.last_touch in ("view", "click")
        for r in rows
    )


def test_lang_confusion_covers_corpus(run, spark):
    rows = run("lang_id_confusion_matrix")
    from alibaba_cppfeaturestore_spark.plans.views import load_table

    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n for r in rows) == n_docs


def test_ann_recall_bounds(run):
    rows = run("ann_recall_audit")
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_hit <= 5 and r.recall_at_5 == r.n_hit / 5.0


def test_fold_assignment_partitions_everything(run, spark):
    rows = run("ml_fold_assignment")
    from alibaba_cppfeaturestore_spark.plans.views import load_table

    n_events = load_table(spark, SF, "events").count()
    assert sum(r.n for r in rows) == n_events
    assert {r.fold for r in rows} == set(range(5))


def test_quantile_normalize_uniformity(run):
    rows = run("feature_quantile_normalize")
    assert all(0.0 <= r.pct <= 1.0 for r in rows)
    # sampled pcts should span the unit interval, not cluster
    pcts = sorted(r.pct for r in rows)
    assert pcts[0] < 0.1 and pcts[-1] > 0.9


def test_data_card_consistency(run):
    [card] = run("corpus_data_card")
    assert card.n_docs > 0
    assert card.vocab_size <= card.n_tokens_total
    assert card.p50_doc_tokens <= card.max_doc_tokens
    assert 0 <= card.n_exact_dup_docs < card.n_docs


def test_drift_js_within_information_bounds(run):
    [row] = run("corpus_drift_js_divergence")
    assert 0.0 <= row.js_divergence <= math.log(2) + 1e-12


def test_hybrid_rrf_contains_both_leg_heads(run, spark):
    rows = run("hybrid_rrf_retrieval")
    # a doc ranked #1 on either leg must appear in the fused top-10
    lex_best = min((r for r in rows if r.lex_rank is not None), key=lambda r: r.lex_rank, default=None)
    vec_best = min((r for r in rows if r.vec_rank is not None), key=lambda r: r.vec_rank, default=None)
    assert lex_best is not None or vec_best is not None
