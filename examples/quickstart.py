"""Quickstart: the engine's main surfaces in one runnable script.

    PYTHONPATH=. python examples/quickstart.py [SF_DIR]

Runs against the generated TPC-H-ish test tables (default
/root/testdata/sf0.001) and prints a sample from each flow: SQL over
registered views, the Ali-CCP pipeline operators, feature-store
retrieval, dedup, similarity search, and a bounded streaming window.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from alibaba_cppfeaturestore_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_duplicates,
)
from alibaba_cppfeaturestore_spark.operators.dictionary import (
    encode_with_dictionaries,
    fit_dictionaries,
)
from alibaba_cppfeaturestore_spark.operators.graph import dedup_keep_canonical
from alibaba_cppfeaturestore_spark.operators.similarity import brute_force_topk
from alibaba_cppfeaturestore_spark.plans.feature_views import (
    FeatureStore,
    FeatureView,
)
from alibaba_cppfeaturestore_spark.plans.views import register_views
from alibaba_cppfeaturestore_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="quickstart")
    register_views(spark, SF_DIR)

    print("== SQL over registered views ==")
    spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).show()

    print("== Dictionary encode (categorify) ==")
    ev = spark.table("events")
    dicts = fit_dictionaries(ev, ["event_type"])
    encode_with_dictionaries(ev, dicts).select("event_id", "event_type").show(5)

    print("== Feature store: historical (leakage-free) retrieval ==")
    fs = FeatureStore()
    fs.register(
        FeatureView("user_spend", ["user_id"], "ts", ["value"], ttl="2 hours"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("event_timestamp")
    )
    fs.get_historical_features(clicks, ["user_spend"]).show(5)

    print("== Near-duplicate detection + transitive dedup ==")
    docs = spark.table("documents").select("doc_id", "text")
    pairs = minhash_lsh_duplicates(docs, jaccard_threshold=0.8)
    pairs.show(5)
    kept = dedup_keep_canonical(docs, pairs, id_col="doc_id")
    print(f"corpus {docs.count()} -> {kept.count()} after cluster dedup; "
          f"exact dedup -> {exact_dedup(docs, ['text'], 'doc_id').count()}")

    print("== Similarity search over embeddings ==")
    emb = spark.table("embeddings")
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    brute_force_topk(emb, queries, k=3).show()

    print("== Lexical retrieval (BM25) + corpus term stats ==")
    from alibaba_cppfeaturestore_spark.operators.retrieval import bm25_topk, top_terms

    bm25_topk(docs, ["join", "filter", "window"], k=5).show()
    top_terms(docs, k=5).show()

    print("== Portable bottom-k sketch dedup ==")
    from alibaba_cppfeaturestore_spark.operators.dedup import bottomk_sketch_pairs

    bottomk_sketch_pairs(docs, min_shared=8).show(5)

    print("== Bounded streaming window ==")
    from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES

    QUERIES["stream_tumbling_window_counts"].spark(spark, SF_DIR).show(5)

    print("== Transaction-logged table: commits, ignore, time travel ==")
    import tempfile

    from alibaba_cppfeaturestore_spark.sources.txlog import TxTable

    t = TxTable(tempfile.mkdtemp(prefix="qs_txlog_") + "/table")
    ev = spark.table("events")
    t.commit(ev.groupBy("event_type").count(), "append")
    t.commit(ev.filter(F.col("value") >= 1.0).groupBy("event_type").count(), "overwrite")
    t.commit(ev.limit(0).groupBy("event_type").count(), "ignore")  # no-op
    print("history:", [(h["version"], h["mode"]) for h in t.history()])
    t.read(spark, version=0).show(3)  # time travel to the first commit

    print("== Incremental aggregate maintenance (no base re-scan) ==")
    from alibaba_cppfeaturestore_spark.operators.incremental import (
        build_agg_state,
        finalize_agg_state,
        merge_agg_state,
    )

    measures = {"total_value": ("value", "sum")}
    state = build_agg_state(
        ev.filter(F.col("event_id") % 2 == 0), ["event_type"], measures
    )
    merged = merge_agg_state(
        state, ev.filter(F.col("event_id") % 2 == 1), ["event_type"], measures
    )
    finalize_agg_state(merged, ["event_type"], measures).show(5)

    print("== Z-order layout: two-dimensional data skipping ==")
    from alibaba_cppfeaturestore_spark.operators.layout import cluster_by_z, zorder_layout

    zdf = zorder_layout(
        ev,
        F.col("user_id"),
        F.datediff(F.col("ts").cast("date"), F.lit("2000-01-01").cast("date")),
    )
    cluster_by_z(zdf, num_files=8).select("event_id", "zval", "file_bucket").show(3)

    print("== Exact robust statistics: grouped OLS + median/MAD outliers ==")
    from alibaba_cppfeaturestore_spark.operators.statistics import grouped_ols, mad_outliers

    x_day = F.datediff(F.col("ts").cast("date"), F.lit("2000-01-01").cast("date"))
    grouped_ols(ev.withColumn("_x", x_day), "_x", "value", ["event_type"]).show(5)
    mad_outliers(ev, "value", ["event_type"]).show(5)

    print("== Heavy hitters without shuffling the vocabulary ==")
    from alibaba_cppfeaturestore_spark.functions.text import chunk_tokens, tokens
    from alibaba_cppfeaturestore_spark.operators.sketches import heavy_hitters

    docs = spark.table("documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    heavy_hitters(toks, "token", phi=(1, 500)).orderBy(F.desc("cnt")).show(5)

    print("== RAG chunking: overlapping 64-token windows ==")
    docs.select("doc_id", F.explode(chunk_tokens(F.col("text"))).alias("c")).select(
        "doc_id", "c.chunk_id", "c.n_chunk_tokens"
    ).show(5)

    print("== Bloom-prefiltered semi join: prune before the shuffle ==")
    from alibaba_cppfeaturestore_spark.operators.joins import bloom_semi_join

    li = spark.table("lineitem")
    keys = spark.table("supplier").limit(10).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    print("rows surviving exact semi join:", bloom_semi_join(li, keys, "l_suppkey").count())

    print("== Count-Min sketch: one-pass mergeable frequencies ==")
    from alibaba_cppfeaturestore_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    sk = countmin_sketch(toks, "token")
    countmin_estimate(sk, toks.distinct().limit(5), "token").show(5)

    print("== Degree-oriented triangle counting on the co-purchase graph ==")
    from alibaba_cppfeaturestore_spark.operators.graph import triangle_count

    b = li.select("l_orderkey", "l_partkey").distinct()
    edges = (
        b.alias("a").join(b.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    )
    triangle_count(edges).show()

    print("== Stable global ids without a single-partition sort ==")
    from alibaba_cppfeaturestore_spark.operators.layout import assign_stable_ids

    assign_stable_ids(spark.table("orders").select("o_orderkey"), ["o_orderkey"]).show(3)

    print("== CUPED-adjusted experiment readout ==")
    from alibaba_cppfeaturestore_spark.operators.statistics import cuped_adjusted_means

    base = ev.select(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("grp"),
        F.when(F.col("event_type") == "view", F.col("value")).otherwise(F.lit(0.0)).alias("xv"),
        F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0)).alias("yv"),
    )
    cuped_adjusted_means(base, "user_id", "grp", "xv", "yv").show()

    spark.stop()


if __name__ == "__main__":
    main()
