"""Tests for the Silver→Gold e2e flow and deterministic sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def test_silver_to_gold_encodes_and_stamps(spark):
    out = QUERIES["aliccp_silver_to_gold_e2e"].spark(spark, SF)
    rows = out.limit(2000).collect()
    assert rows, "gold output empty"
    # encoded columns are dense 0-based indexes bounded by vocab size
    assert all(0 <= r["user_group"] <= 13 for r in rows)
    assert all(0 <= r["user_age"] < 7 for r in rows)
    # raw-id duplication survives encoding
    assert all(r["user_id"] == r["user_id_raw"] for r in rows)
    # injectable clock: constant, not wall-clock
    assert len({r["created"] for r in rows}) == 1


def test_sample_deterministic_fraction_and_rerun(spark):
    q = QUERIES["sample_deterministic"].spark
    total = 1500  # orders rows at sf0.001
    s1 = q(spark, SF)
    n1 = s1.count()
    assert 0.05 * total <= n1 <= 0.15 * total, f"~10% expected, got {n1}/{total}"
    # pure function of the data: identical row set on re-run
    s2 = q(spark, SF)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0


def test_mllib_stringindexer_compat_matches_native(spark):
    """Where frequencies are all distinct, the MLlib StringIndexer fit and
    the native pinned-tie-break fit must produce the identical dictionary,
    and encoding through either must agree row-for-row."""
    from alibaba_cppfeaturestore_spark.operators.dictionary import (
        encode_with_dictionaries,
        fit_dictionary,
        fit_dictionary_mllib,
    )

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2 + [("d",)] * 1,
        "v string",
    )
    native = {r["value"]: r["index"] for r in fit_dictionary(df, "v").collect()}
    mllib = {r["value"]: r["index"] for r in fit_dictionary_mllib(df, "v").collect()}
    assert native == mllib == {"a": 0, "b": 1, "c": 2, "d": 3}

    probe = spark.createDataFrame([("a",), ("d",), ("zzz-unseen",)], "v string")
    enc_native = encode_with_dictionaries(probe, {"v": fit_dictionary(df, "v")})
    enc_mllib = encode_with_dictionaries(probe, {"v": fit_dictionary_mllib(df, "v")})
    assert sorted(r["v"] for r in enc_native.collect()) == sorted(
        r["v"] for r in enc_mllib.collect()
    ) == [0, 3, 4]  # unseen -> |vocab|


def test_one_pass_fit_dictionaries_equals_per_column(spark):
    """fit_dictionaries computes every column's vocabulary in ONE
    grouping-sets scan; the resulting dictionaries must be identical to
    k independent fit_dictionary calls (same counts, same deterministic
    (count desc, value asc) ranking)."""
    from alibaba_cppfeaturestore_spark.operators.dictionary import (
        fit_dictionaries,
        fit_dictionary,
    )
    from alibaba_cppfeaturestore_spark.plans.views import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", "user_id", "props"
    )
    cols = ["event_type", "user_id", "props"]
    combined = fit_dictionaries(ev, cols)
    for c in cols:
        one = {r["value"]: r["index"] for r in fit_dictionary(ev, c).collect()}
        multi = {r["value"]: r["index"] for r in combined[c].collect()}
        assert multi == one, c


def test_weighted_bernoulli_rate_tracks_weight(spark):
    """Inclusion probability must be ∝ weight: empirical rate per weight
    class within 3σ of w/(8·w_max) on a 60k-row population."""
    from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES
    import math

    sf = "/root/testdata/sf0.01"
    from alibaba_cppfeaturestore_spark.plans.views import load_table

    li = load_table(spark, sf, "lineitem")
    pop = {
        int(r.w): r.n
        for r in li.groupBy(F.col("l_quantity").cast("long").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    wmax = max(pop)
    got = QUERIES["sample_weighted_bernoulli"].spark(spark, sf)
    hits = {int(r.weight): r.n for r in got.groupBy("weight").agg(F.count(F.lit(1)).alias("n")).collect()}
    for w, n in pop.items():
        p = w / (8 * wmax)
        mean, sd = n * p, math.sqrt(n * p * (1 - p))
        assert abs(hits.get(w, 0) - mean) <= 3 * sd + 1, (w, hits.get(w, 0), mean)


def test_weighted_bernoulli_is_deterministic(spark):
    from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    a = QUERIES["sample_weighted_bernoulli"].spark(spark, sf).collect()
    b = QUERIES["sample_weighted_bernoulli"].spark(spark, sf).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) > 0


def test_negative_sampling_properties(spark):
    from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.01"
    df = QUERIES["negative_sampling_pairs"].spark(spark, sf).toPandas()
    pos = df[df.label == 1]
    neg = df[df.label == 0]
    assert len(pos) > 0 and len(neg) > 0
    # at most 3 negatives per order, and never colliding with that
    # order's positives
    per_order = neg.groupby("o_orderkey").size()
    assert per_order.max() <= 3
    pos_pairs = set(zip(pos.o_orderkey, pos.partkey))
    assert not any((o, p) in pos_pairs for o, p in zip(neg.o_orderkey, neg.partkey))
    # deterministic
    df2 = QUERIES["negative_sampling_pairs"].spark(spark, sf).toPandas()
    a = sorted(map(tuple, df.itertuples(index=False)))
    b = sorted(map(tuple, df2.itertuples(index=False)))
    assert a == b
