"""The engine's four sanctioned Python tiers, pinned against native paths:

- scalar ``pandas_udf`` (Arrow batch): wide-vector cosine ≡ native HOF cosine
- grouped-map ``applyInPandas``: per-key EWMA ≡ hand recurrence
- Series-to-scalar ``pandas_udf`` (grouped agg): modal bucket ≡ native argmax
- table-function ``udtf`` (Spark 4): 1→N expansion ≡ native posexplode
(``mapInPandas`` and ``applyInPandasWithState`` are pinned in
test_multimodal / test_streaming.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alibaba_cppfeaturestore_spark.functions.vectors import (
    cosine_similarity,
    cosine_similarity_arrow,
)
from alibaba_cppfeaturestore_spark.operators.timeseries import grouped_ewma
from alibaba_cppfeaturestore_spark.plans.views import load_table


def test_arrow_cosine_equals_native(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    pairs = emb.alias("a").crossJoin(emb.alias("b")).select(
        F.col("a.vec_id").alias("ia"),
        F.col("b.vec_id").alias("ib"),
        cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias("native"),
        cosine_similarity_arrow(F.col("a.embedding"), F.col("b.embedding")).alias("arrow"),
    )
    rows = pairs.collect()
    assert len(rows) == 2500
    for r in rows:
        assert r["arrow"] == pytest.approx(r["native"], rel=1e-12)


def test_grouped_ewma_matches_recurrence(spark):
    rows = [
        ("u1", 1, 10.0),
        ("u1", 2, 20.0),
        ("u1", 3, 0.0),
        ("u2", 1, 4.0),
        ("u2", 2, 8.0),
    ]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    got = {
        (r["k"], r["i"]): r["ewma"]
        for r in grouped_ewma(df, "k", ["i"], "v", alpha=0.5).collect()
    }

    def rec(vals, a=0.5):
        y, out = None, []
        for v in vals:
            y = v if y is None else a * v + (1 - a) * y
            out.append(y)
        return out

    want = {}
    for k, vals in [("u1", [10.0, 20.0, 0.0]), ("u2", [4.0, 8.0])]:
        for i, y in enumerate(rec(vals), start=1):
            want[(k, i)] = y
    assert set(got) == set(want)
    for key, y in want.items():
        assert got[key] == pytest.approx(y, rel=1e-12)


def test_grouped_ewma_order_independence_of_input(spark):
    """Shuffled input order must not change the result — the kernel sorts
    by the declared order columns inside each group."""
    rows = [("u1", 3, 1.0), ("u1", 1, 9.0), ("u1", 2, 5.0)]
    df = spark.createDataFrame(rows, ["k", "i", "v"])
    got = sorted(
        (r["i"], r["ewma"])
        for r in grouped_ewma(df, "k", ["i"], "v", alpha=0.5).collect()
    )
    assert got[0] == (1, pytest.approx(9.0))
    assert got[1] == (2, pytest.approx(7.0))
    assert got[2] == (3, pytest.approx(4.0))


def test_grouped_agg_mode_equals_native_argmax(spark, sf_dir):
    """Series-to-scalar (grouped-agg) pandas_udf tier: modal integer
    bucket per group ≡ native counts + row_number argmax."""
    from pyspark.sql import Window

    from alibaba_cppfeaturestore_spark.operators.statistics import mode_bucket_udaf

    ev = load_table(spark, sf_dir, "events")
    mode = mode_bucket_udaf()
    got = {
        r.event_type: r.mode_bucket
        for r in ev.groupBy("event_type")
        .agg(mode(F.floor(F.col("value")).cast("long")).alias("mode_bucket"))
        .collect()
    }
    counts = (
        ev.select("event_type", F.floor("value").cast("long").alias("b"))
        .groupBy("event_type", "b")
        .count()
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("count"), F.asc("b"))
    native = {
        r.event_type: r.b
        for r in counts.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    }
    assert got == native


def test_python_udtf_tier_equals_native_explode(spark):
    """Fourth Python tier: an arrow-optimized Python UDTF (Spark 4
    table function) pinned ≡ the native posexplode path it would
    replace. UDTFs are for 1→N expansions whose logic genuinely can't
    be a native generator; for anything expressible as
    explode/posexplode/inline, the native form wins (codegen, no Python
    round-trip) — this test documents the equivalence contract."""
    from pyspark.sql.functions import udtf, posexplode, split, col, lit

    @udtf(returnType="pos int, tok string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, t in enumerate(text.split()):
                yield (i, t)

    spark.udtf.register("py_tokenize", Tokenize)
    df = spark.createDataFrame([(1, "a b c"), (2, "x y")], "id long, text string")
    df.createOrReplaceTempView("__udtf_docs")
    got = {
        (r.id, r.pos, r.tok)
        for r in spark.sql(
            "SELECT d.id, t.pos, t.tok FROM __udtf_docs d, "
            "LATERAL py_tokenize(d.text) t"
        ).collect()
    }
    want = {
        (r.id, r.pos, r.tok)
        for r in df.select("id", posexplode(split(col("text"), lit(" "))).alias("pos", "tok")).collect()
    }
    assert got == want and len(got) == 5
