"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set against the corpus — one scan, no corpus shuffle, top-k via
window over (query, corpus-partition) partial results. The LSH-bucketed
variant is the 100 TB path: sign-bit signatures put each vector in a
bucket; only same-bucket (or neighboring-band) pairs are compared.

Hyperplanes for the LSH signatures are derived deterministically from
xxhash64 — no RNG state, so signatures are reproducible across runs and
between batch/streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: for each query vector the k nearest corpus rows.

    The query side is broadcast (ANN queries are few relative to corpus);
    the corpus is scanned once. Ties broken by corpus id ascending.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    scored = q.join(c, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _plane_signs(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane weights — plane identity is compile-time
    (table, plane, i), so the weights are generated driver-side and embedded
    as literals: zero per-row hashing, reproducible across runs/sessions."""
    import random

    rng = random.Random((table << 20) ^ (plane << 8) ^ 0xA11CE)
    return [1.0 if rng.getrandbits(1) else -1.0 for _ in range(dim)]


def _lsh_bit(vec: Column, table: int, plane: int, dim: int) -> Column:
    """Sign bit of <vec, h_plane>: one fused multiply-add pass over the
    vector against a literal ±1 array."""
    signs = F.array(*[F.lit(s) for s in _plane_signs(table, plane, dim)])
    proj = F.aggregate(
        F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_signature(vec: Column, num_bits: int, dim: int, table: int = 0) -> Column:
    """Random-hyperplane signature → int bucket id (num_bits ≤ 31)."""
    out = F.lit(0)
    for p in range(num_bits):
        out = out + F.shiftleft(_lsh_bit(vec, table, p, dim), p)
    return out


def _lsh_buckets(vec: Column, num_bits: int, num_tables: int, dim: int) -> Column:
    """array<struct<table:int,bucket:int>> — one bucket per hash table."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_signature(vec, num_bits, dim, table=t).alias("bucket"),
            )
            for t in range(num_tables)
        ]
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_bits: int = 4,
    num_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k with multi-table random-hyperplane LSH.

    A query is compared only against corpus vectors sharing a bucket in at
    least one of ``num_tables`` tables: recall ≈ 1-(1-p^num_bits)^num_tables
    for per-plane agreement p. The scale win: the candidate join is an
    equi-join on (table, bucket) + dedup, never a cross join. Tune
    num_bits up for selectivity, num_tables up for recall.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.explode(_lsh_buckets(F.col(vec_col), num_bits, num_tables, dim)).alias("__b"),
    ).select("neighbor_id", "__cvec", "__b.table", "__b.bucket")
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            F.explode(_lsh_buckets(F.col(vec_col), num_bits, num_tables, dim)).alias("__b"),
        ).select("query_id", "__qvec", "__b.table", "__b.bucket")
    )
    candidates = (
        q.join(c, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qvec", "__cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("__qvec"), F.col("__cvec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def threshold_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup detection).

    Optionally blocked on ``block_col``; unblocked is |corpus|² — at scale
    pair it with LSH buckets (see ``lsh_bucketed_topk``) instead."""
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = corpus.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine_similarity(F.col("a.v"), F.col("b.v")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
