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


def _lsh_bit(vec: Column, plane: int, dim: int) -> Column:
    """Sign bit of <vec, h_plane> where h_plane[i] is a deterministic
    pseudo-random ±1 weight derived from xxhash64(plane, i)."""
    signs = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.when(
            F.xxhash64(F.lit(plane), i).bitwiseAND(F.lit(1)) == 1, F.lit(1.0)
        ).otherwise(F.lit(-1.0)),
    )
    proj = F.aggregate(
        F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_signature(vec: Column, num_bits: int, dim: int) -> Column:
    """Random-hyperplane signature → int bucket id (num_bits ≤ 31)."""
    out = F.lit(0)
    for p in range(num_bits):
        out = out + F.shiftleft(_lsh_bit(vec, p, dim), p)
    return out


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: compare only vectors sharing an LSH bucket.

    Recall < 1.0 by construction (bucket misses); the scale win is that
    the candidate join is an equi-join on bucket id instead of a cross
    join. Increase recall with fewer bits or multi-probe (neighboring
    buckets) — tunables, not semantics.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        lsh_signature(F.col(vec_col), num_bits, dim).alias("__bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            lsh_signature(F.col(vec_col), num_bits, dim).alias("__bucket"),
        )
    )
    scored = q.join(c, ["__bucket"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
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
