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
from .dedup import _spread


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
    the corpus is scanned once — ``_spread`` first, so a singly-split
    embedding file does not serialize the |queries|×|corpus| cosine
    evaluation onto one core (measured 0.92 → 0.65 s at sf0.1; the same
    small-scan trap as the dedup verify stage, SCALING.md round-5
    notes). Ties broken by corpus id ascending.
    """
    from ..functions.vectors import norm

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            norm(F.col(vec_col)).alias("__qnorm"),
        )
    )
    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(F.col(vec_col)).alias("__cnorm"),
    )
    candidates = q.join(c, F.col("query_id") != F.col("neighbor_id"))
    return _topk_by_cosine(candidates, k)


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
    """array<struct<table:int,bucket:int>> — one bucket per hash table.

    All num_tables×num_bits hyperplanes live in ONE literal matrix and
    project through ONE ``transform`` lambda; inlining a projection
    expression per plane (the ``lsh_signature`` formulation) overflows
    generated-code limits at 8×4 planes and drops the scan out of
    whole-stage codegen. Bucket ids then assemble from the flat sign
    array with cheap element_at/shift arithmetic (``_let``-bound so the
    projections evaluate once)."""
    from ..functions.text import _let

    planes = [
        _plane_signs(t, p, dim)
        for t in range(num_tables)
        for p in range(num_bits)
    ]
    pmat = F.array(*[F.array(*[F.lit(s) for s in pl]) for pl in planes])
    bits = F.transform(
        pmat,
        lambda pl: F.when(
            F.aggregate(
                F.zip_with(vec, pl, lambda x, s: x.cast("double") * s),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )

    def assemble(b: Column) -> Column:
        out = []
        for t in range(num_tables):
            bucket = F.lit(0)
            for p in range(num_bits):
                bucket = bucket + F.shiftleft(
                    F.element_at(b, t * num_bits + p + 1), p
                )
            out.append(
                F.struct(F.lit(t).alias("table"), bucket.alias("bucket"))
            )
        return F.array(*out)

    return _let(bits, assemble)


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
    # explode_outer: the bucket array is a computed expression (the _let
    # binding), so an inner explode would re-evaluate all plane
    # projections inside an InferFiltersFromGenerate size/isnotnull
    # filter (see operators/dedup.py); the array is never empty.
    # _spread: the per-vector plane projections (num_tables × num_bits
    # dot products) run in the scan stage — parallelize a singly-split
    # corpus file before them.
    from ..functions.vectors import norm

    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(F.col(vec_col)).alias("__cnorm"),
        F.explode_outer(
            _lsh_buckets(F.col(vec_col), num_bits, num_tables, dim)
        ).alias("__b"),
    ).select("neighbor_id", "__cvec", "__cnorm", "__b.table", "__b.bucket")
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            norm(F.col(vec_col)).alias("__qnorm"),
            F.explode_outer(
                _lsh_buckets(F.col(vec_col), num_bits, num_tables, dim)
            ).alias("__b"),
        ).select("query_id", "__qvec", "__qnorm", "__b.table", "__b.bucket")
    )
    # Score BEFORE the pair dedup (r13, guide §2.3 "shuffle keys and
    # metadata instead of payloads"): a (query, neighbor) pair recurring
    # in several tables carries the SAME two vectors, so the rounded
    # cosine is bit-identical across its occurrences and dropDuplicates
    # keeps the same value whichever row survives. The dedup exchange
    # then carries (query_id, neighbor_id, cosine_sim) — ~24 bytes —
    # instead of two dim-float vectors + norms (~40× more). The price is
    # one dot fold per DUPLICATE occurrence (measured dup factor at
    # sf0.1: 1.27×), paid map-side where partial-aggregate collapse
    # already touched every occurrence anyway; wall-clock measured
    # neutral-to-better at sf0.1 (1.73 → 1.49 s avg, outputs identical).
    from ..functions.vectors import dot

    candidates = (
        q.join(c, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("__qvec"), F.col("__cvec"))
                / (F.col("__qnorm") * F.col("__cnorm")),
                6,
            ).alias("cosine_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _topk_scored(candidates, k)


def _topk_by_cosine(candidates: DataFrame, k: int) -> DataFrame:
    """Shared tail: score candidate (query, neighbor) pairs and keep the
    top-k per query (ties broken by neighbor id).

    When the candidate frame carries ``__qnorm``/``__cnorm`` (norms
    projected per SIDE before the candidate join — the documented
    ``threshold_pairs`` shape, extended to every top-k caller in r13),
    scoring costs ONE dot fold per pair instead of three interpreted
    array aggregates: higher-order functions never whole-stage-codegen
    (guide §4 / the minhash_band_index lesson), so norm(q) was being
    re-folded once per corpus row and norm(c) once per query.
    ``dot/(qnorm·cnorm)`` divides by the product of the SAME doubles
    ``cosine_similarity`` computes, so scores — and top-k order — are
    bit-identical (no epsilon clamp here, unlike threshold_pairs)."""
    if "__qnorm" in candidates.columns:
        from ..functions.vectors import dot

        score = dot(F.col("__qvec"), F.col("__cvec")) / (
            F.col("__qnorm") * F.col("__cnorm")
        )
    else:
        score = cosine_similarity(F.col("__qvec"), F.col("__cvec"))
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(score, 6).alias("cosine_sim"),
    )
    return _topk_scored(scored, k)


def _topk_scored(scored: DataFrame, k: int) -> DataFrame:
    """Top-k per query over an already-scored
    ``(query_id, neighbor_id, cosine_sim)`` frame (ties → neighbor id).
    Split out of ``_topk_by_cosine`` so callers that score before a
    pair dedup (``lsh_bucketed_topk``) share the identical window."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# Fitted-centroid memo: (plan semantic hash, vec_col, k, fraction, seed,
# cap) → centroids. The fit is a pure function of those inputs (seeded
# KMeans over a deterministic capped sample), so re-fitting on every
# query call — a benchmark loop, a retrieval service answering many
# top-k requests against one corpus — burns ~5 s of MLlib job overhead
# to recompute identical floats. The semantic hash ties the entry to the
# corpus PLAN, so a different source path/filter misses the cache.
_CENTROID_CACHE: dict[tuple, list[list[float]]] = {}


def ivf_fit_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_fraction: float | None = None,
    seed: int = 42,
    max_fit_rows: int = 1000 * 16,
) -> list[list[float]]:
    """Fit IVF coarse-quantizer centroids with MLlib KMeans.

    Scale-safe BY DEFAULT: the fit input is always capped at
    ``max_fit_rows`` (≈1000× n_centroids — coarse-quantizer quality
    saturates well below that), so calling this on a 100 TB corpus never
    runs a full-corpus KMeans. Pass ``sample_fraction`` to thin a huge
    corpus uniformly before the cap (seeded, reproducible); assignment
    afterwards is a per-row expression against broadcast centroid
    literals, never a model invocation. Fits are memoized per corpus
    plan (semantic hash), so repeated queries against the same corpus
    reuse the centroids instead of re-running the fit job."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    try:
        sem = corpus._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # Connect or API drift: fall back to uncached fit
        sem = None
    key = (sem, vec_col, n_centroids, sample_fraction, seed, max_fit_rows)
    if sem is not None and key in _CENTROID_CACHE:
        return _CENTROID_CACHE[key]

    sample = corpus if sample_fraction is None else corpus.sample(sample_fraction, seed)
    cap = max(max_fit_rows, 10 * n_centroids)
    vecs = sample.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    ).limit(cap)
    if vecs.isEmpty():
        # empty feed / filtered-away corpus: nothing to quantize. Callers
        # treat [] as "no cells" and return an empty, well-typed result
        # instead of crashing MLlib's fit (driver_sim --perturb-empty).
        if sem is not None:
            _CENTROID_CACHE[key] = []
        return []
    model = KMeans(k=n_centroids, seed=seed, maxIter=10).fit(vecs)
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    if sem is not None:
        _CENTROID_CACHE[key] = centroids
    return centroids


def _nearest_centroid_ids(vec: Column, centroids: list[list[float]], n: int) -> Column:
    """ids of the ``n`` nearest centroids (squared-L2, KMeans' metric).

    The centroid set is ONE literal matrix and the distance is ONE
    ``transform`` lambda over it — inlining a separate distance
    expression per centroid (16× aggregate(zip_with)) overflows the
    generated method size and drops the whole projection out of
    whole-stage codegen (~10× slower on the corpus-assignment scan)."""
    cmat = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    dists = F.transform(
        cmat,
        lambda c: F.aggregate(
            F.zip_with(
                vec,
                c,
                lambda x, cc: (x.cast("double") - cc) * (x.cast("double") - cc),
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    ranked = F.array_sort(
        F.zip_with(
            dists,
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda d, i: F.struct(d.alias("dist"), i.alias("cid")),
        )
    )
    return F.transform(F.slice(ranked, 1, n), lambda s: s["cid"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans coarse quantizer,
    corpus assigned to its nearest centroid, each query probes its
    ``n_probe`` nearest cells. The candidate join is an equi-join on
    centroid id — corpus compared ≈ n_probe/n_centroids of a cross join.
    Pass precomputed ``centroids`` to reuse a fitted quantizer (the
    batch↔stream / fit-once-serve-many path).

    IVF vs hyperplane LSH (``lsh_bucketed_topk``): IVF adapts cells to the
    data distribution (better candidate quality on clustered embeddings)
    at the cost of a fit job; LSH is fit-free and fully deterministic.
    """
    cents = centroids or ivf_fit_centroids(
        corpus, vec_col, n_centroids, sample_fraction
    )
    if not cents:
        # no quantizer cells (empty corpus): an empty, correctly-typed
        # result — limit(0) inputs keep id/vector types without a scan
        empty = (
            queries.limit(0)
            .select(
                F.col(query_id_col).alias("query_id"),
                F.col(vec_col).alias("__qvec"),
            )
            .crossJoin(
                corpus.limit(0).select(
                    F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col).alias("__cvec"),
                )
            )
            .select("query_id", "neighbor_id", "__qvec", "__cvec")
        )
        return _topk_by_cosine(empty, k)
    from ..functions.vectors import norm

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(F.col(vec_col)).alias("__cnorm"),
        F.element_at(_nearest_centroid_ids(F.col(vec_col), cents, 1), 1).alias("__cell"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            norm(F.col(vec_col)).alias("__qnorm"),
            # explode_outer: an inner explode of this computed array
            # would get an InferFiltersFromGenerate size/isnotnull
            # filter that re-runs the per-centroid distance scan twice;
            # the probe list is never empty, so no null rows to drop
            F.explode_outer(
                _nearest_centroid_ids(F.col(vec_col), cents, n_probe)
            ).alias("__cell"),
        )
    )
    candidates = (
        q.join(c, "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qvec", "__cvec", "__qnorm", "__cnorm")
    )
    return _topk_by_cosine(candidates, k)


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
    from ..functions.vectors import dot, norm

    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    # norms computed ONCE PER ROW before the pair join — cosine per pair
    # then costs one dot pass instead of three array aggregates
    base = corpus.select(*cols).withColumn("nrm", norm(F.col("v")))
    # Per-pair dot products are CPU-bound; a small corpus scanning as one
    # parquet split would run the whole pair join on one core — round-robin
    # the probe side to cluster parallelism (build side broadcasts).
    a = base.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    ).alias("a")
    b = base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                dot(F.col("a.v"), F.col("b.v"))
                / F.greatest(F.col("a.nrm") * F.col("b.nrm"), F.lit(1e-12)),
                6,
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_portable_topk(
    emb: DataFrame,
    n_queries: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k with a DETERMINISTIC coarse quantizer — the fully
    oracle-able sibling of ``ivf_topk``: centroids are the ``nlist``
    corpus vectors with the smallest ids (a fixed "random" sample — ids
    carry no geometry) int8-quantized, assignment/probing/scoring are
    integer dot products (every partial sum is an exact integer-valued
    double < 2^53, so aggregation order cannot change a bit), and all
    argmax selections tie-break on ids. Same physical shape as the
    learned-KMeans path — broadcast centroids, cell equi-join, per-cell
    top-k — with recall traded for exact cross-engine replayability.
    Use ``ivf_topk`` (learned centroids) when recall matters more than
    a value-level audit trail.
    """
    from ..functions.vectors import dot_int8, norm_int8, quantize_int8
    from ..operators.aggregates import top_k_per_group

    # NULL-id gate (the winnow precedent: an unattributable member is
    # unactionable): this quantizer is ID-KEYED — centroids are the
    # nlist smallest-id vectors — and an id-less vector cannot hold an
    # id-ordered slot. Without the gate it claims one on exactly ONE
    # engine: Spark's ASC sort default is NULLS FIRST, DuckDB's is NULLS
    # LAST (driver_sim five-way stack find, seed 71: a nulls-fuzzed
    # vec_id became Spark centroid #1 and displaced id 18's slot). As a
    # neighbor or query a NULL id already drops through the != and <
    # conditions below — and through the same conditions in brute-force
    # and LSH top-k, so those operators need no gate (audited r09).
    emb = emb.where(F.col(id_col).isNotNull())

    # _spread: quantization + per-cell scoring are scan-stage CPU work;
    # parallelize a singly-split corpus file before them.
    # "nv" = per-vector integer norm, computed ONCE per row (r13): every
    # scoring site below divides dot_int8 by the precomputed norms —
    # the identical doubles cosine_int8 folds per PAIR, so every cs is
    # bit-identical while the per-pair HOF work drops 3× → 1×.
    q = _spread(emb).select(
        F.col(id_col).alias("vid"), quantize_int8(F.col(vec_col)).alias("qv")
    ).withColumn("nv", norm_int8(F.col("qv")))
    cents = (
        q.orderBy("vid")
        .limit(nlist)
        .select(
            F.col("vid").alias("cent_id"),
            F.col("qv").alias("cent_qv"),
            F.col("nv").alias("cent_nv"),
        )
    )

    def _cs(d_a, d_b, n_a, n_b):
        return dot_int8(d_a, d_b) / F.greatest(n_a * n_b, F.lit(1e-12))

    # cell assignment: best centroid per corpus vector (ties -> smallest id)
    scored_cells = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "vid", "qv", "nv", "cent_id",
            _cs(F.col("qv"), F.col("cent_qv"), F.col("nv"), F.col("cent_nv")).alias("cs"),
        )
    )
    # assigned has two consumers (query extraction, candidate join), but
    # persisting it MEASURED SLOWER (7.6 s -> 11.2 s at sf0.01): the
    # cache is data-sized (it carries the quantized vectors) and the
    # InMemoryTableScan breaks whole-stage codegen, while the recompute
    # is one narrow scan + a 16-row broadcast score. The scan-economy
    # rule (SCALING.md): cache-by-default is as wrong as
    # recompute-by-default — this one stays recomputed.
    assigned = top_k_per_group(scored_cells, ["vid"], "cs", k=1, tiebreak=["cent_id"]).select(
        "vid", "qv", "nv", F.col("cent_id").alias("cell")
    )
    queries = assigned.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("nv").alias("q_nv"),
    )
    probes = top_k_per_group(
        queries.crossJoin(F.broadcast(cents)).select(
            "query_id", "q_qv", "q_nv", "cent_id",
            _cs(F.col("q_qv"), F.col("cent_qv"), F.col("q_nv"), F.col("cent_nv")).alias("cs"),
        ),
        ["query_id"],
        "cs",
        k=nprobe,
        tiebreak=["cent_id"],
    ).select("query_id", "q_qv", "q_nv", F.col("cent_id").alias("cell"))
    cands = (
        probes.join(assigned, "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            _cs(F.col("q_qv"), F.col("qv"), F.col("q_nv"), F.col("nv")).alias("cosine_sim"),
        )
        # a vector sits in exactly one cell, so no candidate dedup needed
    )
    return top_k_per_group(cands, ["query_id"], "cosine_sim", k=k, tiebreak=["neighbor_id"])


def ivf_greedy_topk(
    emb: DataFrame,
    n_queries: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_fit_rows: int = 16384,
) -> DataFrame:
    """IVF top-k with a DATA-ADAPTIVE deterministic coarse quantizer:
    farthest-point (k-center greedy) centroid selection over int8-
    quantized vectors, replacing ``ivf_topk``'s MLlib-KMeans fit (r11
    verdict item 6 — the RNG init and Lloyd float accumulation were the
    only oracle-less stages left in the catalog).

    Why this is exactly replayable where KMeans is not:

    - the fit set is the ``max_fit_rows`` vectors with smallest
      ``portable_hash60(vec_id)`` — a deterministic "random" thinning
      any engine reproduces (hashes carry no geometry, so this is an
      unbiased sample in the only sense that matters to a quantizer);
    - centroid selection is k-center greedy on integer squared-L2
      (``|a|² + |b|² − 2a·b`` over int8 components — every value
      < 2³³, exact in int64 and in the integer-valued doubles a SQL
      engine folds), seeded at the smallest (hash, id) and iterating
      argmax-min-distance with ties to the smallest id — a total,
      engine-free order;
    - Lloyd refinement is deliberately OMITTED: the mean-update divides
      integer sums into non-integer doubles whose downstream distance
      accumulation is summation-order-dependent — the one stage that
      cannot be made engine-equal without scaled-integer cross
      multiplication past 2⁵³. k-center seeding alone is the classic
      approximation (Gonzalez 1985: 2-approx for the k-center
      objective) and is exactly the init production KMeans would
      refine.

    Scale shape: the fit collects ≤ ``max_fit_rows`` quantized vectors
    (≈1 MB at the defaults — a bounded driver-side computation, same
    class as MLlib's ``clusterCenters()``); assignment/probe/score are
    the ``ivf_portable_topk`` tail — broadcast 16-row centroid table,
    cell equi-join, per-cell top-k, no stage touching |corpus|² rows.
    """
    from ..functions.vectors import dot_int8, norm_int8, quantize_int8
    from ..operators.aggregates import top_k_per_group
    from ..operators.dedup import portable_hash60

    # NULL-id gate, same reason as ivf_portable_topk: the fit order is
    # (hash(id), id)-keyed and engine NULL sort defaults differ.
    emb = emb.where(F.col(id_col).isNotNull())
    # "nv": per-vector integer norm, once per row (r13, see
    # ivf_portable_topk) — every scoring site divides dot_int8 by the
    # precomputed norms; bit-identical cs at 1 fold per pair instead of 3
    q = _spread(emb).select(
        F.col(id_col).alias("vid"), quantize_int8(F.col(vec_col)).alias("qv")
    ).withColumn("nv", norm_int8(F.col("qv")))
    fit = (
        q.select(
            "vid", "qv", portable_hash60(F.col("vid").cast("string")).alias("h60")
        )
        .orderBy("h60", "vid")
        .limit(max_fit_rows)
        .collect()
    )
    if not fit:
        return emb.limit(0).select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("cosine_sim"),
        )

    import numpy as np

    vids = np.array([r.vid for r in fit], dtype=np.int64)
    x = np.array([[int(c) for c in r.qv.q] for r in fit], dtype=np.int64)
    nrm = (x * x).sum(axis=1)
    sel = [0]  # fit rows arrive (h60, vid)-ordered: row 0 IS the seed
    dmin = nrm + nrm[0] - 2 * (x @ x[0])
    while len(sel) < nlist:
        mx = dmin.max()
        if mx <= 0:  # every remaining point duplicates a centroid
            break
        tied = np.flatnonzero(dmin == mx)
        j = int(tied[np.argmin(vids[tied])])
        sel.append(j)
        dmin = np.minimum(dmin, nrm + nrm[j] - 2 * (x @ x[j]))

    spark = emb.sparkSession
    cents = F.broadcast(
        spark.createDataFrame(
            [
                (i, (float(fit[j].qv.scale), [int(c) for c in fit[j].qv.q]))
                for i, j in enumerate(sel)
            ],
            "cent_id int, cent_qv struct<scale:float,q:array<tinyint>>",
        ).withColumn("cent_nv", norm_int8(F.col("cent_qv")))
    )

    def _cs(d_a, d_b, n_a, n_b):
        return dot_int8(d_a, d_b) / F.greatest(n_a * n_b, F.lit(1e-12))

    scored_cells = q.crossJoin(cents).select(
        "vid", "qv", "nv", "cent_id",
        _cs(F.col("qv"), F.col("cent_qv"), F.col("nv"), F.col("cent_nv")).alias("cs"),
    )
    assigned = top_k_per_group(
        scored_cells, ["vid"], "cs", k=1, tiebreak=["cent_id"]
    ).select("vid", "qv", "nv", F.col("cent_id").alias("cell"))
    queries = assigned.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("nv").alias("q_nv"),
    )
    probes = top_k_per_group(
        queries.crossJoin(cents).select(
            "query_id",
            "q_qv",
            "q_nv",
            "cent_id",
            _cs(F.col("q_qv"), F.col("cent_qv"), F.col("q_nv"), F.col("cent_nv")).alias("cs"),
        ),
        ["query_id"],
        "cs",
        k=nprobe,
        tiebreak=["cent_id"],
    ).select("query_id", "q_qv", "q_nv", F.col("cent_id").alias("cell"))
    cands = (
        probes.join(assigned, "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            _cs(F.col("q_qv"), F.col("qv"), F.col("q_nv"), F.col("nv")).alias("cosine_sim"),
        )
    )
    return top_k_per_group(cands, ["query_id"], "cosine_sim", k=k, tiebreak=["neighbor_id"])


def lloyd_assign(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid assignment for one Lloyd iteration over LITERAL
    centroids: squared distance to each centroid as a left-associated
    fold (``F.aggregate`` — the same ((0+t₁)+t₂)+… order a SQL oracle
    spells out, so the doubles are bit-identical cross-engine), argmin
    by strict CASE comparisons with ties to the LOWEST index."""
    dists = []
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(vec, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        dists.append(d)
    k = len(dists)
    expr = F.lit(k - 1)
    for j in range(k - 2, -1, -1):
        cond = None
        for m in range(j + 1, k):
            c = dists[j] <= dists[m]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(j)).otherwise(expr)
    return expr


def kmeans_lloyd_step(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One exact Lloyd iteration against given centroids: assign every
    vector to its nearest centroid, return per-cluster size and the
    recomputed centroid's first two coordinates (ROUND(AVG,6) — the
    embedding_stats discipline). The assignment is a pure row-local
    codegen expression (no shuffle); the update is ONE partial-aggregable
    groupBy of k rows — the per-iteration cost profile that lets Lloyd
    run at corpus scale with broadcast centroids. Production k-means
    loops this with refreshed literals (see ``ivf_fit_centroids`` for
    the sampled-fit variant)."""
    assigned = df.select(
        F.col(id_col),
        lloyd_assign(F.col(vec_col).cast("array<double>"), centroids).alias("cluster"),
        F.element_at(F.col(vec_col), 1).cast("double").alias("d0"),
        F.element_at(F.col(vec_col), 2).cast("double").alias("d1"),
    )
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("d0"), 6).alias("new_c0"),
        F.round(F.avg("d1"), 6).alias("new_c1"),
    )
