"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash+LSH, SimHash, and n-gram Jaccard near-dup.
Not in the reference (tabular data); first-class engine additions per the
north-star scope. Design target is the 100 TB case:

- exact dedup: single shuffle on a 64/256-bit content hash, not the text.
- MinHash-LSH: shingle → k minhashes → b bands; candidate pairs come from
  a groupBy on (band, band_hash) — only docs sharing a band bucket are
  compared, so the join is |bucket|² per bucket, never |corpus|².
- SimHash: 64-bit signature; banding into 16-bit chunks gives candidates
  for hamming-distance verification (dups with distance ≤ 3 must share a
  chunk by pigeonhole).

All signature computation is native column expressions (xxhash64 +
higher-order array functions) — deterministic, no Python in the scan.

Duplicate-resolution semantics: "keep smallest doc_id". A row is dropped
iff it pairs (above threshold) with ANY smaller-id row. Pair-loser
dropping is one-hop; for transitive duplicate CLUSTERS (chains merged,
one canonical row per component) close the pairs with
``operators/graph.py::dedup_keep_canonical``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import char_shingles, tokens, winnow_fingerprints
from .ranks import register_persisted


def exact_dedup(
    df: DataFrame, cols: list[str], id_col: str, keep: str = "min",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Exact dedup on ``cols`` content: keep one row per distinct content
    (smallest ``id_col`` by default — deterministic).

    Shuffles on a 256-bit content hash rather than raw content, so shuffle
    keys stay 32 bytes regardless of document size.

    A NULL id NEVER wins representative selection (NULLS LAST in both
    keep modes): "keep smallest id" means the smallest IDENTIFIED
    document — Spark's bare ``asc()`` is nulls-first, which would elect
    the one row nobody can reference as the survivor of its duplicate
    group, while SQL engines' bare ``ASC`` elects the smallest real id
    (``driver_sim --perturb-nulls`` find on NULL-seeded ids).

    ``tiebreak`` (r11, seed-349 stack find): under DUPLICATED ids two
    rows can tie on (content, id) while differing in a carried-along
    column — which one survives is then a shuffle accident. Callers
    that project extra columns off the representative must close the
    order over them (ASC NULLS FIRST, the house tie convention)."""
    content_hash = F.sha2(F.concat_ws("\x00", *[F.col(c).cast("string") for c in cols]), 256)
    w = Window.partitionBy(content_hash).orderBy(
        F.col(id_col).asc_nulls_last() if keep == "min" else F.col(id_col).desc_nulls_last(),
        *[F.asc_nulls_first(c) for c in (tiebreak or [])],
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# Universal-hash permutation constants: h_i(x) = (a_i*x + b_i) mod p over a
# 31-bit Mersenne prime. Products stay < 2^62 so the arithmetic is safe under
# ANSI overflow checking; constants are fixed (deterministic across runs).
_MINHASH_PRIME = (1 << 31) - 1


def portable_hash60(col: Column) -> Column:
    """md5-derived 60-bit non-negative integer hash, reproducible
    bit-identically by any engine with md5: the first 15 hex chars of
    md5(s) parsed base-16. DuckDB replay:
    ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``.

    This is the PORTABLE base hash behind ``portable=True`` on the
    MinHash/SimHash operators — it trades xxhash64's one-pass speed
    (md5 is ~3-4× slower per byte) for a full cross-engine value oracle,
    the ``bottomk_sketch_pairs`` pattern generalized. Production default
    stays xxhash64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _perm_constants(num_hashes: int, seed: int = 0x5EED) -> tuple[list[int], list[int]]:
    import random

    rng = random.Random(seed)
    a = [rng.randrange(1, _MINHASH_PRIME) for _ in range(num_hashes)]
    b = [rng.randrange(0, _MINHASH_PRIME) for _ in range(num_hashes)]
    return a, b


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to cluster parallelism when the scan produced fewer
    splits. Shingling/hashing is CPU-bound at ~200+ ops/char while input
    bytes are comparatively tiny, so bytes-based file-split granularity
    underestimates the work — a single-split file would hash on one core.
    One exchange of the raw text, reused by every downstream branch."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df


def minhash_signature(
    text: Column | str,
    num_hashes: int = 32,
    shingle_size: int = 5,
    portable: bool = False,
) -> Column:
    """MinHash signature as a per-row Column: array of ``num_hashes``
    min-over-shingles hashes (each shingle string-hashed exactly once —
    xxhash64, or :func:`portable_hash60` under ``portable=True`` for
    DuckDB replay — then the permutations fold inside one ``aggregate``).

    USE :func:`minhash_band_index` FOR CORPUS-SCALE WORK. Higher-order
    functions are never whole-stage-codegen'd: this fold evaluates
    interpreted, with boxed arithmetic and two array allocations per
    shingle — measured ~10× the CPU of the aggregation-shaped signature
    in ``minhash_band_index`` (explode shingles → scalar hash →
    ``num_hashes`` codegen'd ``min()`` aggregates), which produces
    bit-identical values. This Column form remains for single-row /
    streaming-callback contexts where a groupBy is unavailable and the
    per-row element count is small."""
    a, b = _perm_constants(num_hashes)
    p = F.lit(_MINHASH_PRIME).cast("long")
    base = portable_hash60 if portable else F.xxhash64
    hashed = F.transform(
        F.array_distinct(char_shingles(text, shingle_size)),
        lambda s: F.pmod(base(s), p),
    )
    init = F.array_repeat(p, num_hashes)
    return F.aggregate(
        hashed,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.pmod(h * F.lit(ai).cast("long") + F.lit(bi).cast("long"), p)
                    for ai, bi in zip(a, b)
                ]
            ),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_bands(
    signature: Column, bands: int, rows_per_band: int, portable: bool = False
) -> Column:
    """Hash each band of the signature → array<struct<band:int,bucket:long>>.
    ``portable=True`` buckets with :func:`portable_hash60` over the same
    comma-joined band string (DuckDB: ``string_agg(v, ',' ORDER BY i)``)."""
    bucket_hash = portable_hash60 if portable else F.xxhash64
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                bucket_hash(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(signature, b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two DISTINCT arrays (set semantics — callers
    must pre-``array_distinct``; doing it here would rebuild the hash set
    per pair). |∪| = |a|+|b|-|∩| avoids materializing the union array.
    The duplicated ``array_intersect`` collapses under codegen CSE; hot
    paths split the projection instead (see ``minhash_lsh_duplicates``)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter / F.greatest(union, F.lit(1))


def minhash_lsh_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 4,
    shingle_size: int = 5,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int | None = 10_000,
    portable: bool = False,
    prune_verify_texts: bool = False,
) -> DataFrame:
    """Candidate generation via LSH banding + exact-Jaccard verification.
    ``prune_verify_texts``: shingle only candidate rows in the verify
    stage — enable at scale / low duplicate density (see
    ``_exact_verify`` for the measured tradeoff; output identical).

    Returns duplicate pairs ``(id_a, id_b, jaccard_sim)`` with id_a < id_b.
    Scale shape: signatures are per-row expressions; candidates come from a
    shuffle on (band, bucket); verification re-shingles only candidate
    rows. No corpus-wide cross join anywhere.

    Band geometry matters: with ``b`` bands of ``r`` rows the candidate
    threshold is ≈ (1/b)^(1/r); the default 4×8 (≈0.84) is tuned to
    ``jaccard_threshold=0.8``. Wider bands (8×4 ≈ 0.59) flood the
    verification stage with sub-threshold pairs — 50×+ more candidates on
    corpora with moderate background similarity.

    ``max_bucket_size`` is the skew guard: a degenerate bucket of m rows
    (boilerplate/empty docs) contributes m² pairs, so one hot key can
    dominate the whole job at scale. Buckets above the cap are dropped
    (their members are still candidates via their other bands); set None
    to disable. The cap also bounds the per-task memory of the
    collect_list below (≤ cap × (8 B id + num_hashes × 8 B sig) per
    group row — ~2.7 MB at the 10 k default).

    Candidate generation is ONE groupBy (band, bucket) → collect_list →
    per-bucket pair expansion with the signature screen evaluated
    inline, replacing the earlier index self-join. The self-join shape
    needed the band index persisted (both join sides), a window-function
    bucket-size cap (extra shuffle), two join exchanges, and a separate
    screen pass over materialized (sig_a, sig_b) pairs; this shape is a
    single shuffle of (id, sig) keyed by bucket, the cap is a free
    ``size(ms)`` filter, and sub-threshold pairs die inside the
    projection without ever being exchanged. Pair volume is identical
    (Σ|bucket|², the LSH guarantee); only the machinery around it is
    gone — with the verify-stage spread fix below, the full pipeline
    measured 3.5 s → 2.3 s at sf0.1 with byte-identical output.

    Shingling is ONE persisted pass (r13, guide §2.3: compute the
    expensive projection once, shuffle/reuse the small thing): the
    corpus used to be shingled THREE times — once feeding the
    signature aggregation and once per verify join side (Spark
    compiles the two sides independently). char_shingles dominates
    executor CPU (~200 ops/char), so the shared ``(id, sh)`` persist
    cut the query's task-time ~35% (24 s → 15.5 s at sf0.1) and wall
    −7% at 32 cores / −14% at 8 cores (interleaved same-JVM A/B; the
    gap widens as cores drop because the saved CPU stops hiding behind
    idle threads — the driver's low-core scaling run is the case that
    matters). The round-4 "persist is neutral-to-worse" measurement
    (see ``_exact_verify``) only ever persisted the VERIFY pass (2→1);
    sharing with the signature pass too (3→1) is what flips the sign.
    The persist is an intermediate of THIS job, released by the
    harness's ``clearCache()`` between attempts — never a cross-run
    cache.
    """
    from pyspark import StorageLevel

    sh = register_persisted(
        _spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                char_shingles(F.col(text_col), shingle_size)
            ).alias("sh"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    grouped = minhash_bucket_groups(
        df, text_col, id_col, num_hashes, bands, shingle_size,
        max_bucket_size, portable=portable, _shingled=sh,
    )
    est = _bucket_pair_screen(grouped, num_hashes, jaccard_threshold)
    return _exact_verify(
        est, None, shingle_size, jaccard_threshold,
        prune_texts=prune_verify_texts, shingled=sh,
    )


def minhash_bucket_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 4,
    shingle_size: int = 5,
    max_bucket_size: int | None = 10_000,
    portable: bool = False,
    _shingled: DataFrame | None = None,
) -> DataFrame:
    """LSH buckets with ≥2 members as ``(band, bucket, ms)`` where ``ms``
    is the member list ``array<struct<id, sig>>`` — the candidate-pair
    source for ``minhash_lsh_duplicates``. Singleton buckets (the vast
    majority of a real corpus) are filtered before any pair math;
    buckets above ``max_bucket_size`` are dropped (skew guard).
    ``_shingled`` passes a pre-computed shingle frame through to
    :func:`minhash_band_index` (see there)."""
    banded = minhash_band_index(
        df, text_col, id_col, num_hashes, bands, shingle_size,
        portable=portable, _shingled=_shingled,
    )
    # Sentinel signatures ([p]*num_hashes — empty/null/too-short texts,
    # which all share one bucket per band) can never verify: no shingles
    # ⇒ exact Jaccard 0. Dropping them BEFORE grouping is output-
    # identical and removes the m² degenerate-bucket pair expansion that
    # a boilerplate-heavy corpus would otherwise feed the screen (the
    # skew cap only bounded it). min-hashes are pmod(·, p) < p, so
    # sig[0] = p identifies the sentinel exactly.
    banded = banded.filter(F.element_at("sig", 1) < F.lit(_MINHASH_PRIME).cast("long"))
    grouped = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list(F.struct("id", "sig")).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    if max_bucket_size is not None:
        grouped = grouped.filter(F.size("ms") <= max_bucket_size)
    return grouped


def _bucket_pair_screen(
    grouped: DataFrame, num_hashes: int, jaccard_threshold: float
) -> DataFrame:
    """Expand each bucket's member list into ordered pairs (id_a < id_b)
    with the signature-agreement screen applied INLINE: the fraction of
    agreeing signature components estimates Jaccard with
    σ ≈ √(j(1-j)/k), so a 3σ margin below the threshold rejects only
    (almost surely) sub-threshold pairs — 32 long comparisons per pair,
    evaluated inside the projection, so rejected pairs are never
    exchanged. dropDuplicates dedups pairs that collide in several
    bands (the screen is deterministic per pair, so screening before
    the dedup is equivalent and strictly cheaper)."""
    est_margin = 3.0 * (0.25 / num_hashes) ** 0.5
    ms = F.array_sort(F.col("ms"))  # struct sort ⇒ by id (first field)
    pair_arr = F.flatten(
        F.transform(
            ms,
            lambda a, i: F.transform(
                F.slice(ms, i + F.lit(2), F.greatest(F.size(ms) - i - 1, F.lit(0))),
                lambda b: F.struct(
                    a["id"].alias("id_a"),
                    b["id"].alias("id_b"),
                    (
                        F.size(
                            F.filter(
                                F.zip_with(a["sig"], b["sig"], lambda x, y: x == y),
                                lambda e: e,
                            )
                        )
                        / F.lit(num_hashes)
                    ).alias("est"),
                ),
            ),
        )
    )
    return (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b", "p.est")
        # id_a < id_b (not just ≤, which the array_sort already gives):
        # an input carrying duplicate ids — the library operator has no
        # unique-id precondition; only the catalog entries canonicalize —
        # puts two rows of the same id in one bucket, and the positional
        # expansion would emit a (x, x) self-pair with est = 1 that
        # survives exact verify. The old self-join's a.id < b.id guard,
        # restored as a free filter inside the same projection stage.
        .filter(
            (F.col("est") >= jaccard_threshold - est_margin)
            & (F.col("id_a") < F.col("id_b"))
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 4,
    shingle_size: int = 5,
    portable: bool = False,
    _shingled: DataFrame | None = None,
) -> DataFrame:
    """LSH band index rows ``(id, sig, band, bucket)`` for a corpus —
    ``bands`` rows per document. Materialize once (ideally bucketed on
    (band, bucket) via ``write_bucketed``) and reuse with
    ``minhash_lsh_duplicates_incremental`` so history is never re-hashed.

    Banding shuffles only (id, sig, band, bucket) — never the document
    text: at 100 TB the banded exchange is |corpus|×bands small rows.

    The signature is computed as a CODEGEN'D AGGREGATION, not the
    per-row higher-order fold of :func:`minhash_signature`: explode the
    distinct shingles, hash each once in a scalar projection, then
    groupBy(id) with ``num_hashes`` ``min()`` aggregates — one per
    permutation — exactly the shape the DuckDB oracle spells
    (``MIN((h0*pa+pb) %% p) ... GROUP BY id, i``). Spark NEVER
    whole-stage-codegens higher-order functions (aggregate/zip_with/
    transform are interpreted, with per-element boxing and array
    allocation): the HOF fold burned ~21 s of executor CPU at sf0.1
    where this aggregation burns ~2 s for bit-identical signatures.
    The extra groupBy(id) exchange is |corpus| rows of 32 longs — and
    map-side partial aggregation collapses the exploded shingles before
    the shuffle, so the exchange is the same size the old shape paid
    anyway. Empty/too-short texts (no shingles) keep the
    ``[p]*num_hashes`` sentinel signature via explode_outer + coalesce
    (the base hash is NULL-guarded — xxhash64(NULL)=42 would otherwise
    defeat the coalesce); null texts get the same sentinel — either way
    those rows die at the signature screen or the exact verify (a
    null/empty text has no shingles, so its verified Jaccard can never
    reach the threshold), matching the oracle, which never emits them.

    Duplicate ids: the groupBy(id) aggregation produces ONE signature
    per id over the UNION of all its rows' shingles (the old per-row
    fold emitted one signature per row). The operator has no unique-id
    precondition, so this per-id semantics is the contract: rows
    sharing an id are treated as one logical document — matching the
    oracle's ``GROUP BY id`` shape (pinned in
    tests/test_dedup_similarity.py::test_minhash_duplicate_ids_*).

    ``_shingled`` (private, for :func:`minhash_lsh_duplicates`): a
    pre-computed — typically persisted — frame ``(id, sh)`` where
    ``sh = array_distinct(char_shingles(text_col, shingle_size))`` over
    the same rows; when given, the shingle projection here is skipped
    and the exploded source reads it instead (bit-identical values: the
    expression tree is the same, only evaluated once and shared with
    the verify stage).
    """
    rows_per_band = num_hashes // bands
    a, b = _perm_constants(num_hashes)
    p = _MINHASH_PRIME
    base = portable_hash60 if portable else F.xxhash64

    if _shingled is not None:
        exploded = _shingled.select(
            "id", F.explode_outer("sh").alias("__s")
        )
    else:
        exploded = _spread(df).select(
            F.col(id_col).alias("id"),
            F.explode_outer(
                F.array_distinct(char_shingles(F.col(text_col), shingle_size))
            ).alias("__s"),
        )
    h0 = (
        exploded
        .select(
            "id",
            # NULL must PROPAGATE so the sentinel coalesce below fires:
            # xxhash64(NULL) = 42 (a real hash, not NULL), so without the
            # guard every empty/null-text row would share a 42-derived
            # signature instead of the documented [p]*num_hashes sentinel
            # (divergence from minhash_signature's per-row fold; round-7
            # advisor find). Final pairs were unchanged (such pairs die
            # at exact verify), but degenerate docs co-bucketed with
            # est=1.0 — with max_bucket_size=None that passed m² junk
            # pairs into verify.
            F.when(
                F.col("__s").isNotNull(),
                F.pmod(base(F.col("__s")), F.lit(p).cast("long")),
            ).alias("__h0"),
        )
    )
    # The wide expression lists below are built as SQL strings (one
    # F.expr round-trip each) rather than Column-combinator trees: every
    # F.* call is a py4j socket round-trip (~0.4 ms), and the
    # combinator form of these 32 aggregates + 4 band buckets costs
    # ~450 round-trips ≈ 0.3 s of driver time PER PLAN BUILD. The parsed
    # expressions are node-for-node identical.
    sig_rows = h0.groupBy("id").agg(
        *[
            F.expr(
                f"coalesce(min(pmod(__h0 * {ai}L + {bi}L, {p}L)), {p}L) AS __m{i}"
            )
            for i, (ai, bi) in enumerate(zip(a, b))
        ]
    )
    # Banding straight off the aggregate's flat columns (no element_at
    # on an intermediate array — column references are free), sig
    # re-assembled as an array only for the output schema.
    def _bucket_sql(bb: int) -> str:
        cols = ", ".join(
            f"CAST(__m{bb * rows_per_band + r} AS STRING)"
            for r in range(rows_per_band)
        )
        joined = f"concat_ws(',', {cols})"
        if portable:
            return f"CAST(conv(substring(md5({joined}), 1, 15), 16, 10) AS BIGINT)"
        return f"xxhash64({joined})"

    band_arr = F.expr(
        "array("
        + ", ".join(
            f"named_struct('band', {bb}, 'bucket', {_bucket_sql(bb)})"
            for bb in range(bands)
        )
        + ")"
    )
    sig = F.expr("array(" + ", ".join(f"__m{i}" for i in range(num_hashes)) + ")")
    return sig_rows.select(
        "id", sig.alias("sig"), F.explode(band_arr).alias("bb")
    ).select("id", "sig", "bb.band", "bb.bucket")


def _cap_buckets(banded: DataFrame, max_bucket_size: int | None) -> DataFrame:
    if max_bucket_size is None:
        return banded
    w = Window.partitionBy("band", "bucket")
    return (
        banded.withColumn("__bsz", F.count("*").over(w))
        .filter(F.col("__bsz") <= max_bucket_size)
        .drop("__bsz")
    )


def _signature_screen(
    cand: DataFrame, num_hashes: int, jaccard_threshold: float
) -> DataFrame:
    """Cheap screen before exact verification: the fraction of agreeing
    signature components estimates Jaccard with σ ≈ √(j(1-j)/k) (≈0.07
    for k=32), so a 3σ margin below the threshold rejects only pairs
    that are (almost surely) sub-threshold — comparing 32 longs instead
    of intersecting ~|text| shingle sets per candidate."""
    est_margin = 3.0 * (0.25 / num_hashes) ** 0.5
    return (
        cand.withColumn(
            "__est",
            F.size(
                F.filter(
                    F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                    lambda eq: eq,
                )
            )
            / F.lit(num_hashes),
        )
        .filter(F.col("__est") >= jaccard_threshold - est_margin)
        .select("id_a", "id_b")
    )


def _exact_verify(
    est: DataFrame,
    texts: DataFrame | None,
    shingle_size: int,
    jaccard_threshold: float,
    prune_texts: bool = False,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs against a
    ``(id, text)`` source covering every candidate id.

    The text source is ``_spread`` before shingling — the round-5 find:
    a small/singly-split text source flows into the verify joins as ONE
    partition, and when AQE broadcasts that side the shingle expressions
    are evaluated inside the broadcast-exchange collect — serially, on
    one core, once per join side. Measured at sf0.1: 3.4 s → 0.6 s for
    the identical 253-pair output just by repartitioning the text
    before the shingle projection. At 100 TB the scan has thousands of
    splits and the spread is a no-op; it exists for the small-corpus /
    collapsed-partition edge (same trap as SCALING.md §Parallelism
    pinning).

    ``prune_texts`` picks the verify shape by CANDIDATE DENSITY:

    - False (default): shingle the full text source and hash-join the
      candidate stream through it. Costs two full shingle passes (one
      per join side — Spark compiles them independently), but
      everything pipelines and nothing blocks. Right when candidates ≈
      corpus (the 7.7%-duplicate bench corpus).
    - True: persist the candidate pairs, semi-join the text source down
      to candidate ids, shingle only those. Right when candidates ≪
      corpus — the 100 TB production case (dup density a few %), where
      two FULL shingle passes are the dominant cost and the pruned scan
      touches a tiny fraction of rows. The pair OUTPUT is identical
      either way (asserted in tests/test_dedup_similarity.py).

    ``shingled``: a pre-computed (typically persisted) ``(id, sh)``
    frame covering every candidate id; when given, ``texts`` is ignored
    and no shingling happens here at all. This is how
    ``minhash_lsh_duplicates`` shares ONE shingle pass between its
    signature aggregation and both verify join sides (r13; see its
    docstring for the measurement).

    Measured non-lever (round 4, sf0.1, re-confirmed after the spread
    fix): persisting the shingled frame *only for this stage* (2 passes
    → 1) is neutral-to-worse end-to-end — the persist is a blocking
    stage that serializes ~8M small shingle strings, while the
    "duplicate" shingle passes run concurrently on otherwise-idle
    threads. Sharing with the SIGNATURE pass too (3 → 1, the
    ``shingled`` param) is what flips the sign — don't re-add a
    verify-only persist without re-measuring."""
    from pyspark import StorageLevel

    if shingled is None:
        texts = _spread(texts)
        if prune_texts:
            est = register_persisted(est.persist(StorageLevel.MEMORY_AND_DISK))
            cand_ids = (
                est.select(F.col("id_a").alias("id"))
                .unionByName(est.select(F.col("id_b").alias("id")))
                .distinct()
            )
            # no broadcast hint: candidate ids can be huge at 100 TB; AQE
            # downgrades the semi-join to broadcast when they are small.
            texts = texts.join(cand_ids, "id", "left_semi")
        shingled = texts.select(
            "id",
            F.array_distinct(char_shingles(F.col("text"), shingle_size)).alias("sh"),
        )
    elif prune_texts:
        # the shingles are already computed (shared with the signature
        # stage), so pruning buys only a smaller join side, not skipped
        # shingle work
        est = register_persisted(est.persist(StorageLevel.MEMORY_AND_DISK))
        cand_ids = (
            est.select(F.col("id_a").alias("id"))
            .unionByName(est.select(F.col("id_b").alias("id")))
            .distinct()
        )
        shingled = shingled.join(cand_ids, "id", "left_semi")
    return (
        est.join(shingled.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(shingled.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        # intersection size in its own projection: referenced twice below,
        # so CollapseProject keeps it evaluated once per pair.
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).alias("__i"),
            (F.size(F.col("sh_a")) + F.size(F.col("sh_b"))).alias("__t"),
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__i") / F.greatest(F.col("__t") - F.col("__i"), F.lit(1)), 6
            ).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= jaccard_threshold)
    )


def minhash_lsh_duplicates_incremental(
    new_df: DataFrame,
    index: DataFrame,
    history_texts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 4,
    shingle_size: int = 5,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int | None = 10_000,
    portable: bool = False,
    prune_verify_texts: bool = True,
) -> DataFrame:
    """Dedup an INGEST BATCH against an already-materialized LSH band
    index (``minhash_band_index`` output) plus within itself — the
    daily-ingestion pattern: history is never re-hashed, and its text is
    scanned only for the candidate ids the band join surfaces.

    Returns pairs (id_a, id_b, jaccard_sim), id_a < id_b, where at least
    one side is a new document. Ids must be unique across history ∪ new —
    in particular history and batch id sets are assumed DISJOINT. That
    assumption also scopes the r13 screen-before-dedup rewrite's
    "output identical" claim (r13 advice): an id present in BOTH the
    index and the batch with edited text carries two different
    signatures through ``union_banded``, and the screen-first order
    keeps a pair if ANY of its signature combinations passes where the
    old dedup-first order screened one arbitrary surviving occurrence.
    Under the documented disjointness precondition each id has exactly
    one signature and the two orders are bit-identical.
    ``history_texts`` is the historical ``(id_col, text_col)`` source used
    for exact verification (candidate-id join → pruned/bloom-filtered
    scan, not a full pass). The hash parameters MUST match the ones the
    index was built with.

    Equivalence: on history H and batch N, this returns exactly the
    pairs of ``minhash_lsh_duplicates(H ∪ N)`` that touch N (modulo the
    bucket cap, which here applies to the union's bucket sizes the same
    way). Proven in tests.

    The NEW batch is shingled ONCE (r13, the ``minhash_lsh_duplicates``
    shared-persist lesson applied to the incremental path): one
    persisted ``(id, sh)`` frame feeds the band-index signature
    aggregation (``_shingled=``) and both exact-verify join sides, where
    the batch previously re-shingled at the band index and once per
    verify side for its candidate rows. History shingling is unchanged:
    its shingles are not stored in the index, so the verify stage still
    shingles exactly the candidate history rows (semi-join pruned when
    ``prune_verify_texts``). Values are bit-identical — the same
    expression tree, evaluated once.
    """
    from pyspark import StorageLevel

    sh_new = register_persisted(
        _spread(new_df)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                char_shingles(F.col(text_col), shingle_size)
            ).alias("sh"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    new_banded = minhash_band_index(
        new_df, text_col, id_col, num_hashes, bands, shingle_size,
        portable=portable, _shingled=sh_new,
    ).withColumn("__new", F.lit(True))
    # persisted for the same two-sided-self-join reason as
    # minhash_lsh_duplicates: without it the batch is re-hashed (and the
    # index re-read) once per join side
    union_banded = register_persisted(_cap_buckets(
        index.select("id", "sig", "band", "bucket").withColumn("__new", F.lit(False)).unionByName(new_banded),
        max_bucket_size,
    ).persist(StorageLevel.MEMORY_AND_DISK))
    a = union_banded.alias("a")
    b = union_banded.alias("b")
    # The signature screen runs BEFORE the pair dedup (r13, the
    # simhash/LSH-top-k lesson, guide §2.3): the agreement estimate is
    # a pure function of the two signatures, so every band-duplicate
    # occurrence of a pair carries the identical value and filtering
    # first is output-identical. The dedup exchange then carries
    # (id_a, id_b) — 16 B of screen-passing ids — instead of two
    # 32-long signature arrays (~530 B) for EVERY co-bucketed pair,
    # and the dedup itself becomes a hash-aggregable distinct (array
    # first() buffers forced a SortAggregate + extra Sort before).
    est = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.__new") | F.col("b.__new")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .transform(lambda c: _signature_screen(c, num_hashes, jaccard_threshold))
        .dropDuplicates(["id_a", "id_b"])
    )
    # The verify side is assembled HERE (not via _exact_verify's
    # texts/prune path) so the batch half reads the sh_new persist while
    # the history half keeps the prune-then-shingle order:
    # prune_verify_texts defaults True HERE (unlike the full-corpus
    # path) — every candidate pair touches the small batch, so
    # candidates ≪ history and the semi-join makes "history text is
    # scanned only for candidate ids" literally true.
    hist_texts = _spread(
        history_texts.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    )
    if prune_verify_texts:
        est = register_persisted(est.persist(StorageLevel.MEMORY_AND_DISK))
        cand_ids = (
            est.select(F.col("id_a").alias("id"))
            .unionByName(est.select(F.col("id_b").alias("id")))
            .distinct()
        )
        # no broadcast hint: candidate ids can be huge at 100 TB; AQE
        # downgrades the semi-join to broadcast when they are small.
        hist_texts = hist_texts.join(cand_ids, "id", "left_semi")
    shingled = hist_texts.select(
        "id",
        F.array_distinct(char_shingles(F.col("text"), shingle_size)).alias("sh"),
    ).unionByName(sh_new)
    return _exact_verify(
        est, None, shingle_size, jaccard_threshold, shingled=shingled
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Drop every row that near-duplicates a smaller-id row (keep-first)."""
    pairs = minhash_lsh_duplicates(df, text_col, id_col, **kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def simhash(text: Column | str, hash_bits: int = 64, portable: bool = False) -> Column:
    """SimHash signature over whitespace tokens → bigint.

    Per-bit vote: each token's xxhash64 contributes +1/-1 to each bit
    position; the signature sets bits with positive totals.
    ``portable=True`` votes on :func:`portable_hash60` instead — callers
    should then pass ``hash_bits=60`` (the portable hash has 60 random
    bits; bits 60-63 of it are always zero and would vote uniformly).

    USE :func:`simhash_duplicates`'s aggregation-shaped signature for
    corpus-scale work: this per-row fold is a higher-order function, and
    HOFs are never whole-stage-codegen'd — the lambda evaluates
    interpreted with two ``hash_bits``-wide array allocations per token
    (see ``minhash_band_index`` for the measured 10× CPU gap of the same
    pattern). The Column form remains for single-row / streaming-callback
    contexts where a groupBy is unavailable."""
    base = portable_hash60 if portable else F.xxhash64
    hashed = F.transform(tokens(text), lambda t: base(t))
    init = F.array_repeat(F.lit(0), hash_bits)

    def token_bits(h: Column) -> Column:
        # h is a lambda variable (already-computed long) — the 64 shifts
        # are cheap integer ops, not 64 re-hashes of the token string.
        return F.array(
            *[
                (F.shiftright(h, p).bitwiseAND(F.lit(1)) * 2 - 1).cast("int")
                for p in range(hash_bits)
            ]
        )

    votes = F.aggregate(
        hashed, init, lambda acc, h: F.zip_with(acc, token_bits(h), lambda x, y: x + y)
    )
    # bit p of the signature = (votes[p] > 0); powers[63] is the sign bit.
    powers = F.array(
        *[
            F.lit(1 << p if p < 63 else -(1 << 63)).cast("long")
            for p in range(hash_bits)
        ]
    )
    masked = F.zip_with(
        votes, powers, lambda v, pw: F.when(v > 0, pw).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(
        masked, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x)
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4×16-bit chunks;
    pairs within hamming ≤ 3 share at least one chunk (pigeonhole), so the
    candidate join is an equi-join on (chunk_idx, chunk_value).

    ``portable=True`` uses 60-bit md5-derived signatures (chunks of
    16/16/16/12 effective bits — the pigeonhole argument is unchanged:
    4 chunks still partition every signature bit, so hamming ≤ 3 implies
    a shared chunk) and replays fully in DuckDB SQL.

    The signature is computed as a CODEGEN'D AGGREGATION (explode
    tokens → one hash per row → ``hash_bits`` signed-vote ``sum()``
    aggregates → one bit-assembly projection), not the per-row
    :func:`simhash` fold — the same interpreted-HOF rewrite as
    ``minhash_band_index``: the fold allocates two ``hash_bits``-wide
    arrays per token and evaluates ~3×``hash_bits`` boxed ops outside
    codegen. Identical signatures (the vote math is expression-for-
    expression the same); null-text rows are filtered up front — under
    the fold they got a null signature, and null chunk values never
    equi-join, so they produced no pairs either way."""
    hash_bits = 60 if portable else 64
    base = portable_hash60 if portable else F.xxhash64
    toks = (
        _spread(df)
        .filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("__t"),
        )
        .select("id", base(F.col("__t")).alias("__h"))
    )
    votes = toks.groupBy("id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(__h, {p}) & 1) = 1"
                f" THEN 1 ELSE -1 END) AS __v{p}"
            )
            for p in range(hash_bits)
        ]
    )
    # powers are disjoint bits, so bitwise OR assembles the signature;
    # the sign bit's literal must dodge the -2^63 parse overflow
    terms = " | ".join(
        f"(CASE WHEN __v{p} > 0 THEN "
        + (f"{1 << p}L" if p < 63 else "(-9223372036854775807L - 1L)")
        + " ELSE 0L END)"
        for p in range(hash_bits)
    )
    sigs = votes.select("id", F.expr(f"CAST({terms} AS BIGINT)").alias("sig"))
    from pyspark import StorageLevel

    chunks = register_persisted(sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned(F.col("sig"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    # persisted: the chunk index feeds both self-join sides; without it
    # every document's signature (a full token-hash vote fold) is
    # computed twice (no ReusedExchange fires — see minhash note)
    ).select("id", "sig", "c.chunk_idx", "c.chunk_val").persist(
        StorageLevel.MEMORY_AND_DISK
    ))
    a, b = chunks.alias("a"), chunks.alias("b")
    # Hamming is computed and FILTERED before the pair dedup (r13, guide
    # §2.3 — don't shuffle what you throw away): it is a pure function
    # of the two signatures, so every duplicate occurrence of a pair
    # carries the identical value, and filtering first removes ALL
    # occurrences of failing pairs — the dedup exchange then carries
    # only the (rare) qualifying pairs instead of every 16-bit chunk
    # collision. Output identical: same distinct pairs, same hamming.
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list[str] | None = None,
    threshold: float = 0.5,
    shingle_n: int | None = None,
) -> DataFrame:
    """Token-set Jaccard similarity pairs, blocked by ``block_cols`` to
    bound the pair space (at scale ALWAYS block — unblocked is |corpus|²;
    the LSH variants above are the unblocked-scale path).

    ``shingle_n``: compare distinct word n-gram SHINGLES instead of
    distinct tokens. Order-sensitive, so it still discriminates where
    token-set Jaccard saturates — under a small vocabulary any two long
    documents share nearly all distinct tokens (measured on the synthetic
    corpus: 31-word vocab, 444 of ~125k unrelated doc pairs at token-set
    J ≥ 0.98), while their 5-gram shingle overlap stays ≈ 0."""
    from ..functions.text import token_shingles

    df = _spread(df)
    elems = (
        token_shingles(F.col(text_col), shingle_n)
        if shingle_n
        else tokens(F.col(text_col))
    )
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in (block_cols or [])],
        F.array_distinct(elems).alias("tokset"),
    ).withColumn("sz", F.size("tokset"))
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    for c in block_cols or []:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # Size filter (set-similarity-join standard): J(a,b) ≤ min/max of the
    # set sizes, so J ≥ t requires min ≥ t·max. Evaluated in the join
    # condition on two ints, it prunes the bulk of the blocked pair space
    # before any O(|set|) intersection is attempted — same output, the
    # oracle is unchanged.
    cond = cond & (
        F.least(F.col("a.sz"), F.col("b.sz"))
        >= F.greatest(F.col("a.sz"), F.col("b.sz")) * F.lit(threshold)
    )
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jaccard(F.col("a.tokset"), F.col("b.tokset")), 6).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def ngram_jaccard_pairs_indexed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int | None = None,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT token-set Jaccard pairs ≥ threshold with NO blocking column
    and no quadratic pair space — the prefix-filtering set-similarity
    join (PPJoin family, Xiao et al., WWW'08), on DataFrames.

    Guarantee (with the size filter min ≥ t·max): any qualifying pair
    overlaps in ≥ ⌈t·|a|⌉ tokens, so the two sets MUST share a token in
    each other's first ``|x| − ⌈t·|x|⌉ + 1`` tokens under one global
    order. Ordering tokens rarest-first makes those prefix tokens the
    most selective ones, so the inverted-index join stays sparse.

    Plan shape (all linear in corpus size except the candidate join):
    tokenize → global token-frequency rank (one agg over exploded
    tokens) → re-assemble each doc's rank-sorted token array → explode
    only the PREFIX into postings → equi-self-join on token (+ size
    filter) → exact verify on the full sorted arrays. Output is
    identical to the quadratic formulation — same oracle.

    The rank-sorted index (``sorted_docs``) and its prefix postings are
    PERSISTED: the index is consumed five times downstream (both sides of
    the candidate self-join re-derive postings; the verify step joins the
    full arrays back twice) and the paper's model is precisely "build the
    index once, probe it". Without persistence Spark re-runs the
    tokenize→rank→sort pipeline per consumer — 3× wall-clock on a
    duplicate-heavy corpus. MEMORY_AND_DISK so a 100 TB index spills
    instead of OOMing; callers that keep the result lazy inherit the
    materialized index on first action.
    """
    sorted_docs, postings, bnames, parallelism = _ppjoin_index(
        df, text_col, id_col, threshold, shingle_n, block_cols
    )
    cand = _ppjoin_candidates(postings, bnames, threshold, parallelism)
    return _ppjoin_verify(sorted_docs, cand, threshold)


def _ppjoin_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    shingle_n: int | None = None,
    block_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame, list[str], int]:
    """The PPJoin index build: (sorted_docs, prefix postings, block-col
    names, parallelism). Split out of :func:`ngram_jaccard_pairs_indexed`
    (pure code motion) so ``tools/scale_probe.py`` can count the
    operator's ACTUAL intermediate volumes — not a replica's — across
    scale factors. Both returned frames are persisted; callers that
    materialize them own the unpersist."""
    from pyspark import StorageLevel

    from ..functions.text import token_shingles

    # ``shingle_n``: compare distinct word-SHINGLE sets instead of token
    # sets (order-sensitive — discriminates where token-set Jaccard
    # saturates; see ngram_jaccard_pairs). ``block_cols``: candidate
    # pairs must also agree on these columns — the PPJoin pruning is
    # per-pair, so adding block equality to the candidate join yields
    # exactly the blocked-quadratic output (a same-block qualifying pair
    # still shares a prefix element and passes the size filter; NULL
    # blocks pair with nobody under equality, same as the join form).
    elems = (
        token_shingles(F.col(text_col), shingle_n)
        if shingle_n
        else tokens(F.col(text_col))
    )
    bcols = [F.col(c).alias(f"__b{i}") for i, c in enumerate(block_cols or [])]
    bnames = [f"__b{i}" for i in range(len(block_cols or []))]
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        F.array_distinct(elems).alias("toks"),
        *bcols,
    )
    exploded = base.select(
        "id", *bnames, F.explode_outer("toks").alias("tok")
    ).filter(F.col("tok").isNotNull())
    # PACKED vocab rank (SURVEY §7.3's W2 hazard, closed round 6): a
    # bare Window.orderBy(cnt, tok) over the vocabulary serializes the
    # whole vocab through ONE partition — invisible at sf0.1, fatal on a
    # 100 TB corpus with a billions-row vocabulary. And a naive
    # partitionBy(cnt) two-phase just moves the hazard: the cnt=1
    # (hapax) bucket IS most of a web-scale vocab. Instead of a global
    # row_number the rank is PACKED bits — clipped count class, an
    # xxhash salt (uniform over hapax tokens, so every window partition
    # is |vocab|/n_salts), and a within-(class, salt) row_number:
    # injective by construction, ascending in count class, computed with
    # ONE balanced window and no stats pass, offsets join, or
    # single-partition exchange anywhere. Rarest-first survives at
    # count-class granularity, which is all the selectivity heuristic
    # can use — within one frequency class every token is equally
    # selective (counts above the 2^21 clip are all saturated stopwords).
    # The OUTPUT PAIRS are provably unchanged under any consistent total
    # order: the prefix-filter guarantee is order-agnostic, and the
    # verified Jaccard is invariant under any token bijection (tests pin
    # equality against the unblocked quadratic formulation).
    # Bit budget: cls ≤ 2^21 shifted 41 ⇒ < 2^62; salt < 2^10 shifted
    # 30; row_number needs < 2^30 per (cls, salt) group ⇒ headroom for a
    # ~10^12-token vocabulary at 1024 salts.
    n_salts = 1024  # fixed, so ranks are deterministic across cluster sizes
    counts = exploded.groupBy("tok").agg(F.count("*").alias("cnt"))
    keyed = counts.select(
        "tok",
        F.least(F.col("cnt"), F.lit(1 << 21)).cast("long").alias("__cls"),
        F.pmod(F.xxhash64("tok"), F.lit(n_salts)).cast("long").alias("__salt"),
    )
    in_w = Window.partitionBy("__cls", "__salt").orderBy("tok")
    ranks = keyed.select(
        "tok",
        (
            F.col("__cls") * F.lit(1 << 41).cast("long")
            + F.col("__salt") * F.lit(1 << 30).cast("long")
            + F.row_number().over(in_w)
        ).alias("rank"),
    )
    # Dictionary-encode: every token is replaced by its packed frequency
    # RANK and all downstream work — postings join key, prefix slice,
    # verify intersection — runs on array<bigint> instead of
    # array<string>. Ranks sort ascending = rarest-first (no struct sort
    # needed), integer equality beats UTF8 comparison in the hot verify
    # loop, and the shuffled index bytes shrink by ~the average token
    # length. Jaccard is invariant under the bijection, so the output is
    # unchanged.
    # The explicit repartition pins the CACHED index at cluster
    # parallelism: the index is small in BYTES (ranks, not strings), so
    # AQE would coalesce the groupBy's shuffle to one partition — and
    # every downstream stage that probes the cache (candidate join,
    # prefix explode) would inherit that single partition and serialize.
    # The repartition sits BELOW the groupBy (r13): HashPartitioning(id)
    # satisfies the aggregate's ClusteredDistribution(id), so ONE
    # explicit exchange both feeds the aggregate and pins the cache —
    # the former shape paid an ENSURE_REQUIREMENTS exchange for the
    # groupBy and then a second REPARTITION_BY_NUM of its output.
    # Shuffle volume is unchanged: collect_list has no map-side
    # collapse, so the aggregate exchange always carried every
    # (id, rank) row anyway.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sorted_docs = register_persisted(
        exploded.join(ranks, "tok")
        .repartition(parallelism, "id")
        .groupBy("id")
        .agg(
            F.array_sort(F.collect_list("rank")).alias("toks"),
            *[F.first(bn).alias(bn) for bn in bnames],
        )
        .withColumn("sz", F.size("toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")).cast("int") + 1
    postings = register_persisted(
        sorted_docs.select(
            "id",
            "sz",
            *bnames,
            F.explode_outer(F.slice("toks", 1, prefix_len)).alias("tok"),
        )
        .filter(F.col("tok").isNotNull())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return sorted_docs, postings, bnames, parallelism


def _ppjoin_candidates(
    postings: DataFrame,
    bnames: list[str],
    threshold: float,
    parallelism: int,
) -> DataFrame:
    """Prefix-postings equi-self-join → distinct candidate id pairs
    (the Σ-postings² bound the SCALING.md claim is about)."""
    a, b = postings.alias("a"), postings.alias("b")
    cand_cond = (
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.id") < F.col("b.id"))
        & (
            F.least(F.col("a.sz"), F.col("b.sz"))
            >= F.greatest(F.col("a.sz"), F.col("b.sz")) * F.lit(threshold)
        )
    )
    for bn in bnames:
        cand_cond = cand_cond & (F.col(f"a.{bn}") == F.col(f"b.{bn}"))
    cand = (
        a.join(b, cand_cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        # dropDuplicates FIRST: its partial aggregation collapses raw
        # join pairs map-side (8.8M raw -> 3.7M distinct at sf0.1), so
        # the exchange ships distinct pairs only — re-ordering it below
        # the repartition was tried in r13 and shuffles 2.7x the bytes
        # for no stage saving at scale (guide §2.3, aggregate before
        # you shuffle).
        .dropDuplicates(["id_a", "id_b"])
        # The candidate rows are two longs — tiny bytes-per-row — so AQE
        # coalesces the dedup shuffle toward ONE partition, which then
        # serializes the expensive per-pair array_intersect verify onto a
        # single core (measured 38 s of single-task CPU at sf0.1; 4× the
        # whole rest of the query). Explicitly repartitioning by id_a keeps
        # the verify data-parallel AND pre-clusters the first verify join
        # key. Bytes are the wrong coalesce signal when downstream
        # cost-per-row dwarfs row width.
        .repartition(parallelism, "id_a")
    )
    return cand


def _ppjoin_verify(
    sorted_docs: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against the
    rank-encoded token arrays."""
    return (
        cand.join(
            sorted_docs.select(
                F.col("id").alias("id_a"),
                F.col("toks").alias("t_a"),
                F.col("sz").alias("__sz_a"),
            ),
            "id_a",
        )
        .join(
            sorted_docs.select(
                F.col("id").alias("id_b"),
                F.col("toks").alias("t_b"),
                F.col("sz").alias("__sz_b"),
            ),
            "id_b",
        )
        # |A∪B| = |A|+|B|−|A∩B| — the sizes already ride the index, so the
        # verify computes ONE array_intersect per candidate instead of an
        # intersect AND a union (array_union re-hashes both arrays); on a
        # dense corpus the verify touches millions of candidates, so
        # halving the per-pair array work matters.
        .withColumn("__inter", F.size(F.array_intersect("t_a", "t_b")))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__inter")
                / (F.col("__sz_a") + F.col("__sz_b") - F.col("__inter")),
                6,
            ).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def winnow_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 12,
    window: int = 8,
    threshold: float = 0.5,
    max_postings: int | None = 1_000,
    portable: bool = False,
) -> DataFrame:
    """Containment pairs via winnowing (rolling-hash) fingerprints: the
    MOSS pipeline on DataFrames. Returns ``(id_a, id_b, containment)``
    with id_a < id_b, containment = |shared fingerprints| /
    min(|fp_a|, |fp_b|) — asymmetric-length-robust, so a document heavily
    quoting a shorter one still scores high (unlike Jaccard).

    Scale shape: fingerprints are a per-row expression; the inverted
    index (explode → equi-self-join on the hash) shuffles (id, n, hash)
    postings — winnowing selects ~2/(window+1) of the k-gram hashes, so
    the posting volume is a fraction of a shingle-level index. The
    per-pair overlap count is a groupBy with map-side partial
    aggregation. ``max_postings`` drops degenerate hashes shared by more
    than that many docs (boilerplate guard — one hot fingerprint would
    otherwise contribute |docs|² join rows); affected docs still pair
    through their other fingerprints.

    ``k`` sets gram discriminativeness and is the knob that keeps the
    inverted index sparse: short grams (k≈5) are common English substrings
    (" the ") shared across unrelated docs, whose m-doc postings each cost
    m² join rows — 20× slowdowns on ordinary corpora. k=12 (MOSS uses
    25-50 for source code) makes incidental collisions rare while any
    ≥ window+k-1 = 19-char shared run still guarantees a match.
    """
    from ..functions.text import _let

    # NULL ids dropped AT THE GATE (r09 five-way-stack find, seed 59):
    # this is the catalog's ONE pair generator that expands pairs
    # POSITIONALLY (array_sort + slice) instead of via a join or an
    # id_a < id_b comparison, so nothing downstream would drop a NULL-id
    # row the way SQL's NULL-propagating `<` does everywhere else
    # (minhash's screen filter, bottomk's join condition, the oracles'
    # a.doc_id < b.doc_id). A pair with an unattributable member is
    # unactionable output; the divergence stayed latent until a NULL-id
    # doc carried a HOT (skew-planted) text — unique-text NULL-id docs
    # never cross the containment threshold with anyone.
    fps = _spread(df.filter(F.col(id_col).isNotNull())).select(
        F.col(id_col).alias("id"),
        winnow_fingerprints(F.col(text_col), k, window, portable=portable).alias("fp"),
    )
    # explode_OUTER, not explode: for an inner Generate over a computed
    # array attribute, InferFiltersFromGenerate adds `size(fp)>0 AND
    # isnotnull(fp)` below, and predicate pushdown inlines the WHOLE
    # fingerprint expression into that filter — 3 evaluations per row,
    # interpreted (20× on this query). Outer generates are exempt from
    # the rule; the null rows from empty arrays are dropped by a cheap
    # filter on the OUTPUT column instead.
    posted = fps.select(
        "id", F.size("fp").alias("n"), F.explode_outer("fp").alias("h")
    ).filter(F.col("h").isNotNull())
    # Join-free pair generation: gather each hash's posting list with ONE
    # groupBy shuffle and emit the C(m,2) pairs from higher-order
    # expressions — a postings SELF-JOIN would shuffle the 5M-row index
    # twice more and re-partition it. The cap bounds the worst per-row
    # expansion at C(max_postings, 2) structs.
    #
    # The parallelism pin sits BEFORE the groupBy, as the groupBy's own
    # exchange: collect_list partials don't shrink data, so an explicit
    # hash-repartition on `h` costs the same shuffle bytes the groupBy
    # would, the aggregation reuses the partitioning (no second
    # exchange), and — the point — the reduce side keeps 32-way
    # parallelism instead of AQE's byte-based coalesce. The earlier
    # shape (groupBy, then repartition the lists) let AQE coalesce the
    # agg to 5 partitions, and those 5 tasks then re-serialized the
    # whole 119 MB posting-list table into the pin exchange — 3.4 s of
    # the query's 6.7 s at sf0.1; this shape runs agg + expansion +
    # overlap-count partials in ONE 32-wide stage (measured 5.1 → 3.9 s
    # end-to-end, identical output; the remaining floor is fingerprint
    # hashing plus the inherent 8M-pair overlap-count exchange, both
    # already 32-wide). Cost-per-row dwarfs row width here (each list
    # fans out C(|ps|,2) structs), which is exactly when byte-based
    # coalescing picks wrong.
    posted = posted.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "h"
    )
    lists = posted.groupBy("h").agg(F.collect_list(F.struct("id", "n")).alias("ps"))
    # singleton posting lists generate no pairs — drop them before the
    # combo expansion (~30% of hashes on a typical corpus)
    lists = lists.filter(F.size("ps") >= 2)
    if max_postings is not None:
        lists = lists.filter(F.size("ps") <= max_postings)

    combos = _let(
        F.array_sort("ps"),  # canonical id order → id_a < id_b by slicing
        lambda arr: F.flatten(
            F.transform(
                arr,
                lambda x, i: F.transform(
                    F.slice(
                        arr, i + 2, F.greatest(F.size(arr) - i - 1, F.lit(0))
                    ),
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        y["id"].alias("id_b"),
                        x["n"].alias("n_a"),
                        y["n"].alias("n_b"),
                    ),
                ),
            )
        ),
    )
    return (
        # explode_outer: same InferFiltersFromGenerate guard as above —
        # an inner explode would re-expand the C(m,2) combo array twice
        # more inside an inferred size/isnotnull filter
        lists.select(F.explode_outer(combos).alias("pr"))
        .filter(F.col("pr").isNotNull())
        .groupBy("pr.id_a", "pr.id_b", "pr.n_a", "pr.n_b")
        .agg(F.count("*").alias("shared"))
        .select(
            "id_a",
            "id_b",
            # portable mode publishes the UNROUNDED ratio: identical ints
            # divide to identical doubles on every engine, while
            # ROUND(double, 6) does NOT cross engines (binary-exact
            # ratios like 1/128 sit exactly on the half boundary —
            # Spark HALF_UPs, DuckDB half-evens; see SCALING.md round-3
            # field notes). Default keeps the rounded human-facing form.
            (
                F.col("shared") / F.greatest(F.least("n_a", "n_b"), F.lit(1))
                if portable
                else F.round(
                    F.col("shared") / F.greatest(F.least("n_a", "n_b"), F.lit(1)), 6
                )
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def bottomk_sketch_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    k: int = 16,
    min_shared: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs via a bottom-k sketch with a
    PORTABLE hash (md5 hex, lexicographic min) — the original
    oracle-checkable member of the sketch-dedup family (MinHash/SimHash
    have since gained ``portable=True`` modes built on the same idea).

    The sketch trades k permutations for ONE hash function + the k
    smallest distinct values. NB the pairing statistic |B_k(A) ∩ B_k(B)|
    is a RECALL-ORIENTED CANDIDATE score, not Cohen's bottom-k Jaccard
    estimator (which intersects each sketch with B_k(A ∪ B)); counting
    raw sketch overlap OVERestimates Jaccard, so ``min_shared`` maps to a
    somewhat lower true-similarity cutoff than min_shared/k suggests —
    fine for candidate generation feeding an exact verify, not for
    reporting similarity values. md5 exists bit-identically in Spark and
    DuckDB, so the ENTIRE pipeline — sketch, inverted index, shared-hash
    counts — has a full value oracle.

    Scale shape = the LSH-band pattern: explode each doc's ≤ k sketch
    hashes into postings, equi-self-join on the hash (only docs sharing
    a bottom hash ever meet — no |corpus|² pair space), count shared
    hashes per pair with map-side combine. ``max_bucket_size`` caps
    degenerate hash buckets (boilerplate guard, same lever as winnow's
    ``max_postings``); leave None when the output must match the
    capless oracle.
    """
    from ..functions.text import token_shingles

    sk = _spread(df).select(
        F.col(id_col).alias("id"),
        F.slice(
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        token_shingles(F.col(text_col), shingle_n),
                        lambda s: F.md5(s),
                    )
                )
            ),
            1,
            k,
        ).alias("sketch"),
    )
    from pyspark import StorageLevel

    # persisted: postings feed both self-join sides (same recompute trap
    # as the minhash band index — the md5 sketch would be built twice)
    posts = register_persisted(
        sk.select("id", F.explode("sketch").alias("h")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    if max_bucket_size is not None:
        hot = (
            posts.groupBy("h")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_bucket_size)
            .select("h")
        )
        posts = posts.join(F.broadcast(hot), "h", "left_anti")
    a, b = posts.alias("a"), posts.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared_hashes"))
        .filter(F.col("shared_hashes") >= min_shared)
    )


def paragraph_exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_regex: str = r"\.[ ]+",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide exact SEGMENT dedup, first-occurrence-wins — the
    C4/RefinedWeb scrub pass one granularity below document dedup:
    boilerplate sentences/paragraphs repeated across documents are
    flagged everywhere except their first appearance, so a writer can
    drop them without touching unique content.

    Returns one row per kept segment:
    ``(id_col, para_idx, para_hash, is_dup)`` where ``para_idx`` is the
    0-based segment position within its document, ``para_hash`` the md5
    of the trimmed segment (md5 so the ledger is portable to any engine
    — same reasoning as ``fingerprint_md5``), and ``is_dup`` = 1 for
    every occurrence after the global first. "First" is the total order
    (id, para_idx); callers must feed unique ids (the catalog entry
    id-canonicalizes).

    ``split_regex`` defaults to sentence boundaries ('. ' runs) because
    the bench corpus is single-line; real corpora pass '\\n{2,}' for
    true paragraphs — the plan is identical.

    Scale shape: segmentation is a per-row explode in the scan stage;
    the ONLY shuffle is the window on ``para_hash`` — and it carries
    (hash, id, idx), never the segment text, so shuffle bytes are ~48 B
    per segment at any corpus size. Hash-partitioned window, no global
    sort. A degenerate hash (empty-ish boilerplate) concentrates one
    key; the rows are 3 fixed-width columns, so even a 10⁸-occurrence
    segment is a few GB in one partition — cap-able upstream by a
    pre-filter on segment length if a corpus demands it."""
    from ..functions.text import WS_TRIM_CHARS

    segs = _spread(df).select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), split_regex)).alias("para_idx", "p"),
    )
    hashed = (
        segs.select(
            "id",
            "para_idx",
            F.btrim(F.col("p"), F.lit(WS_TRIM_CHARS)).alias("p"),
        )
        .filter(F.length("p") >= min_chars)
        .select("id", "para_idx", F.md5("p").alias("para_hash"))
    )
    w = Window.partitionBy("para_hash").orderBy(
        F.asc_nulls_first("id"), F.asc_nulls_first("para_idx")
    )
    return hashed.select(
        F.col("id").alias(id_col),
        "para_idx",
        "para_hash",
        (F.row_number().over(w) > 1).cast("int").alias("is_dup"),
    )


def substring_gram_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    portable: bool = False,
) -> DataFrame:
    """The ExactSubstr posting set: one ``(id, pos, h)`` row per token
    ``k``-gram of every attributable document (``h`` = xxhash64, or md5
    under ``portable``). Exactly |tokens| − (k−1)·|docs| rows — LINEAR
    in the corpus; the basis of :func:`duplicated_substring_spans` and
    the quantity ``tools/scale_probe.py`` measures for the linearity
    claim. Factored out so the probe measures the operator's REAL
    intermediate, not a reimplementation."""
    from ..functions.text import _let

    def gram_hash(joined: Column) -> Column:
        return F.md5(joined) if portable else F.xxhash64(joined)

    toks_col = tokens(F.col(text_col))
    grams = _let(
        toks_col,
        lambda toks: _let(
            F.size(toks) - F.lit(k - 1),
            lambda num: F.when(
                num < 1, F.array().cast("array<struct<pos:int,h:string>>")
                if portable
                else F.array().cast("array<struct<pos:int,h:bigint>>"),
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), num),
                    lambda i: F.struct(
                        i.cast("int").alias("pos"),
                        gram_hash(
                            F.concat_ws(
                                " ",
                                *[
                                    F.element_at(toks, (i + j).cast("int"))
                                    for j in range(k)
                                ],
                            )
                        ).alias("h"),
                    ),
                )
            ),
        ),
    )
    return (
        _spread(df)
        .filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
        .select("id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )


def duplicated_substring_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_span_tokens: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Exact-substring dedup spans (after the ExactSubstr formulation of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): per document, maximal token spans built from the
    cross-document duplicated ``k``-grams. The precise invariant: every
    token of an emitted span is COVERED by at least one k-gram that also
    occurs in some OTHER document (coverage, not per-gram: the ≤k island
    merge below deliberately bridges two duplicated runs across a short
    unique gap whose tokens still sit inside boundary duplicated grams —
    tests/test_dedup_similarity.py::
    test_duplicated_substring_spans_island_merge_boundaries pins a span
    containing grams found nowhere else; no token OUTSIDE every duplicated gram is ever
    emitted, so the scrub never cuts unique text). Returns
    ``(doc_id, span_start, span_end, span_tokens)`` — 1-based inclusive
    token indices — one row per maximal island of at least
    ``min_span_tokens`` tokens (default ``2*k``). Downstream, a curation
    pass cuts these spans out of the training text instead of dropping
    whole near-duplicate documents.

    The paper builds a corpus-wide suffix array — inherently sequential
    and memory-resident. The distributed formulation is k-gram postings:
    a span of ≥ ``min_span`` tokens shared verbatim between two documents
    contains only shared k-grams, so (1) hash every k-gram (one explode,
    |tokens| rows), (2) keep hashes seen in ≥2 DISTINCT documents (one
    groupBy with map-side partial count-distinct), (3) per document,
    merge surviving gram positions whose starts are ≤ k apart into
    maximal islands (one per-document window — bounded by document
    length, never corpus size) and emit each island's [min_pos,
    max_pos+k-1] token range. Spans shorter than ``min_span_tokens`` are
    chance k-gram collisions between unrelated texts, the same false-
    positive class the paper's 50-token threshold exists for.

    Differences from the paper's verbatim-span semantics, all
    deliberate: span boundaries are k-gram-aligned (a true shared
    substring of length L is reported as the span of its L-k+1 grams —
    identical token range; a shared run SHORTER than k is invisible,
    which the min-span threshold would discard anyway); "duplicated"
    means cross-document (a phrase repeated only within one document is
    kept — within-doc repetition is ``text_repetition_rules``' job);
    and a span need not be ONE verbatim shared substring — the island
    merge can join several (possibly different-partner) duplicated runs
    separated by ≤k-token gaps into one span, trading the paper's
    per-substring precision for a single per-document window instead of
    a partner-aligned matching.

    ``portable=True`` hashes grams with md5 (bit-replayable by any
    engine with md5 — the DuckDB value oracle runs this mode);
    production default is xxhash64 (one pass, no string materialization
    of the hash). Jaccard-invariance does NOT apply here — the span
    positions depend only on hash EQUALITY, so any injective hash gives
    identical output; the mode changes bytes shuffled, not semantics.

    Scale shape: shuffle volume is (hash, id, pos) postings — fixed-width
    rows regardless of document size; the duplicated-hash filter is a
    semi join (no posting list materializes); the island window
    partitions by document. A boilerplate k-gram shared by millions of
    docs costs |docs| posting rows (linear, not quadratic — nothing ever
    pairs postings). Rows with a NULL id or NULL text are dropped at the
    gate: spans are keyed output (an unattributable span cannot be cut
    from anything) and a NULL text has no tokens.
    """
    if min_span_tokens is None:
        min_span_tokens = 2 * k

    postings = substring_gram_postings(df, text_col, id_col, k, portable)
    dup_hashes = (
        postings.groupBy("h")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dup_pos = postings.join(dup_hashes, "h", "left_semi")
    w = Window.partitionBy("id").orderBy("pos")
    islands = dup_pos.select(
        "id",
        "pos",
        F.sum(
            F.when(
                F.lag("pos").over(w).isNull()
                | (F.col("pos") > F.lag("pos").over(w) + k),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    return (
        islands.groupBy("id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_span_tokens)
    )


def remove_duplicated_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply :func:`duplicated_substring_spans`: cut each document's
    duplicated token ranges out and return the scrubbed text — the
    second half of the ExactSubstr flow (Lee et al. REMOVE the spans
    rather than dropping documents, preserving each document's unique
    remainder). Returns ``(id_col, clean_text, n_tokens_kept,
    n_tokens_removed)`` for every identified input document.

    ``clean_text`` is the space-joined KEPT tokens — a tokenized
    reconstruction, so original whitespace runs normalize to single
    spaces even in untouched documents (the tokenizer already defines
    token identity everywhere else in the pipeline, so downstream
    consumers see a consistent surface). A document whose every token is
    duplicated scrubs to NULL (nothing left — the caller drops it), as
    does a NULL input text (no tokens to keep).

    Scale shape: spans collapse to one small per-document array
    (collect_list behind the same id shuffle any groupBy pays); the cut
    itself is a per-row higher-order filter — position-indexed lambda
    against the span array, no explode of the corpus tokens, no second
    shuffle. Span counts per document are bounded by |tokens|/k, so the
    collected array can never exceed the document's own size class.
    """
    from ..functions.text import _let

    spans_by_doc = spans.groupBy(F.col(id_col).alias("__sid")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__sp")
    )
    joined = df.filter(F.col(id_col).isNotNull()).join(
        spans_by_doc, F.col(id_col) == F.col("__sid"), "left"
    )
    sp = F.coalesce(
        F.col("__sp"),
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
    )
    kept_col = _let(
        tokens(F.col(text_col)),
        lambda toks: _let(
            F.filter(
                toks,
                lambda x, i: ~F.exists(
                    sp,
                    lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
                ),
            ),
            lambda kept: F.struct(
                F.when(F.size(kept) > 0, F.concat_ws(" ", kept)).alias("clean_text"),
                F.coalesce(F.size(kept), F.lit(0)).alias("n_tokens_kept"),
                F.coalesce(F.size(toks) - F.size(kept), F.lit(0)).alias(
                    "n_tokens_removed"
                ),
            ),
        ),
    )
    return joined.select(id_col, kept_col.alias("__k")).select(
        id_col,
        F.col("__k.clean_text").alias("clean_text"),
        F.col("__k.n_tokens_kept").alias("n_tokens_kept"),
        F.col("__k.n_tokens_removed").alias("n_tokens_removed"),
    )
