"""Deterministic frequency-dictionary encoding ("categorify").

The reference uses 16× MLlib ``StringIndexer(handleInvalid="keep")`` in a
Pipeline (``data_processing/batch_processing/batch_process_Silver_to_Gold.py:106-130``):
value → dense index ordered by descending frequency, unseen values get an
extra index. StringIndexer's tie order among equal-frequency values is
unspecified, which makes results oracle-unfriendly; this native version pins
the tie-break (count desc, value asc) so the mapping is a pure function of
the data — DuckDB-checkable and identical between batch and streaming.

Scale: the dictionary for a column is at most |distinct values| rows —
small relative to the fact table (Ali-CCP's biggest vocab is item_id at
1.8M, reference ``:161-162``) — so encode joins are broadcast-able. The fit
is a groupBy (map-side partial aggregation) + a rank over the *aggregated*
(small) table, not over the raw data. Since round 7 the rank itself is the
two-phase bucket/offset shape (``operators/ranks.py::two_phase_rank``) —
no ``Exchange SinglePartition`` even over the vocab table, so the fit
survives web-scale vocabularies (user_id-class columns whose |vocab|
grows with the data) instead of merely "small enough" ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranks import register_persisted


def _rank_counts(counts: DataFrame, persist: bool = True) -> DataFrame:
    """(value, cnt) → (value, index): 0-based contiguous indices ordered
    by (count desc, value asc — NULLS FIRST, matching ``asc()``), via the
    two-phase global rank (no single-partition window; descending count
    enters the ascending composite key negated). ``persist=False`` when
    ``counts`` already sits on a cached upstream (the grouping-sets fit)
    — double-caching each slice would only burn memory."""
    from .ranks import two_phase_rank

    ranked = two_phase_rank(
        counts,
        [(-F.col("cnt")).cast("long").alias("neg_cnt"), F.col("value")],
        rank_col="__rank",
        persist=persist,
    )
    return ranked.select("value", (F.col("__rank") - F.lit(1)).cast("int").alias("index"))


def fit_dictionary(df: DataFrame, column: str) -> DataFrame:
    """Fit a frequency dictionary: ``(value, index)``, index 0-based,
    ordered by (count desc, value asc) — deterministic StringIndexer.

    The rank runs over the aggregated vocab table (|vocab| rows), not the
    input; partial aggregation happens map-side before the shuffle, and
    the rank is two-phase — no vocab-sized single-partition window.
    """
    counts = df.groupBy(F.col(column).alias("value")).agg(F.count("*").alias("cnt"))
    return _rank_counts(counts)


def fit_dictionaries(df: DataFrame, columns: list[str]) -> dict[str, DataFrame]:
    """Fit dictionaries for many columns in ONE pass over ``df``: a
    GROUPING SETS aggregation ((c1), (c2), …, (ck)) computes every
    column's vocabulary counts in a single scan (Spark expands grouping
    sets map-side), where per-column ``fit_dictionary`` calls would scan
    the input k times — at 100 TB the difference between one read of the
    fact table and sixteen. The combined (Σ|vocab_i|)-row result is
    persisted (every column's slice consumes it); each slice then ranks
    under the same (count desc, value asc) window as the single-column
    fit, so the output dictionaries are IDENTICAL to k independent fits
    (asserted in tests/test_gold_and_sampling.py)."""
    if len(columns) == 1:
        return {columns[0]: fit_dictionary(df, columns[0])}
    from pyspark import StorageLevel

    k = len(columns)
    agg = register_persisted(
        df.groupingSets(
            [[F.col(c)] for c in columns], *[F.col(c) for c in columns]
        )
        .agg(F.count("*").alias("cnt"), F.grouping_id().alias("__gid"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out = {}
    for i, c in enumerate(columns):
        # grouping_id bit j (MSB-first over the grouping columns) is set
        # when column j is aggregated away → the {c_i}-only set has every
        # bit set except bit i
        gid = sum(1 << (k - 1 - j) for j in range(k) if j != i)
        counts = agg.filter(F.col("__gid") == gid).select(
            F.col(c).alias("value"), "cnt"
        )
        out[c] = _rank_counts(counts, persist=False)
    return out


def encode_with_dictionaries(
    df: DataFrame,
    dictionaries: dict[str, DataFrame],
    unseen: str = "keep",
) -> DataFrame:
    """Replace each column with its dictionary index via broadcast joins.

    ``unseen="keep"`` mirrors ``StringIndexer(handleInvalid="keep")``:
    values absent from the dictionary get index = |vocab| (one extra
    bucket). ``unseen="null"`` leaves them NULL.

    Each dictionary is broadcast — no shuffle of the fact table, the joins
    pipeline inside one stage. The |vocab| fallback index for unseen values
    is a lazy one-row aggregate cross-joined (broadcast) onto the fact —
    NOT a driver-side ``count()``, which would run every dictionary's fit
    lineage eagerly at plan-build time (one extra job per column, then the
    broadcast re-runs it).
    """
    out = df
    for col, d in dictionaries.items():
        dict_renamed = F.broadcast(
            d.select(
                F.col("value").alias(f"__{col}_value"),
                F.col("index").alias(f"__{col}_index"),
            )
        )
        out = out.join(
            dict_renamed, out[col] == dict_renamed[f"__{col}_value"], "left"
        )
        idx = F.col(f"__{col}_index")
        if unseen == "keep":
            vocab = F.broadcast(
                d.agg(F.count("*").cast("int").alias(f"__{col}_vocab"))
            )
            out = out.crossJoin(vocab)
            idx = F.coalesce(idx, F.col(f"__{col}_vocab"))
        out = (
            out.drop(col, f"__{col}_value")
            .withColumn(col, idx.cast("int"))
            .drop(f"__{col}_index", f"__{col}_vocab")
        )
    return out


def decode_with_dictionary(
    df: DataFrame, column: str, dictionary: DataFrame
) -> DataFrame:
    """Inverse mapping index→value (dictionary decode)."""
    d = F.broadcast(
        dictionary.select(
            F.col("index").alias(f"__{column}_index"),
            F.col("value").alias(f"__{column}_value"),
        )
    )
    out = df.join(d, df[column] == d[f"__{column}_index"], "left")
    return (
        out.drop(column, f"__{column}_index")
        .withColumnRenamed(f"__{column}_value", column)
    )


def fit_dictionary_mllib(df: DataFrame, column: str) -> DataFrame:
    """MLlib-compat fit (SURVEY §7.3): the same ``(value, index)``
    dictionary shape, produced by an actual
    ``StringIndexer(handleInvalid="keep", stringOrderType="frequencyDesc")``
    fit — the estimator the reference pipelines 16× of
    (``batch_process_Silver_to_Gold.py:106-121``).

    Use this ONLY when an existing MLlib artifact must be matched
    bit-for-bit: StringIndexer's order among equal-frequency values is
    unspecified (JVM hash order), so its output is not a pure function of
    the data and cannot be oracle-checked. ``fit_dictionary`` (count desc,
    value asc — pinned) is the default path; where all frequencies are
    distinct the two agree exactly (asserted in tests).

    The fitted labels are |vocab|-sized driver metadata (same payload an
    MLlib PipelineModel persists), re-emitted as a DataFrame so
    ``encode_with_dictionaries`` / ``decode_with_dictionary`` work
    unchanged on either fit path.
    """
    from pyspark.ml.feature import StringIndexer

    model = StringIndexer(
        inputCol=column,
        outputCol="__idx",
        handleInvalid="keep",
        stringOrderType="frequencyDesc",
    ).fit(df.select(column).where(F.col(column).isNotNull()))
    labels = model.labelsArray[0]
    return df.sparkSession.createDataFrame(
        [(v, i) for i, v in enumerate(labels)], schema="value string, index int"
    )
