"""Incremental aggregate maintenance: materialized-view upkeep without
re-scanning the base table.

Engine extra (the reference recomputes its gold aggregates per batch
run); the pattern is the standard partial-aggregate algebra that every
incremental view maintenance system (and Spark's own partial aggregation)
relies on: keep per-key PARTIAL state (sum/count/min/max; avg as
sum+count), fold new rows into partials, merge partials with a groupBy —
never touch already-aggregated history.

At 100 TB this is the difference between an O(|delta|) nightly update
and an O(|base|) full recompute. Deletions need either a full recompute
of affected keys or invertible measures only (sum/count subtract; min/max
do NOT) — callers with deletes should route them as retraction rows and
restrict measures to invertible ones, noted on ``merge_agg_state``.

Exactness: partial-merge reordering changes double-addition order, so
for cross-engine (or recompute-vs-incremental) bit-equality feed DECIMAL
measure columns — same associativity argument as
``operators/timeseries.py::rollup_cascade``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VALID = {"sum", "count", "min", "max", "avg"}


def _partial_aggs(measures: dict[str, tuple[str, str]], src_is_raw: bool):
    aggs = [(F.count("*") if src_is_raw else F.sum("n")).alias("n")]
    for out, (col, agg) in measures.items():
        if agg == "avg":
            aggs += [
                F.sum(col if src_is_raw else f"__{out}_sum").alias(f"__{out}_sum"),
                (F.count(col) if src_is_raw else F.sum(f"__{out}_cnt")).alias(
                    f"__{out}_cnt"
                ),
            ]
        else:
            fn = F.sum if (agg in ("count", "sum") and not src_is_raw) else getattr(F, agg)
            aggs.append(fn(col if src_is_raw else out).alias(out))
    return aggs


def build_agg_state(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Per-key partial-aggregate state from raw rows: one row per key with
    ``n`` plus each measure's partial columns (avg carried as sum+count).
    ``measures`` maps output column → (input column, agg),
    agg ∈ {sum, count, min, max, avg}."""
    bad = {a for _, a in measures.values()} - _VALID
    if bad:
        raise ValueError(f"unsupported aggs: {bad}")
    return df.groupBy(*keys).agg(*_partial_aggs(measures, src_is_raw=True))


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold a raw-row ``delta`` into an existing state: aggregate the
    delta to partials, union, re-aggregate partials. Cost is
    O(|delta| + |affected state rows|) — the base table is never
    re-read. Insert-only (min/max partials are not invertible; route
    deletions as key-scoped recomputes)."""
    delta_state = build_agg_state(delta, keys, measures)
    return (
        state.unionByName(delta_state)
        .groupBy(*keys)
        .agg(*_partial_aggs(measures, src_is_raw=False))
    )


def finalize_agg_state(
    state: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Resolve partial state to final values (avg = sum/count, cast to
    double before the division — IEEE-deterministic for decimal partials,
    see module docstring). Output: keys, ``n``, one column per measure."""
    out = state
    for name, (_, agg) in measures.items():
        if agg == "avg":
            out = out.withColumn(
                name,
                F.col(f"__{name}_sum").cast("double") / F.col(f"__{name}_cnt"),
            ).drop(f"__{name}_sum", f"__{name}_cnt")
    return out.select(*keys, "n", *measures.keys())
