"""Data-quality constraint checks: uniqueness and referential integrity.

The audit primitives that gate a training-data build (alongside
``aggregates.profile_table`` and ``diff.snapshot_diff``): both return
the VIOLATING rows (empty = constraint holds) rather than a boolean, so
pipelines can quarantine offenders instead of failing blind.

Scale shape: uniqueness is one groupBy on the key (map-side partial
count); referential integrity is a left-anti join (AQE/broadcast
applies). Nothing scans twice; pair with
``sources.writers.write_with_metrics`` to collect pass/fail counts
inside the write job itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups appearing more than once: ``(*keys, n_rows)`` per
    violated key — empty iff ``keys`` is a unique key."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    fk: list[str] | dict[str, str],
) -> DataFrame:
    """Child rows whose foreign key has no parent (orphans). ``fk`` is
    either shared column names or a child→parent column mapping. NULL
    foreign keys are not violations (SQL FK semantics)."""
    mapping = {c: c for c in fk} if isinstance(fk, list) else fk
    parent_keys = parent.select(
        *[F.col(p).alias(c) for c, p in mapping.items()]
    ).distinct()
    not_null = None
    for c in mapping:
        cond = F.col(c).isNotNull()
        not_null = cond if not_null is None else not_null & cond
    return child.filter(not_null).join(parent_keys, list(mapping), "left_anti")
