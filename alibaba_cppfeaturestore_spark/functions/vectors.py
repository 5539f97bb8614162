"""Vector math over array<float> embedding columns — native expressions.

dot / norm / cosine via ``zip_with`` + ``aggregate`` higher-order
functions: per-row JVM expressions, no UDF, no shuffle. Elements are cast
to double before arithmetic so results are reproducible against the DuckDB
oracle (float32 accumulation order would not be).

For very wide vectors (>4k dims) a vectorized pandas_udf over Arrow
batches becomes faster than the expression tree; these helpers are the
default path for the 64-1024-dim range typical of text embeddings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))
