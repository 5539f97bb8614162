"""Executable documentation of the cross-engine NaN facts the
finite-domain policy rests on (established by freeze repro in round 8).

If a DuckDB or Spark upgrade changes any of these, the finite-domain
rationale in functions/vectors.py, plans/catalog._EMB_FINITE_WHERE and
SCALING.md must be re-derived — these tests fail first.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

NAN, INF = float("nan"), float("inf")


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_both_engines_treat_nan_as_greatest(spark, con):
    # NOT an engine disagreement: NaN >= 0 and NaN == NaN are TRUE on
    # both, and NaN sorts greatest — so LSH bucket signs (dot >= 0)
    # AGREE for NaN inputs on both engines.
    row = (
        spark.createDataFrame([(NAN,)], "x double")
        .select(
            (F.col("x") >= 0).alias("ge0"),
            (F.col("x") == F.lit(NAN)).alias("eqnan"),
        )
        .collect()[0]
    )
    assert row.ge0 is True and row.eqnan is True
    d_ge0, d_eq = con.execute(
        "SELECT 'NaN'::DOUBLE >= 0, 'NaN'::DOUBLE = 'NaN'::DOUBLE"
    ).fetchone()
    assert d_ge0 is True and d_eq is True
    # DESC ordering: NaN first on both
    s_first = (
        spark.createDataFrame([(1.0,), (NAN,), (2.0,)], "x double")
        .orderBy(F.desc("x"))
        .collect()[0].x
    )
    assert math.isnan(s_first)
    d_first = con.execute(
        "SELECT x FROM (VALUES (1.0), ('NaN'::DOUBLE), (2.0)) t(x) ORDER BY x DESC"
    ).fetchall()[0][0]
    assert math.isnan(d_first)


def test_duckdb_cosine_clamps_where_spark_arithmetic_yields_nan(spark, con):
    # THE actual divergence mechanism behind the vector finite-domain
    # policy: DuckDB's list_cosine_similarity clamps to [-1, 1] and
    # returns -1.0 for non-finite inputs (corrupt vectors silently sink
    # to the bottom of a DESC top-k), while the engine's explicit IEEE
    # expressions yield NaN (corrupt vectors DOMINATE a Spark DESC
    # top-k, NaN being greatest). Exclusion at ingestion is the only
    # portable policy.
    from alibaba_cppfeaturestore_spark.functions.vectors import cosine_similarity

    for bad, lit in [([NAN, 1.0], "'NaN'::DOUBLE"), ([INF, 1.0], "'Infinity'::DOUBLE")]:
        (d_cos,) = con.execute(
            f"SELECT list_cosine_similarity([{lit}, 1.0], [1.0, 1.0]::DOUBLE[])"
        ).fetchone()
        assert d_cos == -1.0, d_cos
        s_cos = (
            spark.createDataFrame([(bad, [1.0, 1.0])], "a array<double>, b array<double>")
            .select(cosine_similarity(F.col("a"), F.col("b")).alias("c"))
            .collect()[0].c
        )
        assert math.isnan(s_cos)


def test_greatest_least_skip_nulls_on_both_engines(spark, con):
    # the histogram-clamp trap (r08 review find): GREATEST(NULL, 0) is 0
    # — NULLs are SKIPPED, not propagated — on BOTH engines, so any
    # "excluded -> NULL" value fed through an unguarded clamp silently
    # resurrects. The null-check must wrap the clamp.
    row = (
        spark.createDataFrame([(None,)], "x int")
        .select(F.greatest(F.col("x"), F.lit(0)).alias("g"))
        .collect()[0]
    )
    assert row.g == 0
    (d_g,) = con.execute("SELECT GREATEST(NULL::INT, 0)").fetchone()
    assert d_g == 0


def test_duckdb_list_filter_drops_null_elements(spark, con):
    # why is_finite_vector needs the explicit isNotNull leg: DuckDB's
    # list_filter silently drops elements where the predicate is NULL,
    # so `NOT isfinite(x)` alone would KEEP a vector with a NULL
    # component while Spark's forall (NULL result) would DROP it. The
    # oracle spelling adds `x IS NULL OR`, the Spark predicate adds
    # isNotNull — aligned by construction, asserted here.
    (kept,) = con.execute(
        "SELECT len(list_filter([1.0, NULL]::DOUBLE[], x -> NOT isfinite(x))) = 0"
    ).fetchone()
    assert kept is True  # the NULL element vanished from the filter
    (excluded,) = con.execute(
        "SELECT len(list_filter([1.0, NULL]::DOUBLE[], x -> x IS NULL OR NOT isfinite(x))) = 0"
    ).fetchone()
    assert excluded is False  # the aligned spelling catches it
    from alibaba_cppfeaturestore_spark.functions.vectors import is_finite_vector

    row = (
        spark.createDataFrame([([1.0, None],)], "v array<double>")
        .select(is_finite_vector(F.col("v")).alias("f"))
        .collect()[0]
    )
    assert row.f is False
