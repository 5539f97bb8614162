"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 + the
LLM-pipeline extensions, as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — matching DuckDB SQL for the driver's differential gate;
omitted only for hash-algorithm-specific / streaming-stateful ops where no
portable SQL equivalent exists (driver records rows-only checks for those).

Implementations live in ``alibaba_cppfeaturestore_spark.plans.catalog``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shaped
    scan→filter→agg over lineitem."""
    return QUERIES["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
