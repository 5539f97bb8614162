"""Sink adapters: parquet/delta, csv export, jdbc, kafka, partitioned writes.

Covers the reference's sink surface (SURVEY.md §2.1 S3-S5, S7). File sizing
is declarative (``spark.sql.files.maxRecordsPerFile`` in the session
factory) instead of the reference's count()+repartition() two-job dance
(``batch_process_Bronze_to_Silver.py:308-312``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .readers import delta_available


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "ignore",
    partition_by: list[str] | None = None,
    fmt: str | None = None,
) -> None:
    """Idempotent table write (reference S3: Delta ``mode("ignore")``).
    Uses Delta when available, parquet otherwise. ``partition_by`` gives
    partition pruning on downstream reads — choose low-cardinality columns
    (the reference partitions its stream output by user_group, 13 values).
    """
    use_fmt = fmt or ("delta" if delta_available(df.sparkSession) else "parquet")
    writer = df.write.format(use_fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def export_csv_sample(df: DataFrame, path: str, n: int) -> None:
    """Single-file CSV export of a bounded sample (reference S5,
    ``generate_example_data.py:71-72``). coalesce(1) is safe only because
    ``limit(n)`` bounds the data first."""
    df.limit(n).coalesce(1).write.option("header", True).mode("overwrite").csv(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink (reference S4, ``batch_process_Silver_to_Gold.py:166-172``).
    Executors open parallel connections — repartition to a sane connection
    count (≤32) before calling at scale."""
    df.write.jdbc(url=url, table=table, mode=mode, properties=properties or {})
