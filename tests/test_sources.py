"""Source/sink adapter tests (SURVEY.md §2.1): csv round-trip, idempotent
table writes, csv export, local-collection source."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from alibaba_cppfeaturestore_spark.sources.readers import (
    from_collection,
    read_csv,
    read_parquet,
)
from alibaba_cppfeaturestore_spark.sources.writers import (
    export_csv_sample,
    write_table,
)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    path = str(tmp_path / "csv_rt")
    df = from_collection(
        spark, [(1, "a"), (2, "b"), (3, None)], schema="id INT, name STRING"
    )
    df.write.option("header", True).csv(path)
    schema = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("name", T.StringType())]
    )
    back = read_csv(spark, path, schema=schema, header=True)
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b"), (3, None)}


def test_write_table_mode_ignore_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df1 = from_collection(spark, [(1,)], schema="v INT")
    df2 = from_collection(spark, [(2,)], schema="v INT")
    write_table(df1, path, mode="ignore")
    write_table(df2, path, mode="ignore")  # second write skipped
    assert [r["v"] for r in read_parquet(spark, path).collect()] == [1]


def test_write_table_partition_by_prunes(spark, tmp_path):
    path = str(tmp_path / "part")
    df = from_collection(spark, [(1, "x"), (2, "y")], schema="v INT, grp STRING")
    write_table(df, path, mode="overwrite", partition_by=["grp"])
    assert os.path.isdir(os.path.join(path, "grp=x"))
    back = read_parquet(spark, path).filter(F.col("grp") == "x")
    # partition filter must prune to one directory
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 1


def test_export_csv_sample_single_file(spark, tmp_path):
    path = str(tmp_path / "export")
    df = from_collection(spark, [(i,) for i in range(100)], schema="v INT")
    export_csv_sample(df, path, n=10)
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) == 1
    assert read_csv(spark, path, schema="v INT", header=True).count() == 10
