"""Driver-style differential testing: every catalog query vs its DuckDB oracle.

Mimics the driver's correctness gate (CORRECTNESS_r{N}.json): run the Spark
query and the oracle SQL at sf0.01, sort columns by name, sort rows, compare
values. Queries without an oracle get a rows-only sanity check.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    qd = QUERIES[name]
    sdf = qd.spark(spark, SF_DIR)
    spark_pd = sdf.toPandas()

    # an empty result that matches an empty oracle is a vacuous pass —
    # every catalog query must exercise real rows at sf0.01
    assert len(spark_pd) > 0, f"{name}: empty result — trivial parity"

    if qd.oracle is None:
        # Rows-only check: runs, has stable schema, deterministic re-run.
        again = qd.spark(spark, SF_DIR).toPandas()
        assert list(spark_pd.columns) == list(again.columns)
        assert len(spark_pd) == len(again)
        return

    oracle_pd = ddb.execute(qd.oracle).fetchdf()

    assert len(spark_pd) == len(oracle_pd), (
        f"{name}: row count {len(spark_pd)} (spark) != {len(oracle_pd)} (oracle)"
    )
    assert sorted(spark_pd.columns) == sorted(oracle_pd.columns), (
        f"{name}: columns {sorted(spark_pd.columns)} != {sorted(oracle_pd.columns)}"
    )

    a = canonicalize(spark_pd)
    b = canonicalize(oracle_pd)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6)
