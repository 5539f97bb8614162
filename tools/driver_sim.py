"""Driver simulator: run every catalog query under a VANILLA SparkSession.

The per-round driver builds its own SparkSession (no engine confs) and runs
``__spark_entry__.queries()`` against ``oracle_sql()`` via DuckDB at sf0.01.
Pytest's fixture uses the engine's tuned session, so it can mask
session-conf dependencies (e.g. ``spark.sql.mapKeyDedupPolicy`` — the
round-1 ``kv_merge_lastwin`` crash).  This script reproduces the hard gate
locally: vanilla session, column-name-sorted value comparison, JSON report.

Usage:  python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--only name,...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="/tmp/driver_sim.json")
    args = ap.parse_args()

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = [n.strip() for n in args.only.split(",") if n.strip()] or list(queries)

    # Vanilla session: deliberately NO engine confs. local[32] + AQE default.
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver_sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    report: dict[str, dict] = {}
    t_all = time.time()
    for name in names:
        row: dict = {}
        t0 = time.time()
        try:
            spark_pd = queries[name](spark, args.sf).toPandas()
            row["spark_rows"] = len(spark_pd)
            sql = oracles.get(name)
            if sql is None:
                row["err"] = "no_oracle"
            else:
                oracle_pd = con.execute(sql).fetchdf()
                row["oracle_rows"] = len(oracle_pd)
                row["rows_match"] = len(spark_pd) == len(oracle_pd)
                row["schema_match"] = sorted(spark_pd.columns) == sorted(oracle_pd.columns)
                if row["rows_match"] and row["schema_match"]:
                    a, b = canon(spark_pd), canon(oracle_pd)
                    try:
                        pd.testing.assert_frame_equal(
                            a, b, check_dtype=False, check_exact=False,
                            rtol=1e-6, atol=1e-6,
                        )
                        row["hash_match"] = True
                    except AssertionError as e:
                        row["hash_match"] = False
                        row["err"] = f"value_mismatch: {str(e)[:300]}"
                else:
                    row["hash_match"] = False
                    row["err"] = "rows_or_schema_mismatch"
        except Exception:
            row["err"] = traceback.format_exc()[-1500:]
        row["sec"] = round(time.time() - t0, 2)
        report[name] = row
        ok = row.get("hash_match")
        tag = "PASS" if ok else ("NO_ORACLE" if row.get("err") == "no_oracle" else "FAIL")
        print(f"{tag:9s} {name:45s} {row['sec']:7.2f}s", flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)

    n_pass = sum(1 for r in report.values() if r.get("hash_match"))
    n_nor = sum(1 for r in report.values() if r.get("err") == "no_oracle")
    n_fail = len(report) - n_pass - n_nor
    print(
        f"\n== {n_pass} pass, {n_nor} no_oracle, {n_fail} FAIL of {len(report)} "
        f"in {time.time() - t_all:.0f}s  -> {args.out}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
