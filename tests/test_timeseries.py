"""Time-series rollup cascade and gap-fill semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from alibaba_cppfeaturestore_spark.operators.timeseries import (
    gap_fill,
    rollup_cascade,
    time_bucket,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def series(spark):
    rows = [
        ("a", ts("2024-01-01 10:05:00"), 1.0),
        ("a", ts("2024-01-01 10:55:00"), 3.0),
        ("a", ts("2024-01-01 11:10:00"), 5.0),
        ("a", ts("2024-01-02 00:30:00"), 7.0),
        ("b", ts("2024-01-01 10:20:00"), 10.0),
        ("b", ts("2024-01-01 23:59:59"), None),  # null measure
    ]
    return spark.createDataFrame(rows, ["k", "t", "v"])


def test_cascade_levels_match_direct_aggregation(spark, series):
    out = rollup_cascade(
        series,
        "t",
        levels=["1 hour", "1 day"],
        group_cols=["k"],
        measures={
            "sv": ("v", "sum"),
            "av": ("v", "avg"),
            "mx": ("v", "max"),
            "mn": ("v", "min"),
            "cv": ("v", "count"),
        },
    )
    for level, width in [("1 hour", "1 hour"), ("1 day", "1 day")]:
        direct = {
            tuple(r[:2]): r[2:]
            for r in series.groupBy(
                "k", time_bucket(F.col("t"), width).alias("b")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum("v").alias("sv"),
                F.avg("v").alias("av"),
                F.max("v").alias("mx"),
                F.min("v").alias("mn"),
                F.count("v").alias("cv"),
            )
            .select("k", "b", "n", "sv", "av", "mx", "mn", "cv")
            .collect()
        }
        got = {
            (r["k"], r["bucket_start"]): (
                r["n"], r["sv"], r["av"], r["mx"], r["mn"], r["cv"]
            )
            for r in out.filter(F.col("level") == level).collect()
        }
        assert got == direct, level


def test_cascade_rejects_non_reaggregable(spark, series):
    with pytest.raises(ValueError, match="cannot re-aggregate"):
        rollup_cascade(
            series, "t", ["1 hour", "1 day"],
            measures={"d": ("v", "stddev")},
        )


def test_gap_fill_densifies_per_group(spark, series):
    bucketed = (
        series.withColumn("b", time_bucket(F.col("t"), "1 hour"))
        .groupBy("k", "b")
        .agg(F.count("*").alias("n"))
    )
    out = gap_fill(bucketed, "b", 3600, group_cols=["k"], fill={"n": 0})
    rows = {(r["k"], r["b"]): r["n"] for r in out.collect()}
    # group a spans 10:00 day1 → 00:00 day2 inclusive = 15 hourly buckets
    a = {b for (k, b) in rows if k == "a"}
    assert len(a) == 15
    assert rows[("a", ts("2024-01-01 10:00:00"))] == 2
    assert rows[("a", ts("2024-01-01 12:00:00"))] == 0  # filled gap
    # group b's spine is its own span (10:00 → 23:00 = 14 buckets), not a's
    b = {bb for (k, bb) in rows if k == "b"}
    assert len(b) == 14
    assert rows[("b", ts("2024-01-01 23:00:00"))] == 1


def test_time_weighted_avg_locf_semantics(spark):
    """TWAP hand-check: v=10 held 3s, v=2 held 1s, final v=100 carries no
    weight -> (10*3 + 2*1) / 4 = 8.0; plus a single-obs group and an
    all-duplicate-timestamp group falling back to the plain mean."""
    from alibaba_cppfeaturestore_spark.operators.timeseries import time_weighted_avg

    rows = [
        ("a", "2024-01-01 00:00:00", 1, 10.0),
        ("a", "2024-01-01 00:00:03", 2, 2.0),
        ("a", "2024-01-01 00:00:04", 3, 100.0),
        ("b", "2024-01-01 00:00:00", 4, 7.5),
        ("c", "2024-01-01 00:00:00", 5, 1.0),
        ("c", "2024-01-01 00:00:00", 6, 3.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts string, event_id long, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "event_id", "v"
    )
    got = {r.g: (r.n_obs, r.twap) for r in
           time_weighted_avg(df, "ts", "v", ["g"], tiebreak=["event_id"]).collect()}
    assert got["a"] == (3, 8.0)
    assert got["b"] == (1, 7.5)
    assert got["c"] == (2, 2.0)


def test_time_weighted_avg_full_timestamp_range_gap(spark):
    """r11 advice pin: a 9999-12-31 far-future sentinel against an
    epoch-0 floor is a ~2.5e17-us gap — it overflowed the old
    DECIMAL(17,0) duration under ANSI; DECIMAL(19,0) covers the full
    Spark timestamp range. The held value dominates the weighting, so
    twap ≈ the first value."""
    from alibaba_cppfeaturestore_spark.operators.timeseries import time_weighted_avg

    rows = [
        ("a", "1970-01-01 00:00:00", 1, 4.0),
        ("a", "9999-12-31 00:00:00", 2, 1000.0),  # terminal: zero weight
    ]
    df = spark.createDataFrame(rows, "g string, ts string, event_id long, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "event_id", "v"
    )
    got = {r.g: (r.n_obs, r.twap) for r in
           time_weighted_avg(df, "ts", "v", ["g"], tiebreak=["event_id"]).collect()}
    assert got["a"] == (2, 4.0)


def test_seasonal_decompose_components_sum_to_detrended_mean(spark):
    """Weighted by day counts, the seasonal components must average to
    ~0 across weekdays (the trend absorbs the level), and each equals
    the numpy detrended dow mean."""
    import numpy as np
    from alibaba_cppfeaturestore_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["seasonal_decompose_daily"].spark(spark, sf).collect()
    assert {r.dow for r in rows} <= set(range(1, 8)) and len(rows) >= 5
    total_days = sum(r.n_days for r in rows)
    weighted = sum(r.seasonal_component * r.n_days for r in rows) / total_days
    assert abs(weighted) < 1e-6  # OLS residuals mean ~0 over the fit span

    # numpy replay of the whole decomposition
    from alibaba_cppfeaturestore_spark.plans.views import load_table
    import pandas as pd
    ev = load_table(spark, sf, "events").toPandas()
    ev = ev[ev.event_type == "purchase"].copy()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    daily = ev.groupby("day")["value"].sum()
    x = np.array([(pd.Timestamp(d) - pd.Timestamp("2000-01-01")).days for d in daily.index], dtype=float)
    y = daily.to_numpy()
    slope, intercept = np.polyfit(x, y, 1)
    resid = y - (slope * x + intercept)
    dows = np.array([pd.Timestamp(d).dayofweek for d in daily.index])  # Mon=0
    for r in rows:
        mask = dows == (r.dow - 2) % 7  # spark dow: Sun=1 … Sat=7
        assert abs(r.seasonal_component - resid[mask].mean()) < 1e-4
