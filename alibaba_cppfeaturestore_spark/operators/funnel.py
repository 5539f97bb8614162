"""Product-analytics operators: funnel conversion and cohort retention.

Engine extras (no reference counterpart — the reference stops at feature
materialization) covering the event-sequence analytics a behavioral
table like Ali-CCP's exists to answer.

``funnel_conversion`` is CEP-lite: the ORDERED sequence s1 → s2 → … → sk
per entity, each step strictly after the previous and inside an optional
overall window. Implemented as k chained filtered aggregations — step
i's shuffle carries only step-i events (|corpus| never re-shuffles), and
each stage joins the (|entities|-sized) previous frontier. A per-entity
sorted-array fold would do it in one shuffle but puts the whole event
history of hot entities in one task; the chained form keeps per-step
state bounded.

``cohort_retention`` buckets entities by first-activity period and
counts activity per (cohort, periods-since) — one distinct + two
aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    within: str | None = None,
) -> DataFrame:
    """Earliest completion of the ordered ``steps`` per entity.

    Returns one row per entity that completed step 1, with columns
    ``t1..tk`` (NULL from the first uncompleted step on) and ``depth``
    (number of completed steps). Step i+1 must be strictly after step i;
    with ``within`` (e.g. "7 days"), every step must land inside
    ``[t1, t1 + within]``. Uses the EARLIEST qualifying event at each
    stage — the standard first-touch funnel.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    e = F.col(entity_col).alias("entity")

    frontier = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(e)
        .agg(F.min(ts_col).alias("t1"))
    )
    if within is not None:
        frontier = frontier.withColumn(
            "__deadline", F.col("t1") + F.expr(f"INTERVAL {within}")
        )

    for i, step in enumerate(steps[1:], start=2):
        nxt = df.filter(F.col(type_col) == step).select(
            F.col(entity_col).alias("entity"), F.col(ts_col).alias("__ts")
        )
        cond = F.col("__ts") > F.col(f"t{i - 1}")
        if within is not None:
            cond = cond & (F.col("__ts") <= F.col("__deadline"))
        carried = [c for c in frontier.columns if c != "entity"]
        frontier = (
            frontier.join(nxt, "entity", "left")
            .withColumn("__ok", F.when(cond, F.col("__ts")))
            .groupBy("entity")
            .agg(
                *[F.first(c).alias(c) for c in carried],
                F.min("__ok").alias(f"t{i}"),
            )
        )

    out = frontier.drop("__deadline")
    depth = F.lit(1)
    for i in range(2, len(steps) + 1):
        depth = depth + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    # tk is only valid if every prior step completed; chained `cond` on
    # t{i-1} already guarantees NULL propagates forward
    return out.select(
        F.col("entity").alias(entity_col),
        *[f"t{i}" for i in range(1, len(steps) + 1)],
        depth.alias("depth"),
    )


def cohort_retention(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    period: str = "1 week",
) -> DataFrame:
    """Retention matrix: entities bucketed by first-activity period
    (cohort), counted per (cohort, periods_since). ``retained`` at
    periods_since=0 is the cohort size."""
    secs = _period_seconds(period)
    bucket = F.window(F.col(ts_col), period)["start"]
    active = df.select(
        F.col(entity_col).alias("entity"), bucket.alias("p")
    ).distinct()
    first = active.groupBy("entity").agg(F.min("p").alias("cohort"))
    return (
        active.join(first, "entity")
        .groupBy("cohort", "p")
        .agg(F.countDistinct("entity").alias("retained"))
        .select(
            "cohort",
            F.floor(
                (F.unix_timestamp("p") - F.unix_timestamp("cohort")) / F.lit(secs)
            ).alias("periods_since"),
            "retained",
        )
    )


_UNIT_SECONDS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def _period_seconds(period: str) -> int:
    n, unit = period.strip().split()
    unit = unit.rstrip("s")
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unsupported period unit: {period!r}")
    return int(n) * _UNIT_SECONDS[unit]
