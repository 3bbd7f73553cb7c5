"""Conversion-funnel analytics over an event table.

Part of the reference's implied session-analysis workload (ref: README.md:1;
event vocabulary incl. 'purchase' from dags/kafka_stream.py:27-30 recovered).

Semantics: step i is reached by a user iff they have an event of type
``steps[i]`` strictly AFTER their earliest qualifying event for step i-1.

Scale design (100 TB): the sequential dependency (t_i needs t_{i-1}) is
expressed as chained whole-partition window MINs over the SAME
``partitionBy(user_id)`` window — one shuffle total regardless of funnel
depth, no self-joins, no join explosion. The final per-user reduction reuses
the same hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_user_times(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user earliest qualifying timestamp for each funnel step
    (columns ``t_0 .. t_{k-1}``, NULL where the step was never reached).

    ``within_seconds`` bounds each hop: step i must land within that many
    seconds of step i-1's timestamp (the "converted within 30 minutes"
    semantics) — same chained-window plan, one extra predicate, still one
    shuffle for any depth and any bound.
    """
    w = Window.partitionBy(user_col)
    df = events.withColumn(
        "t_0",
        F.min(F.when(F.col(event_type_col) == steps[0], F.col(ts_col))).over(w),
    )
    for i, step in enumerate(steps[1:], start=1):
        cond = (F.col(event_type_col) == step) & (
            F.col(ts_col) > F.col(f"t_{i-1}")
        )
        if within_seconds is not None:
            cond = cond & (
                F.col(ts_col)
                <= F.col(f"t_{i-1}")
                + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
            )
        df = df.withColumn(
            f"t_{i}",
            F.min(F.when(cond, F.col(ts_col))).over(w),
        )
    t_cols = [f"t_{i}" for i in range(len(steps))]
    # t_i is constant per user; reduce to one row per user (same partitioning).
    return df.groupBy(user_col).agg(*[F.max(c).alias(c) for c in t_cols])


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_type_col: str = "event_type",
) -> DataFrame:
    """One row: number of distinct users reaching each funnel step."""
    times = funnel_user_times(events, steps, user_col, ts_col, event_type_col)
    aggs = [
        F.count(F.col(f"t_{i}")).alias(f"n_step{i+1}_{step}")
        for i, step in enumerate(steps)
    ]
    return times.agg(*aggs)
