"""Batch sessionization — the reference's implied analytical payload.

The reference repo is titled "user-session-analysis" (ref: README.md:1) and
replays a clickstream into Kafka for an absent Spark batch job
(ref: dags/kafka_stream.py:87-92, recovered from bytecode). This module IS
that job, built Spark-native:

    gap-based sessions = lag(ts) over (partition by user order by ts)
                         → new-session flag on gap > threshold
                         → running sum of flags = session sequence number

Scale notes (100 TB): exactly ONE shuffle, on ``user_id``. The window
partitions by user; the follow-up ``groupBy(user_id, session_seq)`` reuses
that hash partitioning (Catalyst: HashPartitioning(user_id) satisfies
ClusteredDistribution(user_id, session_seq)), so session stats add no second
shuffle. Skewed power-users are bounded by per-user event counts; if one
user exceeds a partition, pre-split by (user_id, day) before windowing.
Gap comparisons use ``unix_micros`` (exact integer arithmetic, no
float/timestamp-truncation drift vs the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    tiebreak_cols: tuple[str, ...] = ("event_id",),
    out_col: str = "session_seq",
) -> DataFrame:
    """Assign a per-user session sequence number (1-based).

    A new session starts when the gap to the previous event of the same user
    is strictly greater than ``gap_minutes`` (a gap of exactly the threshold
    stays in-session). ``tiebreak_cols`` make the ordering total so results
    are deterministic under equal timestamps.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *tiebreak_cols)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    gap_us = int(gap_minutes * 60_000_000)
    is_new = (prev_us.isNull() | ((us - prev_us) > F.lit(gap_us))).cast("int")
    seq = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn(out_col, seq)


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = "value",
    purchase_event: str | None = "purchase",
    event_type_col: str = "event_type",
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Per-session rollup: bounds, duration, event count, revenue.

    Revenue = sum(value) over purchase events, summed through an exact
    decimal so the result is order-independent (see functions/numeric.py).
    """
    from ..functions.numeric import dsum

    sess = sessionize(events, user_col, ts_col, gap_minutes, tiebreak_cols)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (F.max(F.unix_micros(F.col(ts_col))) - F.min(F.unix_micros(F.col(ts_col))))
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("duration_sec"),
    ]
    if value_col is not None and purchase_event is not None:
        purchase_val = F.when(
            F.col(event_type_col) == purchase_event, F.col(value_col)
        ).otherwise(F.lit(0.0))
        aggs.append(dsum(purchase_val, alias="revenue"))
        aggs.append(
            F.sum((F.col(event_type_col) == purchase_event).cast("int")).alias(
                "n_purchases"
            )
        )
    return sess.groupBy(user_col, "session_seq").agg(*aggs)
