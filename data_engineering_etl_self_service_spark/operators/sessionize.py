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


def sessionize_bucketed(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    tiebreak_cols: tuple[str, ...] = ("event_id",),
    out_col: str = "session_seq",
    bucket_hours: float = 24.0,
) -> DataFrame:
    """Skew-bounded sessionization: bit-identical to :func:`sessionize`,
    but the window partitions by ``(user, time-bucket)`` instead of the
    whole user.

    Why it exists: a single bot/scraper user carrying a material share
    of all events turns the plain per-user window into ONE straggler
    task — and AQE's skew handling splits JOIN partitions, not window
    partitions, so no runtime re-plan can save it (probed at sf0.1 with
    a 10% bot user — see SCALE.md). This is SURVEY §2.5's "pre-split on
    (user_id, day)" contingency as code, generalized to any bucket
    width.

    Two-pass stitch keeps gap semantics EXACT across bucket edges:

    1. Window over ``(user, bucket)``: local new-session flags + local
       running sequence (the skew bound — no task sees more than one
       user-bucket of events).
    2. Bucket-level rollup (ONE ROW per user-bucket — thousands of
       times smaller than events): first/last event time and local
       session count per bucket; a per-user window over these tiny rows
       decides whether each bucket's first session MERGES with the
       previous non-empty bucket's last session (gap <= threshold,
       the exact complement of the new-session rule) and prefix-sums
       the global numbering offsets.
    3. Equi-join the offsets back on ``(user, bucket)`` —
       ``global_seq = offset_prev - merged + local_seq``.

    Cost vs :func:`sessionize`: the bucket-level pass is negligible,
    but downstream per-session rollups can no longer reuse the window's
    partitioning (a session may span buckets), so session_stats pays
    one extra events-sized exchange. Use the plain operator unless the
    user distribution actually skews.
    """
    gap_us = int(gap_minutes * 60_000_000)
    bucket_us = int(bucket_hours * 3_600_000_000)
    us = F.unix_micros(F.col(ts_col))
    e = events.withColumn("_us", us).withColumn(
        "_bkt", F.expr(f"_us DIV {bucket_us}")
    )
    w1 = Window.partitionBy(user_col, "_bkt").orderBy(
        ts_col, *tiebreak_cols
    )
    prev_us = F.lag("_us").over(w1)
    is_new = (
        prev_us.isNull() | ((F.col("_us") - prev_us) > F.lit(gap_us))
    ).cast("int")
    local = e.withColumn(
        "_lseq",
        F.sum(is_new).over(
            w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # one row per (user, bucket): reuses the (user, bucket) hash
    # partitioning the window just established — no extra shuffle here
    blevel = local.groupBy(user_col, "_bkt").agg(
        F.min("_us").alias("_first_us"),
        F.max("_us").alias("_last_us"),
        F.max("_lseq").alias("_nloc"),
    )
    w2 = Window.partitionBy(user_col).orderBy("_bkt")
    prev_last = F.lag("_last_us").over(w2)
    merged = (
        prev_last.isNotNull()
        & ((F.col("_first_us") - prev_last) <= F.lit(gap_us))
    ).cast("long")
    offsets = (
        blevel.withColumn("_m", merged)
        .withColumn(
            "_cum",
            F.sum(F.col("_nloc") - F.col("_m")).over(
                w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select(
            user_col,
            "_bkt",
            "_m",
            (F.col("_cum") - (F.col("_nloc") - F.col("_m"))).alias("_off"),
        )
    )
    return (
        local.join(offsets, [user_col, "_bkt"])
        .withColumn(
            out_col, (F.col("_off") - F.col("_m") + F.col("_lseq"))
        )
        .drop("_us", "_bkt", "_lseq", "_m", "_off")
    )


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
