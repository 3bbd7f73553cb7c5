"""Stream-stream joins (SURVEY §2.9 extension).

The reference never joins two live streams (its consumer is a scheduled
batch job, ref: dags/kafka_stream.py:87-92 recovered), but a real-time
version of its implied funnel — "purchase within N minutes of a view" —
is exactly Spark's watermarked stream-stream interval join.

Scale notes: both sides buffer state keyed by (user_id); the watermark
bounds state size (events older than watermark are evicted), and the
interval condition lets Spark drop left rows once right-side time passes
``l_ts + interval``. Without BOTH watermarks and a time-bound join
condition the state grows without bound — that shape is refused here, not
documented around.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    interval: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams: right row within ``[l_ts, l_ts+interval]``
    of a left row with the same key. ``how`` ∈ {inner, left_outer} —
    left-outer emits unmatched left rows (null right columns) once the
    watermark passes ``l_ts + interval``, i.e. when a match is provably
    impossible.

    Output: (key, l_id, l_ts, r_id, r_ts). Deterministic given closed
    watermarks (availableNow drains everything → full parity with the batch
    twin of the same predicate).
    """
    l = left.withWatermark(ts_col, watermark).select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r = right.withWatermark(ts_col, watermark).select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_id"),
        F.col(ts_col).alias("r_ts"),
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"interval {interval}"))
    )
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported stream-stream join type: {how!r}")
    return l.join(r, cond, how).select(
        F.col("l_key").alias(key), "l_id", "l_ts", "r_id", "r_ts"
    )
