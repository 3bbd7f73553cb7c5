"""Structured-Streaming session analytics.

The streaming twin of operators/sessionize.py — the reference's Kafka DAG
(ref: dags/kafka_stream.py:45-95 recovered) replays events into a topic and
then runs a *batch* job; our engine supports the genuinely-streaming shape:

    readStream → from_json → withWatermark → session_window / window → sink

``session_window(ts, gap)`` merges events whose gaps are < gap into one
window — the same session semantics as the batch lag/cumsum sessionizer
(batch/stream parity is pinned by tests/test_streaming.py).

Late data: the watermark bounds state; events later than the watermark are
dropped (documented drop semantics — the reference's ordered replay never
exercises lateness, ref: SURVEY.md §2.9 ST5).

At 100 TB/day the session state is partitioned by (user_id) across
executors; RocksDB state store + watermark eviction keep it bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str | None = "value",
) -> DataFrame:
    """Per (user, session-window) aggregate over a streaming DataFrame."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col))
        .agg(*aggs)
    )


def streaming_tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str = "1 hour",
    by: str | None = "event_type",
) -> DataFrame:
    """Tumbling-window counts (the implied daily campaign metrics,
    ref: configs/sources/marketing_api_campaigns.yaml:6 schedule)."""
    keys = [F.window(F.col(ts_col), width).alias("w")]
    if by:
        keys.append(F.col(by))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, mode: str = "complete"
) -> None:
    """Drive a streaming aggregate to completion against bounded input
    (availableNow trigger + memory sink) — the testable-parity harness.
    ``mode``: "complete" for plain aggregates; "update" for
    applyInPandasWithState operators (the sink then holds one appended
    row per key per micro-batch — readers reduce to the final row)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
