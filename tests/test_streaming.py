"""Batch/stream parity: session_window (streaming) must agree with the
batch lag/cumsum sessionizer on session counts (SURVEY §5.5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.catalog import load_table
from data_engineering_etl_self_service_spark.operators.sessionize import session_stats
from data_engineering_etl_self_service_spark.streaming.sessions import (
    run_stream_to_memory,
    streaming_session_stats,
    streaming_tumbling_counts,
)


@pytest.fixture(scope="module")
def event_stream(spark, tmp_path_factory):
    """Bounded file stream over the events table (availableNow → testable)."""
    out = str(tmp_path_factory.mktemp("events_us"))
    load_table(spark, "/root/testdata/sf0.001", "events").write.mode(
        "overwrite"
    ).parquet(out)
    schema = spark.read.parquet(out).schema
    return spark.readStream.schema(schema).parquet(out)


def test_stream_session_counts_match_batch(spark, event_stream):
    stream = streaming_session_stats(event_stream, gap="30 minutes")
    run_stream_to_memory(stream, "stream_sessions")
    got = spark.sql(
        "SELECT count(*) AS n, sum(n_events) AS ev FROM stream_sessions"
    ).collect()[0]

    batch = session_stats(
        load_table(spark, "/root/testdata/sf0.001", "events"), gap_minutes=30
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("n_events").alias("ev")).collect()[0]

    assert got.n == batch.n
    assert got.ev == batch.ev


def test_stream_tumbling_counts_match_batch(spark, event_stream):
    stream = streaming_tumbling_counts(event_stream, width="1 hour", by="event_type")
    run_stream_to_memory(stream, "stream_tumbling")
    got = spark.sql("SELECT sum(n) AS total FROM stream_tumbling").collect()[0].total

    batch = load_table(spark, "/root/testdata/sf0.001", "events").count()
    assert got == batch
