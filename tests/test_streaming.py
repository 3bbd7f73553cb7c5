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


def test_streaming_dedup_within_watermark(spark, tmp_path_factory):
    """Duplicate event ids within the watermark are dropped."""
    import datetime as dt

    from data_engineering_etl_self_service_spark.streaming.stateful import (
        streaming_dedup,
    )

    out = str(tmp_path_factory.mktemp("dup_events"))
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 10, "view", 1.0),
        (1, t0 + dt.timedelta(seconds=30), 10, "view", 1.0),  # dup id
        (2, t0 + dt.timedelta(minutes=1), 10, "click", 2.0),
        (2, t0 + dt.timedelta(minutes=2), 10, "click", 2.0),  # dup id
        (3, t0 + dt.timedelta(minutes=3), 11, "view", 3.0),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(out)
    schema = spark.read.parquet(out).schema
    stream = streaming_dedup(spark.readStream.schema(schema).parquet(out))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT event_id FROM dedup_out ORDER BY event_id").collect()
    assert [r.event_id for r in got] == [1, 2, 3]


def test_foreach_batch_sink_idempotent_layout(spark, tmp_path_factory):
    from data_engineering_etl_self_service_spark.streaming.stateful import (
        foreach_batch_parquet,
    )

    src = str(tmp_path_factory.mktemp("fb_src"))
    out = str(tmp_path_factory.mktemp("fb_out"))
    load_table(spark, "/root/testdata/sf0.001", "events").limit(100).write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    q = foreach_batch_parquet(
        spark.readStream.schema(schema).parquet(src), out, "fb_test"
    )
    q.awaitTermination()
    back = spark.read.parquet(f"{out}/batch_id=0")
    assert back.count() == 100


def test_running_user_counters_state(spark, tmp_path_factory):
    from data_engineering_etl_self_service_spark.streaming.stateful import (
        running_user_counters,
    )

    src = str(tmp_path_factory.mktemp("cnt_src"))
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = running_user_counters(spark.readStream.schema(schema).parquet(src))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("counters_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n, r.total)
        for r in spark.sql(
            "SELECT user_id, last(n) AS n, last(total) AS total FROM counters_out GROUP BY user_id"
        ).collect()
    }
    expected = {
        r.user_id: (r.n, r.total)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(expected)
    for u in expected:
        assert got[u][0] == expected[u][0]
        assert abs(got[u][1] - expected[u][1]) < 1e-6
