"""Sessionizer edge semantics (SURVEY.md §5.2): exact-gap boundary,
single-event sessions, interleaved users, out-of-order input."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.operators.sessionize import (
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(minutes=m), et, v) for i, (u, m, et, v) in enumerate(rows)],
        "event_id long, user_id string, ts timestamp, event_type string, value double",
    )


def test_gap_exactly_threshold_stays_in_session(spark):
    df = _events(spark, [("u", 0, "view", 1.0), ("u", 30, "view", 1.0)])
    out = sessionize(df, gap_minutes=30).select("session_seq").collect()
    assert [r.session_seq for r in out] == [1, 1]


def test_gap_over_threshold_splits(spark):
    df = _events(spark, [("u", 0, "view", 1.0), ("u", 30.001, "view", 1.0)])
    seqs = sorted(r.session_seq for r in sessionize(df, gap_minutes=30).collect())
    assert seqs == [1, 2]


def test_single_event_session_and_interleaved_users(spark):
    df = _events(
        spark,
        [("a", 0, "view", 1.0), ("b", 1, "view", 1.0), ("a", 100, "view", 1.0)],
    )
    stats = session_stats(df, gap_minutes=30)
    rows = {(r.user_id, r.session_seq): r for r in stats.collect()}
    assert len(rows) == 3
    assert rows[("b", 1)].n_events == 1
    assert rows[("b", 1)].duration_sec == 0


def test_out_of_order_input_is_sorted_by_window(spark):
    rows = [("u", 90, "view", 1.0), ("u", 0, "view", 1.0), ("u", 5, "purchase", 7.0)]
    df = _events(spark, rows)
    stats = session_stats(df, gap_minutes=30).orderBy("session_seq").collect()
    assert [r.n_events for r in stats] == [2, 1]
    assert stats[0].revenue == 7.0
    assert stats[0].n_purchases == 1


def test_sessions_partition_events(spark, sf_dir):
    """Property: session assignment is a partition of the event set."""
    e = spark.read.parquet(f"{sf_dir}/orders.parquet")  # any table works; use events
    from data_engineering_etl_self_service_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, gap_minutes=30)
    assert sess.count() == ev.count()
    # no session spans a >gap hole: max intra-session gap <= 30 min
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = sess.withColumn("gap", us - F.lag(us).over(w)).filter(
        F.col("gap") > 30 * 60 * 1_000_000
    )
    assert gaps.count() == 0
