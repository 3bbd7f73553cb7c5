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


# ------------------------------------------------- bucketed (skew-bounded)


def _parity(spark, df, bucket_hours, gap=30.0):
    from data_engineering_etl_self_service_spark.operators.sessionize import (
        sessionize_bucketed,
    )

    key = ["user_id", "event_id"]
    plain = {
        tuple(r[k] for k in key): r["session_seq"]
        for r in sessionize(df, gap_minutes=gap).collect()
    }
    bucketed = {
        tuple(r[k] for k in key): r["session_seq"]
        for r in sessionize_bucketed(
            df, gap_minutes=gap, bucket_hours=bucket_hours
        ).collect()
    }
    assert bucketed == plain


def test_bucketed_parity_boundary_cases(spark):
    """Sessions crossing bucket edges, gap exactly at threshold across
    an edge, a user silent for several buckets, single-event buckets —
    with a pathologically small bucket (6 min) so nearly every session
    spans multiple buckets."""
    rows = [
        # u1: one long session of events every 5 min across 2 hours
        *[("u1", m, "view", 1.0) for m in range(0, 120, 5)],
        # u1: reappears 3 days later (many empty buckets skipped)
        ("u1", 3 * 24 * 60, "view", 1.0),
        # u2: gap EXACTLY 30 min straddling a bucket edge -> same session
        ("u2", 4, "view", 1.0),
        ("u2", 34, "view", 1.0),
        # u2: gap 31 min -> new session
        ("u2", 65, "purchase", 5.0),
        # u3: single event
        ("u3", 7, "signup", 0.0),
    ]
    df = _events(spark, rows)
    _parity(spark, df, bucket_hours=0.1)
    _parity(spark, df, bucket_hours=24.0)


def test_bucketed_parity_bot_user_fixture(spark, sf_dir):
    """Fixture events + a synthetic bot user holding ~25% of all events
    at 1-minute cadence (hundreds of sessions' worth of always-on
    traffic): the skew shape the operator exists for."""
    from data_engineering_etl_self_service_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    n = e.count()
    bot = spark.range(n // 3).select(
        (F.lit(10_000_000) + F.col("id")).alias("event_id"),
        F.lit(999_999_999).cast("long").alias("user_id"),
        F.expr(
            "timestamp '2024-01-01 00:00:00' "
            "+ make_interval(0, 0, 0, 0, 0, CAST(id * 41 AS INT), 0)"
        ).alias("ts"),
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    df = e.unionByName(bot)
    _parity(spark, df, bucket_hours=24.0)


def test_bucketed_window_partitions_by_user_and_bucket(spark, sf_dir):
    """The plan pin that makes the skew bound real: the big window's
    partition spec must be (user, bucket), never bare user."""
    from data_engineering_etl_self_service_spark.catalog import load_table
    from data_engineering_etl_self_service_spark.operators.sessionize import (
        sessionize_bucketed,
    )

    e = load_table(spark, sf_dir, "events")
    plan = sessionize_bucketed(e)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    big = [s for s in specs if "_bkt" in s]
    assert big, specs  # the events-sized window carries the bucket key
