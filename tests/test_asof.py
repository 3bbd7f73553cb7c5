"""As-of join: window form vs pandas merge_asof form must agree."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.catalog import load_table
from data_engineering_etl_self_service_spark.operators.asof import (
    asof_join,
    asof_join_pandas,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(minutes=m), et, v) for i, (u, m, et, v) in enumerate(rows)],
        "event_id long, user_id string, ts timestamp, event_type string, value double",
    )


def test_asof_picks_most_recent_at_or_before(spark):
    df = _ev(
        spark,
        [
            ("u", 0, "click", 1.0),
            ("u", 10, "click", 2.0),
            ("u", 10, "purchase", 9.0),   # equal ts → inclusive match
            ("u", 25, "purchase", 9.0),
        ],
    )
    left = df.filter(F.col("event_type") == "purchase")
    right = df.filter(F.col("event_type") == "click")
    out = {r.event_id: r for r in asof_join(left, right).collect()}
    assert out[2].ts_right == T0 + dt.timedelta(minutes=10)  # inclusive
    assert out[3].ts_right == T0 + dt.timedelta(minutes=10)  # most recent


def test_asof_drops_unmatched_left_rows(spark):
    df = _ev(spark, [("u", 0, "purchase", 9.0), ("u", 5, "click", 1.0)])
    left = df.filter(F.col("event_type") == "purchase")
    right = df.filter(F.col("event_type") == "click")
    assert asof_join(left, right).count() == 0  # click is after the purchase


def test_window_and_pandas_forms_agree(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase")
    right = e.filter(F.col("event_type") == "click")
    a = {
        (r.event_id, r.ts_right)
        for r in asof_join(left, right).select("event_id", "ts_right").collect()
    }
    b = {
        (r.event_id, r.ts_right)
        for r in asof_join_pandas(left, right)
        .select("event_id", "ts_right")
        .collect()
    }
    assert a == b and len(a) > 0
