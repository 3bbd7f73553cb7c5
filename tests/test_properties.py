"""Property-based tests (SURVEY §5.4): invariants on random inputs.

Examples are kept small and few — each example drives real Spark jobs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.operators.quality import run_checks
from data_engineering_etl_self_service_spark.operators.sessionize import sessionize

T0 = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),          # user
        st.integers(min_value=0, max_value=10_000),     # minutes offset
    ),
    min_size=1,
    max_size=40,
)

ids_strategy = st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40)

_SPARK = None


def _get_spark():
    global _SPARK
    if _SPARK is None:
        from data_engineering_etl_self_service_spark import get_spark

        _SPARK = get_spark(app_name="property-tests", shuffle_partitions=4)
    return _SPARK


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_sessionizer_invariants(rows):
    """Sessions partition the events; no intra-session gap exceeds the
    threshold; session boundaries always exceed it."""
    spark = _get_spark()
    df = spark.createDataFrame(
        [
            (i, f"u{u}", T0 + dt.timedelta(minutes=m))
            for i, (u, m) in enumerate(rows)
        ],
        "event_id long, user_id string, ts timestamp",
    )
    sess = sessionize(df, gap_minutes=30).cache()
    try:
        assert sess.count() == len(rows)  # partition: every event labelled

        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        us = F.unix_micros(F.col("ts"))
        gaps = sess.select(
            "user_id",
            "session_seq",
            (us - F.lag(us).over(w)).alias("gap"),
            (F.col("session_seq") != F.lag("session_seq").over(w)).alias("boundary"),
        ).filter(F.col("gap").isNotNull())
        thirty = 30 * 60 * 1_000_000
        # same session → gap <= threshold; new session → gap > threshold
        assert gaps.filter(~F.col("boundary") & (F.col("gap") > thirty)).count() == 0
        assert gaps.filter(F.col("boundary") & (F.col("gap") <= thirty)).count() == 0
    finally:
        sess.unpersist()


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ids_strategy)
def test_uniqueness_check_matches_groupby_dupfinder(ids):
    """unique_column verdict ≡ 'no group has count>1' (the reference's
    pandas is_unique semantics, ref: data_quality_operator.py:106)."""
    spark = _get_spark()
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    rep = run_checks(df, [{"check_type": "unique_column", "column": "id"}])
    dupes = df.groupBy("id").count().filter(F.col("count") > 1).count()
    assert rep.passed == (dupes == 0)
