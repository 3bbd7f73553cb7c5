"""Synthetic user-event generator — Spark-native port of the reference's
``generate_user_event`` (ref: dags/kafka_stream.py:23-40 recovered; exact
vocabularies from lines 27-30, key set from line 32, timestamp format from
line 36).

The reference builds one random dict per Kafka message in a Python loop at
~3 msg/s (sleep-throttled, ref :75). Here the generator is a distributed
``spark.range(n)`` with seeded ``rand()`` column expressions — millions of
rows/sec, fully parallel, and deterministic under a fixed seed (the
reference is not reproducible at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: exact vocabularies from the recovered reference source
EVENT_TYPES = ("page_view", "click", "add_to_cart", "purchase")
URLS = ("/home", "/products/1", "/products/2", "/cart", "/checkout")
UTM_SOURCES = ("facebook", "google", "tiktok_ads", "organic")
N_USERS = 50  # user_0 .. user_49 (ref :27)


def _pick(options: tuple[str, ...], r: F.Column) -> F.Column:
    arr = F.array(*[F.lit(o) for o in options])
    idx = (r * len(options)).cast("int") + 1  # element_at is 1-based
    return F.element_at(arr, F.least(idx, F.lit(len(options))))


def synthetic_user_events(
    spark: SparkSession,
    n: int = 5000,
    seed: int = 42,
    start_ts: str = "2025-07-28 00:00:00",
    mean_gap_sec: int = 300,
) -> DataFrame:
    """n synthetic events with the reference's exact schema
    ``(user_id, event_type, url, timestamp, utm_source)``.

    Timestamps advance from ``start_ts`` with random gaps so downstream
    sessionization has realistic structure (the reference stamps wall-clock
    'now', ref :36, which is untestable).
    """
    df = spark.range(n)
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start_ts))
        + (F.col("id") * mean_gap_sec)
        + (F.rand(seed + 4) * mean_gap_sec).cast("long")
    )
    return df.select(
        F.concat(F.lit("user_"), (F.rand(seed) * N_USERS).cast("int")).alias("user_id"),
        _pick(EVENT_TYPES, F.rand(seed + 1)).alias("event_type"),
        _pick(URLS, F.rand(seed + 2)).alias("url"),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
        _pick(UTM_SOURCES, F.rand(seed + 3)).alias("utm_source"),
    )
