"""Round-7 skew probe: sessionization with a bot user at sf0.1.

Synthesizes one always-on bot user carrying ~10% of ALL events on top
of the sf0.1 fixture and times the full per-session rollup three ways:

- plain  : session_stats (window partitioned by bare user_id)
- bucketed: the same rollup over sessionize_bucketed (window over
  (user, 24h bucket) + bucket-level stitch)
- plain/no-bot: the baseline without skew, for the overhead reference

Also verifies the two skewed results are IDENTICAL (exactness is the
whole point of the stitch), and prints the max per-window-partition row
count so the skew bound is visible, not inferred.

Usage: python tools/probe_r7_skew.py [sf_dir] [bot_share]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark import get_spark
from data_engineering_etl_self_service_spark.catalog import load_table
from data_engineering_etl_self_service_spark.functions.numeric import dsum
from data_engineering_etl_self_service_spark.operators.sessionize import (
    session_stats,
    sessionize_bucketed,
)


def rollup_bucketed(events):
    sess = sessionize_bucketed(events, gap_minutes=30.0)
    purchase_val = F.when(
        F.col("event_type") == "purchase", F.col("value")
    ).otherwise(F.lit(0.0))
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (
            (F.max(F.unix_micros(F.col("ts"))) - F.min(F.unix_micros(F.col("ts"))))
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("duration_sec"),
        dsum(purchase_val, alias="revenue"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias(
            "n_purchases"
        ),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10
    spark = get_spark(app_name="probe-r7-skew")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    n = e.count()
    n_bot = int(n * bot_share / (1 - bot_share))
    bot = spark.range(n_bot).select(
        (F.lit(1_000_000_000) + F.col("id")).alias("event_id"),
        F.lit(999_999_999).cast("long").alias("user_id"),
        F.expr(
            "timestamp '2024-01-01 00:00:00' "
            "+ make_interval(0, 0, 0, 0, 0, 0, CAST(id * 47 AS BIGINT))"
        ).alias("ts"),
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    skewed = e.unionByName(bot).localCheckpoint(eager=True)
    print(f"events: {n} fixture + {n_bot} bot = {skewed.count()}")
    dist = (
        skewed.groupBy("user_id").count().orderBy(F.desc("count")).limit(3)
    )
    print("top window partitions:", [(r[0], r[1]) for r in dist.collect()])

    def timed(label, df):
        t0 = time.perf_counter()
        cnt = df.count()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s ({cnt} sessions)")
        return dt, cnt

    # warm both paths at the no-bot baseline first (JIT/codegen)
    timed("plain/no-bot (warm)", session_stats(e, gap_minutes=30.0))
    t_nobot, _ = timed("plain/no-bot", session_stats(e, gap_minutes=30.0))
    t_plain, n_plain = timed(
        "plain/bot", session_stats(skewed, gap_minutes=30.0)
    )
    t_bkt, n_bkt = timed("bucketed/bot", rollup_bucketed(skewed))
    t_bkt2, _ = timed("bucketed/bot (2nd)", rollup_bucketed(skewed))

    a = session_stats(skewed, gap_minutes=30.0)
    b = rollup_bucketed(skewed)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"exactness: symmetric diff = {diff} rows "
          f"({n_plain} vs {n_bkt} sessions)")
    print(
        f"summary: no-bot {t_nobot:.2f}s | bot plain {t_plain:.2f}s | "
        f"bot bucketed {min(t_bkt, t_bkt2):.2f}s"
    )


if __name__ == "__main__":
    main()
