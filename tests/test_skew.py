"""Skew-salted join and bucketized range join: semantics equal the plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.catalog import load_table
from data_engineering_etl_self_service_spark.operators.skew import (
    range_join_buckets,
    salted_join,
)


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    salted = (
        salted_join(li, o, "l_orderkey", "o_orderkey", salt=8)
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_range_join_buckets_equals_inequality_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    l = e.filter(F.col("event_type") == "signup").select("event_id", "ts")
    r = e.filter(F.col("event_type") == "view").select("event_id", "ts")
    bucketed = {
        (x.l_event_id, x.r_event_id)
        for x in range_join_buckets(l, r, max_gap_sec=120).collect()
    }
    lu = F.unix_micros
    naive = {
        (x[0], x[1])
        for x in l.alias("l")
        .crossJoin(r.alias("r"))
        .filter(
            (lu(F.col("r.ts")) - lu(F.col("l.ts")) >= 0)
            & (lu(F.col("r.ts")) - lu(F.col("l.ts")) <= 120 * 1_000_000)
        )
        .select(F.col("l.event_id"), F.col("r.event_id"))
        .collect()
    }
    assert bucketed == naive and len(bucketed) > 0
