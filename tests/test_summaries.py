"""Misra-Gries heavy hitters: exactness + completeness under tight capacity."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.operators.summaries import heavy_hitters


def _stream_df(spark, values, partitions=4):
    return spark.createDataFrame(
        [(v,) for v in values], "item string"
    ).repartition(partitions)


def test_heavy_hitters_exact_vs_counter(spark):
    # zipf-ish synthetic stream: item i appears 1000//(i+1) times
    values = []
    for i in range(100):
        values += [f"w{i}"] * (1000 // (i + 1))
    df = _stream_df(spark, values)
    k = 20
    got = {(r.item, r.cnt) for r in heavy_hitters(df, "item", k=k).collect()}
    n = len(values)
    want = {(v, c) for v, c in Counter(values).items() if c * k > n}
    assert got == want and len(want) > 0


def test_heavy_hitters_late_arrival_tight_capacity(spark):
    """A heavy hitter arriving AFTER the summary is saturated must still
    surface — the regression case for the subtract-the-cut prune rule.
    Single partition forces one sequential MG pass; capacity == k (the
    tightest legal budget)."""
    values = [f"head{i}" for i in range(40) for _ in range(5)]  # 200 items
    values += ["late"] * 101  # just over n/3 of the stream, arrives last
    df = _stream_df(spark, values, partitions=1)
    got = {r.item for r in heavy_hitters(df, "item", k=3, capacity=3).collect()}
    assert got == {"late"}


def test_heavy_hitters_no_false_positives(spark):
    values = ["a"] * 50 + [f"t{i}" for i in range(50)]
    df = _stream_df(spark, values)
    rows = heavy_hitters(df, "item", k=4).collect()
    assert {(r.item, r.cnt, r.n_total) for r in rows} == {("a", 50, 100)}
