"""Deterministic hash sampling: reproducibility + per-stratum rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.operators.sampling import (
    KNUTH,
    hash_sample,
    stratified_hash_sample,
)


def _df(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("g"),
    )


def test_hash_sample_partition_layout_invariant(spark):
    """The sample is a pure function of the key — identical under any
    repartitioning (the property rand(seed) lacks)."""
    df = _df(spark)
    a = {r.k for r in hash_sample(df, "k", 100).collect()}
    b = {r.k for r in hash_sample(df.repartition(17), "k", 100).collect()}
    assert a == b
    # close to the nominal 10% rate
    assert 0.05 < len(a) / 2000 < 0.15


def test_hash_sample_matches_python_arithmetic(spark):
    df = _df(spark, 500)
    got = {r.k for r in hash_sample(df, "k", 250).collect()}
    want = {k for k in range(500) if (k * KNUTH) % 1000 < 250}
    assert got == want


def test_stratified_rates_respected(spark):
    df = _df(spark)
    out = stratified_hash_sample(
        df, "k", "g", {"0": 1000, "1": 0}, default_permille=500
    )
    by_g = {
        r.g: r.cnt
        for r in out.groupBy("g").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_g.get("0") == 500  # rate 1000/1000: whole stratum kept
    assert "1" not in by_g  # rate 0: dropped entirely
    for g in ("2", "3"):  # ~50% of 500
        assert 175 < by_g[g] < 325
