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


def test_domain_mix_weights_uniform_and_explicit_target(spark):
    from data_engineering_etl_self_service_spark.operators.sampling import (
        domain_mix_weights,
    )

    rows = (
        [("web", i, 100) for i in range(80)]
        + [("code", 1000 + i, 100) for i in range(15)]
        + [("math", 2000 + i, 100) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "domain string, id long, sz long")
    w = {
        r["domain"]: r
        for r in domain_mix_weights(df, "domain", "sz").collect()
    }
    # shares: web 800k ppm, code 150k, math 50k; uniform target 333333
    assert w["web"]["actual_ppm"] == 800000
    assert w["web"]["target_ppm"] == 333333
    assert w["web"]["weight_ppm"] == 333333 * 1000000 // 800000
    assert w["web"]["weight_ppm"] < 1000000  # downsample
    assert w["code"]["weight_ppm"] == 333333 * 1000000 // 150000
    assert w["code"]["weight_ppm"] > 2000000  # upsample > 2 epochs
    assert w["math"]["weight_ppm"] == 4000000  # capped (would be 6.67)
    # explicit target: all weight to math, zero to web
    w2 = {
        r["domain"]: r
        for r in domain_mix_weights(
            df, "domain", "sz",
            target_ppm={"math": 900000, "code": 100000},
        ).collect()
    }
    assert w2["web"]["target_ppm"] == 0 and w2["web"]["weight_ppm"] == 0
    assert w2["math"]["weight_ppm"] == 4000000  # capped again


def test_apply_mix_epochs_deterministic_counts(spark):
    """n_copies = integer epochs + Knuth-hash fractional draw; exact
    per-row values recomputed independently in Python, and invariant
    to partition layout."""
    from data_engineering_etl_self_service_spark.operators.sampling import (
        KEY_FOLD,
        KNUTH,
        apply_mix_epochs,
        domain_mix_weights,
    )

    rows = [("a", i, 10) for i in range(200)] + [
        ("b", 1000 + i, 10) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "domain string, id long, sz long")
    w = domain_mix_weights(df, "domain", "sz")
    got = {
        r["id"]: r["n_copies"]
        for r in apply_mix_epochs(df, w, "domain", "id").collect()
    }
    wm = {r["domain"]: r["weight_ppm"] for r in w.collect()}
    for dom, rid, _ in rows:
        wp = wm[dom]
        frac = ((rid % KEY_FOLD) * KNUTH) % 1_000_000
        want = wp // 1_000_000 + (1 if frac < wp % 1_000_000 else 0)
        assert got[rid] == want
    got2 = {
        r["id"]: r["n_copies"]
        for r in apply_mix_epochs(
            df.repartition(13), w, "domain", "id"
        ).collect()
    }
    assert got == got2
    # achieved mix ~ target: both domains end near 125 tokens-worth
    tok = {"a": 0, "b": 0}
    for dom, rid, _ in rows:
        tok[dom] += got[rid] * 10
    assert abs(tok["a"] - tok["b"]) < 0.15 * (tok["a"] + tok["b"])
