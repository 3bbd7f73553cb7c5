"""Incremental rollup: exact maintenance, self-describing reads,
exactly-once streaming sink, maintenance-safe watermark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.operators.rollup import (
    read_rollup,
    rollup_batch_sink,
    upsert_rollup,
)

def _grains():
    # built lazily: Column construction needs an active SparkContext
    return {"k": F.pmod(F.col("id"), F.lit(4))}


AGGS = {
    "n": ("count", None),
    "s": ("sum", "v"),
    "mn": ("min", "v"),
    "mx": ("max", "v"),
}


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", (F.col("id") * 1.5).alias("v")
    )


def test_incremental_equals_direct(spark, tmp_path):
    base = str(tmp_path / "r")
    for lo, hi in ((0, 40), (40, 70), (70, 100)):
        upsert_rollup(spark, base, _mk(spark, lo, hi), _grains(), AGGS)
    got = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in read_rollup(spark, base, {"k": F.col("k")}).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in _mk(spark, 0, 100)
        .groupBy(F.pmod(F.col("id"), F.lit(4)).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want
    # grand total (no group): one row, kinds from the manifest
    tot = read_rollup(spark, base).collect()[0]
    assert tot["n"] == 100 and tot["mx"] == 99 * 1.5


def test_rollup_sink_exactly_once_and_maintenance_safe(spark, tmp_path):
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        compact_snapshot,
        last_committed_batch,
        vacuum,
    )

    base = str(tmp_path / "r")
    sink = rollup_batch_sink(base, _grains(), AGGS)
    sink(_mk(spark, 0, 50), 0)
    sink(_mk(spark, 50, 100), 1)
    sink(_mk(spark, 50, 100), 1)  # crash replay — must not double-count
    assert read_rollup(spark, base).collect()[0]["n"] == 100

    compact_snapshot(spark, base)
    vacuum(base, keep_last=1)
    assert last_committed_batch(base) == 1
    sink(_mk(spark, 50, 100), 1)  # replay after maintenance — still a no-op
    assert read_rollup(spark, base).collect()[0]["n"] == 100


def test_rollup_time_travel_and_unmergeable_kind(spark, tmp_path):
    base = str(tmp_path / "r")
    v1 = upsert_rollup(spark, base, _mk(spark, 0, 10), _grains(), AGGS)
    v2 = upsert_rollup(spark, base, _mk(spark, 10, 30), _grains(), AGGS)
    assert read_rollup(spark, base, version=v1).collect()[0]["n"] == 10
    assert read_rollup(spark, base, version=v2).collect()[0]["n"] == 30
    with pytest.raises(ValueError, match="unmergeable"):
        upsert_rollup(
            spark, base, _mk(spark, 0, 5), _grains(), {"p50": ("median", "v")}
        )


def test_rollup_sink_from_real_stream(spark, tmp_path):
    """End-to-end Structured Streaming maintenance: file stream with
    maxFilesPerTrigger=1 (one micro-batch per file) → rollup_batch_sink →
    partials equal the direct aggregate of everything streamed."""
    src = str(tmp_path / "in")
    _mk(spark, 0, 60).coalesce(1).write.mode("append").parquet(src)
    _mk(spark, 60, 100).coalesce(1).write.mode("append").parquet(src)

    base = str(tmp_path / "r")
    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            rollup_batch_sink(base, _grains(), AGGS)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    tot = read_rollup(spark, base).collect()[0]
    assert tot["n"] == 100
    got = {
        r["k"]: (r["n"], r["s"])
        for r in read_rollup(spark, base, {"k": F.col("k")}).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"])
        for r in _mk(spark, 0, 100)
        .groupBy(F.pmod(F.col("id"), F.lit(4)).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert got == want


def test_rollup_hll_distinct_merges_like_direct_sketch(spark, tmp_path):
    """kind 'hll': distinct-per-grain via mergeable sketch states — the
    union of per-batch partials must estimate exactly like one direct
    sketch over everything (merge-consistency), and close to truth."""
    base = str(tmp_path / "r")
    aggs = {"n": ("count", None), "du": ("hll", "u")}

    def mk(lo, hi):
        # overlapping user ids across batches → dedup across batches matters
        return spark.range(lo, hi).select(
            "id", F.pmod(F.col("id"), F.lit(37)).cast("string").alias("u")
        )

    for lo, hi in ((0, 40), (20, 80), (60, 120)):
        upsert_rollup(spark, base, mk(lo, hi), _grains(), aggs)
    got = {
        r["k"]: r["du"]
        for r in read_rollup(spark, base, {"k": F.col("k")}).collect()
    }
    direct = {
        r["k"]: r["du"]
        for r in mk(0, 40)
        .unionByName(mk(20, 80))
        .unionByName(mk(60, 120))
        .groupBy(F.pmod(F.col("id"), F.lit(4)).alias("k"))
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("u", 12))
            .cast("long")
            .alias("du")
        )
        .collect()
    }
    assert got == direct  # merged partials ≡ one direct sketch
    truth = {
        r["k"]: r["du"]
        for r in mk(0, 40)
        .unionByName(mk(20, 80))
        .unionByName(mk(60, 120))
        .groupBy(F.pmod(F.col("id"), F.lit(4)).alias("k"))
        .agg(F.countDistinct("u").alias("du"))
        .collect()
    }
    for k, est in got.items():
        assert abs(est - truth[k]) <= max(2, 0.05 * truth[k])


def test_rollup_hist_merges_exactly_and_serves_percentiles(spark, tmp_path):
    """hist: kind — 3-batch incremental histograms must EQUAL the
    one-shot direct histogram (exact mergeability), and percentile-at-
    read must land within one bin width of the exact percentile."""
    from data_engineering_etl_self_service_spark.operators.rollup import (
        hist_percentile,
    )

    kind = "hist:0:300:30"  # v = id*1.5 over id<200 -> v in [0, 300)
    aggs = {"h": (kind, "v"), "n": ("count", None)}
    base = str(tmp_path / "hist_roll")
    for lo, hi in ((0, 70), (70, 150), (150, 200)):
        upsert_rollup(spark, base, _mk(spark, lo, hi), _grains(), aggs)
    inc = {
        r["k"]: (list(r["h"]), r["n"])
        for r in read_rollup(spark, base, {"k": F.col("k")}).collect()
    }
    direct_base = str(tmp_path / "hist_direct")
    upsert_rollup(spark, direct_base, _mk(spark, 0, 200), _grains(), aggs)
    direct = {
        r["k"]: (list(r["h"]), r["n"])
        for r in read_rollup(spark, direct_base, {"k": F.col("k")}).collect()
    }
    assert inc == direct and len(inc) == 4
    for k, (h, n) in inc.items():
        assert sum(h) == n  # clamp keeps the denominator honest

    # percentile-at-read: median of each group's v within one bin (10)
    med = {
        r["k"]: r["p50"]
        for r in read_rollup(spark, base, {"k": F.col("k")})
        .select("k", hist_percentile(F.col("h"), 1, 2, kind).alias("p50"))
        .collect()
    }
    exact = {
        r["k"]: r["m"]
        for r in _mk(spark, 0, 200)
        .groupBy(F.pmod(F.col("id"), F.lit(4)).alias("k"))
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").alias("m")
        )
        .collect()
    }
    for k in exact:
        assert abs(med[k] - exact[k]) <= 10.0, (k, med[k], exact[k])


def test_rollup_hist_excludes_nulls(spark, tmp_path):
    """hist: NULL values must be EXCLUDED from every bin (documented
    contract) — not silently clamped into bin 0 by Spark's
    null-skipping greatest(). Bin totals equal the NON-null count."""
    df = spark.range(0, 100).select(
        "id",
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id") * 1.5)
        .alias("v"),
    )
    aggs = {"h": ("hist:0:150:15", "v"), "n": ("count", None)}
    base = str(tmp_path / "hist_null")
    upsert_rollup(spark, base, df, _grains(), aggs)
    rows = read_rollup(spark, base, {"k": F.col("k")}).collect()
    assert len(rows) == 4
    for r in rows:
        non_null = df.filter(
            (F.pmod(F.col("id"), F.lit(4)) == r["k"])
            & F.col("v").isNotNull()
        ).count()
        assert sum(r["h"]) == non_null  # NULLs out of the histogram
        assert r["n"] == 25  # count(*) kind still counts every row
