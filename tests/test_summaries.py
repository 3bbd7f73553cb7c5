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


def test_mg_summary_merge_preserves_completeness(spark):
    """Fold a stream through per-batch summaries + merges with the
    TIGHTEST capacity; every true heavy hitter must survive the merge
    tree (mergeable-summaries invariant)."""
    from data_engineering_etl_self_service_spark.operators.summaries import (
        mg_merge,
        mg_summary,
    )

    b0 = ["a"] * 30 + [f"x{i}" for i in range(40)]
    b1 = ["b"] * 35 + [f"y{i}" for i in range(40)]
    b2 = ["a"] * 25 + ["late"] * 80 + [f"z{i}" for i in range(20)]
    dfs = [_stream_df(spark, b) for b in (b0, b1, b2)]
    cap = 4
    s = mg_summary(dfs[0], "item", cap)
    for d in dfs[1:]:
        s = mg_merge(s, mg_summary(d, "item", cap), cap)
    surv = {r.item for r in s.collect()}
    assert len(surv) <= cap
    n = len(b0) + len(b1) + len(b2)
    full = Counter(b0 + b1 + b2)
    for item, c in full.items():
        if c * (cap + 1) > n:  # count > n/(cap+1): guaranteed survivor
            assert item in surv, (item, c, n, surv)


def test_mg_streaming_sink_tracks_heavy_hitters(spark, tmp_path):
    """Structured Streaming trending-items: file stream (one micro-batch
    per file) -> mg_batch_sink folds each batch's summary into the
    snapshot-stored standing summary; every true heavy hitter of the
    full stream must be in the stored candidate set, exactly-once across
    a replayed batch."""
    from data_engineering_etl_self_service_spark.operators.summaries import (
        mg_batch_sink,
    )
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        read_snapshot,
    )

    src = str(tmp_path / "in")
    b0 = ["a"] * 40 + [f"x{i}" for i in range(30)]
    b1 = ["late"] * 60 + [f"y{i}" for i in range(30)]
    for b in (b0, b1):
        spark.createDataFrame([(v,) for v in b], "item string").coalesce(
            1
        ).write.mode("append").parquet(src)
    base = str(tmp_path / "mg")
    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = mg_batch_sink(base, "item", capacity=8)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    surv = {r.item for r in read_snapshot(spark, base).collect()}
    assert len(surv) <= 8
    n = len(b0) + len(b1)
    for item, c in Counter(b0 + b1).items():
        if c * 9 > n:  # > n/(capacity+1): guaranteed in the summary
            assert item in surv, (item, c, surv)
    # replayed micro-batch is a no-op (exactly-once)
    batch_df = spark.createDataFrame([("a",)] * 100, "item string")
    sink(batch_df, 0)
    assert {r.item for r in read_snapshot(spark, base).collect()} == surv
