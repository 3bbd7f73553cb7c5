"""Training-shard layout (operators/sharding.py): deterministic shuffle
key, balanced assignment, on-disk shard layout and read-back order."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.catalog import load_table
from data_engineering_etl_self_service_spark.operators.sharding import (
    shard_assign,
    shard_key,
    write_training_shards,
)


def test_shard_key_is_deterministic_and_31_bit(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    a = df.select("doc_id", shard_key("doc_id").alias("h"))
    b = df.select("doc_id", shard_key("doc_id").alias("h"))
    assert a.collect() == b.collect()
    mm = a.agg(F.min("h"), F.max("h")).first()
    assert mm[0] >= 0 and mm[1] < 2**31


def test_shard_assign_balances_dense_sequential_ids(spark):
    """Dense-sequential ids (the adversarial case for naive id % n)
    still balance because the LCG mix decorrelates id and shard."""
    df = spark.range(0, 16_000).withColumnRenamed("id", "doc_id")
    counts = [
        r.n
        for r in shard_assign(df, n_shards=16)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(counts) == 16
    assert max(counts) < 1.2 * min(counts)


def test_shard_position_is_global_shuffle_order(spark):
    """position is 1..|shard| without gaps, ordered by the mixed key —
    i.e. a sequential reader of one shard sees the deterministic
    shuffled order, not source order."""
    df = spark.range(0, 2_000).withColumnRenamed("id", "doc_id")
    a = shard_assign(df, n_shards=4, with_position=True)
    for shard in range(4):
        rows = sorted(
            a.filter(F.col("shard") == shard).collect(),
            key=lambda r: r.position,
        )
        assert [r.position for r in rows] == list(range(1, len(rows) + 1))
        hs = [(r.h, r.doc_id) for r in rows]
        assert hs == sorted(hs)
        # shuffled: shard-local position order must not be doc_id order
        assert [r.doc_id for r in rows] != sorted(r.doc_id for r in rows)


def test_write_training_shards_layout_and_manifest(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, n_shards=8).collect()
    assert len(manifest) == 8
    assert sum(r.n_rows for r in manifest) == docs.count()
    # layout: one shard=N directory per shard value
    import pathlib

    dirs = sorted(
        p.name for p in pathlib.Path(path).iterdir() if p.name.startswith("shard=")
    )
    assert len(dirs) == 8
    # read-back preserves all rows and the manifest checksum is the
    # recomputed mixed-key sum (certifies assignment, not just counts)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    expect = {
        r.shard: r.s
        for r in shard_assign(docs, n_shards=8)
        .groupBy("shard")
        .agg(F.sum("h").alias("s"))
        .collect()
    }
    for r in manifest:
        assert expect[r.shard] == r.h_checksum


def test_shard_key_int32_ids_and_column_collision_guard(spark):
    """Round-6 review fixes: an IntegerType id column must not overflow
    under ANSI mode (pre-fold + cast), and shard_assign refuses to
    silently overwrite existing h/shard/position columns."""
    import pytest

    df32 = spark.createDataFrame(
        [(100000,), (2,), (2**31 - 1,)], "doc_id int"
    )
    rows = {
        r.doc_id: r.h
        for r in shard_assign(df32, n_shards=4).collect()
    }
    for i, h in rows.items():
        assert h == (i * 1103515245 + 12345) % 2**31
    # long ids beyond 2^31 fold deterministically instead of overflowing
    big = spark.createDataFrame([(2**33 + 5,)], "doc_id long")
    got = shard_assign(big, n_shards=4).first().h
    assert got == (((2**33 + 5) % 2**31) * 1103515245 + 12345) % 2**31
    with pytest.raises(ValueError, match="overwrite"):
        shard_assign(
            spark.createDataFrame([(1, 2)], "doc_id long, shard long")
        )
