"""Lineage-truncation policy (round 12 — VERDICT r11 advisory #2):
every iterative operator materializes through
``runtime.truncate_lineage``, which defaults to ``localCheckpoint``
(query-retry contract) and swaps to reliable ``checkpoint()`` against a
configured directory when
``spark.data_engineering_etl.checkpoint.reliable`` is true — the
cluster posture where an executor loss mid-iteration must cost a
re-read, not the job. Both modes must produce identical results on the
iterative queries the directive names."""

from __future__ import annotations

import os

import pytest

from data_engineering_etl_self_service_spark.queries import QUERIES
from data_engineering_etl_self_service_spark.runtime import (
    CHECKPOINT_DIR,
    RELIABLE_FLAG,
    truncate_lineage,
)

SF = "/root/testdata/sf0.001"


def _reset(spark):
    spark.conf.set(RELIABLE_FLAG, "false")
    try:
        spark.conf.unset(CHECKPOINT_DIR)
    except Exception:
        pass


def test_reliable_flag_without_dir_is_loud(spark):
    """Must run before any test sets a checkpoint dir on the
    session-scoped SparkContext (setCheckpointDir is sticky)."""
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("a checkpoint dir is already set on this session")
    spark.conf.set(RELIABLE_FLAG, "true")
    try:
        with pytest.raises(ValueError, match="checkpoint directory"):
            truncate_lineage(spark.range(3))
    finally:
        _reset(spark)


def test_default_mode_is_local_checkpoint(spark):
    _reset(spark)
    out = truncate_lineage(spark.range(5))
    assert out.count() == 5
    # lineage really truncated: the plan is a materialized scan now
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan


def test_reliable_checkpoint_parity_on_iterative_queries(spark, tmp_path):
    """The directive's done-criterion: neardup_groups + pagerank_nations
    produce identical results in both modes, and the reliable mode
    really writes to the configured fault-tolerant dir."""
    _reset(spark)

    def run(name):
        return sorted(
            tuple(r) for r in QUERIES[name](spark, SF).collect()
        )

    names = ("neardup_groups", "pagerank_nations")
    local = {n: run(n) for n in names}
    ckpt = str(tmp_path / "reliable_ckpt")
    spark.conf.set(RELIABLE_FLAG, "true")
    spark.conf.set(CHECKPOINT_DIR, ckpt)
    try:
        for n in names:
            assert run(n) == local[n], n
        # the reliable path really touched the configured dir
        assert os.path.isdir(ckpt) and any(os.scandir(ckpt))
    finally:
        _reset(spark)


def test_spread_scan_is_identity_at_scan_parallelism(spark):
    """The 100 TB contract: an input that already has >=
    defaultParallelism partitions passes through UNCHANGED (same object,
    so the codec-query plans stay zero-exchange at real scan
    parallelism — the posture test_codec_queries_* pins)."""
    from data_engineering_etl_self_service_spark.runtime import spread_scan

    n = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, n)
    assert spread_scan(df, "id") is df
    wide = spark.range(0, 1000, 1, n + 3)
    assert spread_scan(wide) is wide


def test_spread_scan_spreads_small_scans_deterministically(spark):
    """A 1-split input is raised to defaultParallelism partitions; the
    rows are unchanged, and the keyed form hash-partitions (deterministic
    placement under task retry — no rand-derived keys)."""
    from data_engineering_etl_self_service_spark.runtime import spread_scan

    df = spark.range(0, 97, 1, 1)
    out = spread_scan(df, "id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in out.collect()) == list(range(97))
    # keyless (round-robin) form: same rows, same partition count
    out2 = spread_scan(df)
    assert out2.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in out2.collect()) == list(range(97))
