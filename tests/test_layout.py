"""Lake layout operators: compaction sizing and Z-order data skipping."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.operators.layout import (
    compact,
    zorder_by,
    zorder_key,
)


def test_compact_reduces_file_count(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("small_files"))
    out = str(tmp_path_factory.mktemp("compacted"))
    spark.range(0, 100_000).repartition(64).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/part-*")) == 64
    n = compact(spark, src, out, target_mb=128)
    assert n == 1  # ~800 KB of input → one target file
    assert len(glob.glob(f"{out}/part-*")) == 1
    assert spark.read.parquet(out).count() == 100_000


def test_zorder_key_interleaves_bits(spark):
    # 2 columns, 2 bits each: corners of the unit square map to the
    # classic Morton order 0,1,2,3.
    df = spark.createDataFrame(
        [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0)], "x double, y double"
    )
    got = {
        (r.x, r.y): r.k
        for r in df.withColumn("k", zorder_key(df, ["x", "y"], bits=2)).collect()
    }
    assert got[(0.0, 0.0)] == 0
    assert got[(3.0, 0.0)] == 0b0101  # x bits at even positions
    assert got[(0.0, 3.0)] == 0b1010
    assert got[(3.0, 3.0)] == 0b1111


def test_zorder_clusters_both_dimensions(spark, tmp_path_factory):
    """After Z-order by (x, y), each output file covers a small box of BOTH
    dimensions — the property parquet min/max skipping needs. A plain sort
    by x would leave per-file y spans ≈ the full domain."""
    out = str(tmp_path_factory.mktemp("zordered"))
    n, files = 40_000, 16
    df = spark.range(0, n).select(
        (F.col("id") % 200).cast("double").alias("x"),
        (F.floor(F.col("id") / 200)).cast("double").alias("y"),
    )
    zorder_by(df, ["x", "y"], n_files=files).write.mode("overwrite").parquet(out)
    spans = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(spans) == files
    avg_sx = sum(r.sx for r in spans) / files
    avg_sy = sum(r.sy for r in spans) / files
    # global span is ~200 in each dimension; clustered files must be far
    # narrower in BOTH (perfect quadrants would be ~50).
    assert avg_sx < 120 and avg_sy < 120, (avg_sx, avg_sy)


def test_compact_flagged_partitions_end_to_end(spark, tmp_path):
    """Audit → compaction loop (round 8): only the small-file-flagged
    partition is rewritten, rows are preserved and verified, the
    healthy partition's files are untouched, and a re-audit shows the
    flag cleared."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_engineering_etl_self_service_spark.operators.layout import (
        compact_flagged,
    )
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        lake_audit_report,
    )

    lake = tmp_path / "lake"
    # part=s: five tiny files (flag fires); part=h: one healthy file
    os.makedirs(lake / "part=s")
    # each ~3 KB (< threshold); merged ~13 KB (> threshold)
    for i in range(5):
        pq.write_table(
            pa.table(
                {"x": pa.array(range(i * 300, i * 300 + 300), pa.int64())}
            ),
            str(lake / "part=s" / f"f{i}.parquet"),
            compression="none",
        )
    os.makedirs(lake / "part=h")
    pq.write_table(  # comfortably above the small-file threshold
        pa.table({"x": pa.array(range(20_000), pa.int64())}),
        str(lake / "part=h" / "f0.parquet"),
        compression="none",
    )
    before_h = sorted(glob.glob(str(lake / "part=h" / "*")))

    rep = {
        r["partition"]: r
        for r in compact_flagged(
            spark, str(lake), small_file_bytes=4096, target_mb=128
        ).collect()
    }
    # only the flagged partition was compacted
    assert set(rep) == {"part=s"}
    r = rep["part=s"]
    assert r["swapped"] is True
    assert r["files_before"] == 5 and r["files_after"] < 5
    assert r["rows_before"] == r["rows_after"] == 1500
    # data identical after the swap
    got = sorted(
        x["x"] for x in spark.read.parquet(str(lake / "part=s")).collect()
    )
    assert got == list(range(1500))
    # healthy partition byte-for-byte untouched
    assert sorted(glob.glob(str(lake / "part=h" / "*"))) == before_h
    # staging/retired dirs cleaned up
    assert not any("__" in d for d in os.listdir(lake))
    # re-audit: the flag is cleared
    rep2 = {
        a["partition"]: a
        for a in lake_audit_report(
            spark, str(lake), small_file_bytes=4096
        ).collect()
    }
    assert rep2["part=s"]["small_file_flag"] is False


def test_compact_flagged_recovers_crashed_swap(spark, tmp_path):
    """Review r8: a crash between the two swap renames leaves the data
    in part=x__retired with the partition dir missing — the recovery
    sweep restores it, and audits never see staging dirs."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_engineering_etl_self_service_spark.operators.layout import (
        compact_flagged,
    )
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        lake_audit_report,
    )

    lake = tmp_path / "lake"
    d = lake / "part=x"
    d.mkdir(parents=True)
    pq.write_table(
        pa.table({"x": pa.array(range(500), pa.int64())}),
        str(d / "f.parquet"),
    )
    # simulate the crash window: src renamed away, staging half-done
    os.rename(d, str(d) + "__retired")
    os.makedirs(str(d) + "__compacting")
    # audits ignore the in-flight dirs entirely
    assert lake_audit_report(spark, str(lake)).count() == 0
    # the next maintenance run restores the partition first
    compact_flagged(spark, str(lake), small_file_bytes=1)
    assert sorted(os.listdir(lake)) == ["part=x"]
    assert spark.read.parquet(str(d)).count() == 500
