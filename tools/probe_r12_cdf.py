"""Round-12 scale probes for the CDC surface (VERDICT r11 #1 and #3).

1. DEEP-HISTORY FEED WALL: fabricate dense append histories of 125 /
   250 / 500 / 1000 committed versions (pyarrow files + JSON manifests
   — the manifest protocol is files, not Spark jobs) and time the batch
   change feed end-to-end (`changes_between`, which auto-routes deep
   ranges through the per-file mapInArrow planner). The number that
   matters is the PER-VERSION wall: flat per-version cost means the
   route really is O(1)-plan / O(delta)-I/O in history depth, the bound
   the r11 sweep's plan-growth class demanded.

2. REPLICA DELTA COST: a 1,000,000-row upstream table replicates, then
   a 100-row upstream delete syncs. Reports the replica DATA bytes
   added (must be 0 — the apply is a position-delete vector, never a
   rewrite), the vector rows (must be 100), and the sync wall. This is
   the verdict's literal done-criterion: "a 100-row delete against a
   10^6-row replica does not rewrite 10^6 rows".

Usage: python tools/probe_r12_cdf.py [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark import get_spark
from data_engineering_etl_self_service_spark.sources.cdf import (
    changes_between,
    replicate_snapshot,
)
from data_engineering_etl_self_service_spark.sources.snapshots import (
    _read_manifest,
    delete_where,
    snapshot_versions,
    write_snapshot,
)


def fabricate_history(base: str, n_versions: int, rows_per_version: int = 20):
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(os.path.join(base, "_snapshots"))
    dirs = []
    for v in range(1, n_versions + 1):
        rel = os.path.join("data", f"v{v:06d}")
        os.makedirs(os.path.join(base, rel))
        lo = (v - 1) * rows_per_version
        tbl = pa.table(
            {
                "id": pa.array(range(lo, lo + rows_per_version), pa.int64()),
                "grp": pa.array(
                    [i % 7 for i in range(lo, lo + rows_per_version)],
                    pa.int64(),
                ),
            }
        )
        pq.write_table(tbl, os.path.join(base, rel, "part-0.parquet"))
        dirs.append(rel)
        manifest = {
            "version": v,
            "mode": "overwrite" if v == 1 else "append",
            "format": "parquet",
            "created_utc": "2026-01-01T00:00:00Z",
            "data_dirs": list(dirs),
            "schema": "struct<id:bigint,grp:bigint>",
        }
        with open(
            os.path.join(base, "_snapshots", f"v{v:012d}.json"), "w"
        ) as f:
            json.dump(manifest, f)


def data_dir_bytes(base: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(os.path.join(base, "data")):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/r12_cdf"
    spark = get_spark(app_name="probe-r12-cdf")

    print("== deep-history feed wall (per-file route) ==")
    for n in (125, 250, 500, 1000):
        base = os.path.join(out_dir, f"hist_{n}")
        fabricate_history(base, n)
        # warm once (JVM/py-worker spin-up), then best of 2 measured
        changes_between(spark, base).count()
        walls = []
        for _ in range(2):
            t0 = time.time()
            rows = changes_between(spark, base).count()
            walls.append(time.time() - t0)
        w = min(walls)
        assert rows == n * 20, (rows, n)
        print(
            f"versions={n:5d} wall={w:6.2f}s per_version={w / n * 1000:7.2f} ms"
            f" rows={rows}"
        )
        shutil.rmtree(base, ignore_errors=True)

    print("== replica delta cost: 100-row delete vs 10^6-row replica ==")
    src = os.path.join(out_dir, "delta_src")
    dst = os.path.join(out_dir, "delta_dst")
    ck = os.path.join(out_dir, "delta_ck")
    for d in (src, dst, ck):
        shutil.rmtree(d, ignore_errors=True)
    big = spark.range(1_000_000).select(
        F.col("id"),
        (F.col("id") % 97).alias("grp"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    )
    write_snapshot(big, src, mode="overwrite")
    t0 = time.time()
    replicate_snapshot(spark, src, dst, ck, key_cols=["id"])
    t_sync0 = time.time() - t0
    bytes_before = data_dir_bytes(dst)
    delete_where(spark, src, "id % 10000 = 7")  # exactly 100 rows
    t0 = time.time()
    replicate_snapshot(spark, src, dst, ck, key_cols=["id"])
    t_sync1 = time.time() - t0
    bytes_after = data_dir_bytes(dst)
    head = _read_manifest(dst, snapshot_versions(dst)[-1])
    print(
        f"initial sync (10^6 rows): {t_sync0:.2f}s, replica data bytes="
        f"{bytes_before:,}"
    )
    print(
        f"100-row delete sync: {t_sync1:.2f}s, mode={head['mode']}, "
        f"n_deleted={head.get('n_deleted')}, n_inserted={head.get('n_inserted')}, "
        f"data bytes added={bytes_after - bytes_before:,} (must be 0)"
    )
    assert bytes_after == bytes_before, "delta apply rewrote data!"
    assert head["mode"] == "merge" and head["n_deleted"] == 100
    for d in (src, dst, ck):
        shutil.rmtree(d, ignore_errors=True)
    print("ok")


if __name__ == "__main__":
    main()
