"""Round-11 maintenance-path scale probes (VERDICT r10 #5):

1. NESTED-FLAG GUARD at K≈10³/10⁴ flagged partitions — the r10 guard
   was an O(K²) all-pairs prefix scan (~10⁸ driver-side comparisons at
   K≈10⁴ before any rewrite started); round 11 replaced it with the
   trailing-slash sorted-adjacency check (O(K log K)). The probe times
   both on the same synthetic label lists and verifies they agree,
   including the lexicographic trap labels ('ds=1.bak' between 'ds=1'
   and 'ds=1/hr=2').

2. ``compact_flagged`` END-TO-END at K=1000 flagged partitions — the
   directive's done-bar: wall still ~flat per partition with the pool
   sized from defaultParallelism (the r10 probe stopped at K=80). The
   lake is K hive partitions × 2 tiny files, every partition flagged.

Usage: python tools/probe_r11_maintenance.py
(run idle — timings share the machine; results go to stdout, record
the summary line in SCALE.md.)
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def guard_old(labels: list[str]) -> bool:
    return any(
        a != b and (b + "/").startswith(a + "/")
        for a in labels
        for b in labels
    )


def guard_new(labels: list[str]) -> bool:
    keys = sorted(p + "/" for p in labels)
    return any(b.startswith(a) for a, b in zip(keys, keys[1:]))


def probe_guard() -> None:
    rng = random.Random(11)
    for k in (1_000, 10_000):
        # realistic hive labels, a few nested + the lexicographic trap
        labels = [f"ds=2026-{i:05d}" for i in range(k - 3)]
        labels += ["ds=x", "ds=x.bak", "ds=x/hr=2"]
        rng.shuffle(labels)
        t0 = time.perf_counter()
        old = guard_old(labels)
        t_old = time.perf_counter() - t0
        t0 = time.perf_counter()
        new = guard_new(labels)
        t_new = time.perf_counter() - t0
        assert old == new is True
        flat = [f"ds=2026-{i:05d}" for i in range(k)]
        assert guard_old(flat) == guard_new(flat) is False
        print(
            f"nested-guard K={k}: old(all-pairs)={t_old:.3f}s "
            f"new(sorted-adjacent)={t_new * 1000:.1f}ms "
            f"speedup={t_old / max(t_new, 1e-9):.0f}x"
        )


def probe_compact_k1000(spark) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_engineering_etl_self_service_spark.operators.layout import (
        compact_flagged,
    )

    for k in (100, 1000):
        lake = os.path.join(ROOT, ".scratch", f"probe_r11_lake_k{k}")
        shutil.rmtree(lake, ignore_errors=True)
        tbl = pa.table({"x": pa.array(range(200), pa.int64())})
        for i in range(k):
            d = os.path.join(lake, f"ds={i:05d}")
            os.makedirs(d)
            for j in range(2):
                pq.write_table(tbl, os.path.join(d, f"f{j}.parquet"),
                               compression="none")
        t0 = time.perf_counter()
        rep = compact_flagged(
            spark, lake, small_file_bytes=64 << 10, target_mb=128
        ).collect()
        wall = time.perf_counter() - t0
        swapped = sum(1 for r in rep if r["swapped"])
        assert swapped == k, (swapped, k)
        print(
            f"compact_flagged K={k}: wall={wall:.1f}s "
            f"({wall / k * 1000:.0f}ms/partition, all swapped)"
        )
        shutil.rmtree(lake, ignore_errors=True)


def main() -> None:
    probe_guard()
    from data_engineering_etl_self_service_spark import get_spark

    spark = get_spark(app_name="probe_r11")
    probe_compact_k1000(spark)


if __name__ == "__main__":
    main()
