"""Round-9 focused scale probes (VERDICT r8 #5):

1. AUDIT STAGE ALONE for the skipping audits — the end-to-end
   `scan_pruning*` queries are builder-dominated (they write the
   mini-lake they then audit), so their whole-query exponent measures
   the builder. This probe runs each query once per SF to materialize
   its lake, then times ONLY the audit operator over the built lake
   (best-of-2, warmed) at sf0.1 vs the sf1 replica and reports
   e = log10(t_sf1 / t_sf0.1). The bar: the audit stage should scale
   like `lake_audit`'s footers-only 0.33 from the round-8 probe.

2. `compact_flagged` WALL vs FLAGGED-PARTITION COUNT — the loop is
   driver-sequenced per flagged partition, so its cost contract is
   linear in the flagged count (each rewrite is one bounded shuffle).
   The probe builds hive lakes with K partitions x 12 tiny files and
   times the audit->compact->swap loop at K=8 and K=80.

Usage: python tools/probe_r9_audit.py [sf1_dir]
(defaults to .scratch/sf1; run idle — timings share the machine.)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_etl_self_service_spark import get_spark

SF01 = "/root/testdata/sf0.1"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _best2(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def probe_audit_stage(spark, sf1_dir: str) -> None:
    from data_engineering_etl_self_service_spark.operators.parquet_meta import (
        lake_audit_report,
        page_pruning_report,
        pruning_report,
    )
    from data_engineering_etl_self_service_spark.queries import QUERIES

    cases = {
        "scan_pruning_audit_stage": (
            "scan_pruning",
            lambda d: pruning_report(spark, d, column="v", lo=16, hi=47),
        ),
        "scan_pruning_pages_audit_stage": (
            "scan_pruning_pages",
            lambda d: page_pruning_report(
                spark, d, column="v", lo=16, hi=47
            ),
        ),
        "scan_pruning_typed_audit_stage": (
            "scan_pruning_typed",
            lambda d: pruning_report(
                spark, d, column="s", lo="w%09d" % 16, hi="w%09d" % 47
            ),
        ),
        "lake_audit_audit_stage": (
            "lake_audit",
            lambda d: lake_audit_report(spark, d, small_file_bytes=1 << 20),
        ),
    }
    for label, (qname, audit) in cases.items():
        walls = {}
        for sflabel, sfdir in (("sf0.1", SF01), ("sf1", sf1_dir)):
            # materialize the query's mini-lake for this SF (builder
            # runs once; NOT timed)
            QUERIES[qname](spark, sfdir).count()
            lake = os.path.join(
                ROOT, ".scratch", qname, os.path.basename(sfdir.rstrip("/"))
            )
            audit(lake).count()  # warm codegen
            walls[sflabel] = _best2(lambda: audit(lake).count())
        exp = round(
            math.log10(
                max(walls["sf1"], 1e-3) / max(walls["sf0.1"], 1e-3)
            ),
            2,
        )
        print(json.dumps({"probe": label, **walls, "exponent": exp}))


def probe_compact_flagged(spark) -> None:
    from pyspark.sql import functions as F

    from data_engineering_etl_self_service_spark.operators.layout import (
        compact_flagged,
    )

    walls = {}
    for k in (8, 80):
        lake = os.path.join(ROOT, ".scratch", f"probe_compact_{k}")
        shutil.rmtree(lake, ignore_errors=True)
        (
            spark.range(k * 1200)
            .withColumn("part", (F.col("id") % k).cast("int"))
            .withColumn("h", F.md5(F.col("id").cast("string")))
            .repartition(12)
            .write.partitionBy("part")
            .parquet(lake)
        )
        t0 = time.perf_counter()
        out = compact_flagged(
            spark, lake, small_file_bytes=1 << 20, target_mb=128
        ).collect()
        walls[k] = round(time.perf_counter() - t0, 3)
        assert len(out) == k and all(r["swapped"] for r in out), out
        shutil.rmtree(lake, ignore_errors=True)
    print(
        json.dumps(
            {
                "probe": "compact_flagged_wall_vs_flagged_count",
                "k8_s": walls[8],
                "k80_s": walls[80],
                "wall_ratio_at_10x_flagged": round(walls[80] / walls[8], 2),
            }
        )
    )


def main() -> None:
    sf1_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(ROOT, ".scratch", "sf1")
    )
    spark = get_spark(app_name="probe-r9-audit")
    probe_audit_stage(spark, sf1_dir)
    probe_compact_flagged(spark)


if __name__ == "__main__":
    main()
