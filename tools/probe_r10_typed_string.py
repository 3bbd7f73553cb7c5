"""String-lane typed-pruning audit: what drives the wall? (round 10)

VERDICT r9 #6: `scan_pruning_typed`'s string-lane audit stage measured
e = 0.82 sf0.1→sf1 — the steepest of the audit family. Two candidate
cost drivers:

- per-FILE footer decode (fixed cost × file count — the audit's
  intended contract), vs
- something growing with DISTINCT strings per file (would mean the
  truncated-stats handling reads more than min/max windows).

This probe separates them: three synthetic string lakes —
(A) baseline K files × N distinct strings, (B) same K files × 10N
distinct strings, (C) 10K files × N strings — each audited with the
same string-range `pruning_report` the query uses. If the dominant
term is per-file decode, e_files ≈ saturation-bound linear and
e_distinct ≈ 0.

Usage: python tools/probe_r10_typed_string.py   (run idle)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from data_engineering_etl_self_service_spark import get_spark
from data_engineering_etl_self_service_spark.operators.parquet_meta import (
    pruning_report,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(root: str, n_files: int, n_rows: int) -> None:
    shutil.rmtree(root, ignore_errors=True)
    for f in range(n_files):
        d = os.path.join(root, f"part={f % 8}")
        os.makedirs(d, exist_ok=True)
        lo = f * n_rows
        pq.write_table(
            pa.table(
                {
                    "s": pa.array(
                        [f"w{(lo + i):09d}" for i in range(n_rows)]
                    ),
                    "v": pa.array(range(lo, lo + n_rows), pa.int64()),
                }
            ),
            os.path.join(d, f"f{f:04d}.parquet"),
            row_group_size=max(1024, n_rows // 4),
        )


def _best2(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="probe-typed-string")
    k, n = 256, 5_000
    lakes = {
        "A_base": (k, n),
        "B_10x_distinct": (k, 10 * n),
        "C_10x_files": (10 * k, n),
    }
    walls = {}
    for label, (nf, nr) in lakes.items():
        root = os.path.join(ROOT, ".scratch", f"probe_typed_{label}")
        build(root, nf, nr)
        audit = lambda r=root: pruning_report(
            spark, r, column="s", lo="w%09d" % 1000, hi="w%09d" % 9000
        ).count()
        audit()  # warm
        walls[label] = _best2(audit)
        shutil.rmtree(root, ignore_errors=True)
    out = {
        "probe": "typed_string_audit_cost_driver",
        **walls,
        "e_distinct": round(
            math.log10(walls["B_10x_distinct"] / walls["A_base"]), 2
        ),
        "e_files": round(
            math.log10(walls["C_10x_files"] / walls["A_base"]), 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
