"""compact_orc_flagged wall vs FLAGGED-PARTITION COUNT (round 9).

Mirrors the r9 compact_flagged probe: the loop's cost driver is the
driver-sequenced per-partition merge, so the probe scales the number
of flagged hive partitions (K small files each) 10x and reports the
wall ratio. Zero-decode concat should make each unit a byte copy.

Usage: python tools/probe_r9_orc_compact.py [K_small] [K_big]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.orc as po

from data_engineering_etl_self_service_spark import get_spark
from data_engineering_etl_self_service_spark.operators.orc_meta import (
    compact_orc_flagged,
)


def build(root: str, n_parts: int, files_per_part: int = 8,
          rows_per_file: int = 5000) -> None:
    shutil.rmtree(root, ignore_errors=True)
    for p in range(n_parts):
        d = os.path.join(root, f"part={p}")
        os.makedirs(d)
        off = p * files_per_part * rows_per_file
        for j in range(files_per_part):
            po.write_table(
                pa.table(
                    {
                        "v": pa.array(
                            [
                                (i * 2654435761) % (1 << 40)
                                for i in range(off, off + rows_per_file)
                            ],
                            pa.int64(),
                        )
                    }
                ),
                os.path.join(d, f"f{j:03d}.orc"),
                compression="snappy",
            )
            off += rows_per_file


def main() -> None:
    k_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k_big = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    spark = get_spark(app_name="probe-orc-compact")
    # warmup: one throwaway compact so codegen/JIT and the ORC reader
    # init land outside the timed region (else the small-K run eats it)
    warm = "/tmp/orc_compact_probe_warm"
    build(warm, 2)
    compact_orc_flagged(spark, warm, small_file_bytes=32 << 20).collect()
    shutil.rmtree(warm, ignore_errors=True)
    out = {}
    for k in (k_small, k_big):
        root = f"/tmp/orc_compact_probe_{k}"
        build(root, k)
        t0 = time.perf_counter()
        rep = compact_orc_flagged(
            spark, root, small_file_bytes=32 << 20
        ).collect()
        wall = time.perf_counter() - t0
        assert len(rep) == k and all(r["swapped"] for r in rep), rep[:3]
        out[k] = wall
        print(f"K={k}: {wall:.2f} s ({len(rep)} partitions swapped)")
        shutil.rmtree(root, ignore_errors=True)
    print(
        f"ratio at {k_big // k_small}x flagged partitions: "
        f"{out[k_big] / out[k_small]:.2f}x wall"
    )


if __name__ == "__main__":
    main()
