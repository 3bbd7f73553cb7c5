"""Warm timing of the r13 two-phase builder queries at sf0.1 (+ ANN)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from data_engineering_etl_self_service_spark import get_spark
from data_engineering_etl_self_service_spark.queries import QUERIES

NAMES = sys.argv[1:] or [
    "scan_pruning", "scan_pruning_pages", "clustering_depth",
    "skip_index_scan", "sq_ann", "cosine_topk",
]
spark = get_spark(app_name="probe_r13_builders")
for name in NAMES:
    QUERIES[name](spark, "/root/testdata/sf0.01").count()
for name in NAMES:
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES[name](spark, "/root/testdata/sf0.1").count()
        best.append(round(time.perf_counter() - t0, 3))
    print(f"# {name}: min={min(best):.3f} samples={best}", flush=True)
