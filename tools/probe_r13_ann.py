"""Round-13 idle A/B: `runtime.spread_scan` on the ANN-family embeddings
scan (VERDICT r12 "Next round" #1 — the r12 A/B under co-tenant load gave
contradictory verdicts, so the family was deferred).

Protocol (the round's own discipline, OPTIMIZATION_r12.md "Method"):
ONE warm session, idle machine, variants INTERLEAVED (off/on/off/on) so a
load wave poisons both arms equally; per arm per alternation best-of-2 at
sf0.1; warm-up at sf0.01 first. The timed action is `.count()` — the bench's
methodology, so a winner here transfers to the bench as measured.

Usage: SPARK_GRAFT_CPUS=32 python tools/probe_r13_ann.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark import get_spark
from data_engineering_etl_self_service_spark.queries import _t
from data_engineering_etl_self_service_spark.runtime import spread_scan

SF_WARM = "/root/testdata/sf0.01"
SF_MEAS = "/root/testdata/sf0.1"


def _variants(spark, sf_dir, spread: bool):
    """name -> DataFrame, corpus-side embeddings optionally spread.

    Mirrors exactly the change queries.py would ship: only the CORPUS
    frame is spread; the query/codebook side stays on the raw scan.
    """
    from data_engineering_etl_self_service_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        knn_join,
        knn_join_blas,
        pq_topk,
        sq_topk,
    )

    e = _t(spark, sf_dir, "embeddings")
    es = spread_scan(e, "vec_id") if spread else e
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vec")
    )
    out = {
        "cosine_topk": cosine_topk(es, q, k=10),
        "ivf_ann": ivf_topk(es, q, k=10, n_cells=8, nprobe=2),
        "sq_ann": sq_topk(es, q, k=10),
        "pq_ann": pq_topk(es, q, k=10),
        "knn_join": knn_join(es, k=1, n_cells=8),
        "knn_join_fast": knn_join_blas(es, k=1, n_cells=8),
    }
    return out


def main() -> None:
    spark = get_spark(app_name="probe_r13_ann")
    names = [
        "cosine_topk",
        "ivf_ann",
        "sq_ann",
        "pq_ann",
        "knn_join",
        "knn_join_fast",
    ]
    # warm both arms
    for spread in (False, True):
        for name, df in _variants(spark, SF_WARM, spread).items():
            df.count()
    results: dict[str, dict[str, list[float]]] = {
        n: {"off": [], "on": []} for n in names
    }
    for alternation in range(2):
        for spread in (False, True):
            arm = "on" if spread else "off"
            for name in names:
                spark.sparkContext.setJobDescription(
                    f"ann-ab {name} {arm} #{alternation}"
                )
                best = float("inf")
                for _ in range(2):
                    df = _variants(spark, SF_MEAS, spread)[name]
                    t0 = time.perf_counter()
                    df.count()
                    best = min(best, time.perf_counter() - t0)
                results[name][arm].append(round(best, 3))
                print(
                    f"# {name} {arm} alt{alternation}: {best:.3f}s",
                    flush=True,
                )
    print("\n== summary (best per arm over alternations) ==")
    for name in names:
        off = min(results[name]["off"])
        on = min(results[name]["on"])
        verdict = "SPREAD WINS" if on < off * 0.95 else (
            "identity wins" if off < on * 0.95 else "wash"
        )
        print(
            f"{name}: off={off:.3f} on={on:.3f} "
            f"({off / on:.2f}x) -> {verdict}  "
            f"all off={results[name]['off']} on={results[name]['on']}"
        )


if __name__ == "__main__":
    main()
