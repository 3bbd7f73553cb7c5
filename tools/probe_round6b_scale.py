"""Scale probes for the late-round-6 operators: archive ingestion
(tar/zip/WebDataset), URL canonicalization, correlation moments,
k-anonymity, and the tokenizer inference pair (WordPiece greedy match,
unigram-LM Viterbi) at 10× table size on local[32].

Replication is "fresh" (ids offset per replica): archives/URLs are
per-row work so wall should track rows ~linearly; the tokenizer
queries grow the CORPUS 10× while the word-type vocabulary stays
fixed, so their wall should grow SUB-linearly — that sub-linearity is
the word-type decomposition's whole scale claim, measured here.

Usage: python tools/probe_round6b_scale.py [sf_dir] [replicas]
Prints one JSON line per measurement: baseline wall, replicated wall,
ratio vs the linear expectation.
"""

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from data_engineering_etl_self_service_spark.catalog import load_table  # noqa: E402

PROBES = [
    ("tar_extract_stats", ("documents",)),
    ("zip_extract_stats", ("documents",)),
    ("wds_sample_stats", ("documents",)),
    ("url_normalize_report", ("events",)),
    ("numeric_correlations", ("lineitem",)),
    ("k_anonymity_report", ("documents",)),
    ("wordpiece_segment", ("documents",)),
    ("unigram_segment", ("documents",)),
]

OFFSETS = {
    "documents": ("doc_id",),
    "events": ("event_id", "user_id"),
    "lineitem": ("l_orderkey",),
}


def run(spark, name, sf_dir):
    from data_engineering_etl_self_service_spark.queries import QUERIES

    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("probe-round6b-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    tables = sorted({t for _, ts in PROBES for t in ts})
    tmp = tempfile.mkdtemp(prefix="probe_r6b_")
    try:
        for t in tables:
            base = load_table(spark, sf_dir, t)
            rep = base.crossJoin(
                spark.range(replicas).select(F.col("id").alias("_rep"))
            )
            for c in OFFSETS[t]:
                # fresh ids per replica: offset far past the base range
                rep = rep.withColumn(
                    c, F.col(c) + F.col("_rep") * F.lit(1_000_000_000)
                )
            rep.drop("_rep").write.mode("overwrite").parquet(
                os.path.join(tmp, f"{t}.parquet")
            )
        for name, _ in PROBES:
            run(spark, name, sf_dir)  # warm (JIT/Arrow/codegen)
            base_w = run(spark, name, sf_dir)
            rep_w = run(spark, name, tmp)
            print(
                json.dumps(
                    {
                        "probe": name,
                        "base_s": base_w,
                        f"x{replicas}_s": rep_w,
                        "ratio_vs_linear": round(
                            rep_w / (base_w * replicas), 3
                        ),
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
