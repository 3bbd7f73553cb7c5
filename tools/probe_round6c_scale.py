"""Scale probes for the round-6c operators: learned NB scoring, entity
resolution, and the new arrival-format passes (ADPCM, unicode, DOCX,
email, code, SRT, LaTeX) at 10x table size on local[32].

Replication is "fresh" (ids offset per replica; customer NAMES are
rebuilt from the offset keys so replicas land in disjoint blocking
prefixes and the pair graph replicates exactly 10x rather than
cross-linking). Format passes are per-row work — wall should track rows
at most linearly; NB's vocabulary is corpus-bound (fixed here), so its
model/scoring stages should also stay ~linear with flat constants.

Usage: python tools/probe_round6c_scale.py [sf_dir] [replicas]
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
    ("nb_classifier_scores", ("documents",)),
    ("entity_groups", ("customer",)),
    ("adpcm_decode_stats", ("documents",)),
    ("unicode_normalize_report", ("documents",)),
    ("docx_extract_stats", ("documents",)),
    ("eml_extract_stats", ("documents",)),
    ("code_file_stats", ("documents",)),
    ("srt_extract_stats", ("documents",)),
    ("latex_extract_stats", ("documents",)),
    ("tfrecord_extract_stats", ("documents",)),
    ("sqlite_extract_stats", ("documents",)),
    ("image_dhash_groups", ("documents",)),
    ("image_neardup_pairs", ("documents",)),
    ("markdown_extract_stats", ("documents",)),
    ("feed_extract_stats", ("documents",)),
    ("epub_extract_stats", ("documents",)),
    ("charset_sniff_stats", ("documents",)),
    ("decompress_sniff_stats", ("documents",)),
    # cheapest_trade_route is deliberately absent: replicating lineitem
    # alone breaks its 5-table join closure, and its per-round |V|+|E|
    # iteration cost is the already-probed trade_hops/pagerank shape.
]

OFFSETS = {
    "documents": ("doc_id",),
    "customer": ("c_custkey",),
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
        .appName("probe-round6c-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    tables = sorted({t for _, ts in PROBES for t in ts})
    tmp = tempfile.mkdtemp(prefix="probe_r6c_")
    try:
        for t in tables:
            base = load_table(spark, sf_dir, t)
            rep = base.crossJoin(
                spark.range(replicas).select(F.col("id").alias("_rep"))
            )
            # customer keys stay 9-digit (lpad truncates longer strings,
            # which would collapse a replica onto ONE name — an all-pairs
            # clique, not a scale probe); documents can offset far out.
            step = 100_000 if t == "customer" else 1_000_000_000
            for c in OFFSETS[t]:
                rep = rep.withColumn(
                    c, F.col(c) + F.col("_rep") * F.lit(step)
                )
            if t == "customer":
                # rebuild names from the offset keys: replicas then sit in
                # disjoint 15-char blocking prefixes, so the fuzzy pair
                # graph replicates 10x instead of cross-linking replicas
                rep = rep.withColumn(
                    "c_name",
                    F.concat(
                        F.lit("Customer#"),
                        F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
                    ),
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
