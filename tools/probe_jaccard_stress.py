"""Round-5 re-run of the jaccard_prefix_pairs stress probe that OOM'd the
local 128G JVM in round 4 (SCALE.md): 90 same-text variants per document
of the sf0.01 corpus => ~450k docs forming 90-cliques, ~20M true pairs of
~full-length documents.

Round 4's failure mode was verify-stage *result materialization* — every
candidate pair carried two full shingle arrays into the verify join and
the whole pair set was localCheckpoint'ed.  Round 5's fix: content-
signature dedup (all 90 clique members share one signature, so the
clique's 4005 pairs short-circuit to jaccard=1.0 with no array join) +
chunked write-through for the residual distinct-signature pairs.

Usage: python tools/probe_jaccard_stress.py [sf_dir] [variants]
Prints one JSON line with wall seconds and output pair count.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from data_engineering_etl_self_service_spark.catalog import load_table  # noqa: E402
from data_engineering_etl_self_service_spark.operators.dedup import (  # noqa: E402
    jaccard_prefix_pairs,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    variants = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "100g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("probe-jaccard-stress")
        .getOrCreate()
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    # 90 same-text variants per doc, distinct ids: doc_id*variants + v.
    v = spark.range(variants).withColumnRenamed("id", "v")
    blown = docs.crossJoin(v).select(
        (F.col("doc_id") * variants + F.col("v")).alias("doc_id"), "text"
    )
    t0 = time.time()
    out = jaccard_prefix_pairs(blown, k=3, threshold_num=4, threshold_den=5)
    n_pairs = out.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "probe": "jaccard_90_variant_cliques",
                "base_docs": n_docs,
                "variants": variants,
                "blown_docs": n_docs * variants,
                "true_pairs": n_pairs,
                "wall_sec": round(wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
