"""Round-6 scale probes: duplicate-substring scrub, LM fluency scoring,
and SemDeDup at 10× corpus size on local[32].

Two replication modes, because they stress different costs:

- **fresh** (tokens tagged per replica): corpus grows 10× with no new
  cross-replica duplication — the realistic growth case; wall should
  track the corpus-linear stages (explode, aggs, joins).
- **clique** (verbatim copies): every gram/vector gains 10× occurrence —
  the adversarial case. For the scrub this pushes shared grams through
  the [2,16] band (some leave it — the skew guard working); for
  SemDeDup identical copies maximize dup volume, and the probe runs it
  at BOTH k=8 (fixed k, cluster size 10× ⇒ pair stage 100×: the
  anti-pattern) and k=80 (k grown with corpus, the SemDeDup discipline)
  to measure exactly what the operator docstring claims.

Usage: python tools/probe_r6_scale.py [sf_dir] [replicas]
Prints one JSON line per measurement.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from data_engineering_etl_self_service_spark.catalog import load_table  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    wall = round(time.perf_counter() - t0, 2)
    print(json.dumps({"probe": label, "wall_s": wall, "rows": n}))
    return wall


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        # the replicated corpora are localCheckpoint-ed into the block
        # manager; size the single-JVM heap for the 10x sf0.1 run
        .config("spark.driver.memory", "64g")
        .appName("probe-r6-scale")
        .getOrCreate()
    )
    from data_engineering_etl_self_service_spark.operators.clustering import (
        semantic_dedup,
    )
    from data_engineering_etl_self_service_spark.operators.dedup import (
        scrub_duplicate_spans,
    )
    from data_engineering_etl_self_service_spark.queries import QUERIES

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    r = spark.range(replicas).withColumnRenamed("id", "r")
    fresh = (
        docs.crossJoin(r)
        .select(
            (F.col("doc_id") * replicas + F.col("r")).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.concat(F.lit("r"), F.col("r").cast("string"), F.lit("_"), t),
                ),
                " ",
            ).alias("text"),
        )
        .repartition(32)
        .localCheckpoint()
    )
    clique = (
        docs.crossJoin(r)
        .select(
            (F.col("doc_id") * replicas + F.col("r")).alias("doc_id"),
            "text",
        )
        .repartition(32)
        .localCheckpoint()
    )

    timed("scrub_1x", lambda: scrub_duplicate_spans(docs).count())
    timed(
        f"scrub_{replicas}x_fresh",
        lambda: scrub_duplicate_spans(fresh).count(),
    )
    timed(
        f"scrub_{replicas}x_clique",
        lambda: scrub_duplicate_spans(clique).count(),
    )

    def lm(d):
        from data_engineering_etl_self_service_spark.operators.lm import (
            lm_fluency,
        )

        return lm_fluency(d).count()

    timed("lm_fluency_1x", lambda: lm(docs))
    timed(f"lm_fluency_{replicas}x_fresh", lambda: lm(fresh))

    embs = load_table(spark, sf_dir, "embeddings")
    blown_e = (
        embs.crossJoin(r)
        .select(
            (F.col("vec_id") * replicas + F.col("r")).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(32)
        .localCheckpoint()
    )
    timed("semdedup_1x_k8", lambda: semantic_dedup(embs, k=8).count())
    timed(
        f"semdedup_{replicas}x_k8_fixedk",
        lambda: semantic_dedup(blown_e, k=8).count(),
    )
    timed(
        f"semdedup_{replicas}x_k80_grownk",
        lambda: semantic_dedup(blown_e, k=80).count(),
    )

    timed(
        "shard_manifest_1x",
        lambda: QUERIES["shard_manifest"](spark, sf_dir).count(),
    )

    # SRP-LSH: at 10x corpus with FIXED planes the buckets don't grow
    # (2^planes of them), so candidates explode — the documented
    # anti-pattern. The probe measures the discipline instead: grow
    # planes_per_table with the corpus (12x8 at 10x vs 18x2 at 1x).
    from data_engineering_etl_self_service_spark.operators.dedup import (
        srp_lsh_pairs,
    )

    timed("srp_1x_18x2", lambda: srp_lsh_pairs(embs).count())
    timed(
        f"srp_{replicas}x_12x8_grownplanes",
        lambda: srp_lsh_pairs(
            blown_e, n_tables=12, planes_per_table=8
        ).count(),
    )

    # Point-in-time join at 10x facts+dimension (keys shifted so the
    # per-customer interval structure is preserved per replica).
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    okmax = orders.agg(F.max("o_orderkey")).first()[0] + 1
    ckmax = orders.agg(F.max("o_custkey")).first()[0] + 1
    bo = (
        orders.crossJoin(r)
        .select(
            (F.col("o_orderkey") + F.col("r") * okmax).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("r") * ckmax).alias("o_custkey"),
            "o_orderpriority",
            "o_orderdate",
        )
        .repartition(32)
        .localCheckpoint()
    )
    bl = (
        li.select("l_orderkey", "l_linenumber", "l_shipdate")
        .crossJoin(r)
        .select(
            (F.col("l_orderkey") + F.col("r") * okmax).alias("l_orderkey"),
            "l_linenumber",
            "l_shipdate",
        )
        .repartition(32)
        .localCheckpoint()
    )

    def pit(o, l):
        from pyspark.sql import Window as W

        from data_engineering_etl_self_service_spark.operators.asof import (
            asof_join,
        )

        w_all = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        w_attr = W.partitionBy("o_custkey", "o_orderpriority").orderBy(
            "o_orderdate", "o_orderkey"
        )
        island = F.row_number().over(w_all) - F.row_number().over(w_attr)
        dim0 = (
            o.withColumn("island", island)
            .groupBy("o_custkey", "o_orderpriority", "island")
            .agg(
                F.min("o_orderdate").alias("t"),
                F.min("o_orderkey").alias("first_orderkey"),
            )
        )
        w_tie = W.partitionBy("o_custkey", "t").orderBy(
            F.desc("first_orderkey")
        )
        dim = (
            dim0.withColumn("rn", F.row_number().over(w_tie))
            .filter(F.col("rn") == 1)
            .select("o_custkey", "t", "o_orderpriority")
        )
        facts = (
            l.join(o.select("o_orderkey", "o_custkey"),
                   l["l_orderkey"] == o["o_orderkey"])
            .select("l_orderkey", "l_linenumber", "l_shipdate", "o_custkey")
            .distinct()
            .withColumn("t", F.col("l_shipdate"))
        )
        return asof_join(
            facts, dim, on="o_custkey", ts_col="t",
            right_cols=("o_orderpriority",),
        ).count()

    timed("pit_join_1x", lambda: pit(orders, li))
    timed(f"pit_join_{replicas}x", lambda: pit(bo, bl))


if __name__ == "__main__":
    main()
