"""Round-7 sf1 scale probe: the frozen CORE-30 at 10× the bench SF.

Generates an sf1-equivalent dataset on disk by replicating every sf0.1
fact table 10× with referential-integrity-preserving key offsets
(region/nation stay fixed like real TPC-H dimensions), then times each
frozen CORE query at sf0.1 and sf1 (warmed, best-of-2 each) and reports
the observed scaling exponent  e = log10(t_sf1 / t_sf0.1)  — e ≈ 1 is
data-linear, e ≈ 0 means fixed costs still dominate locally, e > 1 is
the super-linear smell the probe exists to catch.

Replication keeps semantics "fresh-growth", not adversarial cliques:

- customer/supplier/part/orders/lineitem: keys shifted per replica
  (custkey + r*MAX, orderkey + r*MAX, ...) so joins fan out exactly as
  a real 10× corpus would — no cross-replica key collisions;
- events: new event_ids AND new user_ids per replica (10× users, same
  per-user behavior — the realistic growth shape for sessionization);
- documents: new doc_ids, tokens tagged `_r<replica>` so the dedup /
  LSH / n-gram queries see 10× corpus WITHOUT 10× verbatim duplicates
  (replica 0 keeps the original text; cross-replica shingles disjoint);
- embeddings: new vec_ids, vectors perturbed by a tiny deterministic
  per-replica epsilon on one component so ANN/k-means geometry grows
  instead of degenerating into 2000 points of multiplicity 10.

Output dir defaults to /root/repo/.scratch/sf1 (gitignored; ~60 MB).

Usage: python tools/probe_r7_sf1.py [build|run|all] [out_dir] [query ...]\n(explicit query names probe the extended tail — round 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark import get_spark
from data_engineering_etl_self_service_spark.catalog import load_table

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10


def build(spark, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    r = spark.range(REPLICAS).select(F.col("id").alias("_r"))

    def rep(df):
        return df.crossJoin(r)

    def shift(col, mx):
        return (F.col(col) + F.col("_r") * F.lit(int(mx))).alias(col)

    mx = {}
    for t, k in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        mx[t] = load_table(spark, SF01, t).agg(F.max(k)).first()[0] + 1
    mx["user"] = (
        load_table(spark, SF01, "events").agg(F.max("user_id")).first()[0] + 1
    )

    for t in ("region", "nation"):
        load_table(spark, SF01, t).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )

    c = load_table(spark, SF01, "customer")
    rep(c).select(
        shift("c_custkey", mx["customer"]),
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    ).write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")

    s = load_table(spark, SF01, "supplier")
    rep(s).select(
        shift("s_suppkey", mx["supplier"]), "s_name", "s_nationkey",
        "s_acctbal",
    ).write.mode("overwrite").parquet(f"{out_dir}/supplier.parquet")

    p = load_table(spark, SF01, "part")
    rep(p).select(
        shift("p_partkey", mx["part"]), "p_name", "p_brand", "p_type",
        "p_size", "p_retailprice",
    ).write.mode("overwrite").parquet(f"{out_dir}/part.parquet")

    o = load_table(spark, SF01, "orders")
    rep(o).select(
        shift("o_orderkey", mx["orders"]),
        shift("o_custkey", mx["customer"]),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    ).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    li = load_table(spark, SF01, "lineitem")
    rep(li).select(
        shift("l_orderkey", mx["orders"]),
        shift("l_partkey", mx["part"]),
        shift("l_suppkey", mx["supplier"]),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    ).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    e = load_table(spark, SF01, "events")
    rep(e).select(
        shift("event_id", mx["events"]),
        "ts",
        shift("user_id", mx["user"]),
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    d = load_table(spark, SF01, "documents")
    tagged = F.when(
        F.col("_r") == 0, F.col("text")
    ).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(
                    w, F.lit("_r"), F.col("_r").cast("string")
                ),
            ),
            " ",
        )
    )
    rep(d).select(
        shift("doc_id", mx["documents"]),
        tagged.alias("text"),
        "lang", "source",
        F.length(tagged).alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = load_table(spark, SF01, "embeddings")
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: x
        + F.when(
            i == F.col("_r") % 8, F.col("_r").cast("float") * F.lit(0.003)
        ).otherwise(F.lit(0.0)),
    )
    rep(emb).select(
        shift("vec_id", mx["embeddings"]),
        perturbed.cast("array<float>").alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    print(f"built sf1 at {out_dir}")


def run(spark, out_dir: str, names=None) -> None:
    import math

    from bench import CORE
    from data_engineering_etl_self_service_spark.queries import QUERIES

    results = {}
    for name in names or CORE:
        fn = QUERIES[name]
        fn(spark, "/root/testdata/sf0.01").count()  # warm codegen
        walls = {}
        for label, d in (("sf0.1", SF01), ("sf1", out_dir)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            walls[label] = round(best, 3)
        exp = round(
            math.log10(max(walls["sf1"], 1e-3) / max(walls["sf0.1"], 1e-3)),
            2,
        )
        results[name] = {**walls, "exponent": exp}
        print(json.dumps({"query": name, **results[name]}))
    lin = sum(1 for r in results.values() if r["exponent"] <= 1.05)
    print(
        json.dumps(
            {
                "probe": "sf1" if names else "core30-sf1",
                "n": len(results),
                "sublinear_or_linear": lin,
                "worst": max(
                    results.items(), key=lambda kv: kv[1]["exponent"]
                )[0],
            }
        )
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "sf1",
        )
    )
    names = sys.argv[3:] or None  # round 8: probe the EXTENDED tail too
    spark = get_spark(app_name="probe-r7-sf1")
    if mode in ("build", "all"):
        build(spark, out_dir)
    if mode in ("run", "all"):
        run(spark, out_dir, names)


if __name__ == "__main__":
    main()
