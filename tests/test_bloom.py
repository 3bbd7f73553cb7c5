"""Bloom semi-join: no false negatives, exact-verify equality with a plain
semi-join, and a scan-stage plan (no shuffle before the membership test)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.catalog import load_table
from data_engineering_etl_self_service_spark.operators.bloom import (
    bloom_probe,
    bloom_semi_join,
    build_key_bloom,
)


def test_bloom_probe_is_superset_and_semi_join_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    hv = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 200000
    )
    keys = {r.o_orderkey for r in hv.select("o_orderkey").collect()}

    bloom = build_key_bloom(
        hv.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey"
    )
    pre = bloom_probe(li, bloom, "l_orderkey")
    pre_keys = {r.l_orderkey for r in pre.select("l_orderkey").distinct().collect()}
    assert keys & {
        r.l_orderkey for r in li.select("l_orderkey").distinct().collect()
    } <= pre_keys  # no false negatives

    got = sorted(
        tuple(r)
        for r in bloom_semi_join(
            li, hv, "l_orderkey", "o_orderkey"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in li.join(
            hv.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_semi",
        ).collect()
    )
    assert got == want and len(got) > 0


def test_bloom_false_positive_rate_reasonable(spark, sf_dir):
    """At m = 2^20 bits for a few hundred keys, false positives through
    the pre-filter should be a tiny fraction of the non-member keys."""
    o = load_table(spark, sf_dir, "orders")
    members = o.filter(F.col("o_totalprice") > 300000).select("o_orderkey")
    n_members = members.count()
    bloom = build_key_bloom(members, "o_orderkey")
    probe_all = bloom_probe(
        o.select("o_orderkey"), bloom, "o_orderkey"
    ).count()
    n_total = o.count()
    fp = probe_all - n_members
    assert fp <= max(5, 0.01 * (n_total - n_members))


def test_bloom_probe_plan_has_no_shuffle(spark, sf_dir):
    """The membership test is k broadcast lookups in the scan stage —
    zero shuffle exchanges anywhere in the pre-filter plan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    hv = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    pre = bloom_probe(li, build_key_bloom(hv, "l_orderkey"), "l_orderkey")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = pre._jdf.queryExecution().explainString(jmode)
    # BroadcastExchange is fine (that's the filter shipping); a plain
    # shuffle Exchange before the probe is not. The bitset itself is
    # materialized once at build time (bounded at m/64 rows), so the
    # probe plan contains zero shuffle exchanges.
    shuffles = re.findall(r"^\(\d+\) Exchange\b.*$", plan, flags=re.M)
    assert len(shuffles) == 0, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
