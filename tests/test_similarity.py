"""Similarity search: brute-force correctness + IVF recall behaviour."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.catalog import load_table
from data_engineering_etl_self_service_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
)


def _query(e, n=1):
    return e.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vec")
    )


def test_topk_self_similarity_excluded_and_ordered(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk(e, _query(e), k=5).orderBy("rank").collect()
    assert len(out) == 5
    assert all(r.vec_id != 0 for r in out)
    scores = [r.cos for r in out]
    assert scores == sorted(scores, reverse=True)
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]


def test_ivf_is_subset_semantics(spark, sf_dir):
    """IVF results come from probed cells; every hit must appear in the
    brute-force ranking with the same score."""
    e = load_table(spark, sf_dir, "embeddings")
    q = _query(e)
    exact = {r.vec_id: r.cos for r in cosine_topk(e, q, k=50).collect()}
    approx = ivf_topk(e, q, k=10, n_cells=8, nprobe=2).collect()
    assert len(approx) == 10
    for r in approx:
        if r.vec_id in exact:
            assert exact[r.vec_id] == r.cos


def test_ivf_full_probe_equals_bruteforce(spark, sf_dir):
    """Probing ALL cells makes IVF exact — recall sanity check."""
    e = load_table(spark, sf_dir, "embeddings")
    q = _query(e)
    exact = [(r.rank, r.vec_id) for r in cosine_topk(e, q, k=10).collect()]
    full = [
        (r.rank, r.vec_id)
        for r in ivf_topk(e, q, k=10, n_cells=8, nprobe=8).collect()
    ]
    assert sorted(exact) == sorted(full)
