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


def test_sq8_recall_vs_exact(spark, sf_dir):
    """Int8 quantization must keep most of the true top-10 (recall ≥ 0.7
    at dim=64) and score with exact integers."""
    from data_engineering_etl_self_service_spark.operators.similarity import sq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = _query(e, n=3)
    exact = {
        (r.query_id, r.vec_id) for r in cosine_topk(e, q, k=10).collect()
    }
    approx = sq_topk(e, q, k=10).collect()
    assert len(approx) == 30
    assert all(isinstance(r.qdot, int) for r in approx)
    hits = sum((r.query_id, r.vec_id) in exact for r in approx)
    assert hits / len(exact) >= 0.7


def test_sq8_zero_vector_is_safe(spark):
    from data_engineering_etl_self_service_spark.operators.similarity import (
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -2.0])],
        "vec_id int, embedding array<float>",
    )
    out = {r.vec_id: r.qvec for r in quantize_int8(df).collect()}
    assert out[1] == [0, 0]
    assert out[2] == [64, -127]  # floor(1*63.5+0.5), floor(-2*63.5+0.5)


def test_pq_adc_matches_numpy(spark, sf_dir):
    """PQ codes and ADC scores must equal an independent numpy recompute
    (int8 quantize → subspace slice → argmin → table lookup sum) exactly —
    every step is integer, so there is no tolerance."""
    import numpy as np

    from data_engineering_etl_self_service_spark.operators.similarity import pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = _query(e, n=3)
    got = {
        (r.query_id, r.vec_id): (r.rank, r.adc_dist2)
        for r in pq_topk(e, q, k=10).collect()
    }
    assert len(got) == 30

    rows = sorted(e.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    maxabs = np.abs(M).max(axis=1, keepdims=True)
    scale = np.divide(127.0, maxabs, out=np.zeros_like(maxabs), where=maxabs > 0)
    Q = np.floor(M * scale + 0.5).astype(np.int64)

    nsub, k_codes, sub = 8, 16, 8
    cb = Q[:k_codes]
    codes = np.zeros((len(ids), nsub), dtype=np.int64)
    dtab = np.zeros((len(ids), nsub, k_codes), dtype=np.int64)
    for m in range(nsub):
        vs = Q[:, m * sub : (m + 1) * sub]
        cs = cb[:, m * sub : (m + 1) * sub]
        d2 = ((vs[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = d2.argmin(axis=1)  # first-min = lowest code on ties
        dtab[:, m, :] = d2

    for qi in range(3):
        qrow = int(np.flatnonzero(ids == qi)[0])
        adc = dtab[qrow][np.arange(nsub)[:, None], codes.T].sum(axis=0)
        cand = [(int(adc[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != qi]
        for rank, (d, vid) in enumerate(sorted(cand)[:10], start=1):
            assert got[(qi, vid)] == (rank, d)


def test_knn_join_is_cell_bounded_exact(spark, sf_dir):
    """Each vector's blocked-KNN neighbor can never beat the true (global)
    nearest neighbor, and the reported cosine matches the brute-force score
    for the same pair."""
    from data_engineering_etl_self_service_spark.operators.similarity import knn_join
    from data_engineering_etl_self_service_spark.functions.vector import cosine as cos_expr

    e = load_table(spark, sf_dir, "embeddings")
    got = knn_join(e, k=1, n_cells=8).collect()
    assert len(got) == e.count()  # every vector has an in-cell neighbor here

    # true global best for a 30-vector slice, against the FULL table
    a = e.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec")
    )
    b = e.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
    best = {
        r.a_id: r.best
        for r in a.join(b, F.col("a_id") != F.col("b_id"))
        .select("a_id", cos_expr(F.col("a_vec"), F.col("b_vec")).alias("c"))
        .groupBy("a_id")
        .agg(F.max("c").alias("best"))
        .collect()
    }
    for r in got:
        if r.vec_id in best:
            assert r.cos <= best[r.vec_id] + 1e-12


def test_knn_blas_matches_exact_pairs(spark, sf_dir):
    """The BLAS path must find the same neighbor pairs as the exact fold
    (float tie flips allowed only where cosines are ulp-close)."""
    from data_engineering_etl_self_service_spark.operators.similarity import (
        knn_join,
        knn_join_blas,
    )

    e = load_table(spark, sf_dir, "embeddings")
    exact = {(r.vec_id, r.nn_id): r.cos for r in knn_join(e, k=1, n_cells=8).collect()}
    fast = {(r.vec_id, r.nn_id): r.cos for r in knn_join_blas(e, k=1, n_cells=8).collect()}
    assert len(fast) == len(exact)
    agree = sum(p in exact for p in fast)
    assert agree / len(exact) >= 0.99
    for p, c in fast.items():
        if p in exact:
            assert abs(c - exact[p]) < 1e-9
