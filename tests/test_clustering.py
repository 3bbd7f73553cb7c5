"""Fixed-point Lloyd k-means: exact numpy parity + Lloyd invariants."""

from __future__ import annotations

import numpy as np

from data_engineering_etl_self_service_spark.catalog import load_table
from data_engineering_etl_self_service_spark.operators.clustering import (
    SCALE,
    kmeans_assign,
    kmeans_fit,
    kmeans_summary,
)


def _xf_matrix(e):
    rows = sorted(
        e.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id
    )
    M = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    return (
        np.array([r.vec_id for r in rows], dtype=np.int64),
        np.floor(M * SCALE).astype(np.int64),
    )


def _np_lloyd(X, k, n_iters):
    cents = X[:k].copy()
    for _ in range(n_iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cid = d2.argmin(axis=1)  # first-min = lowest cluster id on ties
        for c in range(k):
            members = X[cid == c]
            if len(members):
                s = members.sum(axis=0)
                n = len(members)
                cents[c] = (s - ((s % n) + n) % n) // n
    return cents


def test_kmeans_matches_numpy_exactly(spark, sf_dir):
    """Integer arithmetic end-to-end ⇒ the distributed result must equal a
    single-node numpy Lloyd bit-for-bit — no tolerance."""
    e = load_table(spark, sf_dir, "embeddings")
    ids, X = _xf_matrix(e)
    k, t = 8, 3
    cents = _np_lloyd(X, k, t)

    got_cents = kmeans_fit(e, k=k, n_iters=t)
    assert [list(c) for c in cents] == got_cents

    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    exp_cid = d2.argmin(axis=1)
    exp_d2 = d2[np.arange(len(X)), exp_cid]
    got = {
        r.vec_id: (r.cluster_id, r.d2)
        for r in kmeans_assign(e, got_cents).select(
            "vec_id", "cluster_id", "d2"
        ).collect()
    }
    for i, vid in enumerate(ids):
        assert got[vid] == (int(exp_cid[i]), int(exp_d2[i]))


def test_kmeans_inertia_nonincreasing(spark, sf_dir):
    """Lloyd monotonicity: total inertia after T+1 iterations can exceed
    the T-iteration inertia only by the floor-rounding slack (< n*dim per
    update)."""
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    dim = len(e.select("embedding").first()[0])
    slack = n * dim
    inertias = []
    for t in (0, 1, 2, 3):
        total = (
            kmeans_summary(e, k=8, n_iters=t)
            .agg({"inertia": "sum"})
            .first()[0]
        )
        inertias.append(int(total))
    for prev, cur in zip(inertias, inertias[1:]):
        assert cur <= prev + slack
    assert inertias[-1] < inertias[0]  # it actually learned something


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = kmeans_summary(e, k=8, n_iters=2).collect()
    assert sum(r.n_vecs for r in out) == e.count()
    assert all(0 <= r.cluster_id < 8 for r in out)
    assert all(r.inertia >= 0 for r in out)
