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


def test_knn_join_max_cell_size_bounds_degenerate_cell(spark):
    """Skew guard: a fixture where almost every vector lands in ONE cell
    (all near-parallel to centroid 0) must be split by ``max_cell_size``
    so the per-cell pair count is bounded, while every vector still gets
    a true-cosine neighbor from its sub-cell."""
    import math

    from data_engineering_etl_self_service_spark.operators.similarity import (
        assign_cells,
        first_n_centroids,
        knn_join,
    )

    dim = 8
    n = 200

    def vec(i):
        # ids 0..7 become the centroids (first_n picks lowest ids); make
        # them one-hot so they are mutually orthogonal. Every later vector
        # is a slight, deterministic perturbation of centroid 0 — all of
        # them assign to cell 0.
        if i < 8:
            return [1.0 if j == i else 0.0 for j in range(dim)]
        eps = 0.01 + 0.0001 * (i % 37)
        return [1.0] + [eps * math.sin(i * (j + 1)) for j in range(1, dim)]

    rows = [(i, vec(i)) for i in range(n)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = first_n_centroids(e, 8)
    sizes = (
        assign_cells(e, cents)
        .groupBy("cell_id")
        .count()
        .collect()
    )
    assert max(r["count"] for r in sizes) >= n - 8  # fixture really is skewed

    cap = 32
    got = knn_join(e, k=1, n_cells=8, max_cell_size=cap).collect()
    # Coverage: the degenerate cell splits into ~ceil(193/32)=7 hash
    # sub-cells of ~27 vectors each — no singletons in practice, so every
    # vector in a multi-member sub-cell reports a neighbor.
    assert len(got) >= int(0.95 * n)

    # The reported score is a true cosine: it can never beat the global
    # (uncapped) in-cell best for that vector.
    uncapped = {r.vec_id: r.cos for r in knn_join(e, k=1, n_cells=8).collect()}
    for r in got:
        assert r.cos <= uncapped[r.vec_id] + 1e-12

    # Bounded pair work: sub-cells are capped, so no partition ever holds
    # more than ~2*cap members (hash imbalance allowance).
    from data_engineering_etl_self_service_spark.operators.similarity import (
        assign_cells as _ac,
    )
    # re-derive the split census the operator builds internally
    from pyspark.sql import functions as SF

    assigned = _ac(e, cents)
    cell_sizes = assigned.groupBy("cell_id").agg(SF.count(SF.lit(1)).alias("m"))
    split = (
        assigned.join(SF.broadcast(cell_sizes), "cell_id")
        .withColumn("nsub", SF.ceil(SF.col("m") / SF.lit(cap)).cast("long"))
        .withColumn("sub", SF.pmod(SF.xxhash64("vec_id"), SF.col("nsub")))
        .groupBy("cell_id", "sub")
        .count()
        .collect()
    )
    assert max(r["count"] for r in split) <= 2 * cap


def test_kmeans_centroids_beat_first_n_recall_on_skew(spark):
    """Production-trained centroids (exact-Lloyd k-means) must match or
    beat the first-N pick on a corpus where the first N ids are NOT
    representative: ids 0-7 are one-hot 'bait' vectors, while the real
    mass sits in two tight clusters (around e8 and e9) whose members are
    near-orthogonal to every bait centroid — so first-N assignment
    scatters each cluster across cells by noise, and nprobe=2 recall
    collapses; a trained coarse quantizer gives the clusters their own
    cells."""
    import math

    from data_engineering_etl_self_service_spark.operators.similarity import (
        cosine_topk,
        first_n_centroids,
        ivf_topk,
        kmeans_centroids,
    )

    dim = 16

    def bait(i):
        return [1.0 if j == i else 0.0 for j in range(dim)]

    def member(i, axis, f):
        v = [0.01 * f(i * 31 + j) for j in range(8)] + [0.0] * 8
        v[axis] = 1.0
        return v

    rows = [(i, bait(i)) for i in range(8)]
    rows += [(i, member(i, 8, math.sin)) for i in range(8, 58)]
    rows += [(i, member(i, 9, math.cos)) for i in range(58, 108)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    q = e.filter(F.col("vec_id").isin(10, 60)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vec")
    )
    exact = {
        qid: {r.vec_id for r in grp}
        for qid, grp in __import__("itertools").groupby(
            sorted(cosine_topk(e, q, k=10).collect(), key=lambda r: r.query_id),
            key=lambda r: r.query_id,
        )
    }

    def recall(cents):
        got = ivf_topk(e, q, k=10, n_cells=8, nprobe=2, centroids=cents).collect()
        per_q = {}
        for r in got:
            per_q.setdefault(r.query_id, set()).add(r.vec_id)
        return sum(
            len(per_q.get(qid, set()) & hits) / len(hits)
            for qid, hits in exact.items()
        ) / len(exact)

    r_first = recall(first_n_centroids(e, 8))
    r_train = recall(kmeans_centroids(e, 8, n_iters=3))
    assert r_train >= r_first
    assert r_train >= 0.9  # trained cells isolate the two true clusters
    assert r_first < 1.0  # and the bait pick measurably loses neighbors


def test_pq_codebook_kmeans_mode_is_integer_and_trains(spark):
    """The trained PQ codebook keeps the int8 ADC contract (all codewords
    integers) and achieves quantization error no worse than first-N on a
    corpus whose first rows are unrepresentative."""
    import math

    import numpy as np

    from data_engineering_etl_self_service_spark.operators.similarity import (
        collect_pq_codebook,
        pq_encode,
    )

    dim = 16

    def vec(i):
        if i < 16:
            return [100.0 if j == i else 0.0 for j in range(dim)]
        return [math.sin(i * (j + 3)) for j in range(dim)]

    rows = [(i, vec(i)) for i in range(116)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def sq_err(cb):
        C = np.asarray(cb, dtype=np.int64)  # (M, K, sub)
        enc = {r.vec_id: r.codes for r in pq_encode(
            e, n_subspaces=4, n_codes=16, dim=dim, codebook=cb
        ).collect()}
        # reconstruct each vector's int8 quantization from its codewords
        err = 0
        for i in range(116):
            v = np.asarray(vec(i), dtype=np.float64)
            maxabs = np.abs(v).max()
            scale = 127.0 / maxabs if maxabs > 0 else 0.0
            qv = np.floor(v * scale + 0.5).astype(np.int64)
            rec = np.concatenate([C[m, enc[i][m]] for m in range(4)])
            err += int(((qv - rec) ** 2).sum())
        return err

    cb_first = collect_pq_codebook(e, n_subspaces=4, n_codes=16, dim=dim)
    cb_train = collect_pq_codebook(
        e, n_subspaces=4, n_codes=16, dim=dim, mode="kmeans"
    )
    for m in range(4):
        for cw in cb_train[m]:
            assert all(isinstance(x, int) for x in cw)
    assert sq_err(cb_train) <= sq_err(cb_first)


def test_persisted_ivf_index_full_probe_equals_bruteforce(spark, tmp_path):
    """nprobe = n_cells ⇒ the persisted-index path must return exactly
    the brute-force cosine top-k (no approximation left)."""
    from data_engineering_etl_self_service_spark.catalog import load_table
    from data_engineering_etl_self_service_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        query_ivf_index,
    )
    from pyspark.sql import functions as F

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vec")
    )
    base = str(tmp_path / "ivf")
    v = build_ivf_index(e, base, n_cells=4)
    assert v == 1
    got = {
        (r.query_id, r.rank, r.vec_id)
        for r in query_ivf_index(spark, base, q, k=5, nprobe=4).collect()
    }
    exact = {
        (r.query_id, r.rank, r.vec_id)
        for r in cosine_topk(e, q, k=5).collect()
    }
    assert got == exact


def test_persisted_ivf_index_prunes_partitions(spark, tmp_path):
    """nprobe=1 must plan a scan over ONLY the probed cell directories."""
    from data_engineering_etl_self_service_spark.catalog import load_table
    from data_engineering_etl_self_service_spark.operators.similarity import (
        build_ivf_index,
    )
    from data_engineering_etl_self_service_spark.sources.snapshots import (
        read_snapshot,
    )
    from pyspark.sql import functions as F

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = str(tmp_path / "ivf")
    build_ivf_index(e, base, n_cells=4)
    postings = read_snapshot(spark, f"{base}/postings")
    cells = [
        r.cell_id
        for r in postings.select("cell_id").distinct().collect()
    ]
    assert len(cells) >= 2
    filtered = postings.filter(F.col("cell_id") == cells[0])
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = filtered._jdf.queryExecution().explainString(jmode)
    # the predicate must land in PartitionFilters (plan-time pruning),
    # NOT PushedFilters (row-group skipping after reading the partition)
    import re

    pf = re.search(r"PartitionFilters: \[(.*)\]", plan)
    assert pf and re.search(
        rf"cell_id#\d+ = {cells[0]}\b", pf.group(1)
    ), plan
    assert filtered.count() > 0


def test_partitioned_snapshot_requires_overwrite(spark, tmp_path):
    import pytest

    from data_engineering_etl_self_service_spark.sources.snapshots import (
        write_snapshot,
    )

    with pytest.raises(ValueError, match="overwrite"):
        df = spark.range(3)
        write_snapshot(
            df.withColumn("p", df.id % 2),
            str(tmp_path / "t"),
            partition_by=("p",),
        )
