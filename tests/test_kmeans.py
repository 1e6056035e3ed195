"""Distributed Lloyd's k-means pinned against a numpy reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.text.kmeans import assign_clusters, train_kmeans
from tests.conftest import SF_SMOKE

K = 6
ITERS = 5


def _ref_kmeans(ids, vecs, k, iters, tol=1e-6):
    """Same init (k lowest ids), same argmin tiebreak (lowest cluster),
    same empty-cluster fallback, same stop rule."""
    order = np.argsort(ids)
    X = vecs[order]
    centroids = X[:k].copy()
    for _ in range(iters):
        d = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the first (lowest) index
        new = centroids.copy()
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        moved = np.abs(new - centroids).max()
        centroids = new
        if moved < tol:
            break
    d = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return centroids, d.argmin(axis=1), d.min(axis=1)


def _load(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    vecs = np.array([[float(x) for x in r.embedding] for r in rows])
    return emb, ids, vecs


def test_kmeans_matches_numpy_reference(spark):
    emb, ids, vecs = _load(spark)
    centroids, assigned = train_kmeans(emb, K, max_iters=ITERS)
    ref_c, ref_a, ref_d = _ref_kmeans(ids, vecs, K, ITERS)

    assert np.allclose(np.array(centroids), ref_c, atol=1e-8)
    got = {r.vec_id: (r.cluster, r.sq_dist) for r in assigned.collect()}
    ref = {
        int(i): (int(a), float(d)) for i, a, d in zip(ids, ref_a, ref_d)
    }
    assert set(got) == set(ref)
    for vid, (cl, dist) in got.items():
        assert cl == ref[vid][0], f"cluster mismatch for {vid}"
        assert abs(dist - ref[vid][1]) < 1e-6

    # every cluster is non-trivial on the fixture corpus
    sizes = [r["count"] for r in assigned.groupBy("cluster").count().collect()]
    assert len(sizes) == K and min(sizes) >= 1


def test_kmeans_converges_and_stops_early(spark):
    """tol large enough that Lloyd stops after the first stable pass —
    the returned assignment is a fixed point (re-assigning under the
    returned centroids changes nothing)."""
    emb, _, _ = _load(spark)
    centroids, assigned = train_kmeans(emb, K, max_iters=50, tol=1e-3)
    again = assign_clusters(emb, centroids)
    a = {r.vec_id: r.cluster for r in assigned.collect()}
    b = {r.vec_id: r.cluster for r in again.collect()}
    assert a == b


def test_kmeans_validates_inputs(spark):
    import pytest

    emb, _, _ = _load(spark)
    with pytest.raises(ValueError):
        train_kmeans(emb, 0)
    with pytest.raises(ValueError):
        train_kmeans(emb.limit(3), 10)
    with pytest.raises(ValueError):
        assign_clusters(emb, [])


def test_trained_centroid_ivf_retrieves_planted(spark):
    """train_kmeans centroids slot into ivf_ann_topk (the trained-IVF
    composition): planted near-identical vectors are still retrieved at
    rank 1, and the probe path behaves identically to the sampled form."""
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.text.kmeans import train_kmeans
    from clickhouse_etl_spark.text.similarity import ivf_ann_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    planted = queries.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x * (1.0 + 0.001 * sin(i)))"
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    centroids, _ = train_kmeans(corpus, k=8, max_iters=3)
    got = {
        (r["query_id"], r["vec_id"])
        for r in ivf_ann_topk(
            corpus, queries, k=5, nprobe=3, trained_centroids=centroids
        ).collect()
    }
    for q in range(3):
        assert (q, q + 100000) in got, f"trained IVF missed planted dup {q}"


def test_trained_centroid_ivf_validates(spark):
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.text.similarity import ivf_ann_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError):
        ivf_ann_topk(emb, emb.limit(1), trained_centroids=[])


def test_assign_kernels_agree(spark):
    """The BLAS gemm kernel and the literal-expression fold kernel must
    assign identical clusters (and matching distances) — the r7
    contract that lets 'auto' switch kernels by k without changing
    results."""
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.text.kmeans import assign_clusters

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(6).select("embedding").collect()
    ]
    a = {r.vec_id: (r.cluster, round(r.sq_dist, 9))
         for r in assign_clusters(emb, cents, kernel="expr").collect()}
    b = {r.vec_id: (r.cluster, round(r.sq_dist, 9))
         for r in assign_clusters(emb, cents, kernel="gemm").collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0]
        assert abs(a[k][1] - b[k][1]) < 1e-9


def test_assign_gemm_null_and_ragged_rows(spark):
    from clickhouse_etl_spark.text.kmeans import assign_clusters

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None), (3, [1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: (r.cluster, r.sq_dist)
           for r in assign_clusters(df, [[0.0, 0.0], [5.0, 5.0]],
                                    kernel="gemm").collect()}
    assert got[1] == (0, 0.0)
    assert got[2] == (None, None)
    assert got[3] == (None, None)
    import pytest

    with pytest.raises(ValueError, match="kernel"):
        assign_clusters(df, [[0.0, 0.0]], kernel="nope")
