"""Distributed k-means (Lloyd's) over embedding columns.

The clustering primitive behind semantic dedup, corpus bucketing for
curriculum mixing, and trained-centroid IVF indexes (the IVF search in
:mod:`text.similarity` probes FIXED sampled centroids; this module
LEARNS them).

Scale decomposition — the whole design:

- Each Lloyd iteration is ONE corpus pass: centroids (k x dims doubles,
  kilobytes) ride the closure as a broadcast literal array; assignment
  is an argmin over JVM higher-order functions (zip_with/aggregate), no
  Python in the row path.
- The centroid update collapses corpus-scale data to k x dims rows
  BEFORE the driver sees anything: posexplode to (cluster, dim, value),
  groupBy average (map-side combined), collect k x dims scalars.
- Empty clusters keep their previous centroid (the standard Lloyd
  fallback) so k never silently shrinks.

Initialization is deterministic (the k lowest-id vectors): no RNG, so
runs/retries/oracles agree. Pinned step-for-step against a numpy
reference in tests/test_kmeans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_etl_spark.text.similarity import _as_double


def _sq_dist_expr(vec: str, centroid: list[float]) -> str:
    arr = "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in centroid) + ")"
    return (
        f"aggregate(zip_with({vec}, {arr}, (x, c) -> (x - c) * (x - c)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _assign_with_vec(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    kernel: str = "auto",
) -> DataFrame:
    """assign_clusters + the (internal) double vector column ``__v`` —
    the trainer's centroid update needs the vectors; public callers get
    the narrow contract below.

    Kernel (r7, measured): the literal-expression argmin evaluates k
    ``aggregate`` folds per row at ~5-15 µs each — 49 s for 60 k
    vectors at k=120 where one BLAS distance matmul is ~0.1 s. 'auto'
    switches to the Arrow 'gemm' kernel (map-only mapInPandas, same
    row-preserving contract) above k=32 and keeps 'expr' below it —
    the oracle-pinned queries (k ≤ 8) stay on the bit-exact-mirrored
    fold path. The kernels agree except on centroids equidistant
    within ~1e-9 (the gemm argmin ranks by the expanded form; the
    chosen centroid's sq_dist is then recomputed exactly)."""
    if kernel not in ("auto", "expr", "gemm"):
        raise ValueError(f"unknown kernel {kernel!r}")
    if not centroids:
        raise ValueError("centroids must be non-empty")
    base = df.select(F.col(id_col), F.expr(_as_double(vec_col)).alias("__v"))
    if kernel == "auto":
        kernel = "gemm" if len(centroids) > 32 else "expr"
    if kernel == "gemm":
        return _assign_gemm(base, centroids, id_col)
    dists = base.select(
        id_col,
        "__v",
        F.array(
            *[F.expr(_sq_dist_expr("__v", c)) for c in centroids]
        ).alias("__d"),
    )
    return dists.select(
        id_col,
        "__v",
        (F.expr("array_position(__d, array_min(__d))") - 1)
        .cast("int")
        .alias("cluster"),
        F.expr("array_min(__d)").alias("sq_dist"),
    )


def _assign_gemm(
    base: DataFrame, centroids: list[list[float]], id_col: str
) -> DataFrame:
    """BLAS assignment kernel: one ``|x|² - 2X·Cᵀ + |c|²`` distance
    matmul per Arrow batch, argmin rows (numpy argmin takes the FIRST
    minimum — the lowest-cluster tie rule), then the winning centroid's
    distance recomputed in the direct ``(x-c)²`` form (the expanded
    form cancels catastrophically when x ≈ c). Map-only — no shuffle,
    same contract as the expr path; NULL/ragged vectors keep their row
    with NULL cluster and sq_dist, exactly as the fold path NULLs
    them."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    C = np.array(centroids, dtype=np.float64)
    dims = C.shape[1]
    cc = (C * C).sum(axis=1)
    idt = base.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField(id_col, idt),
            T.StructField("__v", T.ArrayType(T.DoubleType())),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("sq_dist", T.DoubleType()),
        ]
    )

    def batches(it):
        for pdf in it:
            ok = pdf["__v"].map(
                lambda v: v is not None and len(v) == dims
            ).to_numpy()
            cluster = np.full(len(pdf), None, dtype=object)
            sq = np.full(len(pdf), None, dtype=object)
            if ok.any():
                X = np.array(pdf["__v"][ok].tolist(), dtype=np.float64)
                D = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + cc
                cl = D.argmin(axis=1)
                exact = ((X - C[cl]) ** 2).sum(axis=1)
                cluster[ok] = cl.astype(int)
                sq[ok] = exact
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "__v": pdf["__v"],
                    "cluster": cluster,
                    "sq_dist": sq,
                }
            )

    return base.mapInPandas(batches, schema=schema)


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "auto",
) -> DataFrame:
    """``(id, cluster, sq_dist)``: nearest centroid per vector (L2,
    argmin, lowest cluster id wins ties). ``kernel='expr'`` rides
    literal centroids in the plan (kilobytes of codegen, zero shuffle,
    the DuckDB-mirrored float path); ``'gemm'`` is the BLAS Arrow
    kernel (map-only, zero shuffle) that 'auto' picks above k=32 —
    see :func:`_assign_with_vec`."""
    return _assign_with_vec(df, centroids, id_col, vec_col, kernel).drop(
        "__v"
    )


def train_kmeans(
    df: DataFrame,
    k: int,
    max_iters: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], DataFrame]:
    """Lloyd's k-means. Returns (centroids, assignments).

    ``assignments`` is ``(id_col, cluster, sq_dist)`` under the FINAL
    centroids. Stops early when every centroid moves less than ``tol``
    (max absolute coordinate change) in an iteration.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = df.select(F.col(id_col), F.expr(_as_double(vec_col)).alias("__v"))
    init_rows = base.orderBy(id_col).limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(f"k={k} but corpus has only {len(init_rows)} vectors")
    centroids = [list(r["__v"]) for r in init_rows]
    dims = len(centroids[0])

    for _ in range(max_iters):
        assigned = _assign_with_vec(base, centroids, id_col, "__v")
        new_rows = (
            assigned.select(
                "cluster", F.posexplode("__v").alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty-cluster fallback
        by_cluster: dict[int, list[float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r["cluster"], [0.0] * dims)[r["dim"]] = r["mean"]
        for cid, vec in by_cluster.items():
            new_centroids[cid] = vec
        moved = max(
            abs(a - b)
            for old, new in zip(centroids, new_centroids)
            for a, b in zip(old, new)
        )
        centroids = new_centroids
        if moved < tol:
            break
    final = assign_clusters(base, centroids, id_col=id_col, vec_col="__v").select(
        id_col, "cluster", F.round("sq_dist", 9).alias("sq_dist")
    )
    return centroids, final


__all__ = ["assign_clusters", "train_kmeans"]
