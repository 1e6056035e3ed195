"""Product quantization (PQ) — compressed-domain ANN scoring.

IVF (:func:`text.similarity.ivf_ann_topk`) prunes WHICH corpus vectors
a query examines; PQ compresses HOW each examined vector is stored and
scored (Jégou, Douze & Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011): split the ``d`` dims into ``m``
subspaces, k-means each subspace to ``ksub`` codewords, store each
vector as ``m`` small codes, and score query→vector as the sum of
``m`` lookup-table entries (asymmetric distance computation, ADC)
instead of a ``d``-term scan.

Scale story — the reason PQ exists at 100 TB: after :func:`pq_encode`
the corpus side of an ANN pass stops carrying float arrays at all. A
64-dim float32 embedding (256 bytes) becomes 4 codes (4 bytes at
``ksub<=256``); the codes DataFrame is what persists/shuffles/joins,
and the per-candidate cost is ``m`` ``element_at`` lookups inside
whole-stage codegen. Training reuses the distributed Lloyd trainer
once per subspace (``m`` small trainings, each a corpus-pass-per-iter
distributed job); encoding is the same broadcast-literal argmin as
:func:`text.kmeans.assign_clusters`. No Python in any row path; the
only shuffle anywhere is the final per-query top-k window.

Like IVF's sampled-centroid default, codebooks built from the ``ksub``
lowest-id subvectors (:func:`init_codebooks`) make the whole
encode→ADC pipeline deterministic and SQL-expressible — the
DuckDB-value-hash form; pass :func:`train_pq` output for the trained
form (identical expression machinery, cells shaped by the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_etl_spark.text.kmeans import _sq_dist_expr, train_kmeans
from clickhouse_etl_spark.text.similarity import _as_double, _probe_dims

def _check_books(codebooks) -> tuple[int, int, int]:
    """Validate [m][ksub][dsub] shape; return (m, ksub, dsub)."""
    if not codebooks or not codebooks[0] or not codebooks[0][0]:
        raise ValueError("codebooks must be non-empty [m][ksub][dsub]")
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    for j, book in enumerate(codebooks):
        if len(book) != ksub or any(len(c) != dsub for c in book):
            raise ValueError(
                f"codebook {j} is ragged: expected {ksub}x{dsub}"
            )
    return m, ksub, dsub


def _check_dims(df: DataFrame, vec_col: str, m: int, dsub: int, side: str):
    """SAMPLED fast pre-check (row 1 only — deliberately cruder than
    similarity's ``_probe_dims``, which since r8 takes the MODAL size
    over a 1024-row sample and skips NULL rows; here a NULL probe row
    simply skips the pre-check and defers to the in-pass assert):
    catches the common whole-corpus dims mismatch
    before any work with a friendly error. Ragged rows PAST row 1 are
    caught in-pass by :func:`_vec_expr`'s per-row assert (r6 ADVICE:
    without it a ragged row slices short, NULLs the distance folds,
    and ranks garbage FIRST since NULLs sort low ascending). An EMPTY
    input (a delta batch with no vectors) or a NULL probe row has
    nothing to validate and passes through."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if not row or row[0]["d"] is None or row[0]["d"] < 0:
        return
    dims = int(row[0]["d"])
    if dims != m * dsub:
        raise ValueError(
            f"{side} vectors have {dims} dims but codebooks cover "
            f"{m}*{dsub}={m * dsub}"
        )


def _vec_expr(vec_col: str, m: int, dsub: int, side: str):
    """The double-cast vector with IN-PASS dims enforcement: every row
    must carry exactly m*dsub dims or the job fails loudly (assert_true
    in the projection — no extra pass, codegen'd with the folds). NULL
    vectors pass through untouched (matching _check_dims); the fold
    then yields no candidate for that row."""
    v = F.expr(_as_double(vec_col))
    ok = F.assert_true(
        v.isNull() | (F.size(v) == m * dsub),
        F.lit(
            f"pq: ragged {side} vector (size != {m * dsub}) past the "
            "sampled dims check"
        ),
    )
    return F.when(ok.isNull(), v)


def _subvec(j: int, dsub: int, vec: str = "__v") -> str:
    return f"slice({vec}, {j * dsub + 1}, {dsub})"


def init_codebooks(
    df: DataFrame,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic untrained codebooks: subspace ``j``'s codewords are
    the ``ksub`` lowest-id vectors' ``j``-th subvectors — the same
    no-RNG convention as the Lloyd initializer and IVF's sampled
    centroids, so encode/ADC results are reproducible and
    oracle-checkable without a training run. A bounded driver-side
    reduction (``ksub`` rows), never the corpus."""
    dims = _probe_dims(df, vec_col)
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    dsub = dims // m
    rows = (
        df.select(F.col(id_col), F.expr(_as_double(vec_col)).alias("__v"))
        .orderBy(id_col)
        .limit(ksub)
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"ksub={ksub} but corpus has only {len(rows)} vectors")
    return [
        [list(r["__v"][j * dsub : (j + 1) * dsub]) for r in rows]
        for j in range(m)
    ]


def train_pq(
    df: DataFrame,
    m: int = 4,
    ksub: int = 16,
    max_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train PQ codebooks: one distributed Lloyd run per subspace
    (``m`` runs of :func:`text.kmeans.train_kmeans` over the sliced
    corpus — each run is the module-documented one-pass-per-iteration
    job; the driver only ever holds ``ksub x dsub`` scalars per run).
    Returns ``[m][ksub][dsub]`` codebooks for :func:`pq_encode` /
    :func:`pq_topk`."""
    dims = _probe_dims(df, vec_col)
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    dsub = dims // m
    base = df.select(F.col(id_col), F.expr(_as_double(vec_col)).alias("__v"))
    books = []
    for j in range(m):
        sub = base.select(
            id_col, F.expr(_subvec(j, dsub)).alias("__sub")
        )
        centroids, _ = train_kmeans(
            sub, ksub, max_iters=max_iters, id_col=id_col, vec_col="__sub"
        )
        books.append(centroids)
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, codes)``: each vector's ``m`` nearest-codeword indices
    (L2 argmin per subspace, lowest index wins ties). Codebooks ride
    the plan as literals (kilobytes of codegen); the encode pass is
    map-only — zero shuffle, no Python (the input is spread across the
    cluster first when the scan arrived byte-small: encode is
    CPU-heavy per row — m*ksub distance folds)."""
    from clickhouse_etl_spark.util import rebalance_for_compute

    m, _ksub, dsub = _check_books(codebooks)
    _check_dims(df, vec_col, m, dsub, "corpus")
    # project narrow FIRST, then spread: the rebalance shuffle carries
    # only (id, vector), not the full input row
    base = rebalance_for_compute(
        df.select(
            F.col(id_col), _vec_expr(vec_col, m, dsub, "corpus").alias("__v")
        )
    )
    return _codes_projection(base, codebooks, id_col)


def _codes_projection(
    base: DataFrame,
    codebooks,
    id_col: str,
    cell_centroids=None,
) -> DataFrame:
    """The one fused map-only pass shared by :func:`pq_encode` and
    :func:`ivf_pq_topk`: per-subspace code argmins from ``base``'s
    ``(id, __v)``, plus (when ``cell_centroids`` is given) the coarse
    cell argmin fused into the same projection. Distance arrays are
    named columns FIRST — array_position + array_min each reference the
    array, and re-inlining would double-evaluate the ksub-term fold
    (same discipline as kmeans.assign_clusters)."""
    m, _ksub, dsub = _check_books(codebooks)
    with_cell = (
        [
            F.array(
                *[F.expr(_sq_dist_expr("__v", c)) for c in cell_centroids]
            ).alias("__celld")
        ]
        if cell_centroids is not None
        else []
    )
    with_d = base.select(
        id_col,
        *[F.expr(_subvec(j, dsub)).alias(f"__s{j}") for j in range(m)],
        *with_cell,
    ).select(
        id_col,
        *(["__celld"] if cell_centroids is not None else []),
        *[
            F.array(
                *[F.expr(_sq_dist_expr(f"__s{j}", c)) for c in book]
            ).alias(f"__d{j}")
            for j, book in enumerate(codebooks)
        ],
    )
    cell_out = (
        [
            F.expr(
                "CAST(array_position(__celld, array_min(__celld)) - 1 AS INT)"
            ).alias("cluster")
        ]
        if cell_centroids is not None
        else []
    )
    return with_d.select(
        id_col,
        *cell_out,
        F.array(
            *[
                F.expr(
                    f"CAST(array_position(__d{j}, array_min(__d{j})) - 1 AS INT)"
                )
                for j in range(m)
            ]
        ).alias("codes"),
    )


def _lut_df(
    queries: DataFrame,
    codebooks,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    keep_vec: bool = False,
) -> DataFrame:
    """Per-query flat ADC lookup table: ``m*ksub`` partial squared
    distances ordered (subspace-major, codeword-minor) — an O(d*ksub)
    JVM fold per QUERY, not per pair."""
    m, _ksub, dsub = _check_books(codebooks)
    _check_dims(queries, vec_col, m, dsub, "query")
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        _vec_expr(vec_col, m, dsub, "query").alias("__qv"),
    )
    qsubs = q.select(
        query_id_col,
        "__qv",
        *[F.expr(_subvec(j, dsub, "__qv")).alias(f"__q{j}") for j in range(m)],
    )
    return qsubs.select(
        query_id_col,
        *(["__qv"] if keep_vec else []),
        F.array(
            *[
                F.expr(_sq_dist_expr(f"__q{j}", c))
                for j, book in enumerate(codebooks)
                for c in book
            ]
        ).alias("__lut"),
    )


def _adc_expr(codebooks, codes_col: str) -> str:
    m, ksub, _dsub = _check_books(codebooks)
    return (
        f"aggregate(zip_with({codes_col}, sequence(0, {m - 1}), "
        f"(c, j) -> element_at(__lut, j * {ksub} + c + 1)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codes_col: str = "codes",
) -> DataFrame:
    """ADC top-k: rank the (compressed) corpus per query by approximate
    squared L2 distance. Returns ``(query_id, vec_id, adc_dist, rank)``
    with ``rank`` 1..k ascending distance, id ascending as tie-break;
    a query id present in the corpus is excluded from its own result
    (self-match), mirroring the other search operators.

    Each query precomputes a flat lookup table of ``m*ksub`` partial
    squared distances (query subvector ↔ every codeword — an O(d*ksub)
    JVM fold per QUERY, not per pair); scoring a corpus code row is
    then ``m`` table lookups: ``sum_j lut[j*ksub + code_j]``. The
    query+LUT side broadcasts, so the whole scan is map-side; the only
    shuffle is the per-query top-k window."""
    lut = _lut_df(queries, codebooks, id_col, vec_col, query_id_col)
    scored = (
        codes.join(F.broadcast(lut), F.col(query_id_col) != F.col(id_col))
        .withColumn("__adc_raw", F.expr(_adc_expr(codebooks, codes_col)))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__adc_raw").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("__adc_raw", 6).alias("adc_dist"),
            "rank",
        )
    )


def _exact_rerank(
    cand: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Shared exact-L2 re-rank: ``cand`` carries (query_id, id) — a
    shortlist-sized fact-derived side that joins back to the corpus
    vectors (AQE-elective) and broadcast-joins the query vectors.
    Returns ``(query_id, id, sq_dist, rank)`` rows, rank 1..k ascending
    exact distance, id ascending tie-break."""
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.expr(_as_double(vec_col)).alias("__qv"),
    )
    c = corpus.select(F.col(id_col), F.expr(_as_double(vec_col)).alias("__cv"))
    exact = (
        cand.join(c, on=id_col)
        .join(F.broadcast(q), on=query_id_col)
        .withColumn(
            "__d2",
            F.expr(
                "aggregate(zip_with(__cv, __qv, (a, b) -> (a - b) * (a - b)), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__d2").asc(), F.col(id_col).asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("__d2", 6).alias("sq_dist"),
            "rank",
        )
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """The production PQ pipeline: ADC shortlist, then EXACT re-rank.

    Compressed-domain scoring is lossy (quantization noise reorders
    near-ties), so the standard deployment scores a ``shortlist``
    (default ``5*k``) of candidates per query with ADC — the cheap
    whole-corpus pass over codes — and re-ranks ONLY those with exact
    squared L2 against the full vectors. Returns ``(query_id, vec_id,
    sq_dist, rank)`` with exact distances; recall against exhaustive
    search equals the shortlist's containment of the true top-k (the
    contract pinned in tests), while the exact work drops from
    ``corpus × queries`` to ``shortlist × queries``.

    The shortlist ids join back to the corpus vectors on ``id_col`` —
    a shortlist-sized (queries*shortlist rows) fact-derived side that
    AQE broadcasts at real scale."""
    shortlist = 5 * k if shortlist is None else shortlist
    if shortlist < k:
        raise ValueError(f"shortlist={shortlist} must be >= k={k}")
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    cand = pq_topk(
        codes,
        queries,
        codebooks,
        k=shortlist,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(query_id_col, id_col)
    return _exact_rerank(cand, corpus, queries, k, id_col, vec_col, query_id_col)


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids,
    codebooks,
    k: int = 5,
    nprobe: int = 4,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVFADC — the full Jégou et al. 2011 search shape, and the one
    that actually runs at 100 TB: IVF cells prune WHICH vectors a query
    touches (``~nprobe/num_cells`` of the corpus), PQ codes compress
    WHAT is read for each touched vector (bytes, not floats), ADC ranks
    a ``shortlist`` (default ``5*k``) inside the probed cells, and the
    shortlist alone is re-ranked with exact squared L2 against the full
    vectors. Returns ``(query_id, vec_id, sq_dist, rank)`` — exact
    distances, same contract as :func:`pq_rerank_topk`.

    ``centroids`` are the coarse cells (``train_kmeans`` output or any
    ``list[list[float]]``); ``codebooks`` the PQ books. Both ride the
    plan as literals, so cell argmin AND code argmins are ONE fused
    map-only projection over the corpus scan — no corpus-scale join or
    extra pass anywhere; the query→cell and query→LUT tables broadcast,
    so the candidate scan is map-side and the only shuffles are the two
    per-query top-k windows (ADC + re-rank) over already-shortlisted
    rows."""
    from clickhouse_etl_spark.util import rebalance_for_compute

    shortlist = 5 * k if shortlist is None else shortlist
    if shortlist < k:
        raise ValueError(f"shortlist={shortlist} must be >= k={k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    m, _ksub, dsub = _check_books(codebooks)
    _check_dims(corpus, vec_col, m, dsub, "corpus")
    if not centroids:
        raise ValueError("centroids must be non-empty")
    if len(centroids[0]) != m * dsub:
        raise ValueError(
            f"centroids have {len(centroids[0])} dims but codebooks "
            f"cover {m * dsub}"
        )

    # ONE fused corpus pass: cell argmin + per-subspace code argmins
    # from the same (rebalanced, narrow) projection — a byte-small scan
    # otherwise serializes the distance folds onto one core
    base = rebalance_for_compute(
        corpus.select(
            F.col(id_col), _vec_expr(vec_col, m, dsub, "corpus").alias("__v")
        )
    )
    codes = _codes_projection(base, codebooks, id_col, cell_centroids=centroids)

    # query → nprobe nearest cells (ids only; the LUT re-attaches by
    # query id after the cell join so each query's m*ksub table
    # broadcasts ONCE, not once per probed cell)
    lut = _lut_df(
        queries, codebooks, id_col, vec_col, query_id_col, keep_vec=True
    )
    q_cells = (
        lut.select(
            query_id_col,
            F.posexplode(
                F.array(*[F.expr(_sq_dist_expr("__qv", c)) for c in centroids])
            ).alias("cluster", "__cdist"),
        )
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.col("__cdist").asc(), F.col("cluster").asc()
                )
            ),
        )
        .filter(F.col("__rk") <= nprobe)
        .select(query_id_col, "cluster")
    )

    cand = (
        codes.join(F.broadcast(q_cells), on="cluster")
        .filter(F.col(query_id_col) != F.col(id_col))
        .join(F.broadcast(lut.select(query_id_col, "__lut")), on=query_id_col)
        .withColumn("__adc_raw", F.expr(_adc_expr(codebooks, "codes")))
    )
    w_adc = Window.partitionBy(query_id_col).orderBy(
        F.col("__adc_raw").asc(), F.col(id_col).asc()
    )
    short = (
        cand.withColumn("__srk", F.row_number().over(w_adc))
        .filter(F.col("__srk") <= shortlist)
        .select(query_id_col, id_col)
    )
    return _exact_rerank(
        short, corpus, queries, k, id_col, vec_col, query_id_col
    )


__all__ = [
    "init_codebooks",
    "train_pq",
    "pq_encode",
    "pq_topk",
    "pq_rerank_topk",
    "ivf_pq_topk",
]
