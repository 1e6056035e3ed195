"""Product-quantization tests: trained-codebook equivalence, DuckDB
value mirrors for the deterministic encode/ADC pipeline, and a recall
floor against exact search."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.text.pq import (
    pq_rerank_topk,
    init_codebooks,
    pq_encode,
    pq_topk,
    train_pq,
)
from tools.oracle_check import assert_matches_oracle

SF_DIR = "/root/testdata/sf0.001"
M, KSUB, DIMS = 4, 16, 64
DSUB = DIMS // M


def _assert_matches_oracle(sdf, oracle_sql):
    assert_matches_oracle(sdf, oracle_sql, SF_DIR)


# SQL building blocks shared by both mirrors: deterministic init
# codebooks ARE derivable in SQL (the ksub lowest-id vectors' slices),
# so the oracle is fully self-contained — no literal codebooks.
_EMB = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
_CENT = (
    f"SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cw, v "
    f"FROM emb ORDER BY vec_id LIMIT {KSUB}"
)
_SUBS = f"SELECT unnest(range(0, {M})) AS sub"
# squared L2 between e.v and c.v restricted to subspace `sub`
_SQ = (
    f"list_sum(list_transform(range(1, {DSUB} + 1), "
    f"i -> (e.v[s.sub * {DSUB} + i] - c.v[s.sub * {DSUB} + i])"
    f" * (e.v[s.sub * {DSUB} + i] - c.v[s.sub * {DSUB} + i])))"
)
_CODES = f"""
  d AS (
    SELECT e.vec_id, s.sub, c.cw, {_SQ} AS sq
    FROM emb e CROSS JOIN subs s CROSS JOIN cent c
  ),
  best AS (
    SELECT vec_id, sub, cw,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                              ORDER BY sq ASC, cw ASC) AS rk
    FROM d
  ),
  codes AS (
    SELECT vec_id, list(CAST(cw AS INT) ORDER BY sub) AS codes
    FROM best WHERE rk = 1 GROUP BY vec_id
  )
"""


def test_pq_encode_matches_duckdb(spark):
    """Deterministic init-codebook encode vs a self-contained DuckDB
    mirror (argmin per subspace, lowest codeword wins ties)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    books = init_codebooks(emb, m=M, ksub=KSUB)
    out = pq_encode(emb, books)
    _assert_matches_oracle(
        out,
        f"""
        WITH emb AS ({_EMB}), cent AS ({_CENT}), subs AS ({_SUBS}),
        {_CODES}
        SELECT vec_id, codes FROM codes
        """,
    )


def test_pq_adc_topk_matches_duckdb(spark):
    """Full encode→ADC top-k vs DuckDB: the per-query LUT is built as an
    ORDERED array and the ADC sum folds left-to-right over subspaces in
    both engines, so the float results are bit-comparable."""
    emb = load_table(spark, SF_DIR, "embeddings")
    books = init_codebooks(emb, m=M, ksub=KSUB)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") % 100 == 0)  # 5 queries
    out = pq_topk(codes, queries, books, k=10)
    _assert_matches_oracle(
        out,
        f"""
        WITH emb AS ({_EMB}), cent AS ({_CENT}), subs AS ({_SUBS}),
        {_CODES},
        q AS (SELECT vec_id AS query_id, v FROM emb WHERE vec_id % 100 = 0),
        lutd AS (
          SELECT q.query_id, s.sub, c.cw,
                 list_sum(list_transform(range(1, {DSUB} + 1),
                   i -> (q.v[s.sub * {DSUB} + i] - c.v[s.sub * {DSUB} + i])
                      * (q.v[s.sub * {DSUB} + i] - c.v[s.sub * {DSUB} + i])))
                   AS pd
          FROM q CROSS JOIN subs s CROSS JOIN cent c
        ),
        lut AS (
          SELECT query_id, list(pd ORDER BY sub, cw) AS lut
          FROM lutd GROUP BY query_id
        ),
        scored AS (
          SELECT l.query_id, e.vec_id,
                 list_sum(list_transform(range(0, {M}),
                   j -> l.lut[j * {KSUB} + e.codes[j + 1] + 1])) AS adc
          FROM codes e CROSS JOIN lut l
          WHERE l.query_id <> e.vec_id
        )
        SELECT query_id, vec_id, ROUND(adc, 6) AS adc_dist,
               CAST(rk AS INT) AS rank
        FROM (
          SELECT query_id, vec_id, adc,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY adc ASC, vec_id ASC) AS rk
          FROM scored
        ) WHERE rk <= 10
        """,
    )


def test_train_pq_is_per_subspace_kmeans(spark):
    """train_pq must equal train_kmeans run independently on each
    subspace slice — the PQ trainer is exactly m Lloyd runs."""
    from clickhouse_etl_spark.text.kmeans import train_kmeans

    emb = load_table(spark, SF_DIR, "embeddings").limit(120)
    books = train_pq(emb, m=2, ksub=4, max_iters=3)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    for j in range(2):
        sub = emb.select(
            "vec_id",
            F.expr(
                f"slice(transform(embedding, x -> CAST(x AS DOUBLE)), "
                f"{j * 32 + 1}, 32)"
            ).alias("sv"),
        )
        want, _ = train_kmeans(sub, 4, max_iters=3, vec_col="sv")
        assert books[j] == want, f"subspace {j} diverged"


def _exact_top10(spark, emb, queries):
    from pyspark.sql import Window

    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qv"))
    exact = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "d2",
            F.expr(
                "aggregate(zip_with(transform(embedding, x -> CAST(x AS DOUBLE)),"
                " transform(qv, x -> CAST(x AS DOUBLE)),"
                " (a, b) -> (a - b) * (a - b)),"
                " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("query_id", "vec_id", F.round("d2", 6).alias("d2"))
    )


def test_pq_rerank_recall_floor(spark):
    """The production pipeline (ADC shortlist → exact re-rank) must
    recover most of the exact L2 top-10; measured 0.70 at m=8/ksub=16/
    shortlist=50 on this corpus — the floor leaves margin for testdata
    regeneration. Returned distances must be EXACT (re-rank contract)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    books = train_pq(emb, m=8, ksub=16, max_iters=5)
    queries = emb.filter(F.col("vec_id") % 50 == 0)  # 10 queries
    got = pq_rerank_topk(emb, queries, books, k=10, shortlist=50)
    exact10 = _exact_top10(spark, emb, queries).cache()
    total = exact10.count()
    assert total == 100
    hits = got.join(exact10.select("query_id", "vec_id"),
                    ["query_id", "vec_id"]).count()
    recall = hits / total
    assert recall >= 0.5, f"recall@10 {recall} below floor"
    # every returned distance is the exact squared L2 (same rounding)
    mismatch = (
        got.join(exact10, ["query_id", "vec_id"])
        .filter(F.col("sq_dist") != F.col("d2"))
        .count()
    )
    assert mismatch == 0
    with pytest.raises(ValueError, match="shortlist"):
        pq_rerank_topk(emb, queries, books, k=10, shortlist=5)


def test_pq_validation(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="divisible"):
        train_pq(emb, m=7)
    with pytest.raises(ValueError, match="non-empty"):
        pq_encode(emb, [])
    with pytest.raises(ValueError, match="ragged"):
        pq_encode(emb, [[[1.0, 2.0]], [[1.0]]])


def test_pq_ragged_row_past_sample_fails_in_pass(spark):
    """r6 ADVICE: _check_dims samples row 1 only; a ragged vector later
    in the corpus must fail the job IN-PASS (assert_true in the encode
    projection), never NULL the folds and promote garbage."""
    from py4j.protocol import Py4JJavaError

    rows = [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0, 3.0, 4.0]),
            (3, [1.0, 2.0])]  # ragged, beyond the sampled first row
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = [[[1.0, 2.0]], [[3.0, 4.0]]]  # m=2, dsub=2 → needs 4 dims
    with pytest.raises(Exception, match="ragged corpus vector"):
        pq_encode(df, books).collect()
    # NULL vectors still pass through (nothing to validate)
    ok = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    got = pq_encode(ok, books).collect()
    assert len(got) == 2


def test_ivf_pq_full_probe_equals_rerank(spark):
    """IVFADC with every cell probed must equal the cell-free
    shortlist+re-rank pipeline — cells prune, never re-rank."""
    from clickhouse_etl_spark.text.kmeans import train_kmeans
    from clickhouse_etl_spark.text.pq import ivf_pq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    books = train_pq(emb, m=8, ksub=16, max_iters=3)
    cents, _ = train_kmeans(emb, 8, max_iters=3)
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    full = ivf_pq_topk(
        emb, queries, cents, books, k=10, nprobe=8, shortlist=50
    )
    want = pq_rerank_topk(emb, queries, books, k=10, shortlist=50)
    got_rows = {tuple(r) for r in full.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows == want_rows


def test_ivf_pq_recall_floor(spark):
    """Realistic probe (4 of 8 cells): the pruned search must still
    recover a useful share of the exact top-10, and every returned
    distance is exact."""
    from clickhouse_etl_spark.text.kmeans import train_kmeans
    from clickhouse_etl_spark.text.pq import ivf_pq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    books = train_pq(emb, m=8, ksub=16, max_iters=3)
    cents, _ = train_kmeans(emb, 8, max_iters=3)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = ivf_pq_topk(emb, queries, cents, books, k=10, nprobe=4,
                      shortlist=50)
    exact10 = _exact_top10(spark, emb, queries).cache()
    hits = got.join(exact10.select("query_id", "vec_id"),
                    ["query_id", "vec_id"]).count()
    recall = hits / exact10.count()
    assert recall >= 0.35, f"IVFADC recall@10 {recall} below floor"
    mismatch = (
        got.join(exact10, ["query_id", "vec_id"])
        .filter(F.col("sq_dist") != F.col("d2"))
        .count()
    )
    assert mismatch == 0
    with pytest.raises(ValueError, match="nprobe"):
        ivf_pq_topk(emb, queries, cents, books, k=10, nprobe=0)
