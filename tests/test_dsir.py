"""DSIR importance-weighting tests: bit-exact DuckDB mirrors for the
poly hash family (features → bucket models → per-doc scores), plus
deterministic-resampling and policy pins."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.text.dedup import poly_affine_constants
from clickhouse_etl_spark.text.dsir import (
    dsir_bucket_logratios,
    dsir_resample,
    dsir_scores,
    dsir_select,
    hashed_ngram_buckets,
)
from tools.oracle_check import assert_matches_oracle

SF_DIR = "/root/testdata/sf0.001"
NB = 64  # buckets — small so the sf0.001 corpus exercises collisions

_M64 = "18446744073709551616::HUGEINT"
_FOLD = (
    "list_reduce(list_prepend(0::HUGEINT,"
    " list_transform(string_split({s}, ''), c -> ascii(c)::HUGEINT)),"
    f" (acc, ch) -> (acc * 31 + ch) % {_M64})"
)


def _bucket_sql() -> str:
    """DuckDB mirror of _bucket_expr under 'poly': unsigned fold →
    affine → signed int64 → pmod."""
    a, b = poly_affine_constants(0)
    u = f"(({_FOLD.format(s='g')}) * {a}::HUGEINT + {b}::HUGEINT) % {_M64}"
    signed = (
        f"(CASE WHEN ({u}) >= 9223372036854775808::HUGEINT "
        f"THEN ({u}) - {_M64} ELSE ({u}) END)"
    )
    return f"((({signed}) % {NB}) + {NB}) % {NB}"


# target/raw split of the documents table used throughout
_T_WHERE = "doc_id % 10 = 0"
_R_WHERE = "doc_id % 10 <> 0"

_FEATS = f"""
  toks AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), w -> w <> '') AS t
    FROM documents
  ),
  grams AS (
    SELECT doc_id,
           list_concat(t, list_transform(range(1, len(t)),
             i -> t[i] || ' ' || t[i + 1])) AS gs
    FROM toks
  ),
  feats AS (
    SELECT doc_id, CAST({_bucket_sql()} AS BIGINT) AS bucket
    FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
  )
"""


def _assert_matches_oracle(sdf, oracle_sql):
    assert_matches_oracle(sdf, oracle_sql, SF_DIR)


def test_hashed_ngram_buckets_matches_duckdb(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = hashed_ngram_buckets(
        docs, num_buckets=NB, hash_family="poly"
    )
    _assert_matches_oracle(
        out,
        f"""
        WITH {_FEATS}
        SELECT doc_id, bucket, count(*) AS cnt
        FROM feats GROUP BY doc_id, bucket
        """,
    )


_MODEL = f"""
  tcnt AS (
    SELECT bucket, count(*) AS t_n FROM feats
    WHERE {_T_WHERE} GROUP BY bucket
  ),
  rcnt AS (
    SELECT bucket, count(*) AS r_n FROM feats
    WHERE {_R_WHERE} GROUP BY bucket
  ),
  model AS (
    SELECT b.bucket,
           COALESCE(t.t_n, 0) AS t_n, COALESCE(r.r_n, 0) AS r_n
    FROM (SELECT unnest(range(0, {NB})) AS bucket) b
    LEFT JOIN tcnt t ON t.bucket = b.bucket
    LEFT JOIN rcnt r ON r.bucket = b.bucket
  ),
  ratios AS (
    SELECT bucket,
           ln(t_n + 1.0) - ln((SELECT SUM(t_n) FROM model) + {NB}.0)
           - ln(r_n + 1.0) + ln((SELECT SUM(r_n) FROM model) + {NB}.0)
             AS log_ratio
    FROM model
  )
"""


def test_dsir_logratios_match_duckdb(spark):
    docs = load_table(spark, SF_DIR, "documents")
    target = docs.filter(F.expr(_T_WHERE))
    raw = docs.filter(F.expr(_R_WHERE))
    out = dsir_bucket_logratios(
        target, raw, num_buckets=NB, hash_family="poly"
    )
    _assert_matches_oracle(
        out.select("bucket", F.round("log_ratio", 6).alias("log_ratio")),
        f"""
        WITH {_FEATS}, {_MODEL}
        SELECT bucket, ROUND(log_ratio, 6) AS log_ratio FROM ratios
        """,
    )


def test_dsir_scores_match_duckdb(spark):
    docs = load_table(spark, SF_DIR, "documents")
    target = docs.filter(F.expr(_T_WHERE))
    raw = docs.filter(F.expr(_R_WHERE))
    lr = dsir_bucket_logratios(
        target, raw, num_buckets=NB, hash_family="poly"
    )
    out = dsir_scores(raw, lr, num_buckets=NB, hash_family="poly")
    _assert_matches_oracle(
        out.select(
            "doc_id", F.round("dsir_logweight", 6).alias("dsir_logweight")
        ),
        f"""
        WITH {_FEATS}, {_MODEL},
        docfeats AS (
          SELECT doc_id, bucket, count(*) AS cnt FROM feats
          WHERE {_R_WHERE} GROUP BY doc_id, bucket
        )
        SELECT d.doc_id,
               ROUND(COALESCE(SUM(f.cnt * r.log_ratio), 0.0), 6)
                 AS dsir_logweight
        FROM (SELECT doc_id FROM documents WHERE {_R_WHERE}) d
        LEFT JOIN docfeats f ON f.doc_id = d.doc_id
        LEFT JOIN ratios r ON r.bucket = f.bucket
        GROUP BY d.doc_id
        """,
    )


def test_dsir_resample_deterministic_and_bounded(spark):
    docs = load_table(spark, SF_DIR, "documents")
    target = docs.filter(F.expr(_T_WHERE))
    raw = docs.filter(F.expr(_R_WHERE))
    lr = dsir_bucket_logratios(target, raw, num_buckets=NB)
    scores = dsir_scores(raw, lr, num_buckets=NB)
    a = dsir_resample(scores, 25, seed=7)
    b = dsir_resample(scores, 25, seed=7)
    got_a = sorted(r.doc_id for r in a.collect())
    got_b = sorted(r.doc_id for r in b.collect())
    assert got_a == got_b and len(got_a) == 25
    # a different seed draws a different set (overwhelmingly likely)
    c = sorted(r.doc_id for r in dsir_resample(scores, 25, seed=8).collect())
    assert c != got_a
    # temperature -> 0 approaches hard top-n by weight
    cold = dsir_resample(scores, 25, temperature=1e-9, seed=7)
    top = scores.orderBy(
        F.col("dsir_logweight").desc(), F.col("doc_id").asc()
    ).limit(25)
    assert {r.doc_id for r in cold.collect()} == {
        r.doc_id for r in top.collect()
    }
    # mean selected weight: cold selection >= faithful-DSIR selection
    mw = lambda df: df.agg(F.avg("dsir_logweight")).collect()[0][0]
    assert mw(cold) >= mw(a) - 1e-9

    # poly noise family (r8): deterministic, full-size, a DIFFERENT
    # draw than xxhash64 under the same seed (independent permutation),
    # and the same hard-top-n cold limit. Unknown family fails loudly.
    p1 = sorted(
        r.doc_id
        for r in dsir_resample(scores, 25, seed=7, hash_family="poly").collect()
    )
    p2 = sorted(
        r.doc_id
        for r in dsir_resample(scores, 25, seed=7, hash_family="poly").collect()
    )
    assert p1 == p2 and len(p1) == 25 and p1 != got_a
    cold_p = dsir_resample(
        scores, 25, temperature=1e-9, seed=7, hash_family="poly"
    )
    assert {r.doc_id for r in cold_p.collect()} == {
        r.doc_id for r in top.collect()
    }
    import pytest

    with pytest.raises(ValueError, match="hash_family"):
        dsir_resample(scores, 25, hash_family="nope")


def test_dsir_select_composes_and_keeps_width(spark):
    docs = load_table(spark, SF_DIR, "documents")
    target = docs.filter(F.expr(_T_WHERE))
    raw = docs.filter(F.expr(_R_WHERE))
    out = dsir_select(target, raw, n=10, num_buckets=NB, seed=3)
    rows = out.collect()
    assert len(rows) == 10
    assert set(docs.columns) < set(out.columns)  # width + the weight
    assert "dsir_logweight" in out.columns


def test_dsir_empty_doc_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, None), (4, "alpha beta")],
        "doc_id long, text string",
    )
    lr = dsir_bucket_logratios(
        df.filter("doc_id = 1"), df.filter("doc_id <> 1"), num_buckets=NB
    )
    out = dsir_scores(df, lr, num_buckets=NB)
    got = {r.doc_id: r.dsir_logweight for r in out.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == 0.0 and got[3] == 0.0
    assert got[4] != 0.0


def test_dsir_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_buckets"):
        hashed_ngram_buckets(df, num_buckets=1)
    with pytest.raises(ValueError, match="hash_family"):
        hashed_ngram_buckets(df, hash_family="nope")
    with pytest.raises(ValueError, match="add_k"):
        dsir_bucket_logratios(df, df, add_k=0.0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_resample(df.withColumn("dsir_logweight", F.lit(0.0)), 1,
                      temperature=0.0)
    with pytest.raises(ValueError, match="n must be"):
        dsir_resample(df.withColumn("dsir_logweight", F.lit(0.0)), 0)
