"""Inverted index / TF-IDF — DuckDB-oracle and plan tests."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.text.index import inverted_index, tf_idf
from tools.oracle_check import canon_rows

SF_DIR = "/root/testdata/sf0.001"


def _assert_matches(sdf, oracle_sql):
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        cur = con.execute(oracle_sql)
        dcols, drows = [d[0] for d in cur.description], cur.fetchall()
    finally:
        con.close()
    sc, sr = canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    dc, dr = canon_rows(dcols, drows)
    assert sc == dc, f"columns differ: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"rowcount: spark={len(sr)} duckdb={len(dr)}"
    assert sr == dr, "canonicalized values differ"


_TD_SQL = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    terms AS (
      SELECT doc_id, t[i] AS term
      FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
      WHERE t[i] != ''
    ),
    td AS (SELECT term, doc_id, count(*) AS tf FROM terms GROUP BY 1, 2)
"""


def test_inverted_index_oracle(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = inverted_index(docs, min_df=2)
    _assert_matches(
        out,
        _TD_SQL
        + """
        SELECT term, count(*) AS doc_freq, sum(tf) AS total_tf,
               string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
        FROM td GROUP BY term HAVING count(*) >= 2
        """,
    )


def test_inverted_index_max_postings(spark):
    """Posting lists truncate to the lowest-id entries; counts stay exact."""
    docs = load_table(spark, SF_DIR, "documents")
    full = {r.term: r for r in inverted_index(docs).collect()}
    capped = inverted_index(docs, max_postings=3).collect()
    for r in capped:
        f = full[r.term]
        assert (r.doc_freq, r.total_tf) == (f.doc_freq, f.total_tf)
        assert r.postings == ",".join(f.postings.split(",")[:3])


def test_tf_idf_oracle(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = tf_idf(docs)
    _assert_matches(
        out,
        _TD_SQL
        + """
        , dl AS (SELECT doc_id, sum(tf) AS len FROM td GROUP BY doc_id),
        df AS (SELECT term, count(*) AS df FROM td GROUP BY term),
        n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
        SELECT td.doc_id, td.term, td.tf,
               (td.tf / dl.len) * (ln((1 + n.n) / (1 + df.df)) + 1) AS weight
        FROM td JOIN dl USING (doc_id) JOIN df USING (term), n
        """,
    )


def test_index_plan_no_python(spark):
    docs = load_table(spark, SF_DIR, "documents")
    for op in (inverted_index(docs), tf_idf(docs)):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_ranks_relevance(spark):
    """A doc dense in rare query terms outranks one with a single common
    term; docs without any query term never appear; k bounds the rows;
    the plan stays Python-free (TakeOrdered top-k, no global sort)."""
    from clickhouse_etl_spark.text.index import bm25_topk

    rows = [
        (1, "spark engine spark engine spark"),
        (2, "the the the the the engine"),
        (3, "nothing relevant here at all"),
        (4, "spark once among many other words entirely unrelated"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, ["spark", "engine"], k=3)
    got = out.collect()
    ids = [r.doc_id for r in got]
    assert ids[0] == 1  # rare-term-dense doc wins
    assert 3 not in ids  # no query term -> excluded
    assert len(ids) == 3
    assert got[0].score > got[1].score >= got[2].score
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_requires_terms(spark):
    from clickhouse_etl_spark.text.index import bm25_topk

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    try:
        bm25_topk(docs, [])
        raise AssertionError("empty query must raise")
    except ValueError:
        pass


def test_bm25_rejects_bare_string_query(spark):
    """A bare string would be iterated as characters and silently score
    single-letter terms — refuse it."""
    import pytest

    from clickhouse_etl_spark.text.index import bm25_topk

    df = spark.createDataFrame([(1, "the data")], "id int, text string")
    with pytest.raises(TypeError, match="not a string"):
        bm25_topk(df, query_terms="the data")
