"""Batch-inference scoring seam — DuckDB oracle + contract tests."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.text.scoring import filter_by_score, score_documents
from tools.oracle_check import canon_rows

SF_DIR = "/root/testdata/sf0.001"

# SQL mirror of scoring._default_model (weights -1.5 / 0.02 / -2.0).
_ORACLE = """
    SELECT doc_id,
           1.0 / (1.0 + exp(-(
             -1.5
             + 0.02 * least(len(string_split(text, ' ')), 256)
             + -2.0 * (CASE WHEN length(text) > 0
                       THEN length(regexp_replace(text, '[^A-Z]', '', 'g'))
                            * 1.0 / length(text)
                       ELSE 0.0 END)
           ))) AS score
    FROM documents
"""


def test_score_documents_oracle(spark):
    """The full inference path (Arrow batching, schema, null handling)
    is value-hash checked, not smoke-tested."""
    docs = load_table(spark, SF_DIR, "documents")
    out = score_documents(docs)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        cur = con.execute(_ORACLE)
        dcols, drows = [d[0] for d in cur.description], cur.fetchall()
    finally:
        con.close()
    sc, sr = canon_rows(out.columns, [tuple(r) for r in out.collect()])
    dc, dr = canon_rows(dcols, drows)
    assert sc == dc and len(sr) == len(dr)
    assert sr == dr


def test_injected_model(spark):
    """A caller-supplied model replaces the stub through the same path."""
    docs = load_table(spark, SF_DIR, "documents")
    out = score_documents(docs, model_fn=lambda t: t.str.len() / 1000.0)
    rows = {r.doc_id: r.score for r in out.collect()}
    lens = {r.doc_id: len(r.text) for r in docs.select("doc_id", "text").collect()}
    assert rows == {k: v / 1000.0 for k, v in lens.items()}


def test_filter_by_score(spark):
    """filter_by_score keeps exactly the docs clearing the threshold,
    with the full original schema."""
    docs = load_table(spark, SF_DIR, "documents")
    thr = 0.45
    kept = filter_by_score(docs, thr)
    assert kept.columns == docs.columns
    scores = {r.doc_id: r.score for r in score_documents(docs).collect()}
    expect = {d for d, s in scores.items() if s >= thr}
    got = {r.doc_id for r in kept.select("doc_id").collect()}
    assert got == expect
    assert 0 < len(got) < len(scores), "threshold should split the corpus"


def test_null_text_scores_as_empty(spark):
    """A null text must not kill the job — it scores like empty text."""
    df = spark.createDataFrame(
        [(1, "Hello world"), (2, None), (3, "")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r.score for r in score_documents(df).collect()}
    assert len(rows) == 3
    assert rows[2] == rows[3]
    assert all(0.0 < s < 1.0 for s in rows.values())


def test_scan_pruned_to_model_inputs(spark):
    """Only (id, text) reach Python — the parquet scan must not read
    the other document columns."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        score_documents(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "text"}, cols
