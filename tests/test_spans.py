"""Duplicated-span (substring-level) dedup — oracle + semantics tests.

DuckDB oracle mirrors the full plan (positioned shingles -> corpus-wide
duplicated set -> gaps-and-islands merge) with the same comparison
tools/oracle_check.py and the driver use.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.text.spans import (
    cut_duplicated_spans,
    duplicated_spans,
    span_dedup_stats,
)
from tools.oracle_check import canon_rows

SF_DIR = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        cur = con.execute(sql)
        return [d[0] for d in cur.description], cur.fetchall()
    finally:
        con.close()


def _assert_matches(sdf, oracle_sql):
    dcols, drows = _oracle(oracle_sql)
    sc, sr = canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    dc, dr = canon_rows(dcols, drows)
    assert sc == dc, f"columns differ: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"rowcount: spark={len(sr)} duckdb={len(dr)}"
    assert sr == dr, "canonicalized values differ"


def _spans_oracle_sql(k: int) -> str:
    # list slice t[i:i+k-1] is INCLUSIVE in DuckDB -> k elements.
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+{k}-1], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - {k} + 1, 0))) AS g(i)
    ),
    dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
    hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
    islands AS (
      SELECT doc_id, pos,
        CASE WHEN pos > coalesce(max(pos + {k}) OVER (
          PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    grp AS (
      SELECT doc_id, pos, sum(brk) OVER (
        PARTITION BY doc_id ORDER BY pos) AS gid
      FROM islands
    )
    SELECT doc_id, min(pos) AS span_start, max(pos) + {k} AS span_end,
           max(pos) + {k} - min(pos) AS span_tokens
    FROM grp GROUP BY doc_id, gid
    """


def test_duplicated_spans_oracle(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = duplicated_spans(docs, k=8)
    _assert_matches(out, _spans_oracle_sql(8))


def test_duplicated_spans_oracle_k3(spark):
    """Denser duplication (every doc hits at k=3) — exercises heavy
    overlap merging, not just isolated pairs."""
    docs = load_table(spark, SF_DIR, "documents")
    out = duplicated_spans(docs, k=3)
    _assert_matches(out, _spans_oracle_sql(3))


def test_hash_key_equals_gram_key(spark):
    """The 8-byte shuffle-key variant is pinned equal to the exact one
    on the test corpus (collisions can only over-mark; none here)."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = {tuple(r) for r in duplicated_spans(docs, k=8).collect()}
    hashed = {tuple(r) for r in duplicated_spans(docs, k=8, key="hash").collect()}
    assert exact == hashed


def test_span_semantics_micro(spark):
    """Hand-built corpus: cross-doc repeat merges into one maximal span,
    within-doc repeat counts, short docs emit nothing."""
    rows = [
        # d1/d2 share tokens a..f (6 tokens) -> with k=3, shingle starts
        # 0..3 merge into one span [0, 6) in both docs.
        (1, "a b c d e f x1 y1 z1"),
        (2, "q2 a b c d e f w2"),
        # d3 repeats its own trigram "r r r" at 0 and 4 (overlap-free):
        # positions 0..2 all dup ("r r r" occurs 3x within doc) -> one
        # merged span covering the whole doc.
        (3, "r r r r r r r"),
        # shorter than k -> no shingles, never flagged.
        (4, "a b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(docs, k=3).collect()
    }
    assert (1, 0, 6) in out
    assert (2, 1, 7) in out
    assert (3, 0, 7) in out
    assert not any(d == 4 for d, _, _ in out)
    # d1's unique tail x1 y1 z1 is NOT part of any span.
    assert all(e <= 6 for d, s, e in out if d == 1)


def test_span_dedup_stats(spark):
    """Stats roll up the span rows; clean docs appear with zeros; the
    dup fraction is bounded by 1."""
    docs = load_table(spark, SF_DIR, "documents")
    stats = span_dedup_stats(docs, k=8)
    rows = stats.collect()
    assert len(rows) == docs.count()
    flagged = [r for r in rows if r.n_spans > 0]
    spans = duplicated_spans(docs, k=8)
    assert len(flagged) == spans.select("doc_id").distinct().count()
    assert all(0.0 <= r.dup_fraction <= 1.0 for r in rows)
    assert all(r.dup_tokens == 0 and r.dup_fraction == 0.0
               for r in rows if r.n_spans == 0)


def test_non_first_oracle(spark):
    """The keep-one-copy policy (row_number over each shingle's
    occurrences) against a DuckDB mirror."""
    docs = load_table(spark, SF_DIR, "documents")
    out = duplicated_spans(docs, k=8, mark="non_first")
    k = 8
    _assert_matches(
        out,
        f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
          SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+{k}-1], ' ') AS gram
          FROM toks, UNNEST(generate_series(1, greatest(len(t) - {k} + 1, 0))) AS g(i)
        ),
        hits AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
            FROM grams
          ) WHERE rn >= 2
        ),
        islands AS (
          SELECT doc_id, pos,
            CASE WHEN pos > coalesce(max(pos + {k}) OVER (
              PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
            THEN 1 ELSE 0 END AS brk
          FROM hits
        ),
        grp AS (
          SELECT doc_id, pos, sum(brk) OVER (
            PARTITION BY doc_id ORDER BY pos) AS gid
          FROM islands
        )
        SELECT doc_id, min(pos) AS span_start, max(pos) + {k} AS span_end,
               max(pos) + {k} - min(pos) AS span_tokens
        FROM grp GROUP BY doc_id, gid
        """,
    )


def test_cut_keeps_one_copy_micro(spark):
    """Cutting non-first spans leaves exactly one copy of the repeated
    passage and preserves unique text."""
    rows = [
        (1, "a b c d e f x1 y1 z1"),
        (2, "q2 a b c d e f w2"),
        (3, "p3 q3 r3"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in cut_duplicated_spans(docs, k=3).collect()}
    # doc 1 holds the canonical (first) copy — untouched.
    assert out[1].text == "a b c d e f x1 y1 z1"
    assert out[1].removed_tokens == 0
    # doc 2 loses the repeated a..f run, keeps its unique frame.
    assert out[2].text == "q2 w2"
    assert out[2].removed_tokens == 6
    # clean doc passes through.
    assert out[3].text == "p3 q3 r3"
    assert out[3].removed_tokens == 0
    assert set(out[1].__fields__) == {"doc_id", "text", "removed_tokens"}


def test_cut_totals_match_spans(spark):
    """Corpus-wide removed tokens equal the non-first span total."""
    docs = load_table(spark, SF_DIR, "documents")
    cut = cut_duplicated_spans(docs, k=8)
    spans = duplicated_spans(docs, k=8, mark="non_first")
    total_cut = cut.agg(F.sum("removed_tokens")).first()[0]
    total_spans = spans.agg(F.sum("span_tokens")).first()[0]
    assert total_cut == total_spans
    assert cut.count() == docs.count()


def test_spans_plan_no_python(spark):
    """The whole pipeline is JVM-side: no Python eval nodes, and the
    islands merge + final aggregate share one exchange on doc_id."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = duplicated_spans(docs, k=8)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
