"""Round-7 Dolma-style ops: corpus-wide paragraph dedup (DuckDB
value-hash mirror) and the Bloom-filter decontamination pre-pass
(superset-of-exact pins)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.text.packing import (
    decontaminate,
    decontaminate_bloom,
    ngram_contamination,
    ngram_contamination_bloom,
)
from clickhouse_etl_spark.text.spans import dedup_paragraphs
from tools.oracle_check import assert_matches_oracle

SF_DIR = "/root/testdata/sf0.001"

# Salt the documents with shared boilerplate so paragraph dedup bites:
# every third doc gains the same license paragraph, every fifth the
# same footer — chr(10)||chr(10) so Spark and DuckDB build identical
# strings without escape-interpretation differences.
_SALT_SPARK = (
    "CASE WHEN doc_id % 3 = 0 THEN text || char(10) || char(10) ||"
    " 'Licensed under the Apache License Version 2.' WHEN doc_id % 5 = 0"
    " THEN text || char(10) || char(10) || 'Subscribe to our newsletter.'"
    " || char(10) || char(10) || text ELSE text END"
)
_SALT_DUCK = (
    "CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || chr(10) ||"
    " 'Licensed under the Apache License Version 2.' WHEN doc_id % 5 = 0"
    " THEN text || chr(10) || chr(10) || 'Subscribe to our newsletter.'"
    " || chr(10) || chr(10) || text ELSE text END"
)


def test_dedup_paragraphs_matches_duckdb(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.expr(_SALT_SPARK).alias("text")
    )
    out = dedup_paragraphs(docs).select(
        "doc_id", "text", "n_paragraphs_dropped"
    )
    sep = "chr(10) || chr(10)"
    oracle = f"""
    WITH salted AS (
      SELECT doc_id, {_SALT_DUCK} AS text FROM documents
    ),
    paras AS (
      SELECT doc_id,
             unnest(string_split(text, {sep})) AS para,
             generate_subscripts(string_split(text, {sep}), 1) - 1 AS pos
      FROM salted
    ),
    keeper AS (
      SELECT para, MIN(struct_pack(i := doc_id, p := pos)) AS keep
      FROM paras WHERE length(para) >= 1 GROUP BY para
    ),
    survivors AS (
      SELECT pa.doc_id, pa.pos, pa.para
      FROM paras pa JOIN keeper k ON k.para = pa.para
      WHERE k.keep.i = pa.doc_id AND k.keep.p = pa.pos
      UNION ALL
      SELECT doc_id, pos, para FROM paras WHERE length(para) < 1
    ),
    rebuilt AS (
      SELECT doc_id,
             COALESCE(string_agg(para, {sep} ORDER BY pos), '') AS text,
             COUNT(*) AS n_kept
      FROM survivors GROUP BY doc_id
    )
    SELECT s.doc_id,
           COALESCE(r.text, '') AS text,
           CAST(len(string_split(s.text, {sep})) - COALESCE(r.n_kept, 0)
                AS INT) AS n_paragraphs_dropped
    FROM salted s LEFT JOIN rebuilt r ON r.doc_id = s.doc_id
    """
    assert_matches_oracle(out, oracle, SF_DIR)


def test_dedup_paragraphs_semantics(spark):
    rows = [
        (1, "alpha\n\nshared\n\nbeta"),
        (2, "shared\n\ngamma"),        # 'shared' first seen in doc 1
        (3, "shared"),                  # drops entirely -> empty text
        (4, None),                      # NULL passes through
        (5, "x\n\n\n\nx"),              # empty paragraph survives; 2nd x?
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_paragraphs_dropped)
           for r in dedup_paragraphs(df).collect()}
    assert got[1] == ("alpha\n\nshared\n\nbeta", 0)
    assert got[2] == ("gamma", 1)
    assert got[3] == ("", 1)
    assert got[4] == (None, 0)
    # doc 5: paragraphs are ['x', '', 'x'] — the empty one is exempt
    # (min_chars=1), the second 'x' is a corpus-wide duplicate of the
    # first and drops
    assert got[5] == ("x\n\n", 1)


def test_bloom_contamination_superset_of_exact(spark):
    docs = load_table(spark, SF_DIR, "documents")
    benchmark = docs.filter("doc_id % 25 = 0").select(
        "doc_id", F.substring("text", 1, 120).alias("text")
    )
    exact = {r.doc_id: (r.n_ngrams, r.matched_ngrams)
             for r in ngram_contamination(docs, benchmark).collect()}
    bloom = {r.doc_id: (r.n_ngrams, r.matched_ngrams)
             for r in ngram_contamination_bloom(docs, benchmark).collect()}
    assert set(exact) == set(bloom)
    extra = 0
    total = 0
    for d, (n_e, m_e) in exact.items():
        n_b, m_b = bloom[d]
        assert n_b == n_e  # denominator identical
        assert m_b >= m_e  # Bloom can only ADD matches
        extra += m_b - m_e
        total += n_e
    # false-positive budget: at fpp=1e-3 the excess must stay tiny
    assert extra <= max(5, total // 200)
    # contaminated docs flagged by exact are flagged by bloom
    assert all(bloom[d][1] > 0 for d, (_, m) in exact.items() if m > 0)


def test_decontaminate_bloom_drops_superset(spark):
    docs = load_table(spark, SF_DIR, "documents")
    benchmark = docs.filter("doc_id % 25 = 0").select(
        "doc_id", F.substring("text", 1, 200).alias("text")
    )
    keep_exact = {r.doc_id for r in
                  decontaminate(docs, benchmark).select("doc_id").collect()}
    # any-overlap dropping compounds per-gram FPs (P(false drop) is
    # ~n_grams*fpp per doc) -> use an fpp sized for the doc length
    keep_bloom = {r.doc_id for r in
                  decontaminate_bloom(docs, benchmark, fpp=1e-6)
                  .select("doc_id").collect()}
    # bloom drops a superset: surviving set is a subset of exact's
    assert keep_bloom <= keep_exact
    assert len(keep_bloom) >= len(keep_exact) - max(5, len(keep_exact) // 100)


def test_bloom_contamination_empty_benchmark(spark):
    docs = load_table(spark, SF_DIR, "documents")
    empty = docs.filter("doc_id < 0")
    out = ngram_contamination_bloom(docs, empty).collect()
    assert len(out) == docs.count()
    assert all(r.matched_ngrams == 0 for r in out)
    with pytest.raises(ValueError, match="fpp"):
        ngram_contamination_bloom(docs, docs, fpp=0.0)


def test_bloom_explicit_zero_expected_raises(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="expected_grams"):
        ngram_contamination_bloom(docs, docs, expected_grams=0)


def test_dedup_paragraphs_regex_metachar_sep(spark):
    """sep is literal: a regex-metacharacter separator must round-trip
    (the split pattern is Pattern.quote-wrapped; unquoted '||' would
    split per-character)."""
    df = spark.createDataFrame(
        [(1, "aa||bb"), (2, "bb||cc")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.text, r.n_paragraphs_dropped)
           for r in dedup_paragraphs(df, sep="||").collect()}
    assert got[1] == ("aa||bb", 0)
    assert got[2] == ("cc", 1)  # 'bb' already kept in doc 1


def test_dedup_paragraphs_idempotent(spark):
    """Running the dedup twice must be a no-op: after keep-first, every
    surviving paragraph IS its own first occurrence."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.expr(_SALT_SPARK).alias("text")
    )
    once = dedup_paragraphs(docs).select("doc_id", "text")
    twice = dedup_paragraphs(once).select(
        "doc_id", "text", "n_paragraphs_dropped"
    )
    assert twice.filter(F.col("n_paragraphs_dropped") > 0).count() == 0
    a = {(r.doc_id, r.text) for r in once.collect()}
    b = {(r.doc_id, r.text) for r in twice.select("doc_id", "text").collect()}
    assert a == b


def test_dedup_paragraphs_exchanges_key_on_digest(spark):
    """100 TB shuffle-bytes contract (r7 VERDICT weak item): no exchange
    may key on the full paragraph string. The keeper aggregate groups on
    sha2(paragraph, 256) — 32-byte keys regardless of paragraph length,
    map-side combinable — and there is no keep-list join-back at all;
    the only body-carrying exchange is the per-document reassembly,
    keyed on the doc id, and the only join is the final row-width
    rebuild on the doc id."""
    import re

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.expr(_SALT_SPARK).alias("text")
    )
    out = dedup_paragraphs(docs)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "sha2(cast(__p" in plan  # digest key present
    physical = out._jdf.queryExecution().executedPlan().toString()
    # every hashpartitioning keys on the digest (_groupingexpression)
    # or a doc-id column — never on the paragraph body column __p
    part_keys = re.findall(r"hashpartitioning\(([^,)]+)", physical)
    assert part_keys, "expected shuffle exchanges in the plan"
    for key in part_keys:
        assert not key.strip().startswith("__p#"), (
            f"body-keyed exchange: {key}"
        )
    # join keys carry ids only (the pre-r8 form joined on __p itself)
    for keys in re.findall(
        r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\s+\[([^\]]*)\], \[([^\]]*)\]",
        physical,
    ):
        assert "__p#" not in keys[0] and "__p#" not in keys[1], (
            f"body-keyed join: {keys}"
        )
