"""Text normalization: DuckDB bit-mirror for the JVM rules, DuckDB
nfc_normalize pin for the Arrow NFC path, NFKC compatibility folds."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.text.normalize import normalize_text
from tools.oracle_check import assert_matches_oracle

SF_DIR = "/root/testdata/sf0.001"

# salt the corpus with control chars, messy whitespace, and case so
# every rule fires — the same derived-corpus discipline as test_web
_SALT_SPARK = (
    "CASE WHEN doc_id % 3 = 0 THEN concat('MiXeD ', text, char(9), 'col',"
    " char(11), 'umn')"
    " WHEN doc_id % 3 = 1 THEN concat(char(7), text, '  double  space ')"
    " ELSE text END"
)
_SALT_DUCK = (
    "CASE WHEN doc_id % 3 = 0 THEN concat('MiXeD ', text, chr(9), 'col',"
    " chr(11), 'umn')"
    " WHEN doc_id % 3 = 1 THEN concat(chr(7), text, '  double  space ')"
    " ELSE text END"
)


def test_normalize_text_matches_duckdb(spark):
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "text", F.expr(_SALT_SPARK)
    )
    out = normalize_text(docs).select("doc_id", "text")
    assert_matches_oracle(
        out,
        f"""
        WITH salted AS (SELECT doc_id, {_SALT_DUCK} AS text FROM documents)
        SELECT doc_id,
               lower(trim(regexp_replace(
                 regexp_replace(text, '[\\x00-\\x08\\x0E-\\x1F\\x7F]', '', 'g'),
                 '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS text
        FROM salted
        """,
        SF_DIR,
    )


def test_normalize_nfc_matches_duckdb(spark):
    """The Arrow NFC path must agree with DuckDB's nfc_normalize on
    composed/decomposed fixtures (é -> é etc.)."""
    rows = [
        (1, "Café au lait"),        # decomposed accent
        (2, "Ångström"),        # already composed
        (3, "Å B̧ ć"),   # several combining marks
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in normalize_text(
            df, unicode_form="NFC", lowercase=False,
            collapse_whitespace=False, strip_control=False
        ).collect()
    }
    import duckdb

    con = duckdb.connect()
    for i, t in rows:
        want = (
            con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
            if t is not None
            else None
        )
        assert got[i] == want, (i, got[i], want)
    con.close()


def test_normalize_nfkc_folds_compat(spark):
    df = spark.createDataFrame(
        [(1, "ﬁle ² ＡBC")], "doc_id long, text string"
    )  # ﬁ ligature, superscript 2, fullwidth A
    out = normalize_text(df, unicode_form="NFKC").first().text
    assert out == "file 2 abc"
    with pytest.raises(ValueError, match="unicode_form"):
        normalize_text(df, unicode_form="NFD")


def test_normalize_passthrough_schema(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = normalize_text(docs)
    assert out.columns == docs.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # default path is fully JVM
