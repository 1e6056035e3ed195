"""Fuzzy edit-distance pairs — brute-force DuckDB oracle + edge cases."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.operators.fuzzy import fuzzy_self_pairs
from tools.oracle_check import canon_rows

SF_DIR = "/root/testdata/sf0.001"


def _oracle_pairs(sql_rel, col, k):
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW t AS {sql_rel}")
        cur = con.execute(
            f"""
            SELECT a.id AS id_a, b.id AS id_b,
                   a.{col} AS {col}_a, b.{col} AS {col}_b,
                   levenshtein(a.{col}, b.{col}) AS distance
            FROM t a JOIN t b ON a.id < b.id
            WHERE levenshtein(a.{col}, b.{col}) <= {k}
            """
        )
        return [d[0] for d in cur.description], cur.fetchall()
    finally:
        con.close()


def test_matches_bruteforce_oracle_on_customers(spark):
    """Candidate filtering + verify == the n2 ground truth (completeness
    of the q-gram/short-bucket split, not just precision)."""
    customer = load_table(spark, SF_DIR, "customer")
    df = customer.select("c_custkey", "c_name")
    out = fuzzy_self_pairs(df, "c_name", max_distance=2, id_col="c_custkey")
    dcols, drows = _oracle_pairs(
        f"SELECT c_custkey AS id, c_name FROM '{SF_DIR}/customer.parquet'",
        "c_name",
        2,
    )
    sc, sr = canon_rows(
        ["id_a", "id_b", "c_name_a", "c_name_b", "distance"],
        [tuple(r) for r in out.collect()],
    )
    dc, dr = canon_rows(dcols, drows)
    assert len(sr) == len(dr) and sr == dr
    assert len(sr) > 0, "fixture should contain near-miss names"


def test_short_and_boundary_strings(spark):
    """Strings below the q-gram completeness floor still pair — incl.
    short-vs-long pairs across the boundary band."""
    rows = [
        (1, "ab"), (2, "ac"),            # short-short, distance 1
        (3, "abcdefgh"), (4, "abcdefghx"),  # long-long, distance 1
        (5, "abcde"), (6, "abcdef"),     # boundary band (floor=6, k=1)
        (7, "zzzz"),                     # no partner
    ]
    df = spark.createDataFrame(rows, ["doc_id", "s"])
    got = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_self_pairs(df, "s", max_distance=1).collect()
        if r.distance > 0
    }
    assert got == {(1, 2): 1, (3, 4): 1, (5, 6): 1}


def test_exact_match_k0(spark):
    rows = [(1, "same"), (2, "same"), (3, "longer string here"),
            (4, "longer string here"), (5, "other")]
    df = spark.createDataFrame(rows, ["doc_id", "s"])
    got = {(r.id_a, r.id_b) for r in
           fuzzy_self_pairs(df, "s", max_distance=0).collect()}
    assert got == {(1, 2), (3, 4)}


def test_no_python_in_plan(spark):
    customer = load_table(spark, SF_DIR, "customer")
    plan = (
        fuzzy_self_pairs(customer, "c_name", 1, id_col="c_custkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_auto_q_matches_explicit_on_hex_names(spark):
    """q='auto' on the registered 12-hex-char fixture must derive a q
    that (a) skips the short path (min_len >= q*(k+1)) and (b) returns
    the exact pinned-q=5 pair set."""
    customer = load_table(spark, SF_DIR, "customer")
    names = customer.select(
        F.col("c_custkey").alias("doc_id"),
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 12).alias("name"),
    )
    pinned = fuzzy_self_pairs(names, "name", 1, q=5)
    auto = fuzzy_self_pairs(names, "name", 1, q="auto")
    key = lambda df: sorted((r.id_a, r.id_b, r.distance) for r in df.collect())
    assert key(auto) == key(pinned)
    # auto mode proves the short path empty and drops it from the plan
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "CrossJoin" not in plan and "BroadcastNestedLoop" not in plan


def test_auto_q_mixed_lengths_still_complete(spark):
    """auto on a corpus with strings below any gram floor keeps the
    short path and finds every pair."""
    rows = [(1, "ab"), (2, "ac"), (3, "abcdefgh"), (4, "abcdefghx"),
            (5, "abcde"), (6, "abcdef"), (7, "zzzz")]
    df = spark.createDataFrame(rows, ["doc_id", "s"])
    got = {(r.id_a, r.id_b): r.distance
           for r in fuzzy_self_pairs(df, "s", 1, q="auto").collect()
           if r.distance > 0}
    assert got == {(1, 2): 1, (3, 4): 1, (5, 6): 1}


def test_saturation_raise_no_safe_q(spark):
    """The no-safe-q corner errs loudly instead of running a saturated
    N² gram join: binary alphabet, 12-char strings, k=1 — even the
    largest bound-compatible q (6) gives only 2^6 = 64 gram slots for
    hundreds of gram occurrences."""
    import pytest as _pytest

    from clickhouse_etl_spark.operators.fuzzy import GramSaturationError

    rows = [(i, format(i % 4096, "012b")) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "s"])
    with _pytest.raises(GramSaturationError, match="saturated"):
        fuzzy_self_pairs(df, "s", 1, q="auto", saturation="raise")
    # warn mode surfaces the same diagnosis but still plans the query
    with _pytest.warns(RuntimeWarning, match="saturated"):
        out = fuzzy_self_pairs(df, "s", 1, q=5, saturation="warn")
    assert out.columns == ["id_a", "id_b", "s_a", "s_b", "distance"]


def test_saturation_raise_short_value_runaway(spark):
    """The dead corner (every string inside the short band with a large
    distinct-value population) errs loudly instead of cross-joining."""
    import pytest as _pytest

    from clickhouse_etl_spark.operators.fuzzy import GramSaturationError

    rows = [(i, format(i, "04d")) for i in range(300)]  # 300 distinct len-4
    df = spark.createDataFrame(rows, ["doc_id", "s"])
    with _pytest.raises(GramSaturationError, match="runaway"):
        fuzzy_self_pairs(df, "s", 1, q=3, saturation="raise",
                         max_short_values=100)


def test_saturation_ignore_keeps_lazy_plan(spark):
    """saturation='ignore' runs zero stats jobs (plan-only composition,
    the pre-r12 contract) and rejects q='auto'."""
    import pytest as _pytest

    rows = [(1, "abcdefgh"), (2, "abcdefghx")]
    df = spark.createDataFrame(rows, ["doc_id", "s"])
    out = fuzzy_self_pairs(df, "s", 1, saturation="ignore")
    assert {(r.id_a, r.id_b) for r in out.collect() if r.distance > 0} == {(1, 2)}
    with _pytest.raises(ValueError, match="auto"):
        fuzzy_self_pairs(df, "s", 1, q="auto", saturation="ignore")


def test_registered_row_oracle_prefilter_equals_bruteforce():
    """The ext_fuzzy_pairs oracle uses the q-gram candidate prefilter
    (a theorem at q=5, k=1 over 12-char names) instead of the n²
    brute force, so it stays tractable at the sweep scales. Pin the
    two formulations equal at the gate SFs — if the prefilter ever
    dropped a true pair, THIS fails before the registry row could
    drift."""
    import duckdb

    from clickhouse_etl_spark.queries import ORACLE_SQL

    gram_sql = ORACLE_SQL["ext_fuzzy_pairs"]
    brute_sql = """
    WITH names AS (
      SELECT c_custkey AS id,
             CASE WHEN c_custkey % 10 = 0 AND c_custkey > 0
                  THEN 'z' || substr(md5(CAST(c_custkey - 1 AS VARCHAR)), 2, 11)
                  ELSE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12)
             END AS name
      FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
           levenshtein(a.name, b.name) AS distance
    FROM names a JOIN names b ON a.id < b.id
    WHERE levenshtein(a.name, b.name) <= 1
    """
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW customer AS SELECT * FROM "
            f"read_parquet('{sf_dir}/customer.parquet')"
        )
        got = sorted(con.execute(gram_sql).fetchall())
        want = sorted(con.execute(brute_sql).fetchall())
        con.close()
        assert len(want) > 0  # planted typos exist at every SF
        assert got == want, f"{sf_dir}: prefilter dropped/added pairs"


# --- fuzzy_join (two-table form, r12) -------------------------------------


def _oracle_join_pairs(left_rel, right_rel, col, k):
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW l AS {left_rel}")
        con.execute(f"CREATE VIEW r AS {right_rel}")
        cur = con.execute(
            f"""
            SELECT l.id AS id_l, r.id AS id_r,
                   l.{col} AS {col}_l, r.{col} AS {col}_r,
                   levenshtein(l.{col}, r.{col}) AS distance
            FROM l, r
            WHERE levenshtein(l.{col}, r.{col}) <= {k}
            """
        )
        return [d[0] for d in cur.description], cur.fetchall()
    finally:
        con.close()


def test_fuzzy_join_matches_bruteforce_oracle(spark):
    """Two-table candidate split + verify == the n×m ground truth:
    customer names vs a dirtied copy (dropped char) of a sample of
    them — inserts, deletes, and exact matches all represented."""
    from clickhouse_etl_spark.operators.fuzzy import fuzzy_join

    customer = load_table(spark, SF_DIR, "customer")
    left = customer.select(F.col("c_custkey").alias("doc_id"),
                           F.col("c_name").alias("name"))
    # right: every 3rd customer, with every 2nd of those missing the
    # last character (distance-1 deletions), the rest verbatim
    right = (
        customer.filter(F.col("c_custkey") % 3 == 0)
        .select(
            (F.col("c_custkey") + 1_000_000).alias("doc_id"),
            F.when(
                F.col("c_custkey") % 2 == 0,
                F.expr("substring(c_name, 1, length(c_name) - 1)"),
            ).otherwise(F.col("c_name")).alias("name"),
        )
    )
    out = fuzzy_join(left, right, "name", max_distance=1)
    dcols, drows = _oracle_join_pairs(
        f"SELECT c_custkey AS id, c_name AS name FROM '{SF_DIR}/customer.parquet'",
        f"""SELECT c_custkey + 1000000 AS id,
               CASE WHEN c_custkey % 2 = 0
                    THEN substring(c_name, 1, length(c_name) - 1)
                    ELSE c_name END AS name
            FROM '{SF_DIR}/customer.parquet' WHERE c_custkey % 3 = 0""",
        "name",
        1,
    )
    sc, sr = canon_rows(
        ["id_l", "id_r", "name_l", "name_r", "distance"],
        [tuple(r) for r in out.collect()],
    )
    dc, dr = canon_rows(dcols, drows)
    assert len(sr) == len(dr) and sr == dr
    assert len(sr) > 0


def test_fuzzy_join_short_and_boundary(spark):
    """Cross-table pairs below and across the q-gram floor route through
    the two-sided value-level short path."""
    from clickhouse_etl_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame(
        [(1, "ab"), (2, "abcde"), (3, "abcdefgh"), (4, "qqq")],
        ["doc_id", "s"],
    )
    right = spark.createDataFrame(
        [(10, "ac"), (20, "abcdef"), (30, "abcdefghx"), (40, "zzzz")],
        ["doc_id", "s"],
    )
    got = {(r.id_l, r.id_r): r.distance
           for r in fuzzy_join(left, right, "s", max_distance=1).collect()}
    assert got == {(1, 10): 1, (2, 20): 1, (3, 30): 1}


def test_fuzzy_join_auto_q_and_saturation(spark):
    """auto-q derives from BOTH sides combined; the saturation guard
    fires on a binary-alphabet corpus."""
    import pytest as _pytest

    from clickhouse_etl_spark.operators.fuzzy import (
        GramSaturationError,
        fuzzy_join,
    )

    customer = load_table(spark, SF_DIR, "customer")
    left = customer.select(
        F.col("c_custkey").alias("doc_id"),
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 12).alias("s"),
    )
    right = customer.select(
        (F.col("c_custkey") + 500_000).alias("doc_id"),
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 12).alias("s"),
    )
    auto = fuzzy_join(left, right, "s", 1, q="auto")
    pinned = fuzzy_join(left, right, "s", 1, q=5)
    key = lambda df: sorted((r.id_l, r.id_r, r.distance) for r in df.collect())
    ka = key(auto)
    assert ka == key(pinned)
    assert len(ka) > 0  # every left row has its exact twin on the right
    bits = [(i, format(i % 4096, "012b")) for i in range(400)]
    bl = spark.createDataFrame(bits, ["doc_id", "s"])
    br = spark.createDataFrame([(i + 10_000, s) for i, s in bits], ["doc_id", "s"])
    with _pytest.raises(GramSaturationError, match="saturated"):
        fuzzy_join(bl, br, "s", 1, q="auto", saturation="raise")


def test_fuzzy_join_right_col_and_k0(spark):
    """Differently-named join columns and exact-only matching."""
    from clickhouse_etl_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "a"])
    right = spark.createDataFrame([(9, "alpha"), (8, "gamma")], ["doc_id", "b"])
    out = fuzzy_join(left, right, "a", max_distance=0, right_col="b")
    rows = out.collect()
    assert [(r.id_l, r.id_r, r.a_l, r.b_r, r.distance) for r in rows] == [
        (1, 9, "alpha", "alpha", 0)
    ]


def test_fuzzy_join_candidate_oracle_prefilter_equals_bruteforce():
    """The ext_fuzzy_join candidate oracle uses the two-sided q-gram
    prefilter instead of the n×m brute force; pin the formulations
    equal at the gate SFs (the self-pairs precedent)."""
    import duckdb

    from clickhouse_etl_spark.queries.extensions import _FUZZY_JOIN_ORACLE

    brute_sql = """
    WITH lnames AS (
      SELECT c_custkey AS id,
             substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS name
      FROM customer
    ),
    rnames AS (
      SELECT c_custkey + 1000000 AS id,
             CASE WHEN c_custkey % 2 = 0
                  THEN 'z' || substr(md5(CAST(c_custkey AS VARCHAR)), 2, 11)
                  ELSE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12)
             END AS name
      FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT l.id AS id_l, r.id AS id_r, l.name AS name_l, r.name AS name_r,
           levenshtein(l.name, r.name) AS distance
    FROM lnames l, rnames r
    WHERE levenshtein(l.name, r.name) <= 1
    """
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW customer AS SELECT * FROM "
            f"read_parquet('{sf_dir}/customer.parquet')"
        )
        got = sorted(con.execute(_FUZZY_JOIN_ORACLE).fetchall())
        want = sorted(con.execute(brute_sql).fetchall())
        con.close()
        assert len(want) > 0
        assert got == want, f"{sf_dir}: prefilter dropped/added pairs"


def test_occupancy_scoped_to_gram_path(spark):
    """The saturation estimate counts ONLY strings the completeness
    floor admits to the gram join: a sea of short strings (value-level
    path) must not fake saturation for a tiny, safe long-string
    population. Regression for the r12 whole-corpus occupancy bug."""
    from clickhouse_etl_spark.operators.fuzzy import fuzzy_self_pairs

    # 4000 binary 4-char strings (occupancy over 2^q would scream) +
    # 10 hex 16-char strings that are perfectly safe at q=5, k=1.
    rows = [(i, format(i % 16, "04b")) for i in range(4000)]
    rows += [(10_000 + i, f"{i:x}" * 16) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "s"])
    # must NOT raise: the gram join holds only the 10 long strings
    out = fuzzy_self_pairs(df, "s", 1, q=5, saturation="raise",
                           max_short_values=100_000)
    assert out.columns == ["id_a", "id_b", "s_a", "s_b", "distance"]


def test_occupancy_not_masked_by_short_strings():
    """Converse direction: below-floor strings contribute no negative
    (len - q + 1) terms that could mask a genuinely saturated
    long-string population."""
    from clickhouse_etl_spark.operators.fuzzy import _occupancy

    # 500 12-char strings over a 2-char alphabet at q=6: 2^6 = 64
    # slots for 500*7 = 3500 occurrences -> occupancy ~54.7. A million
    # 3-char strings must not drag the estimate below the threshold.
    hist = [(3, 1_000_000, 3_000_000), (12, 500, 6_000)]
    stats = {"n": 1_000_500, "min_len": 3, "max_len": 12,
             "hist": hist, "alphabet": 2}
    occ = _occupancy(stats, 6, 1)
    assert occ > 50  # only the 500 long strings count
