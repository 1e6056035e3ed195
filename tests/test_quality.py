"""Data-quality gate tests: profiling (DuckDB-checked) + expectations."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.operators.quality import (
    ExpectationError,
    accepted_values,
    check_expectations,
    enforce_expectations,
    in_range,
    matches,
    not_null,
    predicate,
    profile_columns,
    unique,
)
from tests.conftest import SF_SMOKE


def test_profile_matches_duckdb(spark):
    df = load_table(spark, SF_SMOKE, "orders")
    prof = {r["column"]: r for r in profile_columns(
        df, ["o_orderstatus", "o_totalprice"]
    ).collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_SMOKE}/orders.parquet')"
    )
    n, nn_status, dist_status, mean_tp, min_tp, max_tp = con.execute(
        """
        SELECT count(*),
               sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
               count(DISTINCT o_orderstatus),
               avg(o_totalprice), min(o_totalprice), max(o_totalprice)
        FROM orders
        """
    ).fetchone()

    st = prof["o_orderstatus"]
    assert st["n_rows"] == n and st["n_null"] == (nn_status or 0)
    # HLL estimate within 5% of exact (tiny cardinality → exact here)
    assert abs(st["approx_distinct"] - dist_status) <= max(1, 0.05 * dist_status)
    assert st["mean"] is None  # non-numeric

    tp = prof["o_totalprice"]
    assert tp["mean"] == pytest.approx(float(mean_tp), rel=1e-9)
    assert float(tp["min_value"]) == pytest.approx(float(min_tp))
    assert float(tp["max_value"]) == pytest.approx(float(max_tp))


def test_profile_is_single_job(spark):
    """All row-level stats must come from ONE aggregate: the plan has a
    single pass over the scan (no unions of per-column subplans)."""
    df = load_table(spark, SF_SMOKE, "orders")
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") + plan.count("Scan parquet") <= 2  # one scan (naming differs by mode)
    assert "Union" not in plan


def test_expectations_pass_and_fail(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 50.0, "a@x.io"),
            (2, "B", 75.0, "b@x.io"),
            (3, "A", 101.0, None),      # pct out of range; null email OK
            (3, "Z", 10.0, "notmail"),  # dup id, bad status, bad email
        ],
        "id int, status string, pct double, email string",
    )
    rules = [
        not_null("id"),
        unique("id"),
        accepted_values("status", ["A", "B"]),
        in_range("pct", 0, 100),
        matches("email", r"[^@]+@[^@]+\.[a-z]+"),
        predicate("pct_consistent", "pct IS NULL OR pct >= 0"),
    ]
    rep = {r["rule"]: r for r in check_expectations(df, rules).collect()}
    assert rep["not_null(id)"]["passed"]
    assert rep["unique(id)"]["n_violations"] == 1
    assert rep["accepted_values(status)"]["n_violations"] == 1
    assert rep["in_range(pct)"]["n_violations"] == 1  # only 101.0
    assert rep["matches(email)"]["n_violations"] == 1  # null email passes
    assert rep["pct_consistent"]["passed"]


def test_enforce_raises_with_failing_rules(spark):
    df = spark.createDataFrame([(None,), (1,)], "id int")
    with pytest.raises(ExpectationError) as ei:
        enforce_expectations(df, [not_null("id")])
    assert "not_null(id)" in str(ei.value)
    # all-pass returns the report
    ok = enforce_expectations(df.filter("id IS NOT NULL"), [not_null("id")])
    assert ok.count() == 1


def test_expectations_on_real_table(spark):
    """The orders contract the reference implicitly assumes, as an
    explicit publish gate. (lineitem deliberately fails a
    unique(l_orderkey, l_linenumber) gate — the driver testdata carries
    1401 duplicate line keys at sf0.001; asserted below as the
    catches-real-dirt case.)"""
    orders = load_table(spark, SF_SMOKE, "orders")
    report = enforce_expectations(
        orders,
        [
            not_null("o_orderkey"),
            unique("o_orderkey"),
            accepted_values("o_orderstatus", ["F", "O", "P"]),
            predicate("positive_total", "o_totalprice > 0"),
        ],
    )
    assert report.filter("NOT passed").count() == 0

    li = load_table(spark, SF_SMOKE, "lineitem")
    with pytest.raises(ExpectationError, match="unique"):
        enforce_expectations(li, [unique("l_orderkey", "l_linenumber")])


def test_profile_handles_quoted_column_names(spark):
    """Names with quotes/backticks are legal in Spark and must not break
    the stack() SQL."""
    from clickhouse_etl_spark.operators.quality import profile_columns

    df = spark.range(5).selectExpr(
        "id AS `student's_score`", "id * 2 AS plain"
    )
    rows = {r.column: r for r in profile_columns(df).collect()}
    assert set(rows) == {"student's_score", "plain"}
    assert rows["student's_score"].n_rows == 5


def test_compare_profiles_flags_drift(spark):
    """Null jump, domain collapse, mean shift, and schema add/drop all
    flag; an unchanged column stays clean."""
    from clickhouse_etl_spark.operators.quality import (
        compare_profiles,
        profile_columns,
    )

    base = spark.range(1000).selectExpr(
        "CAST(id AS DOUBLE) AS stable",
        "CAST(id % 100 AS DOUBLE) AS collapsing",
        "CAST(id AS DOUBLE) AS shifting",
        "CASE WHEN id % 100 = 0 THEN NULL ELSE id END AS nulling",
        "id AS dropped",
    )
    cand = spark.range(1000).selectExpr(
        "CAST(id AS DOUBLE) AS stable",
        "CAST(id % 3 AS DOUBLE) AS collapsing",          # 100 -> 3 distinct
        "CAST(id + 100000 AS DOUBLE) AS shifting",       # >> 3 stddevs
        "CASE WHEN id % 2 = 0 THEN NULL ELSE id END AS nulling",  # 1% -> 50%
        "id AS added_col",
    )
    rep = {
        r.column: r
        for r in compare_profiles(
            profile_columns(base), profile_columns(cand)
        ).collect()
    }
    assert not rep["stable"].drifted
    assert rep["collapsing"].distinct_drift
    assert rep["shifting"].mean_drift
    assert rep["nulling"].null_drift
    assert rep["dropped"].schema_drift and rep["added_col"].schema_drift
    assert all(
        rep[c].drifted for c in ("collapsing", "shifting", "nulling",
                                 "dropped", "added_col")
    )
