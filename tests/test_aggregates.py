"""A1-A8 golden tests — the averaging-semantics traps (SURVEY.md §5.3).

The A1-vs-A2 denominator difference and coe≤0→1 defaulting are silent
semantic bugs if conflated — pinned here with hand-computed values.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_spark.operators.aggregates import (
    avg_null_as_zero,
    avg_null_dropped,
    avg_of_avgs,
    credit_totals,
    json_details,
    nested_details,
    weighted_average,
)

# (group, score): group g1 has scores [80, None, 100] → A1 avg=90, A2 avg=60.
SCORES = [("g1", 80.0), ("g1", None), ("g1", 100.0), ("g2", None), ("g3", 50.0)]


@pytest.fixture(scope="module")
def scores_df(spark):
    return spark.createDataFrame(SCORES, ["grp", "score"])


def test_a1_null_dropped_denominator(spark, scores_df):
    out = {
        r["grp"]: r["avg_score"]
        for r in avg_null_dropped(scores_df, ["grp"], "score").collect()
    }
    assert out["g1"] == 90.0  # (80+100)/2 — null NOT in the denominator
    assert out["g2"] is None  # all-null group → NULL, not 0
    assert out["g3"] == 50.0


def test_a2_null_as_zero_denominator(spark, scores_df):
    out = {
        r["grp"]: r["avg_score"]
        for r in avg_null_as_zero(scores_df, ["grp"], "score").collect()
    }
    assert out["g1"] == 60.0  # (80+0+100)/3 — null counts as zero
    assert out["g2"] == 0.0
    assert out["g3"] == 50.0


def test_a3_weighted_average_coe_defaulting(spark):
    # coe ≤ 0 and NULL both default to weight 1 (reference …:293-295).
    rows = [
        ("s1", 80.0, 2.0),
        ("s1", 60.0, 0.0),   # defaults to 1
        ("s1", 40.0, -3.0),  # defaults to 1
        ("s2", 90.0, None),  # defaults to 1
    ]
    df = spark.createDataFrame(rows, ["subj", "pct", "coe"])
    out = {
        r["subj"]: r["weighted_avg"]
        for r in weighted_average(df, ["subj"], "pct", "coe").collect()
    }
    assert out["s1"] == pytest.approx((80 * 2 + 60 * 1 + 40 * 1) / 4)
    assert out["s2"] == pytest.approx(90.0)


def test_a4_avg_of_avgs_differs_from_flat_avg(spark):
    rows = [("n1", "c1", 10.0), ("n1", "c1", 30.0), ("n1", "c2", 50.0)]
    df = spark.createDataFrame(rows, ["nat", "cust", "v"])
    out = avg_of_avgs(df, ["nat", "cust"], ["nat"], "v").collect()
    # mean(mean(10,30), mean(50)) = mean(20, 50) = 35 — NOT flat mean 30.
    assert out[0]["avg_of_avgs"] == pytest.approx(35.0)


def test_a6_credit_totals(spark):
    rows = [("st1", 3.0, 4.0), ("st1", 1.0, 2.0)]
    df = spark.createDataFrame(rows, ["student", "credit", "gpa"])
    r = credit_totals(df, ["student"]).collect()[0]
    assert r["totalCredits"] == 4.0
    assert r["totalGPA"] == pytest.approx((3 * 4 + 1 * 2) / 4)  # 3.5
    assert r["subjectCount"] == 2


def test_a7_nested_details_deterministic_order(spark):
    rows = [("st1", "math", 90.0), ("st1", "art", 70.0), ("st2", "math", 50.0)]
    df = spark.createDataFrame(rows, ["student", "subject", "score"])
    out = {
        r["student"]: r["details"]
        for r in nested_details(df, ["student"], ["subject", "score"]).collect()
    }
    assert [d["subject"] for d in out["st1"]] == ["art", "math"]  # sorted
    assert out["st2"][0]["score"] == 50.0


def test_mad_outliers_grouped_map(spark):
    from clickhouse_etl_spark.operators.grouped import mad_outliers

    rows = [
        ("u1", 1.0), ("u1", 2.0), ("u1", 3.0), ("u1", 100.0), ("u1", None),
        ("u2", 5.0),  # single value: MAD 0 → never an outlier
    ]
    df = spark.createDataFrame(rows, ["user_id", "value"])
    out = mad_outliers(df, ["user_id"], "value").collect()
    assert len(out) == 5  # NULL excluded
    u1 = {r["value"]: r for r in out if r["user_id"] == "u1"}
    assert u1[100.0]["is_outlier"] is True
    assert u1[2.0]["is_outlier"] is False
    assert u1[2.0]["group_median"] == pytest.approx(2.5)
    u2 = [r for r in out if r["user_id"] == "u2"][0]
    assert u2["group_mad"] == 0.0 and u2["is_outlier"] is False


def test_mad_outliers_jvm_equals_grouped_map(spark):
    """The JVM two-pass default must agree with the applyInPandas seam on
    every row (same medians, MADs, flags) — including the null-value and
    single-value-group edges."""
    from clickhouse_etl_spark.operators.grouped import mad_outliers, mad_outliers_jvm

    rows = [
        ("u1", 1.0), ("u1", 2.0), ("u1", 3.0), ("u1", 100.0), ("u1", None),
        ("u2", 5.0),
        ("u3", -1.0), ("u3", -1.0), ("u3", 4.0), ("u3", 8.5),
    ]
    df = spark.createDataFrame(rows, ["user_id", "value"])
    canon = lambda out: sorted(
        (
            r["user_id"],
            r["value"],
            round(r["group_median"], 9),
            round(r["group_mad"], 9),
            r["is_outlier"],
        )
        for r in out
    )
    assert canon(mad_outliers_jvm(df, ["user_id"]).collect()) == canon(
        mad_outliers(df, ["user_id"]).collect()
    )


def test_a8_json_details_roundtrip(spark):
    rows = [("st1", "quiz", 10.0), ("st1", "exam", 20.0)]
    df = spark.createDataFrame(rows, ["student", "kind", "score"])
    r = json_details(df, ["student"], ["kind", "score"]).collect()[0]
    parsed = json.loads(r["customEvaluations"])
    assert {d["kind"] for d in parsed} == {"quiz", "exam"}
    assert r["customEvaluationCount"] == 2


# --- sumMap (ClickHouse sumMap / SummingMergeTree map compaction) ---

_SUM_MAP_ORACLE = """
WITH e AS (
  SELECT l_orderkey % 8 AS g, l_returnflag AS k,
         CAST(l_quantity AS BIGINT) AS v FROM lineitem
  UNION ALL
  SELECT l_orderkey % 8, l_linestatus, CAST(l_linenumber AS BIGINT)
  FROM lineitem
), s AS (
  SELECT g, k, SUM(v) AS s FROM e GROUP BY g, k
  HAVING SUM(v) IS NOT NULL AND SUM(v) <> 0
)
SELECT g, list(k ORDER BY k) AS keys, list(s ORDER BY k) AS values
FROM s GROUP BY g
"""


def test_sum_map_matches_duckdb_oracle(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.operators.aggregates import sum_map
    from tools.oracle_check import assert_matches_oracle

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select(
        (F.col("l_orderkey") % 8).alias("g"),
        F.array("l_returnflag", "l_linestatus").alias("mk"),
        F.array(
            F.col("l_quantity").cast("long"), F.col("l_linenumber").cast("long")
        ).alias("mv"),
    )
    out = sum_map(li, ["g"], "mk", "mv")
    assert_matches_oracle(out, _SUM_MAP_ORACLE, sf)


def test_sum_map_zero_cancel_and_null_semantics(spark):
    from clickhouse_etl_spark.operators.aggregates import sum_map

    rows = [
        # key 'a' cancels to 0; 'b' totals 7; 'n' only NULL values
        ("g", ["a", "b"], [5, 3]),
        ("g", ["a", "b", "n"], [-5, 4, None]),
        ("g", None, None),  # NULL arrays contribute nothing
        ("h", None, None),  # group with ONLY null arrays vanishes
    ]
    df = spark.createDataFrame(
        rows, "g string, mk array<string>, mv array<long>"
    )
    out = {r["g"]: (r["keys"], r["values"]) for r in
           sum_map(df, ["g"], "mk", "mv").collect()}
    assert out == {"g": (["b"], [7])}  # a: zero-dropped, n: NULL-dropped
    kept = {r["g"]: (r["keys"], r["values"]) for r in
            sum_map(df, ["g"], "mk", "mv", drop_zero=False).collect()}
    assert kept == {"g": (["a", "b", "n"], [0, 7, None])}


def test_sum_map_null_key_sorts_first(spark):
    """Pin the NULL-key position (r6 ADVICE): array_sort's struct
    ordering places a NULL field BEFORE every non-NULL value, so a
    NULL key leads the output arrays — the docstring and any consumer
    aligning the parallel arrays by position rely on this."""
    from clickhouse_etl_spark.operators.aggregates import sum_map

    rows = [
        ("g", ["b", None], [1, 10]),
        ("g", ["a", None], [2, 20]),
    ]
    df = spark.createDataFrame(
        rows, "g string, mk array<string>, mv array<long>"
    )
    out = sum_map(df, ["g"], "mk", "mv").collect()[0]
    assert out["keys"] == [None, "a", "b"]
    assert out["values"] == [30, 2, 1]


def test_sum_map_length_mismatch_raises(spark):
    from clickhouse_etl_spark.operators.aggregates import sum_map

    df = spark.createDataFrame(
        [("g", ["a", "b"], [1])], "g string, mk array<string>, mv array<long>"
    )
    with pytest.raises(Exception, match="lengths"):
        sum_map(df, ["g"], "mk", "mv").collect()
