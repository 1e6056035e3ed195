"""F1/F6-F16 golden tests — scalar function semantics (SURVEY.md §2.9)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import ensure_runtime_confs
from clickhouse_etl_spark.functions.scalars import (
    coalesce_default,
    gender_normalize,
    is_uuid,
    nan_to_null,
    path_first_id,
    path_synthesize,
    percentage,
    safe_double,
    score_from_percentage,
    weighted_coe,
)


def _one_col(spark, values, expr_fn, dtype="string"):
    ensure_runtime_confs(spark)
    df = spark.createDataFrame([(v,) for v in values], f"v {dtype}")
    return [r["out"] for r in df.select(expr_fn(F.col("v")).alias("out")).collect()]


def test_f1_gender_normalize_passthrough_keeps_original(spark):
    got = _one_col(
        spark, ["m", "M", "male", "MALE", "f", "Female", "nonbinary", None],
        gender_normalize,
    )
    # passthrough returns the ORIGINAL value, not the lowercased one
    # (reference …etl_students_to_clickhouse.py:75-80).
    assert got == ["male", "male", "male", "male", "female", "female",
                   "nonbinary", None]


def test_f6_safe_double_null_on_bad_input(spark):
    got = _one_col(spark, ["1.5", "x", "", None, " 2 "], safe_double)
    assert got == [1.5, None, None, None, 2.0]


def test_f7_percentage_guard(spark):
    ensure_runtime_confs(spark)
    df = spark.createDataFrame(
        [(50.0, 200.0), (50.0, 0.0), (50.0, -1.0)], ["s", "mx"]
    )
    got = [
        r["p"]
        for r in df.select(
            percentage(F.col("s"), F.col("mx")).alias("p")
        ).collect()
    ]
    assert got == [25.0, 0.0, 0.0]


def test_f8_score_reconstruction(spark):
    df = spark.createDataFrame([(80.0, 50.0)], ["pct", "mx"])
    got = df.select(
        score_from_percentage(F.col("pct"), F.col("mx")).alias("s")
    ).collect()
    assert got[0]["s"] == pytest.approx(40.0)


def test_f9_f10_path_split_and_synthesize(spark):
    got = _one_col(spark, ["#abc#def#", "#only", ""], path_first_id)
    # no second segment → NULL (the reference's ``split('#')[1]`` would
    # raise IndexError; the engine degrades to NULL instead of failing).
    assert got == ["abc", "only", None]
    got2 = _one_col(spark, ["rec1"], path_synthesize)
    assert got2 == ["#rec1"]


def test_f12_f16_coalesce_default(spark):
    got = _one_col(
        spark, [None, 5.0], lambda c: coalesce_default(c, 100.0), dtype="double"
    )
    assert got == [100.0, 5.0]


def test_a3_weighted_coe_defaults(spark):
    got = _one_col(
        spark, [2.0, 0.0, -1.0, None], weighted_coe, dtype="double"
    )
    assert got == [2.0, 1.0, 1.0, 1.0]


def test_f13_uuid_validation(spark):
    got = _one_col(
        spark,
        [
            "123e4567-e89b-12d3-a456-426614174000",
            "123E4567-E89B-12D3-A456-426614174000",
            "not-a-uuid",
            "123e4567e89b12d3a456426614174000",
            None,
        ],
        is_uuid,
    )
    assert got == [True, True, False, False, None]


def test_f14_nan_to_null(spark):
    got = _one_col(
        spark, [1.0, float("nan"), None], nan_to_null, dtype="double"
    )
    assert got[0] == 1.0
    assert got[1] is None and got[2] is None
    assert not any(isinstance(g, float) and math.isnan(g) for g in got)


def test_sql_surface_matches_column_functions(spark):
    """The SQL-registered functions compile to the same values as the
    Column API on a value sweep including every edge (band cutoffs, NULL
    coe, zero max, non-UUID, passthrough gender)."""
    from clickhouse_etl_spark.functions.grading import grade_band
    from clickhouse_etl_spark.functions.scalars import (
        gender_normalize,
        is_uuid,
        percentage,
        weighted_coe,
    )
    from clickhouse_etl_spark.functions.sql_surface import register_sql_functions

    names = register_sql_functions(spark)
    assert "grade_band" in names

    df = spark.createDataFrame(
        [
            (85.0, "m", "123e4567-e89b-12d3-a456-426614174000", 2.0),
            (84.999, "F", "not-a-uuid", 0.0),
            (40.0, "Female", None, -1.0),
            (0.0, "x", "123E4567-E89B-12D3-A456-426614174000", None),
            (None, None, None, 3.5),
        ],
        "pct double, g string, u string, coe double",
    )
    df.createOrReplaceTempView("sql_surface_probe")
    via_sql = spark.sql(
        """
        SELECT grade_band(pct) AS grade, grade_gpa(pct) AS gpa,
               pct_of(pct, 100.0) AS p, gender_normalize(g) AS gn,
               is_uuid(u) AS uu, weighted_coe(coe) AS w
        FROM sql_surface_probe
        """
    ).collect()
    via_col = df.select(
        grade_band(F.col("pct")).getField("grade").alias("grade"),
        grade_band(F.col("pct")).getField("gpa").alias("gpa"),
        percentage(F.col("pct"), F.lit(100.0)).alias("p"),
        gender_normalize(F.col("g")).alias("gn"),
        is_uuid(F.col("u")).alias("uu"),
        weighted_coe(F.col("coe")).alias("w"),
    ).collect()
    assert via_sql == via_col


def test_sql_surface_inlines_into_codegen(spark):
    """SQL-defined functions must INLINE (no python eval, no UDF node) —
    the whole point of the CREATE FUNCTION form."""
    from clickhouse_etl_spark.functions.sql_surface import register_sql_functions

    register_sql_functions(spark)
    plan = (
        spark.range(10)
        .selectExpr("grade_band(CAST(id AS DOUBLE)) AS g")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CASE WHEN" in plan  # the ladder inlined as an expression


def test_sql_surface_timestamp_zoo_matches_column(spark):
    """parse_ts / iso_str (SQL surface) == iso_or_legacy_timestamp /
    timestamp_to_iso_string (Column API) across the full input zoo."""
    from clickhouse_etl_spark.functions.sql_surface import register_sql_functions
    from clickhouse_etl_spark.functions.timestamps import (
        iso_or_legacy_timestamp,
        timestamp_to_iso_string,
    )

    register_sql_functions(spark)
    inputs = [
        "2024-03-05T10:11:12Z",
        "2024-03-05T10:11:12.5Z",
        "2024-03-05T10:11:12.56Z",
        "2024-03-05T10:11:12.567Z",
        "2024-03-05T10:11:12.567891Z",
        "2024-03-05T10:11:12",
        "2024-03-05T10:11:12.25",
        "2024-03-05 10:11:12",
        "datetime.date@version=2(1999-09-09)",
        "datetime.date@version=2(bogus)",
        "garbage",
        "",
        None,
    ]
    df = spark.createDataFrame([(s,) for s in inputs], "s string")
    df.createOrReplaceTempView("ts_zoo_probe")
    via_sql = spark.sql(
        "SELECT parse_ts(s) AS t, iso_str(parse_ts(s)) AS i FROM ts_zoo_probe"
    ).collect()
    via_col = df.select(
        iso_or_legacy_timestamp(F.col("s")).alias("t"),
        timestamp_to_iso_string(iso_or_legacy_timestamp(F.col("s"))).alias("i"),
    ).collect()
    assert via_sql == via_col
