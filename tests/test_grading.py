"""F2 golden tests — grade-band boundary values (SURVEY.md §5.3).

reference: apps/airflow/dags/student_scores_subject/
etl_student_scores_subject_month_to_clickhouse.py:84-109 — closed lower
bounds at 85/80/70/65/50/45/40.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_etl_spark.functions.grading import (
    grade_band,
    grade_band_sql,
    grade_gpa_sql,
)

# (pct, grade, gpa, meaning) — every cutoff, epsilon below it, and the ends.
GOLDEN = [
    (100.0, "A", 4.0, "Excellent"),
    (85.0, "A", 4.0, "Excellent"),
    (84.999, "B+", 3.5, "Very Good"),
    (80.0, "B+", 3.5, "Very Good"),
    (79.999, "B", 3.0, "Good"),
    (70.0, "B", 3.0, "Good"),
    (69.999, "C+", 2.5, "Fairly Good"),
    (65.0, "C+", 2.5, "Fairly Good"),
    (64.999, "C", 2.0, "Fair"),
    (50.0, "C", 2.0, "Fair"),
    (49.999, "D", 1.5, "Poor"),
    (45.0, "D", 1.5, "Poor"),
    (44.999, "E", 1.0, "Very Poor"),
    (40.0, "E", 1.0, "Very Poor"),
    (39.999, "F", 0.0, "Failure"),
    (0.0, "F", 0.0, "Failure"),
]


def test_grade_band_boundaries(spark):
    df = spark.createDataFrame([(p,) for p, *_ in GOLDEN], ["pct"])
    out = {
        r["pct"]: (r["g"]["grade"], r["g"]["gpa"], r["g"]["meaning"])
        for r in df.select("pct", grade_band(F.col("pct")).alias("g")).collect()
    }
    for pct, grade, gpa, meaning in GOLDEN:
        assert out[pct] == (grade, gpa, meaning), f"pct={pct}"


def test_grade_band_sql_matches_column_form(spark):
    """The SQL CASE text (used in oracles) must agree with the Column form."""
    df = spark.createDataFrame([(p,) for p, *_ in GOLDEN], ["pct"])
    out = df.select(
        "pct",
        grade_band(F.col("pct")).getField("grade").alias("col_grade"),
        F.expr(grade_band_sql("pct")).alias("sql_grade"),
        grade_band(F.col("pct")).getField("gpa").alias("col_gpa"),
        F.expr(grade_gpa_sql("pct")).alias("sql_gpa"),
    ).collect()
    for r in out:
        assert r["col_grade"] == r["sql_grade"], r
        assert r["col_gpa"] == r["sql_gpa"], r
