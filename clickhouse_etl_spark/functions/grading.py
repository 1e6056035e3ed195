"""F2 — grade banding ladder.

reference: apps/airflow/dags/student_scores_subject/
etl_student_scores_subject_month_to_clickhouse.py:84-109 (``get_grade_info``,
duplicated at apps/airflow/dags/student_transcript/
etl_student_transcript_to_clickhouse.py:65-90).

Cutoffs are closed lower bounds: ≥85→A, ≥80→B+, ≥70→B, ≥65→C+, ≥50→C,
≥45→D, ≥40→E, else F.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (lower bound, grade, gpa, meaning) — order matters (first match wins).
GRADE_BANDS: list[tuple[float, str, float, str]] = [
    (85.0, "A", 4.0, "Excellent"),
    (80.0, "B+", 3.5, "Very Good"),
    (70.0, "B", 3.0, "Good"),
    (65.0, "C+", 2.5, "Fairly Good"),
    (50.0, "C", 2.0, "Fair"),
    (45.0, "D", 1.5, "Poor"),
    (40.0, "E", 1.0, "Very Poor"),
]
FAIL_BAND = ("F", 0.0, "Failure")


def grade_band(pct: Column) -> Column:
    """percentage → struct(grade, gpa, meaning) via a when() ladder."""
    expr = None
    for cutoff, grade, gpa, meaning in GRADE_BANDS:
        cond = pct >= cutoff
        val = F.struct(
            F.lit(grade).alias("grade"),
            F.lit(gpa).alias("gpa"),
            F.lit(meaning).alias("meaning"),
        )
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise(
        F.struct(
            F.lit(FAIL_BAND[0]).alias("grade"),
            F.lit(FAIL_BAND[1]).alias("gpa"),
            F.lit(FAIL_BAND[2]).alias("meaning"),
        )
    )


def grade_letter(pct: Column) -> Column:
    return grade_band(pct).getField("grade")


def grade_gpa(pct: Column) -> Column:
    return grade_band(pct).getField("gpa")


def grade_meaning(pct: Column) -> Column:
    return grade_band(pct).getField("meaning")


def grade_band_sql(pct_expr: str) -> str:
    """The same ladder as ANSI-SQL CASE text (for oracle parity checks)."""
    cases = " ".join(
        f"WHEN {pct_expr} >= {cutoff} THEN '{grade}'"
        for cutoff, grade, _, _ in GRADE_BANDS
    )
    return f"CASE {cases} ELSE '{FAIL_BAND[0]}' END"


def grade_gpa_sql(pct_expr: str) -> str:
    cases = " ".join(
        f"WHEN {pct_expr} >= {cutoff} THEN {gpa}"
        for cutoff, _, gpa, _ in GRADE_BANDS
    )
    return f"CASE {cases} ELSE {FAIL_BAND[1]} END"


def grade_meaning_sql(pct_expr: str) -> str:
    cases = " ".join(
        f"WHEN {pct_expr} >= {cutoff} THEN '{meaning}'"
        for cutoff, _, _, meaning in GRADE_BANDS
    )
    return f"CASE {cases} ELSE '{FAIL_BAND[2]}' END"
