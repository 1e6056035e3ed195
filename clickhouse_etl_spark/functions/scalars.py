"""Scalar column functions (SURVEY.md §2.9 F1, F6-F16).

All pure ``pyspark.sql.functions`` expressions — JVM-side, codegen'd, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"


def gender_normalize(col: Column) -> Column:
    """F1 — lowercase; m/male→male, f/female→female, else passthrough.

    reference: apps/airflow/dags/student/etl_students_to_clickhouse.py:75-80
    (passthrough keeps the *original* value, not the lowercased one).
    """
    low = F.lower(col)
    return (
        F.when(low.isin("m", "male"), F.lit("male"))
        .when(low.isin("f", "female"), F.lit("female"))
        .otherwise(col)
    )


def safe_double(col: Column) -> Column:
    """F6 — None→None, unparsable→None (reference ``to_float``).

    reference: apps/airflow/dags/student_scores_subject/
    etl_student_scores_subject_month_to_clickhouse.py:45-53.
    Non-ANSI cast gives exactly null-on-bad-input.
    """
    return col.cast("double")


def percentage(sum_or_avg: Column, max_score: Column) -> Column:
    """F7 — avg/max×100 guarded by max>0 else 0.

    reference: …etl_student_scores_subject_month_to_clickhouse.py:211,254,311
    """
    return F.when(max_score > 0, sum_or_avg / max_score * 100).otherwise(F.lit(0.0))


def score_from_percentage(pct: Column, max_score: Column) -> Column:
    """F8 — final = pct×maxScore/100.

    reference: …etl_student_scores_subject_month_to_clickhouse.py:309
    """
    return pct * max_score / 100


def path_first_id(path: Column) -> Column:
    """F9 — structurePath '#<id>#…' → first id segment.

    reference: …etl_student_scores_subject_month_to_clickhouse.py:364-368
    (``structurePath.split('#')[1]``).
    """
    return F.split(path, "#").getItem(1)


def path_synthesize(record_id: Column) -> Column:
    """F10 — f"#{structure_record_id}".

    reference: apps/airflow/dags/student_transcript/
    etl_student_transcript_to_clickhouse.py:424
    """
    return F.concat(F.lit("#"), record_id)


def json_object(*cols: Column, **named: Column) -> Column:
    """F11 — serialize a struct of columns to a JSON string.

    reference: apps/airflow/dags/student/etl_students_to_clickhouse.py:82-86
    """
    fields = list(cols) + [c.alias(n) for n, c in named.items()]
    return F.to_json(F.struct(*fields))


def coalesce_default(col: Column, default) -> Column:
    """F16 — default-on-missing (e.g. maxScore→100).

    reference: …etl_student_scores_subject_month_to_clickhouse.py:208,226
    """
    return F.coalesce(col, F.lit(default))


def weighted_coe(coe: Column) -> Column:
    """F16/A3 — coefficient defaulted to 1 when NULL or ≤ 0.

    reference: …etl_student_scores_subject_month_to_clickhouse.py:293-295
    """
    return F.when(coe.isNull() | (coe <= 0), F.lit(1.0)).otherwise(coe.cast("double"))


def is_uuid(col: Column) -> Column:
    """F13 — UUID validation (reference try/except uuid.UUID).

    reference: apps/airflow/dags/teacher/etl_teachers_to_clickhouse.py:74-81
    """
    return col.rlike(UUID_RE)


def nan_to_null(col: Column) -> Column:
    """F14 — NaN → NULL (reference math.isnan check).

    reference: apps/airflow/dags/applicant/etl_applicants_to_clickhouse.py:103
    """
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)
