"""F3-F5 — the timestamp zoo.

The reference ingests timestamps in several shapes and normalizes them with
per-row Python (reference: apps/airflow/dags/applicant/
etl_applicants_to_clickhouse.py:21-38 ``clean_timestamps``;
apps/airflow/dags/student_scores_subject/
etl_student_scores_subject_month_to_clickhouse.py:56-82 ``format_datetime``):

1. ISO-8601 ``%Y-%m-%dT%H:%M:%S[.%f]Z``
2. the legacy literal ``datetime.date@version=2(1999-09-09)``
3. already-clean ``%Y-%m-%d %H:%M:%S``

Here each becomes a vectorized ``to_timestamp``/``regexp_extract``
coalesce chain — one pass, JVM-side, invalid input → NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LEGACY_RE = r"\((\d{4}-\d{2}-\d{2})\)"


def iso_timestamp(col: Column) -> Column:
    """ISO-8601 with/without fractional seconds, with/without 'Z' →
    timestamp.

    Python's ``%f`` (the reference parser) accepts 1-6 fraction digits;
    Spark's ``S`` patterns each match an EXACT digit count, so the
    fraction is normalized first: pad/truncate to millis via regex,
    then parse with the fixed patterns. Invalid inputs → NULL.
    """
    # '.1' -> '.100', '.123456' -> '.123'; no-op without a fraction.
    # Sub-millisecond digits truncate. ($100/$10 = group 1 + literal
    # zeros: Java replacement parsing stops at the largest valid group.)
    trunc = F.regexp_replace(col, r"(\.\d{1,3})\d*", r"$1")
    pad1 = F.regexp_replace(trunc, r"\.(\d)(?=[^\d]|$)", r".$100")
    norm = F.regexp_replace(pad1, r"\.(\d\d)(?=[^\d]|$)", r".$10")
    return F.coalesce(
        F.to_timestamp(norm, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
        F.to_timestamp(norm, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.to_timestamp(norm, "yyyy-MM-dd'T'HH:mm:ss.SSS"),
        F.to_timestamp(norm, "yyyy-MM-dd'T'HH:mm:ss"),
        F.to_timestamp(norm, "yyyy-MM-dd HH:mm:ss"),
    )


def legacy_date_rescue(col: Column) -> Column:
    """F4 — ``datetime.date@version=2(1999-09-09)`` → timestamp at midnight.

    reference: apps/airflow/dags/student_transcript/
    etl_student_transcript_to_clickhouse.py:31-41
    """
    date_str = F.regexp_extract(col, _LEGACY_RE, 1)
    return F.when(
        date_str != "", F.to_timestamp(date_str, "yyyy-MM-dd")
    ).otherwise(F.lit(None).cast("timestamp"))


def iso_or_legacy_timestamp(col: Column) -> Column:
    """Full zoo: ISO first, then the legacy rescue; unparsable → NULL."""
    return F.coalesce(iso_timestamp(col), legacy_date_rescue(col))


def timestamp_to_iso_string(col: Column) -> Column:
    """F5 — timestamp → '%Y-%m-%dT%H:%M:%S' string (JSON boundaries only).

    reference: apps/airflow/dags/student/etl_students_to_clickhouse.py:56-57
    """
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")
