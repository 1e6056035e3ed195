"""Aggregation layer (SURVEY.md §2.5 A1-A9).

The two averaging semantics are named, separate operators — the reference
silently mixes them (null-dropped in the monthly fact, null-as-zero in the
transcript) and that difference changes denominators.

All are plain ``groupBy().agg`` → Spark plans partial (map-side) + final
aggregation automatically; no driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_etl_spark.functions.scalars import weighted_coe


def avg_null_dropped(
    df: DataFrame, keys: Sequence[str], value: str, alias: str = "avg_score"
) -> DataFrame:
    """A1 — mean over non-null values only (SQL AVG semantics).

    reference: apps/airflow/dags/student_scores_subject/
    etl_student_scores_subject_month_to_clickhouse.py:160-204,243-247
    """
    return df.groupBy(*keys).agg(F.avg(value).alias(alias))


def avg_null_as_zero(
    df: DataFrame, keys: Sequence[str], value: str, alias: str = "avg_score"
) -> DataFrame:
    """A2 — nulls count as zero *in the denominator too*.

    reference: apps/airflow/dags/student_transcript/
    etl_student_transcript_to_clickhouse.py:240-245,287-290 maps None→0
    before averaging — a different denominator than A1.
    """
    return df.groupBy(*keys).agg(
        F.avg(F.coalesce(F.col(value), F.lit(0.0))).alias(alias)
    )


def weighted_average(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    weight: str,
    alias: str = "weighted_avg",
) -> DataFrame:
    """A3 — Σ(value×coe)/Σ(coe) with coe≤0 (or NULL) defaulting to 1.

    NULL values are excluded from BOTH sums: SUM skips the NULL
    numerator term automatically, and counting the row's weight in the
    denominator anyway would silently deflate the average (the
    reference iterates scored evaluations only, so an unscored row
    contributes neither — …:284-302).
    """
    w = weighted_coe(F.col(weight))
    w_eff = F.when(F.col(value).isNotNull(), w)
    return df.groupBy(*keys).agg(
        (F.sum(F.col(value) * w) / F.sum(w_eff)).alias(alias)
    )


def avg_of_avgs(
    df: DataFrame,
    inner_keys: Sequence[str],
    outer_keys: Sequence[str],
    value: str,
    alias: str = "avg_of_avgs",
) -> DataFrame:
    """A4 — two-level average (per-custom percentage → subject mean).

    reference: apps/airflow/dags/student_transcript/
    etl_student_transcript_to_clickhouse.py:255-265
    """
    inner = df.groupBy(*inner_keys).agg(F.avg(value).alias("__inner_avg"))
    return inner.groupBy(*outer_keys).agg(F.avg("__inner_avg").alias(alias))


def credit_totals(
    df: DataFrame,
    keys: Sequence[str],
    credit: str = "credit",
    gpa: str = "gpa",
) -> DataFrame:
    """A6 — totalCredits=Σcredit, totalGPA=Σ(credit×gpa)/Σcredit, count.

    reference: …etl_student_transcript_to_clickhouse.py:409-412,440-442
    """
    return df.groupBy(*keys).agg(
        F.sum(credit).alias("totalCredits"),
        (F.sum(F.col(credit) * F.col(gpa)) / F.sum(credit)).alias("totalGPA"),
        F.count(F.lit(1)).alias("subjectCount"),
    )


def nested_details(
    df: DataFrame,
    keys: Sequence[str],
    detail_cols: Sequence[str],
    alias: str = "details",
    sort_within: bool = True,
) -> DataFrame:
    """A7 — collect per-group detail structs into an array column.

    reference: …etl_student_transcript_to_clickhouse.py:368-394,399-452
    (the 18-field ``subjectDetails`` tuple array).

    ``collect_list`` ordering is shuffle-dependent; ``sort_within`` makes
    the array deterministic (sorted by struct field order), which the
    reference's dict-iteration order never guaranteed.
    """
    arr = F.collect_list(F.struct(*[F.col(c) for c in detail_cols]))
    if sort_within:
        arr = F.sort_array(arr)
    return df.groupBy(*keys).agg(arr.alias(alias))


def json_details(
    df: DataFrame,
    keys: Sequence[str],
    detail_cols: Sequence[str],
    alias: str = "customEvaluations",
    count_alias: str = "customEvaluationCount",
) -> DataFrame:
    """A8 — collect per-group records and serialize to a JSON array string.

    reference: …etl_student_scores_subject_month_to_clickhouse.py:216-231,
    373-374,426-427 (``customEvaluations`` JSON column + count).
    """
    arr = F.sort_array(F.collect_list(F.struct(*[F.col(c) for c in detail_cols])))
    return df.groupBy(*keys).agg(
        F.to_json(arr).alias(alias),
        F.size(arr).alias(count_alias),
    )
