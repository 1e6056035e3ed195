"""F3-F5 golden tests — the timestamp zoo (SURVEY.md §5.3).

reference: clean_timestamps (apps/airflow/dags/applicant/
etl_applicants_to_clickhouse.py:21-38), format_datetime
(…student_scores_subject/…:56-82), legacy rescue
(…student_transcript/…:31-41).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import ensure_runtime_confs
from clickhouse_etl_spark.functions.timestamps import (
    iso_or_legacy_timestamp,
    iso_timestamp,
    legacy_date_rescue,
    timestamp_to_iso_string,
)

ZOO = [
    ("2024-03-05T10:20:30.123Z", dt.datetime(2024, 3, 5, 10, 20, 30, 123000)),
    ("2024-03-05T10:20:30Z", dt.datetime(2024, 3, 5, 10, 20, 30)),
    ("2024-03-05T10:20:30.500", dt.datetime(2024, 3, 5, 10, 20, 30, 500000)),
    ("2024-03-05T10:20:30", dt.datetime(2024, 3, 5, 10, 20, 30)),
    ("2024-03-05 10:20:30", dt.datetime(2024, 3, 5, 10, 20, 30)),
    ("datetime.date@version=2(1999-09-09)", dt.datetime(1999, 9, 9, 0, 0, 0)),
    ("not a date", None),
    (None, None),
]


def _parse(spark, values, expr_fn):
    ensure_runtime_confs(spark)  # UTC + ANSI off for deterministic parsing
    df = spark.createDataFrame([(v,) for v in values], ["raw"])
    return [r["out"] for r in df.select(expr_fn(F.col("raw")).alias("out")).collect()]


def test_full_zoo(spark):
    got = _parse(spark, [v for v, _ in ZOO], iso_or_legacy_timestamp)
    for (raw, want), out in zip(ZOO, got):
        assert out == want, f"raw={raw!r}: got {out}, want {want}"


def test_legacy_rescue_only_matches_versioned_literal(spark):
    got = _parse(
        spark,
        ["datetime.date@version=2(2001-02-03)", "(2001-02-03)", "2001-02-03"],
        legacy_date_rescue,
    )
    assert got[0] == dt.datetime(2001, 2, 3)
    assert got[1] == dt.datetime(2001, 2, 3)  # any parenthesized date form
    assert got[2] is None  # bare dates are the ISO path's job


def test_iso_rejects_legacy_literal(spark):
    got = _parse(spark, ["datetime.date@version=2(1999-09-09)"], iso_timestamp)
    assert got == [None]


def test_roundtrip_to_iso_string(spark):
    ensure_runtime_confs(spark)
    df = spark.createDataFrame(
        [(dt.datetime(2024, 3, 5, 10, 20, 30),)], ["ts"]
    )
    out = df.select(timestamp_to_iso_string(F.col("ts")).alias("s")).collect()
    assert out[0]["s"] == "2024-03-05T10:20:30"


def test_iso_timestamp_fraction_digit_zoo(spark):
    """%f accepts 1-6 fraction digits; each variant must parse (pad to
    millis, truncate past them) instead of silently going NULL."""
    from clickhouse_etl_spark.functions.timestamps import iso_timestamp

    rows = [
        (1, "2021-05-01T10:00:00.1Z"),
        (2, "2021-05-01T10:00:00.12Z"),
        (3, "2021-05-01T10:00:00.123Z"),
        (4, "2021-05-01T10:00:00.123456Z"),
        (5, "2021-05-01T10:00:00Z"),
        (6, "not a timestamp"),
    ]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {r.id: r.ts for r in
           df.select("id", iso_timestamp(F.col("s")).alias("ts")).collect()}
    assert got[6] is None
    assert got[5].microsecond == 0
    assert got[1].microsecond == 100_000
    assert got[2].microsecond == 120_000
    assert got[3].microsecond == 123_000
    assert got[4].microsecond == 123_000  # sub-milli truncates
