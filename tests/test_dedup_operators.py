"""P3/W1/J7/A9 golden tests — dedup policies (SURVEY.md §5.3)."""

from __future__ import annotations

import datetime as dt

from clickhouse_etl_spark.operators.dedup import (
    exact_distinct,
    last_write_wins,
    latest_row_per_key,
)


def _students(spark):
    rows = [
        ("k1", "old", dt.datetime(2024, 1, 1)),
        ("k1", "new", dt.datetime(2024, 2, 1)),
        ("k2", "only", dt.datetime(2024, 1, 15)),
    ]
    return spark.createDataFrame(rows, ["uniqueKey", "name", "updatedAt"])


def test_p3_keeps_max_updated_at(spark):
    out = {
        r["uniqueKey"]: r["name"]
        for r in latest_row_per_key(_students(spark), ["uniqueKey"]).collect()
    }
    assert out == {"k1": "new", "k2": "only"}


def test_p3_tiebreak_is_deterministic(spark):
    ts = dt.datetime(2024, 1, 1)
    rows = [("k", 1, ts), ("k", 2, ts), ("k", 3, ts)]
    df = spark.createDataFrame(rows, ["uniqueKey", "n", "updatedAt"])
    out = latest_row_per_key(df, ["uniqueKey"], tiebreak=["n"]).collect()
    assert len(out) == 1 and out[0]["n"] == 3  # highest tiebreak wins


def test_j7_last_write_wins_one_row_per_key(spark):
    out = last_write_wins(_students(spark), "uniqueKey").collect()
    assert len(out) == 2
    assert {r["name"] for r in out} == {"new", "only"}


def test_p4_scrub_invalid_keys(spark):
    from clickhouse_etl_spark.operators.dedup import scrub_invalid_keys

    df = spark.createDataFrame(
        [("ok1", "x"), ("undefined", "y"), (None, "z"), ("", "w"), ("ok2", "v")],
        ["sid", "v"],
    )
    out = sorted(r["sid"] for r in scrub_invalid_keys(df, ["sid"]).collect())
    assert out == ["ok1", "ok2"]
    # numeric keys must pass through untouched (no NULL-coercion trap)
    nums = spark.createDataFrame([(1,), (2,)], ["sid"])
    assert scrub_invalid_keys(nums, ["sid"]).count() == 2


def test_a9_exact_distinct(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2)], ["k", "v"]
    )
    assert exact_distinct(df, ["k"]).count() == 1
    assert exact_distinct(df).count() == 2
