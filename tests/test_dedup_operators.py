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


def test_last_write_wins_requires_order(spark):
    import pytest
    """No updatedAt and no explicit order_col -> error, not an
    arbitrary-payload ordering."""
    df = spark.createDataFrame([(1, True), (1, False)], ["k", "flag"])
    with pytest.raises(ValueError, match="order_col"):
        last_write_wins(df, "k")


def test_representative_latest_tiebreak(spark):
    """Tied order values resolve deterministically via the tiebreak."""
    from clickhouse_etl_spark.operators.dedup import representative_latest

    rows = [(1, 10, 5, "a"), (1, 10, 9, "b"), (2, 7, 1, "c")]
    df = spark.createDataFrame(rows, ["k", "ord", "tie", "payload"])
    out = {r.k: r.payload for r in representative_latest(
        df, ["k"], ["payload"], "ord", tiebreak=["tie"]).collect()}
    assert out == {1: "b", 2: "c"}


def test_mad_outliers_jvm_keeps_null_keys(spark):
    from pyspark.sql import functions as F
    """NULL group keys form their own group (twin parity), never drop."""
    from clickhouse_etl_spark.operators.grouped import mad_outliers_jvm

    rows = [(None, 1.0), (None, 1.1), (None, 99.0), (7, 2.0), (7, 2.1)]
    df = spark.createDataFrame(rows, ["user_id", "value"])
    out = mad_outliers_jvm(df, ["user_id"], "value")
    assert out.count() == 5
    nulls = out.filter(F.col("user_id").isNull())
    assert nulls.count() == 3
    assert nulls.filter(F.col("is_outlier")).count() == 1
