"""Timeseries operators (deltaSum, LTTB downsampling) — DuckDB oracle
on the events table + hand-computed semantics pins."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.operators.timeseries import (
    delta_sum,
    lttb_downsample,
)
from tools.oracle_check import assert_matches_oracle

SF_DIR = "/root/testdata/sf0.001"

_DELTA_SUM_ORACLE = """
WITH d AS (
  SELECT event_type,
         value - LAG(value) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS d
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
)
SELECT event_type,
       SUM(CASE WHEN d > 0 THEN d ELSE 0 END) AS delta_sum
FROM d GROUP BY event_type
"""


def test_delta_sum_matches_duckdb_oracle(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = delta_sum(
        ev, "value", F.struct("ts", "event_id"), ["event_type"]
    )
    assert_matches_oracle(out, _DELTA_SUM_ORACLE, SF_DIR)


def test_delta_sum_counter_reset(spark):
    # monotonic counter with one reset: 0,5,10,(reset)3,6 -> 5+5+3 = 13
    rows = [("c", i, v) for i, v in enumerate([0, 5, 10, 3, 6])]
    rows += [("single", 0, 42)]  # one surviving row -> 0, not NULL
    df = spark.createDataFrame(rows, "g string, t int, v long")
    out = {r["g"]: r["delta_sum"] for r in
           delta_sum(df, "v", "t", ["g"]).collect()}
    assert out == {"c": 13, "single": 0}


def test_lttb_hand_computed_and_invariants(spark):
    # n=6 -> n_out=4: buckets [1,3) and [3,5); hand-computed triangle
    # areas keep the y=10 spike and the post-spike floor point.
    ys = [0.0, 10.0, 0.0, 0.0, 5.0, 0.0]
    rows = [("s", float(i), y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = sorted(
        (r["x"], r["y"])
        for r in lttb_downsample(df, "x", "y", 4, ["g"]).collect()
    )
    assert got == [(0.0, 0.0), (1.0, 10.0), (3.0, 0.0), (5.0, 0.0)]

    # short series pass through untouched
    short = lttb_downsample(df, "x", "y", 10, ["g"]).collect()
    assert sorted((r["x"], r["y"]) for r in short) == [
        (float(i), y) for i, y in enumerate(ys)
    ]


def test_lttb_shape_invariants_on_events(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type",
        F.unix_micros("ts").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    n_out = 25
    down = lttb_downsample(ev, "x", "y", n_out, ["event_type"])
    per = {r["event_type"]: r["n"] for r in
           down.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    ends = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in down.groupBy("event_type")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    }
    src = {
        r["event_type"]: (r["n"], r["lo"], r["hi"])
        for r in ev.dropna()
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.min("x").alias("lo"),
             F.max("x").alias("hi"))
        .collect()
    }
    for g, (n_src, lo, hi) in src.items():
        assert per[g] == min(n_src, n_out)
        assert ends[g] == (lo, hi)  # first/last points always survive


def test_lttb_rejects_degenerate_params(spark):
    df = spark.createDataFrame([("g", 1.0, 1.0)], "g string, x double, y double")
    with pytest.raises(ValueError, match="n_out"):
        lttb_downsample(df, "x", "y", 2, ["g"])
    with pytest.raises(ValueError, match="group_cols"):
        lttb_downsample(df, "x", "y", 3, [])
