"""Moving-window aggregates (groupArrayMovingSum/Avg analogs) vs DuckDB
window oracles plus the ClickHouse fixed-divisor leading-edge pin.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table  # noqa: E402
from tools.oracle_check import assert_matches_oracle  # noqa: E402

SF = "/root/testdata/sf0.001"

_MOVSUM_ORACLE = """
SELECT user_id, event_id,
       SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         AS moving_sum
FROM events
"""


def test_moving_sum_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.timeseries import moving_sum

    ev = load_table(spark, SF, "events").select("user_id", "event_id", "value")
    out = moving_sum(ev, ["user_id"], "event_id", "value", 5)
    assert_matches_oracle(out.drop("value"), _MOVSUM_ORACLE, SF)


_MOVAVG_ORACLE = """
SELECT user_id, event_id,
       SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 5.0
         AS moving_avg
FROM events
"""


def test_moving_avg_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.timeseries import moving_avg

    ev = load_table(spark, SF, "events").select("user_id", "event_id", "value")
    out = moving_avg(ev, ["user_id"], "event_id", "value", 5)
    out = out.select("user_id", "event_id",
                     F.round("moving_avg", 6).alias("moving_avg"))
    oracle = _MOVAVG_ORACLE.replace(
        "/ 5.0\n         AS moving_avg", "/ 5.0 AS raw")
    assert_matches_oracle(
        out,
        "SELECT user_id, event_id, ROUND(raw, 6) AS moving_avg FROM ("
        + oracle + ")",
        SF,
    )


def test_moving_avg_fixed_divisor_leading_edge(spark):
    """ClickHouse divides by n even when the frame holds < n rows."""
    from clickhouse_etl_spark.operators.timeseries import moving_avg, moving_sum

    rows = [(1, i, float(v)) for i, v in enumerate([4, 8, 12, 16])]
    df = spark.createDataFrame(rows, "g int, t int, v double")
    got = {r["t"]: r["moving_avg"]
           for r in moving_avg(df, ["g"], "t", "v", 4).collect()}
    assert got[0] == pytest.approx(1.0)     # 4/4, not 4/1
    assert got[1] == pytest.approx(3.0)     # 12/4
    assert got[3] == pytest.approx(10.0)    # full window
    with pytest.raises(ValueError):
        moving_sum(df, ["g"], "t", "v", 0)
