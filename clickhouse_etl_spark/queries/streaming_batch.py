"""Windowed-aggregation queries (batch form of the streaming tier).

The reference has no streaming surface (SURVEY.md §2.10) — these extend
the engine over the ``events`` table. Each query here is the *batch*
expression of a window; ``clickhouse_etl_spark/streaming.py`` runs the
same logic as a real Structured Streaming job (readStream +
withWatermark + AvailableNow trigger) and ``tests/test_streaming.py``
asserts batch ≡ stream on every window shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.queries import register


# Demoted to tests/test_demoted_oracles.py in the round-6 registry
# rotation (identical value-hash oracle there; batch≡stream is also
# asserted in tests/test_streaming.py) — stream_session_30m stays as
# the registered streaming row, being the harder stateful shape.
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# Not registered: the sliding-window shape is oracle-checked in
# tests/test_demoted_oracles.py and batch≡stream-asserted in
# tests/test_streaming.py — the registry is capped at the driver's
# 50-query correctness window (tumbling + session stay registered).
def stream_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h length, 1h slide): each event lands in 2 windows."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


@register(
    "stream_session_30m",
    oracle="""
    SELECT user_id, MIN(ts) AS session_start, count(*) AS n_events
    FROM (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
      )
    )
    GROUP BY user_id, session_no
    """,
)
def stream_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (session_window, batch form).

    Spark merges events into one session while each gap is < 30 min; a gap
    of exactly 30 min starts a NEW session (window end is exclusive) — the
    oracle's islands formulation uses >= for the same cut.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )
