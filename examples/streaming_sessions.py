"""End-to-end streaming analytics — the Structured Streaming tier as
one program over the driver's ``events`` landing zone.

One `readStream` source fans into four independent sinks: tumbling
per-type counts (watermarked windowed agg), 30-minute session analysis
(built-in `session_window` merge), the stateful conversion funnel
(`applyInPandasWithState` twin of ClickHouse `windowFunnel`, tiebroken
for deterministic tied-ts order), and micro-batch incremental upsert
into a versioned snapshot table (`foreachBatch` + merge — idempotent
per batch id, atomic `_CURRENT` flip). Every stage is an engine API;
all four run AvailableNow over the same zone, the back-fill shape that
also serves production (swap the trigger and the sink, nothing else).

Run: ``python examples/streaming_sessions.py [sf_dir]``. Smoke-covered
in ``tests/test_examples.py``.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str, work_dir: str | None = None) -> dict:
    from clickhouse_etl_spark import streaming as st

    work = work_dir or tempfile.mkdtemp(prefix="stream_example_")
    report: dict = {}

    def finish(df, name, mode="complete"):
        return st.run_stream_to_memory(
            spark, df, name, f"{work}/ckpt_{name}", output_mode=mode
        )

    zone = f"{sf_dir}/events.parquet"

    # 1. Tumbling hourly counts per event type, 2h watermark for late
    #    arrivals — the canonical windowed aggregation.
    hourly = finish(
        st.tumbling_counts(
            st.read_event_stream(spark, zone), window="1 hour"
        ),
        "ex_hourly",
    )
    report["hourly_windows"] = hourly.count()

    # 2. 30-minute-gap sessions per user: session count + mean length.
    sessions = finish(
        st.session_counts(
            st.read_event_stream(spark, zone), gap="30 minutes"
        ),
        "ex_sessions",
    )
    report["sessions"] = sessions.count()
    report["mean_session_events"] = round(
        sessions.agg(F.avg("n_events")).collect()[0][0], 2
    )

    # 3. Stateful funnel: signup → view → purchase within 24h, greedy
    #    from the earliest anchor — ClickHouse windowFunnel semantics,
    #    batch ≡ stream (pinned in tests/test_streaming.py).
    funnel = finish(
        st.streaming_funnel(
            st.read_event_stream(spark, zone),
            steps=[
                "event_type = 'signup'",
                "event_type = 'view'",
                "event_type = 'purchase'",
            ],
            window_seconds=86400,
            tiebreak_col="event_id",
        ),
        "ex_funnel",
        mode="append",
    )
    levels = (
        funnel.groupBy("user_id")
        .agg(F.max("funnel_level").alias("lvl"))
        .groupBy("lvl")
        .count()
        .collect()
    )
    report["funnel_levels"] = {int(r["lvl"]): r["count"] for r in levels}

    # 4. Micro-batch incremental upsert: latest event per user merged
    #    into a versioned snapshot table as batches land (idempotent per
    #    batch id, atomic _CURRENT flip); then read the published state.
    from clickhouse_etl_spark.sinks.staging import read_current

    st.foreach_batch_upsert(
        st.read_event_stream(spark, zone).select(
            "user_id", "ts", "event_type", "value"
        ),
        table_root=f"{work}/latest_per_user",
        keys=["user_id"],
        order_col="ts",
        checkpoint_dir=f"{work}/ckpt_upsert",
    )
    report["snapshot_users"] = read_current(
        spark, f"{work}/latest_per_user"
    ).count()
    return report


if __name__ == "__main__":
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from clickhouse_etl_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    print(run(get_spark(master="local[8]"), sf))
