"""Structured Streaming tier: batch ≡ stream equivalence (SURVEY.md §2.10).

Each windowed aggregation runs twice over the same event files — once as
the registered batch query, once as a real readStream + withWatermark +
AvailableNow job — and the results must be identical (no late data in a
replayed static file set, so the watermark drops nothing).
"""

from __future__ import annotations

import pytest

from clickhouse_etl_spark import streaming as st
from clickhouse_etl_spark.queries.streaming_batch import (
    stream_session_30m,
    stream_sliding_2h,
    stream_tumbling_hourly,
)
from tests.conftest import SF_SMOKE, rows_set


@pytest.fixture(scope="module")
def event_stream(spark):
    return st.read_event_stream(spark, f"{SF_SMOKE}/events.parquet")


def _run(spark, sdf, name, tmp_path):
    return st.run_stream_to_memory(spark, sdf, name, str(tmp_path / name))


def test_stream_source_is_streaming(event_stream):
    assert event_stream.isStreaming
    assert dict(event_stream.dtypes)["ts"] == "timestamp"


def test_tumbling_batch_equals_stream(spark, event_stream, tmp_path):
    batch = rows_set(stream_tumbling_hourly(spark, SF_SMOKE))
    stream = rows_set(_run(spark, st.tumbling_counts(event_stream), "t_tumb", tmp_path))
    assert stream == batch


def test_sliding_batch_equals_stream(spark, event_stream, tmp_path):
    batch = rows_set(stream_sliding_2h(spark, SF_SMOKE))
    stream = rows_set(_run(spark, st.sliding_counts(event_stream), "t_slide", tmp_path))
    assert stream == batch


def test_session_batch_equals_stream(spark, event_stream, tmp_path):
    batch = rows_set(stream_session_30m(spark, SF_SMOKE))
    stream = rows_set(_run(spark, st.session_counts(event_stream), "t_sess", tmp_path))
    assert stream == batch
