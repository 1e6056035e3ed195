"""Structured Streaming tier: batch ≡ stream equivalence (SURVEY.md §2.10).

Each windowed aggregation runs twice over the same event files — once as
the registered batch query, once as a real readStream + withWatermark +
AvailableNow job — and the results must be identical (no late data in a
replayed static file set, so the watermark drops nothing).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_etl_spark import streaming as st
from clickhouse_etl_spark.catalog import load_table
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


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Exactly-once incremental semantics: re-running against the same
    checkpoint after new files land must read ONLY the new files (the
    streaming form of the S7 high-watermark contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_etl_spark.catalog import load_table

    events = load_table(spark, SF_SMOKE, "events")
    pdf = events.toPandas().sort_values("ts")
    pdf["ts"] = pdf["ts"].astype("int64")
    half = len(pdf) // 2
    zone = tmp_path / "resume_zone"
    zone.mkdir()
    ckpt = str(tmp_path / "resume_ckpt")

    pq.write_table(
        pa.Table.from_pandas(pdf.iloc[:half], preserve_index=False),
        str(zone / "a.parquet"),
    )

    def run_once(name):
        stream = st.read_event_stream(spark, str(zone))
        q = (
            st.tumbling_counts(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sum(p["numInputRows"] for p in q.recentProgress)

    assert run_once("resume_run1") == half

    pq.write_table(
        pa.Table.from_pandas(pdf.iloc[half:], preserve_index=False),
        str(zone / "b.parquet"),
    )
    # second run, SAME checkpoint: only file b is read
    assert run_once("resume_run2") == len(pdf) - half


# --- custom stateful operator (applyInPandasWithState) ----------------------

def test_first_seen_stateful_equals_batch_minby(spark, event_stream, tmp_path):
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.catalog import load_table

    out = st.run_stream_to_memory(
        spark,
        st.first_seen_per_key(event_stream),
        "t_first_seen",
        str(tmp_path / "fs"),
        output_mode="append",
    )
    events = load_table(spark, SF_SMOKE, "events")
    batch = events.groupBy("user_id", "event_type").agg(
        F.min(F.struct("ts", "event_id")).alias("m")
    ).select(
        "user_id",
        "event_type",
        F.col("m.ts").alias("first_ts"),
        F.col("m.event_id").alias("first_event_id"),
    )
    assert rows_set(out) == rows_set(batch)


def test_first_seen_state_suppresses_across_microbatches(spark, tmp_path):
    """2-file source at maxFilesPerTrigger=1 → 2 micro-batches; the state
    must prevent a key emitted in batch 1 from re-emitting in batch 2."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_etl_spark.catalog import load_table

    events = load_table(spark, SF_SMOKE, "events")
    pdf = events.select("event_id", "ts", "user_id", "event_type", "value",
                        "props").toPandas().sort_values("ts")
    pdf["ts"] = pdf["ts"].astype("int64")  # back to int64 nanos for the zone
    half = len(pdf) // 2
    zone = tmp_path / "zone2"
    zone.mkdir()
    for name, part in (("a.parquet", pdf.iloc[:half]), ("b.parquet", pdf.iloc[half:])):
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       str(zone / name))

    stream = st.read_event_stream(spark, str(zone), max_files_per_trigger=1)
    out = st.run_stream_to_memory(
        spark,
        st.first_seen_per_key(stream),
        "t_first_seen_2b",
        str(tmp_path / "fs2"),
        output_mode="append",
    ).collect()
    keys = [(r["user_id"], r["event_type"]) for r in out]
    assert len(keys) == len(set(keys))  # exactly one emission per key
    n_keys = events.select("user_id", "event_type").distinct().count()
    assert len(keys) == n_keys


# --- watermarked streaming dedup + foreachBatch incremental merge -----------

def test_dedup_within_watermark_equals_batch(spark, tmp_path):
    """Streaming dedup over a 2-file source with duplicated events must
    equal batch dropDuplicates — cross-micro-batch duplicates included
    (both copies land inside the watermark horizon)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_etl_spark.catalog import load_table

    events = load_table(spark, SF_SMOKE, "events")
    pdf = events.limit(200).toPandas()
    pdf["ts"] = pdf["ts"].astype("int64")
    zone = tmp_path / "dedup_zone"
    zone.mkdir()
    # file a: rows 0..149; file b: rows 100..199 → 50 duplicates span the
    # micro-batch boundary at maxFilesPerTrigger=1.
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:150], preserve_index=False), str(zone / "a.parquet"))
    pq.write_table(pa.Table.from_pandas(pdf.iloc[100:], preserve_index=False), str(zone / "b.parquet"))

    stream = st.read_event_stream(spark, str(zone), max_files_per_trigger=1)
    keys = ["event_id", "ts"]
    out = st.run_stream_to_memory(
        spark,
        st.dedup_within_watermark(stream, keys=keys, watermark="10 days"),
        "t_dedup_wm",
        str(tmp_path / "t_dedup_wm"),
        output_mode="append",
    )
    batch = spark.read.parquet(str(zone)).dropDuplicates(keys)
    assert out.count() == batch.count() == 200


def test_foreach_batch_upsert_incremental_merge(spark, tmp_path):
    """2 micro-batches of dimension updates merged through foreachBatch:
    the published snapshot after the run equals a batch merge_upsert of
    all updates, and intermediate versions remain for rollback."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_etl_spark.sinks.staging import list_versions, read_current
    from clickhouse_etl_spark.sinks.upsert import merge_upsert

    rows = [
        # (event_id, ts, user_id, event_type, value, props) reused as a
        # keyed update stream: user_id is the merge key, ts the version.
        (1, 1_000_000_000, 10, "alpha", 1.0, "{}"),
        (2, 2_000_000_000, 20, "beta", 2.0, "{}"),
        (3, 3_000_000_000, 10, "alpha2", 3.0, "{}"),  # newer write, key 10
        (4, 1_500_000_000, 30, "gamma", 4.0, "{}"),
    ]
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    zone = tmp_path / "upsert_zone"
    zone.mkdir()
    cols = list(zip(*rows))
    pq.write_table(pa.table(dict(zip(schema.names, [list(c[:2]) for c in cols]))), str(zone / "a.parquet"))
    pq.write_table(pa.table(dict(zip(schema.names, [list(c[2:]) for c in cols]))), str(zone / "b.parquet"))

    table_root = str(tmp_path / "dim_table")
    stream = st.read_event_stream(spark, str(zone), max_files_per_trigger=1)
    st.foreach_batch_upsert(
        stream,
        table_root,
        keys=["user_id"],
        order_col="ts",
        checkpoint_dir=str(tmp_path / "upsert_ckpt"),
    )

    current = read_current(spark, table_root)
    batch_all = spark.read.parquet(str(zone))
    expected = merge_upsert(batch_all.limit(0), batch_all, ["user_id"], "ts")
    assert rows_set(current.select("user_id", "event_type")) == rows_set(
        expected.select("user_id", "event_type")
    )
    assert rows_set(current.select("user_id", "event_type")) == {
        (10, "alpha2"), (20, "beta"), (30, "gamma"),
    }
    # one snapshot version per micro-batch, all kept for rollback
    assert len(list_versions(table_root)) == 2


def _attribution_sides(df):
    """views → later purchases by the same user within 1 hour; disjoint
    role-specific column names (the operator's contract)."""
    views = df.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    buys = df.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return views, buys


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """The two-stream attribution join (bounded state via watermark +
    time-range condition) produces exactly the batch interval join."""
    events = load_table(spark, SF_SMOKE, "events")
    bv, bp = _attribution_sides(events)
    batch = rows_set(
        st.stream_interval_join(bv, bp, "v_user", "p_user", "v_ts", "p_ts")
    )
    assert batch, "fixture produces no attribution pairs — widen the window"

    s = st.read_event_stream(spark, f"{SF_SMOKE}/events.parquet")
    sv, sp = _attribution_sides(s)
    joined = st.stream_interval_join(sv, sp, "v_user", "p_user", "v_ts", "p_ts")
    assert joined.isStreaming
    out = st.run_stream_to_memory(
        spark, joined, "attr_join", str(tmp_path / "attr"), output_mode="append"
    )
    assert rows_set(out) == batch


def test_stream_interval_join_rejects_column_clash(spark):
    events = load_table(spark, SF_SMOKE, "events")
    import pytest

    with pytest.raises(ValueError, match="disjoint"):
        st.stream_interval_join(events, events, "user_id", "user_id", "ts", "ts")


def test_foreach_batch_summing_equals_batch_aggregate(spark, tmp_path):
    """Streamed per-key running totals equal one batch groupBy over all
    rows, and a REPLAYED batch id is skipped instead of double-added."""
    import pyarrow as pa

    from clickhouse_etl_spark import streaming as st
    from clickhouse_etl_spark.sinks.staging import current_version, read_current
    from clickhouse_etl_spark.streaming import _apply_summing_batch

    rows = [
        (1, 1_000_000_000, 10, "a", 1.5, "{}"),
        (2, 2_000_000_000, 20, "b", 2.0, "{}"),
        (3, 3_000_000_000, 10, "a", 3.0, "{}"),
        (4, 4_000_000_000, 30, "c", 4.0, "{}"),
        (5, 5_000_000_000, 10, "a", 0.5, "{}"),
    ]
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    zone = tmp_path / "sum_zone"
    zone.mkdir()
    cols = list(zip(*rows))
    # two files -> availableNow may split into micro-batches
    for i, sl in enumerate((slice(0, 3), slice(3, 5))):
        tbl = pa.table(
            {f.name: list(c[sl]) for f, c in zip(schema, cols)}, schema=schema
        )
        import pyarrow.parquet as pq

        pq.write_table(tbl, zone / f"part{i}.parquet")

    stream = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(zone))
    )
    table_root = str(tmp_path / "sum_table")
    st.foreach_batch_summing(
        stream,
        table_root,
        keys=["user_id"],
        sum_cols=["value"],
        checkpoint_dir=str(tmp_path / "sum_ckpt"),
    )

    current = read_current(spark, table_root)
    got = {r.user_id: r.value for r in current.collect()}
    assert got == {10: 5.0, 20: 2.0, 30: 4.0}

    # Replay: re-apply the LAST batch id — must be skipped, totals frozen.
    import os

    ckpt = os.path.abspath(str(tmp_path / "sum_ckpt"))
    last_id = int(current_version(table_root))
    batch = spark.createDataFrame(
        [(10, 100.0)], "user_id long, value double"
    )
    applied = _apply_summing_batch(
        batch, last_id, table_root, ["user_id"], ["value"], checkpoint_dir=ckpt
    )
    assert applied is False
    after = {r.user_id: r.value for r in read_current(spark, table_root).collect()}
    assert after == got
    # A NEW batch id applies normally.
    assert _apply_summing_batch(
        batch, last_id + 1, table_root, ["user_id"], ["value"],
        checkpoint_dir=ckpt,
    )
    final = {r.user_id: r.value for r in read_current(spark, table_root).collect()}
    assert final[10] == 105.0

    # A DIFFERENT checkpoint over the same table must refuse outright
    # (fresh checkpoints restart ids over a re-read source).
    import pytest

    with pytest.raises(RuntimeError, match="owned by checkpoint"):
        _apply_summing_batch(
            batch, 0, table_root, ["user_id"], ["value"],
            checkpoint_dir=str(tmp_path / "other_ckpt"),
        )


def test_summing_sink_refuses_foreign_table_root(spark, tmp_path):
    """A table_root with published snapshots but no summing-sink marker
    (another writer's table) is refused instead of silently merged."""
    import pytest

    from clickhouse_etl_spark.sinks.staging import publish_snapshot
    from clickhouse_etl_spark.streaming import _apply_summing_batch

    root = str(tmp_path / "foreign")
    publish_snapshot(
        spark.createDataFrame([(1, 2.0)], "user_id long, value double"),
        root, version="00000000000000000007",
    )
    batch = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
    with pytest.raises(RuntimeError, match="another writer"):
        _apply_summing_batch(
            batch, 0, root, ["user_id"], ["value"],
            checkpoint_dir=str(tmp_path / "ck"),
        )


# --- stateful streaming funnel ---------------------------------------------

_FUNNEL_STEPS = [
    "event_type = 'signup'",
    "event_type = 'view'",
    "event_type = 'purchase'",
]


def test_streaming_funnel_equals_batch(spark, event_stream, tmp_path):
    """Max emitted level per user == the batch window_funnel (the
    registered ext_window_funnel semantics) over the same files."""
    from clickhouse_etl_spark.operators.events import window_funnel

    out = st.run_stream_to_memory(
        spark,
        st.streaming_funnel(event_stream, _FUNNEL_STEPS, 86400),
        "t_funnel",
        str(tmp_path / "fun"),
        output_mode="append",
    )
    got = {
        r.user_id: r.lvl
        for r in out.groupBy("user_id")
        .agg(F.max("funnel_level").alias("lvl"))
        .collect()
    }
    events = load_table(spark, SF_SMOKE, "events")
    want = {
        r.user_id: r.funnel_level
        for r in window_funnel(events, _FUNNEL_STEPS, 86400).collect()
    }
    assert got == want


def test_streaming_funnel_advances_across_microbatches(spark, tmp_path):
    """Chains that SPAN micro-batches must complete: a user whose step-1
    lands in batch 1 and steps 2-3 in batch 2 reaches level 3 — the
    GroupState carries (anchor, level, t_prev) across batches."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-01-01").value // 1000  # micros
    rows = []
    # u1: signup in file A; view+purchase in file B (within window)
    rows.append((1, base, 1, "signup"))
    rows.append((2, base + 10_000_000, 1, "view"))
    rows.append((3, base + 20_000_000, 1, "purchase"))
    # u2: signup in A; view in B but PAST the window -> stays level 1
    rows.append((4, base, 2, "signup"))
    rows.append((5, base + 100 * 1_000_000, 2, "view"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    pdf["ts"] = pdf["ts"] * 1000  # micros -> nanos (landing-zone encoding)
    zone = tmp_path / "funzone"
    zone.mkdir()
    a = pdf[pdf.event_id.isin([1, 4])]
    b = pdf[~pdf.event_id.isin([1, 4])]
    for name, part in (("a.parquet", a), ("b.parquet", b)):
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            str(zone / name),
        )
    # FileStreamSource orders batches by modification time; two writes
    # can land in the same millisecond, so pin distinct mtimes to make
    # "A before B" deterministic instead of filesystem-dependent
    import os as _os
    import time as _time

    now = _time.time()
    _os.utime(zone / "a.parquet", (now - 60, now - 60))
    _os.utime(zone / "b.parquet", (now, now))
    stream = st.read_event_stream(spark, str(zone), max_files_per_trigger=1)
    out = st.run_stream_to_memory(
        spark,
        st.streaming_funnel(stream, _FUNNEL_STEPS, window_seconds=60),
        "t_funnel_2b",
        str(tmp_path / "fun2"),
        output_mode="append",
    )
    got = {
        r.user_id: r.lvl
        for r in out.groupBy("user_id")
        .agg(F.max("funnel_level").alias("lvl"))
        .collect()
    }
    assert got == {1: 3, 2: 1}


def test_streaming_funnel_expire_closed_windows(spark, tmp_path):
    """Bounded-state mode: once the watermark passes anchor + window,
    the user's state is evicted — a later step-2 event does NOT advance
    the old funnel, and a later step-1 event re-anchors a FRESH funnel
    (emitted with the new anchor_ts). The default mode keeps the old
    anchor forever (contrast pinned here)."""
    import os as _os
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-01-01").value // 1000  # micros
    HOUR = 3_600_000_000
    # file A: u1 signup at t0 (anchor; window 60s)
    # file B: u2 signup at t0+10h — advances the watermark (delay 1s)
    #         far past u1's window close
    # file C: u2 view — u1 has NO data this batch, so its expired
    #         timeout fires and the state is evicted (timeouts only
    #         fire for data-free keys)
    # file D: u1 view at t0+11h (state gone: must NOT advance the old
    #         funnel) then u1 signup at t0+11h+1s (re-anchors FRESH)
    rows_a = [(1, base, 1, "signup"), (6, base, 3, "signup")]
    rows_b = [(2, base + 10 * HOUR, 2, "signup")]
    # u3's late signup lands in the SAME batch whose watermark first
    # passes its window close — data pre-empts the timeout callback, so
    # the operator must apply the eviction inline and re-anchor
    rows_c = [
        (3, base + 10 * HOUR + 10_000_000, 2, "view"),
        (7, base + 10 * HOUR + 20_000_000, 3, "signup"),
    ]
    rows_d = [
        (4, base + 11 * HOUR, 1, "view"),
        (5, base + 11 * HOUR + 1_000_000, 1, "signup"),
    ]
    zone = tmp_path / "funexp"
    zone.mkdir()
    now = _time.time()
    for i, (name, rows) in enumerate(
        (("a.parquet", rows_a), ("b.parquet", rows_b), ("c.parquet", rows_c),
         ("d.parquet", rows_d))
    ):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type"]
        )
        pdf["value"] = 1.0
        pdf["props"] = "{}"
        pdf["ts"] = pdf["ts"] * 1000  # micros -> nanos landing encoding
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False), str(zone / name)
        )
        _os.utime(zone / name, (now - 120 + 30 * i, now - 120 + 30 * i))
    stream = st.read_event_stream(spark, str(zone), max_files_per_trigger=1)
    out = st.run_stream_to_memory(
        spark,
        st.streaming_funnel(
            stream,
            _FUNNEL_STEPS,
            window_seconds=60,
            watermark="1 second",
            expire_closed_windows=True,
        ),
        "t_funnel_exp",
        str(tmp_path / "funexp_q"),
        output_mode="append",
    )
    rows = out.collect()
    u1 = [r for r in rows if r.user_id == 1]
    # old anchor emitted level 1; the view after eviction must not have
    # produced level 2; the late signup re-anchors (a second level-1 row
    # with the NEW anchor timestamp)
    assert sorted(r.funnel_level for r in u1) == [1, 1]
    anchors = sorted(r.anchor_ts for r in u1)
    assert anchors[0] != anchors[1]
    # same-batch pre-emption: u3's re-anchor arrived in the batch the
    # timeout would have fired — still two distinct level-1 anchors
    u3 = [r for r in rows if r.user_id == 3]
    assert sorted(r.funnel_level for r in u3) == [1, 1]
    a3 = sorted(r.anchor_ts for r in u3)
    assert a3[0] != a3[1]


def test_summing_batch_carries_moment_states(spark, tmp_path):
    """moment_cols flows through the foreachBatch path: two applied
    micro-batches leave a snapshot whose moment reader equals the
    one-shot aggregate over all rows."""
    from clickhouse_etl_spark.sinks.staging import read_current
    from clickhouse_etl_spark.sinks.upsert import moment_avg, moment_var
    from clickhouse_etl_spark.streaming import _apply_summing_batch

    root = str(tmp_path / "msnap")
    b1 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, v double")
    b2 = spark.createDataFrame(
        [("a", 6.0), ("b", 7.0), ("c", 9.0)], "k string, v double")
    for i, b in enumerate((b1, b2)):
        assert _apply_summing_batch(
            b, i, root, ["k"], ["v"], checkpoint_dir=str(tmp_path / "ck"),
            moment_cols={"v_state": "v"},
        )
    snap = read_current(spark, root)
    got = {r.k: (r.avg, r.var)
           for r in snap.select(
               "k",
               F.round(moment_avg("v_state"), 9).alias("avg"),
               F.round(moment_var("v_state"), 9).alias("var"),
           ).collect()}
    import statistics
    assert got["a"] == (3.0, round(statistics.variance([1.0, 2.0, 6.0]), 9))
    assert got["b"] == (6.0, round(statistics.variance([5.0, 7.0]), 9))
    assert got["c"] == (9.0, None)


# --- stateful streaming sequenceCount --------------------------------------


def test_streaming_sequence_count_equals_batch(spark, event_stream, tmp_path):
    """Max emitted count per user == the batch sequence_count over the
    same files, with absent streaming users == batch zeros (the stream
    only emits when a chain completes). sf0.001 has no (user, ts) ties
    (asserted in-test), so no tiebreak is needed for determinism."""
    from clickhouse_etl_spark.operators.events import sequence_count

    events = load_table(spark, SF_SMOKE, "events")
    assert (
        events.groupBy("user_id", "ts").count().filter("count > 1").count()
        == 0
    )
    out = st.run_stream_to_memory(
        spark,
        st.streaming_sequence_count(event_stream, _FUNNEL_STEPS, 86400),
        "t_seqcnt",
        str(tmp_path / "sc"),
        output_mode="append",
    )
    got = {
        r.user_id: r.n
        for r in out.groupBy("user_id")
        .agg(F.max("n_sequences").alias("n"))
        .collect()
    }
    want = {
        r.user_id: r.n_sequences
        for r in sequence_count(events, _FUNNEL_STEPS, 86400).collect()
    }
    assert all(got[u] == n for u, n in want.items() if n > 0)
    assert set(got) == {u for u, n in want.items() if n > 0}
    assert any(n > 0 for n in want.values())  # non-vacuous


def test_streaming_sequence_count_chains_across_microbatches(spark, tmp_path):
    """A chain whose steps straddle the micro-batch boundary completes,
    a second full chain in the later batch counts separately
    (non-overlapping greedy resumes after the completing event), and an
    abandoned-window user stays at zero emissions."""
    import os as _os
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-01-01").value // 1000  # micros
    s = 1_000_000
    rows = [
        # u1: signup+view in file A; purchase in file B -> 1, then a
        # full signup/view/purchase in B -> 2
        (1, base, 1, "signup"), (2, base + s, 1, "view"),
        (3, base + 2 * s, 1, "purchase"),
        (4, base + 3 * s, 1, "signup"), (5, base + 4 * s, 1, "view"),
        (6, base + 5 * s, 1, "purchase"),
        # u2: signup in A; view in B past the 60s window -> no completion
        (7, base, 2, "signup"), (8, base + 100 * s, 2, "view"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    pdf["ts"] = pdf["ts"] * 1000  # micros -> nanos (landing-zone encoding)
    zone = tmp_path / "sczone"
    zone.mkdir()
    a = pdf[pdf.event_id.isin([1, 2, 7])]
    b = pdf[~pdf.event_id.isin([1, 2, 7])]
    for name, part in (("a.parquet", a), ("b.parquet", b)):
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            str(zone / name),
        )
    now = _time.time()
    _os.utime(zone / "a.parquet", (now - 60, now - 60))
    _os.utime(zone / "b.parquet", (now, now))
    stream = st.read_event_stream(spark, str(zone), max_files_per_trigger=1)
    out = st.run_stream_to_memory(
        spark,
        st.streaming_sequence_count(stream, _FUNNEL_STEPS, window_seconds=60),
        "t_seqcnt_2b",
        str(tmp_path / "sc2"),
        output_mode="append",
    )
    got = {
        r.user_id: r.n
        for r in out.groupBy("user_id")
        .agg(F.max("n_sequences").alias("n"))
        .collect()
    }
    assert got == {1: 2}


def test_streaming_sequence_count_tiebreak_matches_batch(spark, tmp_path):
    """Equal-timestamp events sort stably on (ts, tiebreak) inside a
    micro-batch, matching the batch operator's tiebreak_col semantics.
    The fixture's tie is order-SENSITIVE: a completing purchase and a
    re-anchoring signup share a timestamp — purchase-first (the
    event_id order) leaves the signup alive to start chain #2 (n=2);
    signup-first would see the completion wipe it (n=1)."""
    import os as _os
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_etl_spark.operators.events import sequence_count

    base = pd.Timestamp("2024-01-01").value // 1000  # micros
    s = 1_000_000
    rows = [
        (1, base, 1, "signup"), (2, base + s, 1, "view"),
        (3, base + 2 * s, 1, "purchase"),  # completes chain 1 ...
        (4, base + 2 * s, 1, "signup"),    # ... tied re-anchor survives
        (5, base + 3 * s, 1, "view"), (6, base + 4 * s, 1, "purchase"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    pdf["ts"] = pdf["ts"] * 1000  # micros -> nanos (landing-zone encoding)
    zone = tmp_path / "tiezone"
    zone.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(zone / "a.parquet"),
    )
    now = _time.time()
    _os.utime(zone / "a.parquet", (now, now))
    stream = st.read_event_stream(spark, str(zone))
    out = st.run_stream_to_memory(
        spark,
        st.streaming_sequence_count(
            stream, _FUNNEL_STEPS, window_seconds=86400,
            tiebreak_col="event_id",
        ),
        "t_seqcnt_tie",
        str(tmp_path / "sctie"),
        output_mode="append",
    )
    got = {
        r.user_id: r.n
        for r in out.groupBy("user_id")
        .agg(F.max("n_sequences").alias("n"))
        .collect()
    }
    batch_events = spark.createDataFrame(
        pdf.assign(ts=pd.to_datetime(pdf["ts"], unit="ns"))
    )
    want = {
        r.user_id: r.n_sequences
        for r in sequence_count(
            batch_events, _FUNNEL_STEPS, 86400, tiebreak_col="event_id"
        ).collect()
    }
    assert want == {1: 2}
    assert got == want


def test_streaming_sequence_count_null_tiebreak_matches_batch(spark, tmp_path):
    """NULL tiebreak values among tied-ts events sort FIRST in the
    micro-batch (na_position='first'), matching Spark's ascending
    nulls-first default in the batch twin. The fixture's tie is
    order-SENSITIVE: the completing purchase carries a NULL event_id
    and ties with a re-anchoring signup — NULL-first means the
    purchase completes chain #1 before the signup re-anchors (n=2);
    NULL-last would let the completion wipe the new anchor (n=1)."""
    import os as _os
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_etl_spark.operators.events import sequence_count

    base = pd.Timestamp("2024-01-01").value // 1000  # micros
    s = 1_000_000
    rows = [
        (1, base, 1, "signup"), (2, base + s, 1, "view"),
        (None, base + 2 * s, 1, "purchase"),  # tied completer, NULL id
        (4, base + 2 * s, 1, "signup"),       # tied re-anchor
        (5, base + 3 * s, 1, "view"), (6, base + 4 * s, 1, "purchase"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["event_id"] = pdf["event_id"].astype("Int64")
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    pdf["ts"] = pdf["ts"] * 1000  # micros -> nanos (landing-zone encoding)
    zone = tmp_path / "nulltiezone"
    zone.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(zone / "a.parquet"),
    )
    now = _time.time()
    _os.utime(zone / "a.parquet", (now, now))
    stream = st.read_event_stream(spark, str(zone))
    out = st.run_stream_to_memory(
        spark,
        st.streaming_sequence_count(
            stream, _FUNNEL_STEPS, window_seconds=86400,
            tiebreak_col="event_id",
        ),
        "t_seqcnt_nulltie",
        str(tmp_path / "scnulltie"),
        output_mode="append",
    )
    got = {
        r.user_id: r.n
        for r in out.groupBy("user_id")
        .agg(F.max("n_sequences").alias("n"))
        .collect()
    }
    # build the batch twin with a TRUE NULL (pandas Int64 NaN reaches
    # Spark as a float NaN, which sorts LAST — not the same row)
    batch_rows = [
        (None if e is None else int(e),
         pd.to_datetime(t * 1000, unit="ns").to_pydatetime(), int(u), et)
        for e, t, u, et in rows
    ]
    batch_events = spark.createDataFrame(
        batch_rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    want = {
        r.user_id: r.n_sequences
        for r in sequence_count(
            batch_events, _FUNNEL_STEPS, 86400, tiebreak_col="event_id"
        ).collect()
    }
    assert want == {1: 2}
    assert got == want
