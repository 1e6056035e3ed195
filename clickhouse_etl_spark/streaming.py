"""Structured Streaming tier — the real readStream/withWatermark module.

The reference has no streaming surface (SURVEY.md §2.10): its closest
analog is the daily high-watermark incremental batch (S7). This module is
the engine's extension tier mandated by the north star: the SAME windowed
aggregations exposed in ``queries/streaming_batch.py`` as batch queries,
executed as incremental streaming jobs over a file source.

Design notes (100 TB):
- File-source streaming scales by listing + splitting new files per
  micro-batch; at production scale the source would be Kafka — swap
  ``read_event_stream`` only, the window logic is source-agnostic.
- ``withWatermark`` bounds state: late events beyond the watermark are
  dropped and completed windows are evicted from the state store. Without
  it, windowed state grows forever.
- Batch ≡ stream equivalence is the correctness contract: run the same
  window over the same files with ``Trigger.AvailableNow`` and the final
  ("append"-complete) output must equal the batch groupBy — asserted in
  tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_etl_spark.catalog import ensure_runtime_confs

# Landing-zone symlink dirs created for single-file stream sources,
# keyed by the real file path; reused across calls, removed at exit.
_SYMLINK_ZONES: dict[str, str] = {}

# events.parquet physical schema (streaming requires an explicit schema).
# The driver has shipped two physical encodings of ts across rounds:
# TIMESTAMP(NANOS), which arrives as a long under nanosAsLong, and plain
# TIMESTAMP(MICROS), which arrives as TimestampType (NTZ inference off).
# read_event_stream probes the footer via a batch read and picks the
# matching schema + normalization.
def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


EVENTS_RAW_SCHEMA = _events_schema(T.LongType())


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a parquet landing zone of events.

    ``path`` may be a directory or a glob (e.g. ``{sf_dir}/events.parquet``).
    ``maxFilesPerTrigger`` throttles micro-batch size (ingestion rate
    control) — leave None for AvailableNow back-fills.
    """
    import atexit
    import os
    import shutil
    import tempfile

    ensure_runtime_confs(spark)
    # Footer-only probe: under nanosAsLong a TIMESTAMP(NANOS) ts infers as
    # bigint; TIMESTAMP(MICROS) infers as timestamp (NTZ inference off).
    ts_is_long = dict(spark.read.parquet(path).dtypes).get("ts") == "bigint"
    schema = _events_schema(T.LongType() if ts_is_long else T.TimestampType())
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(path):
        # Spark's file stream source requires a DIRECTORY (it pins
        # basePath to the source path internally). For a single concrete
        # file, build a tiny landing-zone dir holding a symlink — the
        # shape a real ingestion directory has. Zones are reused per
        # source file and removed at interpreter exit so repeated calls
        # don't leak temp dirs for the process lifetime.
        real = os.path.abspath(path)
        zone = _SYMLINK_ZONES.get(real)
        if zone is None or not os.path.isdir(zone):
            zone = tempfile.mkdtemp(prefix="event_stream_zone_")
            os.symlink(real, os.path.join(zone, os.path.basename(real)))
            _SYMLINK_ZONES[real] = zone
            atexit.register(shutil.rmtree, zone, ignore_errors=True)
        path = zone
    raw = reader.parquet(path)
    if ts_is_long:
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data watermark.

    Streaming twin of ``queries/streaming_batch.stream_tumbling_hourly``
    (identical output schema; batch ≡ stream asserted in tests).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts (streaming twin of stream_sliding_2h)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of silence.

    Streaming twin of ``stream_session_30m`` — ``session_window`` is the
    built-in stateful merge (no applyInPandasWithState needed for pure
    gap-sessionization).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


FIRST_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("first_event_id", T.LongType()),
    ]
)

_FIRST_SEEN_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("funnel_level", T.IntegerType()),
        T.StructField("anchor_ts", T.TimestampType()),
    ]
)

# (anchor micros, reached level, last step's micros) per user
_FUNNEL_STATE = T.StructType(
    [
        T.StructField("t1_us", T.LongType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("t_prev_us", T.LongType()),
    ]
)


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    watermark: str = "2 hours",
    expire_closed_windows: bool = False,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """The streaming twin of :func:`operators.events.window_funnel`
    (ClickHouse ``windowFunnel``, greedy-from-earliest semantics):
    per-user funnel progress maintained as explicit GroupState across
    micro-batches via ``applyInPandasWithState``.

    State per user is three scalars — (anchor micros, reached level,
    previous step's micros) — O(users), not O(events): the incremental
    form of the batch operator's one-join-per-step plan. Each batch's
    events are scanned in event-time order; a row advances the funnel
    iff it matches the NEXT step, is strictly later than the previous
    step's event, and is within ``window_seconds`` of the anchor —
    exactly the batch operator's min-ts chain, because a sorted scan's
    first match IS the min. Emits one ``(user_id, funnel_level,
    anchor_ts)`` row whenever a user anchors or advances; the consumer
    takes each user's max level (batch ≡ stream asserted in
    tests/test_streaming.py, including across micro-batch boundaries).

    Caveat (inherent to one-pass stateful funnels): events must reach
    the operator in event-time order ACROSS micro-batches for chains
    that span batches — a step-2 event processed before its step-1
    anchor in an EARLIER batch cannot retroactively count. Within a
    batch, order doesn't matter: ALL of a user's Arrow chunks are
    concatenated before the one sort (a per-chunk sort would lose
    chains spanning chunk boundaries). For replayed file sets
    (back-fills) the source delivers in file order, so sort the
    landing files by time — the same discipline every event-time
    state machine (sessionization included) already needs.
    ``tiebreak_col`` mirrors the batch operator's: equal-ts events
    within a batch sort stably on ``(ts, tiebreak)`` instead of
    quicksort-arbitrary order, with NULL tiebreaks FIRST (Spark's
    ascending-sort default, so ties agree with the batch twin); equal-ts
    events split ACROSS batches keep arrival order (the cross-batch
    caveat above).

    State: with the default ``expire_closed_windows=False`` the op runs
    ``NoTimeout`` — exact greedy-from-earliest semantics require the
    anchor to survive arbitrarily long quiet periods, so per-user
    entries are NEVER evicted (state is O(distinct users) for the
    stream's lifetime, same trade-off as :func:`first_seen_per_key`);
    ``watermark`` then only declares the input's event-time horizon.
    ``expire_closed_windows=True`` is the bounded-state form for an
    unbounded user universe: ``EventTimeTimeout`` evicts a user's state
    once the watermark passes ``anchor + window_seconds`` — the funnel
    could never advance again, so every level already emitted stays
    correct — and the SEMANTIC trade is explicit: a step-1 event
    arriving after eviction RE-ANCHORS a fresh funnel (per-window
    funnels over the recent horizon, ClickHouse-windowFunnel-style)
    instead of being ignored under the forever-first anchor. State
    becomes O(users active within one window+watermark horizon).
    NULL timestamps are dropped before the state function.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    # plain (non-underscore) derived names: pandas itertuples renames
    # underscore-leading fields positionally, which would break getattr
    flags = [f"etl_s{i}" for i in range(k)]
    sort_cols = ["etl_ts_us"] + (["etl_tb"] if tiebreak_col else [])
    with_flags = (
        events.withWatermark("ts", watermark)
        .selectExpr(
            "user_id",
            # event-time timeout requires the watermark-tagged column to
            # survive into the stateful operator's child plan
            *(["ts"] if expire_closed_windows else []),
            "unix_micros(ts) AS etl_ts_us",
            *[f"CAST(({s}) AS BOOLEAN) AS {f}" for s, f in zip(steps, flags)],
            *([f"{tiebreak_col} AS etl_tb"] if tiebreak_col else []),
        )
        .filter("etl_ts_us IS NOT NULL")
    )
    window_us = int(window_seconds) * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        if expire_closed_windows and state.hasTimedOut:
            # watermark passed anchor + window: the funnel can never
            # advance — evict; a later step-1 event re-anchors fresh
            state.remove()
            return
        if state.exists:
            t1, level, t_prev = state.get
        else:
            t1, level, t_prev = None, 0, None
        if (
            expire_closed_windows
            and t1 is not None
            and state.getCurrentWatermarkMs() > (t1 + window_us) // 1000
        ):
            # the watermark passed this anchor's window but data for the
            # user arrived in the SAME batch the timeout would have
            # fired (data pre-empts the timeout callback): apply the
            # eviction here so the batch's step-1 events re-anchor
            # instead of being swallowed by the dead state
            t1, level, t_prev = None, 0, None
        changed = False
        # one sort over the WHOLE batch: a user's events can arrive as
        # several Arrow chunks, and a per-chunk sort would scan a later
        # chunk's earlier-ts rows after this chunk's later ones
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        batch = frames[0] if len(frames) == 1 else pd.concat(frames)
        for row in batch.sort_values(
            sort_cols, kind="stable", na_position="first"
        ).itertuples(
            index=False
        ):
            ts_us = int(row.etl_ts_us)
            if t1 is None:
                if getattr(row, "etl_s0"):
                    t1, level, t_prev = ts_us, 1, ts_us
                    changed = True
                continue
            if level < k and getattr(row, f"etl_s{level}"):
                if ts_us > t_prev and ts_us <= t1 + window_us:
                    level += 1
                    t_prev = ts_us
                    changed = True
        if not changed:
            return
        state.update((t1, level, t_prev))
        if expire_closed_windows:
            # late-arriving anchors can close behind the current
            # watermark; a timeout in the past is rejected, so clamp one
            # tick ahead (eviction then fires on the next batch)
            state.setTimeoutTimestamp(
                max((t1 + window_us) // 1000, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "funnel_level": [level],
                "anchor_ts": [pd.Timestamp(t1, unit="us")],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return with_flags.groupBy("user_id").applyInPandasWithState(
        fn,
        FUNNEL_SCHEMA,
        _FUNNEL_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout
        if expire_closed_windows
        else GroupStateTimeout.NoTimeout,
    )


SEQ_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sequences", T.LongType()),
    ]
)

# per-level candidate chains (anchors[i]/lasts[i] = the level-(i+1)
# candidate, NULL when empty) + the running completed-chain count
_SEQ_COUNT_STATE = T.StructType(
    [
        T.StructField("anchors", T.ArrayType(T.LongType(), True)),
        T.StructField("lasts", T.ArrayType(T.LongType(), True)),
        T.StructField("n", T.LongType()),
    ]
)


def streaming_sequence_count(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    watermark: str = "2 hours",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """The streaming twin of :func:`operators.events.sequence_count`
    (ClickHouse ``sequenceCount``): greedy non-overlapping completed
    chains per user, maintained as explicit GroupState across
    micro-batches via ``applyInPandasWithState``.

    State per user is O(k): the k-1 candidate (anchor, last) pairs plus
    the running count — EXACTLY the batch operator's automaton state
    (max-anchor dominance, window expiry, reset-on-completion,
    re-anchoring), carried between batches instead of between loop
    iterations, so batch ≡ stream holds by construction on in-order
    input (asserted in tests/test_streaming.py, including a chain whose
    steps straddle a micro-batch boundary).

    Emits ``(user_id, n_sequences)`` whenever the user's count
    INCREASES (the count is monotone; the consumer takes each user's
    max). Users whose pattern never completes emit nothing — the batch
    operator returns an explicit 0 row for them, so the batch ≡ stream
    comparison treats absent as 0.

    Same cross-batch ordering caveat as :func:`streaming_funnel`:
    events must reach the operator in event-time order ACROSS
    micro-batches for chains that span batches (within a batch the one
    concatenated sort handles any arrival order). ``tiebreak_col``
    mirrors the batch operator's: equal-ts events WITHIN a batch sort
    stably on ``(ts, tiebreak)`` instead of in quicksort-arbitrary
    order, NULL tiebreaks first (Spark's ascending-sort default), so
    tied-ts batches agree with the batch twin; ties that
    straddle a micro-batch boundary remain ordered by arrival (the
    cross-batch caveat above — state carries no lookbehind to reorder
    them). Runs ``NoTimeout``:
    the COUNT must survive quiet periods for the stream's lifetime, so
    state is O(distinct users) — the candidate pairs themselves expire
    naturally through the window check, only the two small arrays and
    a long persist per user.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    flags = [f"etl_s{i}" for i in range(k)]
    sort_cols = ["etl_ts_us"] + (["etl_tb"] if tiebreak_col else [])
    with_flags = (
        events.withWatermark("ts", watermark)
        .selectExpr(
            "user_id",
            "unix_micros(ts) AS etl_ts_us",
            *[f"CAST(({s}) AS BOOLEAN) AS {f}" for s, f in zip(steps, flags)],
            *([f"{tiebreak_col} AS etl_tb"] if tiebreak_col else []),
        )
        .filter("etl_ts_us IS NOT NULL")
    )
    window_us = int(window_seconds) * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            anchors, lasts, n = state.get
            chains = [
                None if a is None else (a, l)
                for a, l in zip(anchors, lasts)
            ]
        else:
            chains = [None] * max(k - 1, 0)
            n = 0
        n0 = n
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        batch = frames[0] if len(frames) == 1 else pd.concat(frames)
        # chains[lvl-1] here == the batch operator's chains[lvl] (its
        # index 0 slot is never used); same scan, verbatim semantics
        for row in batch.sort_values(
            sort_cols, kind="stable", na_position="first"
        ).itertuples(
            index=False
        ):
            ts_us = int(row.etl_ts_us)
            for i in range(k - 1):
                c = chains[i]
                if c is not None and ts_us > c[0] + window_us:
                    chains[i] = None
            completed = False
            for lvl in range(k - 1, 0, -1):  # longest candidates first
                c = chains[lvl - 1]
                if c is None or not getattr(row, f"etl_s{lvl}"):
                    continue
                if ts_us <= c[1]:  # strictly-later, ties never chain
                    continue
                if lvl + 1 == k:
                    n += 1
                    chains = [None] * (k - 1)
                    completed = True
                    break
                nxt = chains[lvl]
                if nxt is None or c[0] > nxt[0]:
                    chains[lvl] = (c[0], ts_us)
            if completed:
                continue
            if getattr(row, "etl_s0"):
                if k == 1:
                    n += 1
                elif chains[0] is None or ts_us > chains[0][0]:
                    chains[0] = (ts_us, ts_us)
        state.update((
            [None if c is None else c[0] for c in chains],
            [None if c is None else c[1] for c in chains],
            n,
        ))
        if n > n0:
            yield pd.DataFrame({"user_id": [key[0]], "n_sequences": [n]})

    from pyspark.sql.streaming.state import GroupStateTimeout

    return with_flags.groupBy("user_id").applyInPandasWithState(
        fn,
        SEQ_COUNT_SCHEMA,
        _SEQ_COUNT_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def first_seen_per_key(
    events: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator: emit each (user_id, event_type)'s FIRST
    event exactly once across the whole stream — a streaming dedup that
    the built-in window aggregations can't express (state must survive
    micro-batches and suppress later re-emissions).

    ``applyInPandasWithState``: per-key Arrow-batched Python with an
    explicit GroupState; one boolean per key, so state size is
    O(distinct keys). The op runs with ``NoTimeout`` — exact first-seen
    semantics require remembering every key for the stream's lifetime,
    so entries are NEVER evicted; over an unbounded key space swap in
    ``GroupStateTimeout.EventTimeTimeout`` + ``setTimeoutTimestamp`` to
    forget keys idle past the watermark (trade-off: a key silent longer
    than the horizon re-emits as first-seen). Batch twin:
    groupBy(min_by) — asserted equal in tests; cross-batch suppression
    asserted with a 2-file source at maxFilesPerTrigger=1.
    """
    import pandas as pd

    def fn(key, pdfs, state):
        if state.exists:
            return  # key already emitted in an earlier micro-batch
        best = None
        for pdf in pdfs:
            cand = pdf.sort_values(["ts", "event_id"]).head(1)
            best = (
                cand
                if best is None
                else pd.concat([best, cand]).sort_values(["ts", "event_id"]).head(1)
            )
        if best is None or best.empty:
            return
        state.update((True,))
        row = best.iloc[0]
        yield pd.DataFrame(
            {
                "user_id": [row["user_id"]],
                "event_type": [row["event_type"]],
                "first_ts": [row["ts"]],
                "first_event_id": [row["event_id"]],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            fn,
            FIRST_SEEN_SCHEMA,
            _FIRST_SEEN_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state — the ingestion-side
    guard a training-data pipeline runs before anything else (the batch
    ``ns_dedup_exact`` twin, §dedup tier).

    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes it, so state is O(keys per watermark
    window) instead of O(all keys ever) — the difference between a
    stream that runs for years and one that OOMs. Exactly-once *within*
    the watermark horizon; duplicates arriving later than the watermark
    are the documented trade (same contract ClickHouse's ReplacingMergeTree
    gives: eventual, bounded-window collapse).

    Batch twin for tests: ``dropDuplicates(keys)`` over the same files.
    """
    keys = list(keys or ["user_id", "event_type", ts_col])
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts_col: str,
    right_ts_col: str,
    within: str = "1 HOUR",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INNER interval join: right rows whose timestamp
    falls in ``[left_ts, left_ts + within]`` for the same key — the
    canonical attribution shape (impression → conversion within an
    hour), here as a real two-stream join.

    State stays BOUNDED because both sides carry watermarks AND the join
    condition bounds right_ts relative to left_ts: Spark derives state
    eviction for each side from the watermark + range (the documented
    stream-stream inner-join requirement; without the time bound, both
    sides' state would grow forever).

    Column names across the two inputs must be disjoint (rename before
    joining — attribution joins need role-specific names anyway). The
    SAME code path runs on batch frames (``withWatermark`` is a no-op
    there), which is how tests pin batch ≡ stream equivalence.
    """
    if set(left.columns) & set(right.columns):
        clash = sorted(set(left.columns) & set(right.columns))
        raise ValueError(
            f"left/right column names must be disjoint, both have: {clash}"
        )
    lw = left.withWatermark(left_ts_col, watermark)
    rw = right.withWatermark(right_ts_col, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts_col) >= F.col(left_ts_col))
        & (
            F.col(right_ts_col)
            <= F.col(left_ts_col) + F.expr(f"INTERVAL {within}")
        )
    )
    return lw.join(rw, cond, "inner")


def foreach_batch_upsert(
    streaming_df: DataFrame,
    table_root: str,
    keys: list[str],
    order_col: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
):
    """Continuous incremental merge: each micro-batch upserts into a
    versioned snapshot table (sinks.staging + sinks.upsert composed under
    ``foreachBatch``) — the streaming form of the reference's daily
    "extract → replace table" DAGs, without the full rewrite.

    Exactly-once story: ``foreachBatch`` replays a failed batch with the
    same ``batch_id``; ``publish_snapshot`` writes ``v=<batch_id>`` and
    flips the ``_CURRENT`` pointer last, so a replay overwrites its own
    half-written snapshot instead of corrupting the published one —
    idempotent per batch id, atomic per publish.

    Scale: the merge is :func:`~clickhouse_etl_spark.sinks.upsert.
    merge_upsert`'s single key-shuffle; the rewrite cost is O(current
    table) per batch here (parquet has no in-place update), which is the
    lever a real deployment swaps for partition-pruned rewrites (merge
    only partitions the delta touches — see sinks/upsert.py's partition
    note) or a native MERGE sink (Delta/Iceberg).
    """
    from clickhouse_etl_spark.sinks.staging import publish_snapshot, read_current
    from clickhouse_etl_spark.sinks.upsert import merge_upsert

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # ONLY a missing _CURRENT pointer means "first batch, no table
        # yet". Any other read failure (corrupt footer, FS hiccup,
        # permissions) must propagate — merging against an empty table
        # and re-publishing would silently discard every accumulated row.
        try:
            current = read_current(spark, table_root)
        except FileNotFoundError:
            current = None
        if current is None:
            merged = merge_upsert(
                batch_df.limit(0), batch_df, keys, order_col
            )
        else:
            merged = merge_upsert(current, batch_df, keys, order_col)
        # Materialize BEFORE publishing: the merge reads the _CURRENT
        # snapshot it is about to supersede.
        merged = merged.localCheckpoint(eager=True)
        publish_snapshot(merged, table_root, version=f"{batch_id:020d}")

    q = (
        streaming_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"foreach_batch_upsert did not finish within {timeout_sec}s"
        )
    return q


_SUMMING_MARKER = "_SUMMING_SINK.json"


def _read_summing_marker(table_root: str) -> dict | None:
    import json
    from pathlib import Path

    p = Path(table_root) / _SUMMING_MARKER
    if not p.exists():
        return None
    return json.loads(p.read_text())


def _write_summing_marker(table_root: str, checkpoint: str) -> None:
    import json
    import os
    from pathlib import Path

    root = Path(table_root)
    root.mkdir(parents=True, exist_ok=True)
    tmp = root / f"{_SUMMING_MARKER}.tmp"
    tmp.write_text(json.dumps({"checkpoint": checkpoint}))
    os.replace(tmp, root / _SUMMING_MARKER)  # atomic on POSIX


def _apply_summing_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_root: str,
    keys: list[str],
    sum_cols: list[str],
    min_cols: tuple = (),
    max_cols: tuple = (),
    checkpoint_dir: str = "",
    hll_cols: dict | None = None,
    hist_cols: dict | None = None,
    moment_cols: dict | None = None,
) -> bool:
    """One micro-batch of :func:`foreach_batch_summing` (module-level so
    tests can drive replay directly). Returns False when the batch was
    SKIPPED as already applied.

    Replay/ownership guard: unlike merge_upsert (last-write-wins,
    replay-idempotent by construction), an additive merge DOUBLE-COUNTS
    a replayed batch. Two mechanisms, split by what each must be atomic
    with:

    - The APPLIED id is the published snapshot's version (the
      ``_CURRENT`` flip is atomic with it): ``version >= batch_id`` →
      replayed batch, skipped. A separate applied-id record would open
      a crash window between publish and record where a replay
      re-merges against the already-merged snapshot.
    - An OWNERSHIP marker (``_SUMMING_SINK.json``, the checkpoint
      identity) is written before the first publish. A DIFFERENT
      checkpoint raises: batch ids restart at 0 under a fresh
      checkpoint while the stream re-reads the whole source, so
      continuing would either silently drop every restarted batch
      (id-compare) or double-count the table (no compare) — reuse the
      original checkpoint or start a fresh table_root. Published
      snapshots with NO marker also raise (the root belongs to some
      other writer, e.g. a MaterializedView — integer version numbers
      alone cannot distinguish it).
    """
    import os

    from clickhouse_etl_spark.sinks.staging import (
        current_version,
        publish_snapshot,
        read_current,
    )
    from clickhouse_etl_spark.sinks.upsert import summing_merge

    spark = batch_df.sparkSession
    ckpt = os.path.abspath(checkpoint_dir) if checkpoint_dir else ""
    marker = _read_summing_marker(table_root)
    ver = current_version(table_root)
    if marker is None:
        if ver is not None:
            raise RuntimeError(
                f"{table_root!r} has published snapshots but no summing-"
                "sink marker: it belongs to another writer — "
                "foreach_batch_summing must own its table_root"
            )
        _write_summing_marker(table_root, ckpt)
    elif marker.get("checkpoint") != ckpt:
        raise RuntimeError(
            f"summing sink {table_root!r} is owned by checkpoint "
            f"{marker.get('checkpoint')!r}, not {ckpt!r}: a new "
            "checkpoint restarts batch ids over a re-read source, "
            "which cannot be folded additively — reuse the original "
            "checkpoint or start a fresh table_root"
        )
    if ver is not None:
        if int(ver) >= batch_id:
            return False  # replayed batch — already folded in
        current = read_current(spark, table_root)
    else:
        current = None
    merged = summing_merge(
        current, batch_df, keys, sum_cols, min_cols, max_cols,
        hll_cols=hll_cols, hist_cols=hist_cols, moment_cols=moment_cols,
    )
    # Materialize BEFORE publishing: the merge reads the _CURRENT
    # snapshot it is about to supersede.
    merged = merged.localCheckpoint(eager=True)
    publish_snapshot(merged, table_root, version=f"{batch_id:020d}")
    return True


def foreach_batch_summing(
    streaming_df: DataFrame,
    table_root: str,
    keys: list[str],
    sum_cols: list[str],
    checkpoint_dir: str,
    min_cols: tuple = (),
    max_cols: tuple = (),
    timeout_sec: int = 120,
    hll_cols: dict | None = None,
    hist_cols: dict | None = None,
    moment_cols: dict | None = None,
):
    """Continuous incremental AGGREGATE maintenance: each micro-batch
    folds its per-key states — sum/min/max, plus the mergeable HLL
    distinct (``hll_cols``), fixed-bin histogram (``hist_cols``), and
    second-moment mean/variance (``moment_cols``) families, all with
    ``summing_merge``'s semantics — into a versioned snapshot
    (sinks.staging + sinks.upsert.summing_merge under ``foreachBatch``)
    — the streaming form of a SummingMergeTree table, with an explicit
    replay guard because additive merges are not replay-idempotent
    (see :func:`_apply_summing_batch`).

    Unlike a windowed streaming aggregation this carries NO watermark
    state in the engine: per-key running totals live in the snapshot,
    so key cardinality is bounded by the TABLE, not by state-store
    memory, and late rows simply fold in whenever they arrive.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _apply_summing_batch(
            batch_df, batch_id, table_root, keys, sum_cols, min_cols, max_cols,
            checkpoint_dir=checkpoint_dir,
            hll_cols=hll_cols, hist_cols=hist_cols, moment_cols=moment_cols,
        )

    q = (
        streaming_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"foreach_batch_summing did not finish within {timeout_sec}s"
        )
    return q


def run_stream_to_memory(
    spark: SparkSession,
    streaming_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
    output_mode: str = "complete",
) -> DataFrame:
    """Execute a streaming aggregation to completion (AvailableNow) and
    return the final result as a batch DataFrame (memory sink). Windowed
    aggs use ``complete``; arbitrary-stateful ops (applyInPandasWithState)
    require ``append``. Test/backfill helper — production would
    writeStream to parquet/Kafka with the same trigger.
    """
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        # Timed out: the memory table holds a PARTIAL result and the query
        # is still running against the session — stop it and fail loudly
        # rather than silently returning incomplete data.
        q.stop()
        raise TimeoutError(
            f"streaming query {query_name!r} did not finish within "
            f"{timeout_sec}s; stopped to avoid returning partial results"
        )
    return spark.table(query_name)
