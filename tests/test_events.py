"""Event-sequence analytics (sessionize / funnel / retention) — DuckDB
oracles on the sf0.001 events table + micro semantics checks."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.operators.events import (
    retention_flags,
    retention_summary,
    sequence_match,
    sessionize,
    window_funnel,
)
from tools.oracle_check import canon_rows

SF_DIR = "/root/testdata/sf0.001"


def _assert_matches(sdf, oracle_sql):
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
        )
        cur = con.execute(oracle_sql)
        dcols, drows = [d[0] for d in cur.description], cur.fetchall()
    finally:
        con.close()
    sc, sr = canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    dc, dr = canon_rows(dcols, drows)
    assert sc == dc, f"columns differ: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"rowcount: spark={len(sr)} duckdb={len(dr)}"
    assert sr == dr, "canonicalized values differ"


def test_sessionize_oracle(spark):
    events = load_table(spark, SF_DIR, "events")
    out = sessionize(events, gap="30 minutes").select(
        "user_id", "event_id", "session_id"
    )
    _assert_matches(
        out,
        """
        SELECT user_id, event_id,
               sum(CASE WHEN prev_ts IS NULL
                        OR ts > prev_ts + INTERVAL 30 MINUTE
                   THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
          FROM events
        )
        """,
    )


def test_window_funnel_oracle(spark):
    events = load_table(spark, SF_DIR, "events")
    steps = [
        "event_type = 'signup'",
        "event_type = 'view'",
        "event_type = 'purchase'",
    ]
    out = window_funnel(events, steps, window_seconds=86400)
    _assert_matches(
        out,
        """
        WITH t1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'signup' GROUP BY user_id
        ),
        t2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN t1 USING (user_id)
          WHERE e.event_type = 'view' AND e.ts > t1.t1
            AND e.ts <= t1.t1 + INTERVAL 86400 SECONDS
          GROUP BY e.user_id
        ),
        t3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN t1 USING (user_id) JOIN t2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > t2.t2
            AND e.ts <= t1.t1 + INTERVAL 86400 SECONDS
          GROUP BY e.user_id
        )
        SELECT t1.user_id,
               CASE WHEN t3.user_id IS NOT NULL THEN 3
                    WHEN t2.user_id IS NOT NULL THEN 2
                    ELSE 1 END AS funnel_level
        FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
        """,
    )


def test_window_funnel_micro(spark):
    """Window cutoff and ordering: step events outside the window or out
    of order don't count."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # u1: full chain inside window.
        (1, base, "a"), (1, base + dt.timedelta(seconds=10), "b"),
        (1, base + dt.timedelta(seconds=20), "c"),
        # u2: step2 lands after the window -> level 1.
        (2, base, "a"), (2, base + dt.timedelta(seconds=120), "b"),
        # u3: step2 precedes step1 -> level 1.
        (3, base, "b"), (3, base + dt.timedelta(seconds=5), "a"),
        # u4: no step1 -> absent.
        (4, base, "b"), (4, base + dt.timedelta(seconds=1), "c"),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: r.funnel_level
        for r in window_funnel(
            events,
            ["event_type = 'a'", "event_type = 'b'", "event_type = 'c'"],
            window_seconds=60,
        ).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1}


def test_sequence_match_is_full_funnel(spark):
    events = load_table(spark, SF_DIR, "events")
    steps = ["event_type = 'signup'", "event_type = 'view'",
             "event_type = 'purchase'"]
    matched = {
        r.user_id: r.matched
        for r in sequence_match(events, steps, 86400).collect()
    }
    levels = {
        r.user_id: r.funnel_level
        for r in window_funnel(events, steps, 86400).collect()
    }
    assert set(matched) == set(levels)
    assert all(matched[u] == (lv == 3) for u, lv in levels.items())
    assert any(matched.values()) and not all(matched.values())


def test_retention_oracle(spark):
    events = load_table(spark, SF_DIR, "events")
    conds = [
        "event_type = 'signup'",
        "event_type = 'click'",
        "event_type = 'purchase'",
    ]
    out = retention_flags(events, conds)
    _assert_matches(
        out,
        """
        SELECT user_id,
               max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r2,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r3
        FROM events GROUP BY user_id
        """,
    )


def test_retention_summary_consistent(spark):
    events = load_table(spark, SF_DIR, "events")
    conds = ["event_type = 'signup'", "event_type = 'purchase'"]
    flags = retention_flags(events, conds)
    summary = retention_summary(events, conds).first()
    assert summary.n_r1 == flags.agg(F.sum("r1")).first()[0]
    assert summary.n_r2 == flags.agg(F.sum("r2")).first()[0]
    assert summary.n_r2 <= summary.n_r1


def test_sessionize_gap_semantics(spark):
    """Events exactly at the gap boundary stay in the same session;
    one tick past starts a new one."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base),
        (1, 2, base + dt.timedelta(minutes=30)),          # == gap: same
        (1, 3, base + dt.timedelta(minutes=60, seconds=1)),  # > gap: new
    ]
    events = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    got = {r.event_id: r.session_id for r in sessionize(events).collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_fill_time_gaps_explosion_guard(spark):
    """A mis-sized step over a long range must raise in-pass, not OOM
    building one giant sequence array."""
    import pytest

    from clickhouse_etl_spark.operators.events import fill_time_gaps

    df = spark.createDataFrame(
        [("g", "2020-01-01 00:00:00", 1), ("g", "2024-01-01 00:00:00", 2)],
        "k string, ts string, n int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(Exception, match="buckets"):
        fill_time_gaps(
            df, "ts", "1 second", ["k"], ["n"], max_buckets=1000
        ).collect()
    # the same range is fine at a sane step
    ok = fill_time_gaps(df, "ts", "30 day", ["k"], ["n"])
    assert ok.count() > 2


def test_fill_time_gaps_linear_interpolation(spark):
    """Hand-computed straight-line fill: interior gaps interpolate on
    each column's OWN anchors, edges with one neighbor stay NULL."""
    from clickhouse_etl_spark.operators.events import fill_time_gaps

    rows = [
        # n observed at 00:00 (10) and 03:00 (40): gap hours 01/02
        # interpolate to 20, 30. m observed at 01:00 (5) and 03:00 (9):
        # hour 02 interpolates to 7 on m's own anchors; hour 00 has no
        # left neighbor for m -> NULL.
        ("g", "2024-01-01 00:00:00", 10, None),
        ("g", "2024-01-01 01:00:00", None, 5),
        ("g", "2024-01-01 03:00:00", 40, 9),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, n int, m int"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = fill_time_gaps(df, "ts", "1 hour", ["k"], ["n", "m"],
                         fill="linear")
    got = {str(r["ts"]): (r["n"], r["m"]) for r in out.collect()}
    assert len(got) == 4
    assert got["2024-01-01 00:00:00"] == (10.0, None)
    assert got["2024-01-01 01:00:00"] == (20.0, 5.0)
    assert got["2024-01-01 02:00:00"] == (30.0, 7.0)
    assert got["2024-01-01 03:00:00"] == (40.0, 9.0)


def test_fill_time_gaps_subsecond_step_guard(spark):
    """The explosion guard must count buckets at MICROsecond precision:
    a '50 milliseconds' step over a minute is 1200 buckets, which
    whole-second truncation would under-count ~50x and wave through."""
    import pytest

    from clickhouse_etl_spark.operators.events import fill_time_gaps

    df = spark.createDataFrame(
        [("g", "2024-01-01 00:00:00", 1), ("g", "2024-01-01 00:01:00", 2)],
        "k string, ts string, n int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(Exception, match="buckets"):
        fill_time_gaps(
            df, "ts", "50 milliseconds", ["k"], ["n"], max_buckets=1000
        ).collect()
    # sub-second steps still WORK under the cap
    ok = fill_time_gaps(df, "ts", "500 milliseconds", ["k"], ["n"],
                        max_buckets=1000)
    assert ok.count() == 121


# --- sequenceCount ----------------------------------------------------------

def _py_earliest_completion(evts, start, steps_types, window_s):
    """Brute-force: smallest index e >= start such that a complete chain
    (strictly increasing ts, all within window of its OWN anchor) ends
    at e using only events in [start, e]. Independent of the engine's
    per-level candidate algorithm: tries EVERY anchor exhaustively."""
    k = len(steps_types)
    for e in range(start, len(evts)):
        if evts[e][2] != steps_types[k - 1]:
            continue
        te = evts[e][0]
        for i1 in range(start, e + 1 - (k - 1) if k > 1 else e + 1):
            if evts[i1][2] != steps_types[0]:
                continue
            t1 = evts[i1][0]
            if te > t1 + window_s:
                continue
            # greedy earliest middle matching (optimal for existence:
            # shared window bound + monotone strictly-increasing ts)
            tp = t1
            j = i1 + 1
            ok = True
            for step in range(1, k - 1):
                while j < e and not (
                    evts[j][2] == steps_types[step]
                    and evts[j][0] > tp
                    and evts[j][0] <= t1 + window_s
                ):
                    j += 1
                if j >= e:
                    ok = False
                    break
                tp = evts[j][0]
                j += 1
            if ok and (k == 1 or te > tp):
                return e
    return None


def _py_sequence_count(rows, steps_types, window_s):
    """Independent Python reference: maximum non-overlapping complete
    chains = repeatedly take the earliest-completing chain (interval
    scheduling) and resume after it. rows: (ts_seconds, tiebreak,
    event_type); scanned in (ts, tiebreak) order — the same total order
    the Spark op uses."""
    evts = sorted(rows)
    n = 0
    start = 0
    while True:
        end = _py_earliest_completion(evts, start, steps_types, window_s)
        if end is None:
            return n
        n += 1
        start = end + 1


def test_sequence_count_micro(spark):
    import datetime as dt

    from clickhouse_etl_spark.operators.events import sequence_count

    base = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1: two complete a-b chains + one dangling a
        (1, base, "a"), (1, base + s, "b"),
        (1, base + 2 * s, "a"), (1, base + 3 * s, "b"),
        (1, base + 4 * s, "a"),
        # u2: a ... b outside the window -> 0
        (2, base, "a"), (2, base + dt.timedelta(seconds=120), "b"),
        # u3: b only -> 0 (still emitted)
        (3, base, "b"),
        # u4: overlap test — a a b b counts ONE chain: the earliest
        # completion is (first a -> first b); the scan resumes AFTER
        # that b, where the second b finds no unconsumed anchor
        (4, base, "a"), (4, base + s, "a"),
        (4, base + 2 * s, "b"), (4, base + 3 * s, "b"),
        # u5: dead-anchor re-anchor — a@0's window expires before any b;
        # the chain is abandoned and a@100 anchors the counted chain
        # with b@130 (the never-re-anchor formulation wedges at 0 here)
        (5, base, "a"),
        (5, base + dt.timedelta(seconds=100), "a"),
        (5, base + dt.timedelta(seconds=130), "b"),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: r.n_sequences
        for r in sequence_count(
            events, ["event_type = 'a'", "event_type = 'b'"], 60
        ).collect()
    }
    assert got == {1: 2, 2: 0, 3: 0, 4: 1, 5: 1}


def test_sequence_count_matches_python_reference(spark):
    """Full-corpus check against the independent brute-force reference,
    and the sequence_match consistency pin: matched => n >= 1 (one
    direction only — re-anchoring can complete a chain the
    greedy-from-earliest anchor misses)."""
    from clickhouse_etl_spark.operators.events import (
        sequence_count,
        sequence_match,
    )

    events = load_table(spark, SF_DIR, "events")
    steps_types = ["signup", "view", "purchase"]
    steps = [f"event_type = '{t}'" for t in steps_types]
    got = {
        r.user_id: r.n_sequences
        for r in sequence_count(
            events, steps, 86400, tiebreak_col="event_id"
        ).collect()
    }
    by_user = {}
    for r in events.select("user_id", "ts", "event_type", "event_id").collect():
        by_user.setdefault(r.user_id, []).append(
            (r.ts.timestamp(), r.event_id, r.event_type)
        )
    want = {
        u: _py_sequence_count(rs, steps_types, 86400)
        for u, rs in by_user.items()
    }
    assert got == want
    matched = {
        r.user_id: r.matched
        for r in sequence_match(events, steps, 86400).collect()
    }
    for u, n in got.items():
        if u in matched:
            if matched[u]:
                assert n >= 1, (u, n)
        else:
            assert n == 0  # no step-1 event at all


# --- strict_order funnel ----------------------------------------------------

def test_window_funnel_strict_order_micro(spark):
    """A->B->D->C stops at level 2 (D interrupts); a clean consecutive
    A->B->C reaches 3; window cutoff still applies; the level is the
    MAX over all step-1 anchors (ClickHouse parity, r10 ADVICE — a
    later anchor can outrun one an intervening event killed)."""
    import datetime as dt

    from clickhouse_etl_spark.operators.events import (
        window_funnel_strict_order,
    )

    base = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1: A B D C -> 2
        (1, base, "a"), (1, base + s, "b"),
        (1, base + 2 * s, "d"), (1, base + 3 * s, "c"),
        # u2: A B C -> 3
        (2, base, "a"), (2, base + s, "b"), (2, base + 2 * s, "c"),
        # u3: A, then B past the window -> 1
        (3, base, "a"), (3, base + dt.timedelta(seconds=120), "b"),
        # u4: B A B C -> anchor at the first A (greedy-from-earliest),
        # consecutive B C after it -> 3
        (4, base, "b"), (4, base + s, "a"),
        (4, base + 2 * s, "b"), (4, base + 3 * s, "c"),
        # u5: no A -> absent
        (5, base, "b"), (5, base + s, "c"),
        # u6: A and B at the SAME timestamp -> tied events never chain
        # (each anchor's chain stays a restriction of a relaxed chain,
        # which requires strictly-later timestamps) -> 1
        (6, base, "a"), (6, base, "b"), (6, base + s, "c"),
        # u7: A D A B C -> the FIRST anchor dies at 1 (D interrupts)
        # but the SECOND runs clean -> max over anchors = 3 (the case
        # the old first-anchor approximation scored 1)
        (7, base, "a"), (7, base + s, "d"), (7, base + 2 * s, "a"),
        (7, base + 3 * s, "b"), (7, base + 4 * s, "c"),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: r.funnel_level
        for r in window_funnel_strict_order(
            events,
            ["event_type = 'a'", "event_type = 'b'", "event_type = 'c'"],
            window_seconds=60,
        ).collect()
    }
    assert got == {1: 2, 2: 3, 3: 1, 4: 3, 6: 1, 7: 3}


def test_window_funnel_strict_order_oracle(spark):
    """Full-corpus check against a DuckDB LEAD-chain oracle (the same
    formulation: consecutive next events must match the next steps
    within each step-1 anchor's window, max over anchors)."""
    from clickhouse_etl_spark.operators.events import (
        window_funnel_strict_order,
    )

    events = load_table(spark, SF_DIR, "events")
    out = window_funnel_strict_order(
        events,
        ["event_type = 'signup'", "event_type = 'view'",
         "event_type = 'purchase'"],
        window_seconds=86400,
        tiebreak_col="event_id",
    )
    _assert_matches(
        out,
        """
        WITH flagged AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                 event_type = 'signup' AS s0,
                 LEAD(event_type = 'view', 1) OVER w AS n1t,
                 LEAD(epoch_us(ts), 1) OVER w AS n1ts,
                 LEAD(event_type = 'purchase', 2) OVER w AS n2t,
                 LEAD(epoch_us(ts), 2) OVER w AS n2ts
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        leveled AS (
          SELECT user_id, ts_us, event_id,
                 1
                 + CASE WHEN COALESCE(n1t, FALSE)
                         AND n1ts <= ts_us + 86400000000
                         AND n1ts > ts_us THEN 1 ELSE 0 END
                 + CASE WHEN COALESCE(n1t, FALSE)
                         AND n1ts <= ts_us + 86400000000
                         AND n1ts > ts_us
                         AND COALESCE(n2t, FALSE)
                         AND n2ts <= ts_us + 86400000000
                         AND n2ts > n1ts THEN 1 ELSE 0 END
                   AS lvl
          FROM flagged WHERE s0
        )
        SELECT user_id, MAX(lvl) AS funnel_level
        FROM leveled GROUP BY user_id
        """,
    )


# --- strict_dedup funnel ------------------------------------------------------

def test_window_funnel_strict_dedup_micro(spark):
    """A repeat of an already-matched condition interrupts; unrelated
    events do not (that's strict_order's job)."""
    import datetime as dt

    from clickhouse_etl_spark.operators.events import (
        window_funnel_strict_dedup,
    )

    base = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1: A B A C -> second A re-matches step 1 while waiting -> 2
        (1, base, "a"), (1, base + s, "b"),
        (1, base + 2 * s, "a"), (1, base + 3 * s, "c"),
        # u2: A B C -> clean -> 3
        (2, base, "a"), (2, base + s, "b"), (2, base + 2 * s, "c"),
        # u3: A B D C -> D unrelated, does NOT interrupt -> 3
        (3, base, "a"), (3, base + s, "b"),
        (3, base + 2 * s, "d"), (3, base + 3 * s, "c"),
        # u4: A A B -> repeat of the anchor condition -> stuck at 1
        (4, base, "a"), (4, base + s, "a"), (4, base + 2 * s, "b"),
        # u5: A, B past the window, then C -> window cutoff holds -> 1
        (5, base, "a"), (5, base + dt.timedelta(seconds=120), "b"),
        # u6: no A -> absent
        (6, base, "b"),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: r.funnel_level
        for r in window_funnel_strict_dedup(
            events,
            ["event_type = 'a'", "event_type = 'b'", "event_type = 'c'"],
            window_seconds=60,
        ).collect()
    }
    assert got == {1: 2, 2: 3, 3: 3, 4: 1, 5: 1}


def test_window_funnel_strict_dedup_is_restriction(spark):
    """strict_dedup can only remove progress: corpus-wide its level is
    <= the default mode's level for every user, equal whenever no
    repeat fired (checked against an independent per-user replay)."""
    from clickhouse_etl_spark.operators.events import (
        window_funnel,
        window_funnel_strict_dedup,
    )

    events = load_table(spark, SF_DIR, "events")
    steps_types = ["signup", "view", "purchase"]
    steps = [f"event_type = '{t}'" for t in steps_types]
    strict = {
        r.user_id: r.funnel_level
        for r in window_funnel_strict_dedup(
            events, steps, 86400, tiebreak_col="event_id"
        ).collect()
    }
    relaxed = {
        r.user_id: r.funnel_level
        for r in window_funnel(events, steps, 86400).collect()
    }
    assert set(strict) == set(relaxed)
    assert all(strict[u] <= relaxed[u] for u in strict)
    assert any(strict[u] < relaxed[u] for u in strict)  # repeats exist

    # independent replay: index-based loop over collected rows
    by_user = {}
    for r in events.select("user_id", "ts", "event_type", "event_id").collect():
        if r.ts is None:
            continue
        by_user.setdefault(r.user_id, []).append(
            (r.ts.timestamp(), r.event_id, r.event_type)
        )
    want = {}
    for u, rs in by_user.items():
        rs = sorted(rs)
        idx0 = next(
            (i for i, e in enumerate(rs) if e[2] == steps_types[0]), None
        )
        if idx0 is None:
            continue
        t1 = rs[idx0][0]
        lvl, tp = 1, rs[idx0][0]
        for ts, _tb, et in rs[idx0 + 1:]:
            if lvl >= len(steps_types):
                break
            if (
                et == steps_types[lvl]
                and ts > tp
                and ts <= t1 + 86400
            ):
                lvl += 1
                tp = ts
            elif et in steps_types[:lvl]:
                break
        want[u] = lvl
    assert strict == want


# --- sequenceNextNode --------------------------------------------------------

def test_sequence_next_node_micro(spark):
    import datetime as dt

    from clickhouse_etl_spark.operators.events import sequence_next_node

    base = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1: a b c d -> next after consecutive (a,b) run is c
        (1, base, "a"), (1, base + s, "b"),
        (1, base + 2 * s, "c"), (1, base + 3 * s, "d"),
        # u2: a x b -> x interrupts, no consecutive match -> absent
        (2, base, "a"), (2, base + s, "x"), (2, base + 2 * s, "b"),
        # u3: chain at the end of the stream -> matched, next NULL
        (3, base, "a"), (3, base + s, "b"),
        # u4: two matches; FIRST one wins (next = a, not d)
        (4, base, "a"), (4, base + s, "b"), (4, base + 2 * s, "a"),
        (4, base + 3 * s, "b"), (4, base + 4 * s, "d"),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: r.next_value
        for r in sequence_next_node(
            events, ["event_type = 'a'", "event_type = 'b'"]
        ).collect()
    }
    assert got == {1: "c", 3: None, 4: "a"}


def test_sequence_next_node_oracle(spark):
    """Full-corpus DuckDB LEAD-chain mirror (first consecutive
    signup->view run; the following event's type, NULL at stream end)."""
    from clickhouse_etl_spark.operators.events import sequence_next_node

    events = load_table(spark, SF_DIR, "events")
    out = sequence_next_node(
        events,
        ["event_type = 'signup'", "event_type = 'view'"],
        tiebreak_col="event_id",
    )
    _assert_matches(
        out,
        """
        WITH flagged AS (
          SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                 event_type = 'signup' AS s0,
                 LEAD(event_type = 'view', 1) OVER w AS n1,
                 LEAD(event_type, 2) OVER w AS nxt
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        hits AS (
          SELECT user_id, nxt,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS rn
          FROM flagged WHERE s0 AND COALESCE(n1, FALSE)
        )
        SELECT user_id, nxt AS next_value FROM hits WHERE rn = 1
        """,
    )


# --- maxIntersections / maxIntersectionsPosition ---

_MAX_INTERSECTIONS_ORACLE = """
WITH iv AS (
  SELECT event_type, ts AS s,
         ts + to_seconds(CAST(FLOOR(value) AS BIGINT)) AS e
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND value >= 0
), pts AS (
  SELECT event_type, s AS ts, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, e, -1 FROM iv
), run AS (
  SELECT event_type, ts, d,
         SUM(d) OVER (PARTITION BY event_type ORDER BY ts, d) AS run
  FROM pts
), pk AS (
  SELECT *, MAX(run) OVER (PARTITION BY event_type) AS peak FROM run
)
SELECT event_type,
       MAX(run) AS max_intersections,
       MIN(CASE WHEN run = peak THEN ts END) AS position
FROM pk GROUP BY event_type
"""


def test_max_intersections_matches_duckdb_oracle(spark):
    from clickhouse_etl_spark.operators.events import max_intersections

    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("ts").isNotNull() & (F.col("value") >= 0)
    )
    iv = ev.select(
        "event_type",
        F.col("ts").alias("s"),
        F.timestamp_micros(
            F.unix_micros("ts")
            + F.floor("value").cast("long") * F.lit(1_000_000)
        ).alias("e"),
    )
    out = max_intersections(iv, "s", "e", ["event_type"])
    _assert_matches(out, _MAX_INTERSECTIONS_ORACLE)


def test_max_intersections_half_open_and_position(spark):
    from clickhouse_etl_spark.operators.events import max_intersections

    rows = [
        # g1: [0,10) and [10,20) touch but never overlap -> peak 1 at t0
        ("g1", "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
        ("g1", "2024-01-01 00:00:10", "2024-01-01 00:00:20"),
        # g2: [0,10] x [5,15] x [8,9] -> 3 open at t+8 (first time)
        ("g2", "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
        ("g2", "2024-01-01 00:00:05", "2024-01-01 00:00:15"),
        ("g2", "2024-01-01 00:00:08", "2024-01-01 00:00:09"),
        # NULL endpoints are dropped, not counted
        ("g2", None, "2024-01-01 00:00:01"),
        ("g2", "2024-01-01 00:00:01", None),
    ]
    df = spark.createDataFrame(rows, "g string, s string, e string").select(
        "g", F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e")
    )
    out = {
        r["g"]: (r["max_intersections"], str(r["position"]))
        for r in max_intersections(df, "s", "e", ["g"]).collect()
    }
    assert out["g1"] == (1, "2024-01-01 00:00:00")
    assert out["g2"] == (3, "2024-01-01 00:00:08")


# --- intervalLengthSum ---

_INTERVAL_LENGTH_ORACLE = """
WITH iv AS (
  SELECT event_type,
         epoch_us(ts) AS s,
         epoch_us(ts + to_seconds(CAST(FLOOR(value) AS BIGINT))) AS e
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND value >= 0
), flagged AS (
  SELECT event_type, s, e,
         CASE WHEN MAX(e) OVER (
                PARTITION BY event_type ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR s > MAX(e) OVER (
                PARTITION BY event_type ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
         THEN 1 ELSE 0 END AS opens
  FROM iv
), islands AS (
  SELECT event_type, s, e,
         SUM(opens) OVER (PARTITION BY event_type ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), per_island AS (
  SELECT event_type, island, MAX(e) - MIN(s) AS len
  FROM islands GROUP BY event_type, island
)
SELECT event_type, SUM(len) AS length_us
FROM per_island GROUP BY event_type
"""


def test_interval_length_sum_matches_duckdb_oracle(spark):
    from clickhouse_etl_spark.operators.events import interval_length_sum

    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("ts").isNotNull() & (F.col("value") >= 0)
    )
    iv = ev.select(
        "event_type",
        F.col("ts").alias("s"),
        F.timestamp_micros(
            F.unix_micros("ts")
            + F.floor("value").cast("long") * F.lit(1_000_000)
        ).alias("e"),
    )
    out = interval_length_sum(iv, "s", "e", ["event_type"])
    _assert_matches(out, _INTERVAL_LENGTH_ORACLE)


def test_interval_length_sum_merge_semantics(spark):
    from clickhouse_etl_spark.operators.events import interval_length_sum

    rows = [
        # g1: [0,10] + [10,20] touch -> one island, 20s
        ("g1", "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
        ("g1", "2024-01-01 00:00:10", "2024-01-01 00:00:20"),
        # g2: [0,10] contains [2,5]; [30,40] disjoint -> 10 + 10 = 20s
        ("g2", "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
        ("g2", "2024-01-01 00:00:02", "2024-01-01 00:00:05"),
        ("g2", "2024-01-01 00:00:30", "2024-01-01 00:00:40"),
        # g3: zero-length interval contributes 0
        ("g3", "2024-01-01 00:00:01", "2024-01-01 00:00:01"),
        # NULL endpoint rows are dropped
        ("g3", None, "2024-01-01 00:00:09"),
    ]
    df = spark.createDataFrame(rows, "g string, s string, e string").select(
        "g", F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e")
    )
    out = {r["g"]: r["length_us"] for r in
           interval_length_sum(df, "s", "e", ["g"]).collect()}
    assert out == {"g1": 20_000_000, "g2": 20_000_000, "g3": 0}


# ---------------------------------------------------------------------------
# sequenceCount / strict_dedup recursive-CTE oracles: built in round 10
# here (proving both ops SQL-expressible, the BPE precedent), promoted
# to the driver registry in the round-11 rotation — the builders now
# live next to their registered rows in queries/extensions.py and are
# imported so this suite and the driver gate can never diverge.
# ---------------------------------------------------------------------------
from clickhouse_etl_spark.queries.extensions import (  # noqa: E402
    _sequence_count_oracle,
    _strict_dedup_oracle,
)


def test_sequence_count_matches_recursive_sql_oracle(spark):
    """sequence_count vs the event-by-event recursive-CTE simulation —
    the full driver-gate comparison (canon columns + values), proving
    the op registry-promotable. The Python brute-force reference above
    stays as the independent third opinion."""
    from clickhouse_etl_spark.operators.events import sequence_count

    events = load_table(spark, SF_DIR, "events")
    out = sequence_count(
        events,
        ["event_type = 'signup'", "event_type = 'view'",
         "event_type = 'purchase'"],
        86400,
        tiebreak_col="event_id",
    )
    _assert_matches(out, _sequence_count_oracle())


def test_window_funnel_strict_dedup_matches_recursive_sql_oracle(spark):
    """strict_dedup vs the event-by-event recursive-CTE simulation —
    full driver-gate comparison (the interrupt-on-repeat semantics no
    fixed-depth LEAD ladder can express ARE SQL-expressible via
    recursion), making the op registry-promotable."""
    from clickhouse_etl_spark.operators.events import (
        window_funnel_strict_dedup,
    )

    events = load_table(spark, SF_DIR, "events")
    out = window_funnel_strict_dedup(
        events,
        ["event_type = 'signup'", "event_type = 'view'",
         "event_type = 'purchase'"],
        86400,
        tiebreak_col="event_id",
    )
    _assert_matches(out, _strict_dedup_oracle())


def test_all_null_ts_users_yield_no_row(spark):
    """Contract pin: a user whose EVERY timestamp is NULL is absent
    from sequence_count / window_funnel_strict_dedup output (NULL ts
    drop before the scan); a user with a mix keeps their row computed
    over the non-NULL events only."""
    import datetime as dt

    from clickhouse_etl_spark.operators.events import (
        sequence_count,
        window_funnel_strict_dedup,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, None, "signup"),  # u1: all-NULL ts -> no row
        (2, t0, "signup"), (2, None, "view"),  # u2: mixed -> row, NULLs out
        (2, t0 + dt.timedelta(seconds=1), "view"),
        (3, t0, "signup"),  # u3: never completes -> explicit 0 row
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    steps = ["event_type = 'signup'", "event_type = 'view'"]
    seq = {r.user_id: r.n_sequences
           for r in sequence_count(events, steps, 86400).collect()}
    assert seq == {2: 1, 3: 0}
    fun = {r.user_id: r.funnel_level
           for r in window_funnel_strict_dedup(events, steps, 86400).collect()}
    assert fun == {2: 2, 3: 1}
