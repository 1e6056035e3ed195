"""Event-sequence analytics: sessionize, window funnel, retention.

The ClickHouse warehouse the reference loads into is famous for exactly
these (``windowFunnel``, ``retention``, session analysis) — the
downstream Metabase/report layer consumes them. Spark-first forms:

- :func:`sessionize` — gaps-and-islands session ids (the batch twin of
  ``streaming.session_window``): one window pass per user, no Python.
- :func:`window_funnel` — max funnel level per user, greedy-from-
  earliest semantics: level i is reached iff after the user's FIRST
  step-1 event there are strictly-later events matching steps 2..i, in
  order, all within ``window_seconds`` of that first event. One user-
  keyed join per funnel step (funnels are short; each join shuffles on
  the user key only).
- :func:`retention_flags` / :func:`retention_summary` — ClickHouse
  ``retention()``: per-user condition flags where every later flag is
  AND-ed with the first (cohort) condition, then cohort-wide counts.

All three are exact and DuckDB-oracle-checked (tests/test_events.py).

Note on funnel semantics (the contract is each docstring; don't
silently assume the ClickHouse variant):

- :func:`window_funnel` (relaxed) anchors greedy-from-earliest —
  ClickHouse slides the window over EVERY step-1 occurrence and keeps
  the best chain. :func:`window_funnel_strict_order` DOES take the max
  over all anchors (r10 ADVICE closed the approximation there, where
  the per-anchor level is already a LEAD projection);
  :func:`window_funnel_strict_dedup` and :func:`sequence_count` run
  the full ClickHouse automata event-for-event (recursive-CTE-oracle
  driver rows).
- Every mode here requires chained timestamps to be STRICTLY
  increasing — which is ClickHouse's ``strict_increase`` flag, not its
  default (CH's default lets equal-timestamp events chain in whatever
  order the engine sees them; that order is nondeterministic under
  parallel scan, so this library pins the deterministic variant and
  offers ``tiebreak_col`` to totalize equal-ts ORDERING where the scan
  itself is order-sensitive).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a session id per user from inactivity gaps.

    A new session starts when the time since the user's previous event
    exceeds ``gap`` (interval string). ``session_col`` is the 1-based
    session ordinal per user — combine with the user key for a globally
    unique id. One shuffle (window on user), codegen throughout.
    """
    gap_sec = F.expr(f"INTERVAL {gap}")
    # Cast ONCE up front and build both the ordering and the lag from the
    # same timestamp expression — lagging the raw column would compare a
    # timestamp against string+interval (nulls out or misorders the gap
    # test on string-typed ts columns).
    ts = F.col(ts_col).cast("timestamp")
    w = Window.partitionBy(user_col).orderBy(ts)
    prev_ts = F.lag(ts).over(w)
    new_session = (prev_ts.isNull() | (ts > prev_ts + gap_sec)).cast("int")
    return events.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def window_funnel(
    events: DataFrame,
    steps: Sequence[Column | str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Max funnel level per user (greedy-from-earliest; see module doc).

    ``steps`` are boolean conditions (Column or SQL string), one per
    funnel stage in order. Returns ``(user_col, funnel_level)`` for
    every user with at least one step-1 event; level ranges 1..len(steps).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    conds = [F.expr(s) if isinstance(s, str) else s for s in steps]
    ts = F.col(ts_col).cast("timestamp")

    anchor = (
        events.filter(conds[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("__t1"))
    )
    cur = anchor.withColumn("__t_prev", F.col("__t1"))
    levels = anchor.select(user_col, F.lit(1).alias("funnel_level"))
    deadline = F.col("__t1") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
    for i, cond in enumerate(conds[1:], start=2):
        nxt = events.filter(cond).select(
            F.col(user_col), ts.alias("__ts")
        )
        cur = (
            cur.join(nxt, on=user_col, how="inner")
            .filter((F.col("__ts") > F.col("__t_prev")) & (F.col("__ts") <= deadline))
            .groupBy(user_col, "__t1")
            .agg(F.min("__ts").alias("__t_prev"))
        )
        levels = levels.unionByName(
            cur.select(user_col, F.lit(i).alias("funnel_level"))
        )
    return levels.groupBy(user_col).agg(
        F.max("funnel_level").alias("funnel_level")
    )


def window_funnel_strict_order(
    events: DataFrame,
    steps: Sequence[Column | str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``windowFunnel(window, 'strict_order')``: the chain
    must be CONSECUTIVE — any intervening event (matching nothing, or a
    wrong step) stops it. In ``A → B → D → C`` the funnel reads level 2:
    ``D`` interrupts before ``C``.

    EVERY step-1 event is a prospective anchor and the user's level is
    the MAX over all of them — ClickHouse's semantics (windowFunnel
    reports the longest chain, not the first; r10 ADVICE closed the
    first-anchor approximation this operator used to ship). In
    ``A → D → A → B → C`` the first anchor dies at level 1 (``D``
    interrupts) but the second runs clean, so the funnel reads 3. Each
    anchor's chain is the longest step-prefix matched by the
    CONSECUTIVE run of events starting there, each within
    ``window_seconds`` of ITS anchor. Returns ``(user_col,
    funnel_level)`` for users with a step-1 event. Because a later
    anchor carries a later deadline, the max-over-anchors level is NOT
    bounded by the greedy-from-earliest relaxed mode's level — the
    per-anchor chain is still a restriction of a relaxed chain from the
    same anchor.

    Plan: strict order makes this a pure LEAD problem — one window sort
    per user, then ``lead(i)`` tests step ``i+1`` at offset ``i`` — no
    per-step joins at all (cheaper than the default mode\'s join
    ladder; the relaxed mode can\'t use LEAD because its steps skip
    arbitrary distances), and the max-over-anchors pick is a plain
    groupBy max over the already-computed per-anchor levels (no second
    window pass). Like every mode in this family the chain's timestamps
    must be STRICTLY increasing (a tied-timestamp pair never chains).
    ``tiebreak_col`` totalizes the event order under timestamp ties,
    same caveat as :func:`sequence_count`. NULL timestamps are dropped.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    conds = [F.expr(s) if isinstance(s, str) else s for s in steps]
    k = len(conds)
    ts = F.col(ts_col).cast("timestamp")
    base_cols = [
        F.col(user_col),
        F.unix_micros(ts).alias("__ts_us"),
        *[c.cast("boolean").alias(f"__s{i}") for i, c in enumerate(conds)],
    ]
    if tiebreak_col:
        base_cols.append(F.col(tiebreak_col).alias("__tb"))
    base = events.select(*base_cols).filter(F.col("__ts_us").isNotNull())
    order = [F.col("__ts_us")] + ([F.col("__tb")] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    deadline = F.col("__ts_us") + F.lit(int(window_seconds) * 1_000_000)
    # chain length at each prospective anchor: 1 + how many consecutive
    # lead(i) events match step i+1, inside the window, each strictly
    # later than its predecessor. hit can only be NULL when the lead row
    # is missing, and then its first conjunct is FALSE — acc never goes
    # NULL (ts_us is filtered non-null above).
    level = F.lit(1)
    acc = F.lit(True)
    for i in range(1, k):
        lead_ts = F.lead(F.col("__ts_us"), i).over(w)
        prev_ts = (
            F.col("__ts_us") if i == 1 else F.lead(F.col("__ts_us"), i - 1).over(w)
        )
        hit = (
            F.coalesce(F.lead(F.col(f"__s{i}"), i).over(w), F.lit(False))
            & (lead_ts <= deadline)
            & (lead_ts > prev_ts)
        )
        acc = acc & hit
        level = level + acc.cast("int")
    anchored = base.select(
        F.col(user_col),
        F.col("__s0"),
        level.alias("__lvl"),
    ).filter(F.col("__s0"))
    # ClickHouse parity: the user's level is the MAX over all step-1
    # anchors (a later anchor can outrun one whose chain an intervening
    # event killed) — partial-aggregated map-side, no second window.
    return anchored.groupBy(user_col).agg(
        F.max("__lvl").alias("funnel_level")
    )


def sequence_next_node(
    events: DataFrame,
    steps: Sequence[Column | str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``sequenceNextNode(forward, first_match)``: per user,
    the VALUE of the event immediately following the first CONSECUTIVE
    run of events matching ``steps`` — the "what do users do next after
    completing the funnel" question. Returns ``(user_col, next_value)``
    for every user with at least one full consecutive match;
    ``next_value`` is NULL when the match ends the user's event stream.

    Same pure-LEAD plan as :func:`window_funnel_strict_order` (one
    window sort per user, ``lead(i)`` tests step ``i`` at offset
    ``i``), plus one more LEAD fetching the value at offset ``k``.
    The match is anchored at the EARLIEST qualifying run (first_match);
    consecutive means no intervening events, and tied timestamps order
    by ``tiebreak_col`` (pass the event id for a total order). NULL
    timestamps are dropped. No window-seconds bound — the ClickHouse
    function has none; compose with a time filter upstream if needed.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    conds = [F.expr(s) if isinstance(s, str) else s for s in steps]
    k = len(conds)
    ts = F.col(ts_col).cast("timestamp")
    base_cols = [
        F.col(user_col),
        F.unix_micros(ts).alias("__ts_us"),
        F.col(value_col).alias("__val"),
        *[c.cast("boolean").alias(f"__s{i}") for i, c in enumerate(conds)],
    ]
    if tiebreak_col:
        base_cols.append(F.col(tiebreak_col).alias("__tb"))
    base = events.select(*base_cols).filter(F.col("__ts_us").isNotNull())
    order = [F.col("__ts_us")] + ([F.col("__tb")] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    matched = F.lit(True)
    for i in range(k):
        step_here = (
            F.col("__s0") if i == 0
            else F.coalesce(F.lead(F.col(f"__s{i}"), i).over(w), F.lit(False))
        )
        matched = matched & step_here
    anchored = base.select(
        F.col(user_col),
        *order,
        matched.alias("__hit"),
        F.lead(F.col("__val"), k).over(w).alias("__next"),
    ).filter(F.col("__hit"))
    return (
        anchored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(user_col, F.col("__next").alias("next_value"))
    )


def window_funnel_strict_dedup(
    events: DataFrame,
    steps: Sequence[Column | str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``windowFunnel(window, 'strict_dedup')``: a repeat of
    an ALREADY-MATCHED step's condition interrupts the chain. In
    ``A → B → A → C`` the funnel reads level 2: the second ``A``
    (step 1's condition, already matched) fires before ``C`` can.

    Same greedy-from-earliest anchor, in-window and strictly-later
    rules as :func:`window_funnel`, so the level here is always <= the
    default mode's level (pinned in tests). An event that BOTH advances
    the chain and re-matches an earlier condition advances (the next
    step wins — dedup only interrupts while waiting).

    Interrupt-on-repeat makes the scan order-dependent in a way no
    fixed-depth LEAD or join ladder can express (any event anywhere in
    the wait gap can kill the chain), so like :func:`sequence_count`
    this is an Arrow-batched scan: flags JVM-side, ONE user-key
    shuffle, O(1) state per user — and the same r11 physical form
    (``repartition(user)`` + Tungsten ``sortWithinPartitions`` + one
    ``mapInPandas`` pass per partition; see sequence_count's docstring
    for the measured per-group-vs-per-partition crossing costs). NULL
    timestamps are dropped before the scan — a user whose every
    timestamp is NULL yields NO row rather than a level-0 row (pinned
    in tests/test_events.py). ``tiebreak_col`` totalizes the order
    under timestamp ties.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    import pandas as pd

    conds = [F.expr(s) if isinstance(s, str) else s for s in steps]
    k = len(conds)
    flags = [f"etl_s{i}" for i in range(k)]
    sort_cols = ["etl_ts_us"] + (["etl_tb"] if tiebreak_col else [])
    proj = [
        F.col(user_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("etl_ts_us"),
        *[c.cast("boolean").alias(f) for c, f in zip(conds, flags)],
    ]
    if tiebreak_col:
        proj.append(F.col(tiebreak_col).alias("etl_tb"))
    flagged = events.select(*proj).filter(F.col("etl_ts_us").isNotNull())
    window_us = int(window_seconds) * 1_000_000

    user_field = events.schema[user_col]
    out_schema = T.StructType(
        [user_field, T.StructField("funnel_level", T.IntegerType())]
    )
    part = flagged.repartition(F.col(user_col)).sortWithinPartitions(
        user_col, *sort_cols
    )

    def run(batches):
        # Positional row layout (fixed by `proj` above): 0 = user,
        # 1 = ts micros, 2..2+k-1 = step flags. Same partition-sorted
        # single-pass form as sequence_count (r11): one Python crossing
        # per partition, automaton state carried across user and
        # Arrow-batch boundaries. Users with no step-1 anchor emit
        # nothing (t1 stays None), matching the per-group form.
        UNSET = object()
        cur = UNSET
        t1 = None  # anchor micros (first step-1 event)
        level = 0
        t_prev = None
        dead = False
        out_u: list = []
        out_l: list = []
        for pdf in batches:
            if not len(pdf):
                continue
            for row in pdf.itertuples(index=False, name=None):
                u = row[0]
                if cur is UNSET or (
                    u != cur and not (u != u and cur != cur)  # NaN==NaN
                ):
                    if cur is not UNSET and t1 is not None:
                        out_u.append(cur)
                        out_l.append(level)
                    cur = u
                    t1, level, t_prev, dead = None, 0, None, False
                ts_us = int(row[1])
                if t1 is None:
                    if row[2]:  # step-1 flag
                        t1, level, t_prev = ts_us, 1, ts_us
                    continue
                if dead or level >= k:
                    continue
                in_window = ts_us > t_prev and ts_us <= t1 + window_us
                if row[2 + level] and in_window:
                    level += 1
                    t_prev = ts_us
                elif any(row[2 + i] for i in range(level)):
                    # repeat of an already-matched condition: interrupt
                    # (regardless of window — the chain is contaminated)
                    dead = True
            if out_u:  # flush finished users per batch: O(batch) memory
                yield pd.DataFrame({user_col: out_u, "funnel_level": out_l})
                out_u, out_l = [], []
        if cur is not UNSET and t1 is not None:
            out_u.append(cur)
            out_l.append(level)
        if out_u:
            yield pd.DataFrame({user_col: out_u, "funnel_level": out_l})

    return part.mapInPandas(run, out_schema)


def sequence_match(
    events: DataFrame,
    steps: Sequence[Column | str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """ClickHouse ``sequenceMatch``-style boolean per user: did the full
    ordered step chain occur within the window? Exactly
    :func:`window_funnel` reaching the last level — one row per user
    with a step-1 event, ``matched`` true iff the whole chain completed
    (same greedy-from-earliest anchor and semantics)."""
    n = len(list(steps))
    levels = window_funnel(
        events, steps, window_seconds, user_col=user_col, ts_col=ts_col
    )
    return levels.select(
        user_col, (F.col("funnel_level") == n).alias("matched")
    )


def sequence_count(
    events: DataFrame,
    steps: Sequence[Column | str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``sequenceCount``: greedy NON-OVERLAPPING completed
    chains per user — how many times the full ordered step sequence
    occurred, each chain's events strictly increasing in time and
    within ``window_seconds`` of its OWN first event. The scan takes
    the EARLIEST-COMPLETING chain each time and resumes after its
    completing event (events are never shared between counted chains)
    — the interval-scheduling greedy, so the count is the maximum
    possible. A chain whose window expires without completing is
    abandoned and the search re-anchors (a later step-1 event starts a
    fresh chain — sequences are NOT lost behind a dead anchor).
    Because completion may hang off a LATER anchor than the earliest
    step-1 event, ``sequence_match`` (greedy-from-earliest) implies
    ``n_sequences >= 1`` but not conversely (pinned in tests).

    Returns ``(user_col, n_sequences)`` for every user with at least
    one non-NULL-timestamp event (0 when the pattern never completes —
    ClickHouse semantics). NULL timestamps are dropped BEFORE the scan,
    matching the SQL-side comparison semantics of the other event
    operators — so a user whose every timestamp is NULL yields NO row,
    not a 0 row (pinned in tests/test_events.py).

    This one is inherently sequential PER USER (a chain's shape depends
    on which earlier events previous chains consumed), so it is an
    Arrow-batched op: step flags are precomputed JVM-side, the corpus
    shuffles ONCE on the user key, and the scan keeps one candidate
    chain per level (max-anchor dominance: a later anchor has a later
    deadline, so it subsumes earlier ones at the same level). State per
    user is O(k) — the same distribution story as any user-keyed
    aggregate at 100 TB.

    Physical form (r11): ``repartition(user)`` + JVM
    ``sortWithinPartitions(user, ts[, tiebreak])`` + ONE
    ``mapInPandas`` pass walking each partition's pre-sorted rows,
    carrying the automaton state across user AND Arrow-batch
    boundaries. Same single shuffle as the earlier per-group
    ``applyInPandas`` form, but one Python crossing per PARTITION
    instead of per user (measured at sf0.1: the trivial per-group
    crossing alone cost 3.8 s for 1.5 k users vs 0.85 s
    per-partition), the sort runs in Tungsten instead of pandas, and
    peak Python memory is O(Arrow batch), not O(user's events).

    ``tiebreak_col`` makes the scan order total when timestamps tie
    (pass the event id); without it, equal-ts orders are
    partition-arbitrary — same caveat as every event-order-sensitive
    operator here.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    import pandas as pd

    conds = [F.expr(s) if isinstance(s, str) else s for s in steps]
    k = len(conds)
    flags = [f"etl_s{i}" for i in range(k)]  # itertuples-safe names
    sort_cols = ["etl_ts_us"] + (["etl_tb"] if tiebreak_col else [])
    proj = [
        F.col(user_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("etl_ts_us"),
        *[c.cast("boolean").alias(f) for c, f in zip(conds, flags)],
    ]
    if tiebreak_col:
        proj.append(F.col(tiebreak_col).alias("etl_tb"))
    flagged = events.select(*proj).filter(F.col("etl_ts_us").isNotNull())
    window_us = int(window_seconds) * 1_000_000

    user_field = events.schema[user_col]
    out_schema = T.StructType(
        [user_field, T.StructField("n_sequences", T.LongType())]
    )
    part = flagged.repartition(F.col(user_col)).sortWithinPartitions(
        user_col, *sort_cols
    )

    def run(batches):
        # Positional row layout (fixed by `proj` above): 0 = user,
        # 1 = ts micros, 2..2+k-1 = step flags (tiebreak, if any, only
        # orders the sort — the scan never reads it). State carries
        # across user changes AND Arrow-batch boundaries; rows arrive
        # pre-sorted by (user, ts[, tb]) from the Tungsten sort.
        UNSET = object()
        cur = UNSET
        # chains[lvl] = (anchor_us, last_us) of the best candidate that
        # has matched steps 0..lvl-1; max-anchor dominance keeps one per
        # level. On completion everything resets (non-overlapping).
        chains: list[tuple[int, int] | None] = [None] * k
        n = 0
        out_u: list = []
        out_n: list = []
        for pdf in batches:
            if not len(pdf):
                continue
            for row in pdf.itertuples(index=False, name=None):
                u = row[0]
                if cur is UNSET or (
                    u != cur and not (u != u and cur != cur)  # NaN==NaN
                ):
                    if cur is not UNSET:
                        out_u.append(cur)
                        out_n.append(n)
                    cur = u
                    chains = [None] * k
                    n = 0
                ts_us = int(row[1])
                # a candidate whose window this event already overruns
                # can never extend again (later events are later
                # still): drop it
                for lvl in range(1, k):
                    c = chains[lvl]
                    if c is not None and ts_us > c[0] + window_us:
                        chains[lvl] = None
                completed = False
                for lvl in range(k - 1, 0, -1):  # longest first
                    c = chains[lvl]
                    if c is None or not row[2 + lvl]:
                        continue
                    if ts_us <= c[1]:  # strictly-later, ties never chain
                        continue
                    if lvl + 1 == k:
                        n += 1
                        chains = [None] * k
                        completed = True
                        break
                    nxt = chains[lvl + 1]
                    if nxt is None or c[0] > nxt[0]:
                        chains[lvl + 1] = (c[0], ts_us)
                if completed:
                    continue
                if row[2]:  # step-1 flag
                    if k == 1:
                        n += 1
                    elif chains[1] is None or ts_us > chains[1][0]:
                        chains[1] = (ts_us, ts_us)
            if out_u:  # flush finished users per batch: O(batch) memory
                yield pd.DataFrame({user_col: out_u, "n_sequences": out_n})
                out_u, out_n = [], []
        if cur is not UNSET:
            out_u.append(cur)
            out_n.append(n)
        if out_u:
            yield pd.DataFrame({user_col: out_u, "n_sequences": out_n})

    return part.mapInPandas(run, out_schema)


def retention_flags(
    events: DataFrame,
    conds: Sequence[Column | str],
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user retention flags (ClickHouse ``retention()`` semantics).

    ``r1`` is true iff the user matches the cohort condition
    ``conds[0]``; every later ``r_i`` is true iff the user matches
    ``conds[i]`` AND ``r1``. One aggregation pass; flags come out as
    ints (0/1) for painless summing.
    """
    if not conds:
        raise ValueError("conds must be non-empty")
    cs = [F.expr(c) if isinstance(c, str) else c for c in conds]
    aggs = [
        F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"__m{i}")
        for i, c in enumerate(cs, start=1)
    ]
    per_user = events.groupBy(user_col).agg(*aggs)
    out = [F.col("__m1").alias("r1")]
    out += [
        (F.col(f"__m{i}") * F.col("__m1")).alias(f"r{i}")
        for i in range(2, len(cs) + 1)
    ]
    return per_user.select(F.col(user_col), *out)


def retention_summary(
    events: DataFrame,
    conds: Sequence[Column | str],
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort-wide retention counts: one row, ``n_r1..n_rk`` summed over
    users — the number retained at each stage."""
    flags = retention_flags(events, conds, user_col=user_col)
    k = len(list(conds))
    return flags.agg(
        *[F.sum(f"r{i}").alias(f"n_r{i}") for i in range(1, k + 1)]
    )


def fill_time_gaps(
    df: DataFrame,
    ts_col: str,
    step: str = "1 hour",
    group_cols: Sequence[str] = (),
    value_cols: Sequence[str] = (),
    fill: str = "null",
    max_buckets: int = 10_000_000,
) -> DataFrame:
    """ClickHouse ``ORDER BY ts WITH FILL STEP`` — densify a per-group
    time series so every ``step`` bucket between the group's first and
    last observation exists. ``max_buckets`` bounds any single group's
    grid (the explosion guard raises in-pass instead of OOMing on a
    mis-sized step).

    ``df`` must hold one row per (group, bucket) with ``ts_col``
    already bucket-aligned (build it with ``date_trunc``/``window`` —
    misaligned timestamps would interleave with the grid instead of
    merging into it). Missing buckets appear with ``value_cols`` filled
    by policy: ``'null'`` (ClickHouse default), ``'zero'``, ``'locf'``
    (last observation carried forward — the dashboard gauge/state
    convention), or ``'linear'`` (straight-line interpolation between
    the surrounding observations — the TimescaleDB ``interpolate()`` /
    InfluxDB ``fill(linear)`` convention for sampled metrics; leading/
    trailing gaps with only one neighbor stay NULL, and the filled
    columns come back as double).

    Plan: per-group min/max aggregate → ``sequence(min, max, step)``
    explode → left join the observations back on (group, bucket). The
    explode is bounded by time-range/step per group — a property of the
    CALENDAR, not the data volume — and both shuffles key on the group,
    so the shape survives any corpus scale with bounded time ranges.
    """
    if fill not in ("null", "zero", "locf", "linear"):
        raise ValueError("fill must be 'null', 'zero', 'locf', or 'linear'")
    missing = [c for c in value_cols if c not in df.columns]
    if missing:  # a typo here would otherwise silently skip the fill
        raise ValueError(f"value_cols not in df: {missing}")
    gcols = list(group_cols)
    ts = F.col(ts_col).cast("timestamp")
    bounds = df.groupBy(*gcols).agg(
        F.min(ts).alias("__lo"), F.max(ts).alias("__hi")
    )
    # Explosion guard, evaluated in-pass (no extra job): sequence()
    # builds each group's grid as ONE in-memory array, so a mis-sized
    # step over a long range (seconds over years) would OOM an executor
    # before anything downstream could bound it. Estimate the bucket
    # count from the bounds and the step's actual width and refuse past
    # max_buckets per group.
    # Step width measured in MICROseconds: whole-second truncation
    # would under-count buckets 1000x for a '1 millisecond' step and
    # defeat the guard entirely.
    step_iv = F.expr(f"INTERVAL {step}")
    step_us = F.unix_micros(F.col("__lo") + step_iv) - F.unix_micros(
        F.col("__lo")
    )
    n_buckets = (
        F.unix_micros(F.col("__hi")) - F.unix_micros(F.col("__lo"))
    ) / F.greatest(step_us, F.lit(1))
    guard = F.when(
        n_buckets > max_buckets,
        F.raise_error(
            F.concat(
                F.lit(
                    f"fill_time_gaps: a group spans > {max_buckets} "
                    f"'{step}' buckets — widen the step, pre-filter the "
                    "range, or raise max_buckets"
                )
            )
        ).cast("timestamp"),
    ).otherwise(F.col("__lo"))
    grid = bounds.select(
        *gcols,
        F.explode(
            F.sequence(guard, F.col("__hi"), step_iv)
        ).alias(ts_col),
    )
    out = grid.join(df, on=[*gcols, ts_col], how="left")
    if fill == "zero":
        out = out.select(
            *gcols,
            ts_col,
            *[
                F.coalesce(F.col(c), F.lit(0)).alias(c) if c in value_cols
                else F.col(c)
                for c in df.columns
                if c not in gcols and c != ts_col
            ],
        )
    elif fill == "locf":
        w = (
            Window.partitionBy(*[F.col(c) for c in gcols])
            .orderBy(F.col(ts_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            *gcols,
            ts_col,
            *[
                F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                if c in value_cols
                else F.col(c)
                for c in df.columns
                if c not in gcols and c != ts_col
            ],
        )
    elif fill == "linear":
        # Both frames share one (group, ts) sort: Catalyst plans a
        # single Sort feeding two Window operators, so this costs the
        # same one shuffle + one sort as locf.
        w_prev = (
            Window.partitionBy(*[F.col(c) for c in gcols])
            .orderBy(F.col(ts_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_next = (
            Window.partitionBy(*[F.col(c) for c in gcols])
            .orderBy(F.col(ts_col).asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))

        def interp(c: str) -> F.Column:
            v = F.col(c).cast("double")
            # per-column known-timestamp: columns may have different
            # null patterns, so each interpolates on its own anchors
            kt = F.when(v.isNotNull(), t_us)
            pv = F.last(v, ignorenulls=True).over(w_prev)
            pt = F.last(kt, ignorenulls=True).over(w_prev)
            nv = F.first(v, ignorenulls=True).over(w_next)
            nt = F.first(kt, ignorenulls=True).over(w_next)
            # observed rows short-circuit (also avoids nt == pt there);
            # gaps with both neighbors interpolate; edges stay NULL
            return F.when(v.isNotNull(), v).when(
                pv.isNotNull() & nv.isNotNull(),
                pv + (nv - pv) * (t_us - pt) / (nt - pt),
            ).alias(c)

        out = out.select(
            *gcols,
            ts_col,
            *[
                interp(c) if c in value_cols else F.col(c)
                for c in df.columns
                if c not in gcols and c != ts_col
            ],
        )
    return out


def max_intersections(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: Sequence[str] = (),
    out_col: str = "max_intersections",
    position_col: str = "position",
) -> DataFrame:
    """ClickHouse ``maxIntersections`` / ``maxIntersectionsPosition`` in
    one pass: per group, the maximum number of intervals
    ``[start, end)`` open simultaneously, and the EARLIEST timestamp at
    which that maximum is first reached — "peak concurrent sessions,
    and when". Intervals are half-open: an interval ending exactly
    where another starts does not overlap it (at a tied timestamp the
    ``-1`` close sorts before the ``+1`` open).

    Shape: each interval becomes two delta points (+1 at start, -1 at
    end) via one explode; a running sum ordered by ``(ts, delta)``
    within each group is the live-interval count; a same-window max +
    conditional-min aggregation reads off the peak and its first
    timestamp. One shuffle on the group key, one sort — the window's
    default RANGE frame makes timestamp ties resolve to the
    post-tie-group count, which is exactly the concurrency after all
    simultaneous opens (closes only lower the count, so skipping their
    intermediate values never misses a peak).

    Rows with a NULL start or end are dropped (an unbalanced delta
    would corrupt every later count). Callers must ensure
    ``end >= start``; inverted intervals are not detected here.

    With no ``group_cols`` the single window partition funnels the
    whole corpus through one task — for a GLOBAL concurrency profile at
    scale, group by a coarse time bucket instead and refine, or feed
    the delta points through ``operators.prefix.running_total``.
    """
    pts = (
        df.filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
        .select(
            *group_cols,
            F.explode(
                F.array(
                    F.struct(
                        F.col(start_col).cast("timestamp").alias("ts"),
                        F.lit(1).alias("delta"),
                    ),
                    F.struct(
                        F.col(end_col).cast("timestamp").alias("ts"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("__p"),
        )
        .select(*group_cols, F.col("__p.ts").alias("__ts"), F.col("__p.delta").alias("__d"))
    )
    w = Window.partitionBy(*group_cols).orderBy("__ts", "__d")
    run = F.sum("__d").over(w)
    peak = F.max(run).over(Window.partitionBy(*group_cols))
    scored = pts.select(
        *group_cols,
        F.col("__ts"),
        run.alias("__run"),
        peak.alias("__peak"),
    )
    return scored.groupBy(*group_cols).agg(
        F.max("__run").alias(out_col),
        F.min(F.when(F.col("__run") == F.col("__peak"), F.col("__ts"))).alias(
            position_col
        ),
    )


def interval_length_sum(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: Sequence[str] = (),
    out_col: str = "length_us",
) -> DataFrame:
    """ClickHouse ``intervalLengthSum``: per group, the total length of
    the UNION of the intervals — overlaps counted once ("total active
    time" across overlapping sessions). Timestamp endpoints; the result
    is exact integer MICROSECONDS (``length_us``, long) — divide by 1e6
    for seconds, which keeps the operator exact instead of baking a
    float in.

    Gaps-and-islands: order intervals by (start, end) within the group,
    a row opens a new island when its start lies strictly beyond the
    running max of all earlier ends, the island id is the running count
    of those opens, and each island contributes max(end) − min(start).
    Two window passes over ONE group-key sort, then two hash
    aggregations (per-island, then per-group) — nothing quadratic,
    nothing collected. Touching intervals ([0,10], [10,20]) merge —
    union LENGTH has no open/half-open ambiguity (the boundary point
    has measure zero); zero-length intervals contribute 0.

    NULL endpoints drop the row; ``end >= start`` is the caller's
    contract (same as :func:`max_intersections`).
    """
    base = df.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    ).select(
        *group_cols,
        F.unix_micros(F.col(start_col).cast("timestamp")).alias("__s"),
        F.unix_micros(F.col(end_col).cast("timestamp")).alias("__e"),
    )
    w = Window.partitionBy(*group_cols).orderBy("__s", "__e")
    prev_max_end = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col("__s") > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    per_island = (
        base.withColumn("__island", island)
        .groupBy(*group_cols, "__island")
        .agg((F.max("__e") - F.min("__s")).alias("__len"))
    )
    return per_island.groupBy(*group_cols).agg(F.sum("__len").alias(out_col))
