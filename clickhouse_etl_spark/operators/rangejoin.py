"""Range (interval) join — binned, not theta-exploded.

Extension surface (the reference has equi-joins only, SURVEY.md §2.4).
A naive ``e.ts BETWEEN i.start AND i.end`` join plans as
BroadcastNestedLoop/cartesian — every event against every interval. The
binned form assigns each event to one time bin and each interval to every
bin it overlaps, equi-joins on the bin, then verifies the exact
predicate: cost ∝ events + interval×bins_covered + true matches, an
equi-shuffle Catalyst handles like any other join.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_etl_spark.util import materialize


def range_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
    how: str = "inner",
    key_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Join events to intervals with ``start <= ts < end`` via time bins.

    Returns events ⨝ intervals rows (all columns of both). Interval ends
    are exclusive. ``bin_seconds`` trades bin-replication of intervals
    against per-bin candidate count — set it near the typical interval
    length.

    ``how``: 'inner', 'left' (keep unmatched events), or 'right' (keep
    unmatched intervals). The outer variants re-attach unmatched rows via
    an anti join against the matched set, so a row matching in one bin
    never also surfaces null-extended from another bin. The inner path
    pays none of this machinery. The anti-join key is, in order of
    preference:

    - ``key_cols`` — caller-declared unique key of the preserved side
      (e.g. an interval id). Cheapest: the matched-key set is a narrow
      distinct + single-key anti join, no snapshotting needed.
    - else a surrogate ``monotonically_increasing_id`` stamped on the
      preserved side. The stamped frame is snapshotted (lazy persist) so
      the join branch and the anti branch see the SAME ids — surrogate
      ids are only stable within one evaluation of one plan.

    Bin boundaries: the upper bin is the *un-decremented*
    ``floor(unix_timestamp(end) / bin_seconds)`` — ``unix_timestamp``
    truncates sub-second precision, so decrementing first (the old form)
    dropped events in ``[floor(end), end)`` whose bin exceeded the
    decremented bound. The exact predicate filters the overshoot rows the
    extra tail bin admits. Inverted/zero-length intervals (``end <=
    start``) are clamped to a single bin instead of generating a
    descending (spurious) sequence; the exact predicate matches nothing
    for them, so they only appear (null-extended) under ``how='right'``.
    """
    if how not in ("inner", "left", "right"):
        raise ValueError(f"range_join_binned supports inner/left/right, got {how!r}")
    if key_cols is not None and not key_cols:
        raise ValueError("key_cols must be None or non-empty")

    surrogate = how != "inner" and key_cols is None
    if surrogate:
        # Snapshot so both consumers (join side + anti side) see the same
        # surrogate ids — see docstring. cut_lineage: a lazy cache is not
        # enough, because an evicted block would recompute
        # monotonically_increasing_id from the live plan with
        # potentially different partition ordering, silently
        # double-surfacing or dropping preserved rows.
        stamped = materialize(
            (events if how == "left" else intervals).withColumn(
                "__pid", F.monotonically_increasing_id()
            ),
            cut_lineage=True,
        )
        if how == "left":
            events = stamped
        else:
            intervals = stamped

    lo_bin = F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds).cast("long")
    hi_bin = F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds).cast("long")
    e_binned = events.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds).cast("long")
    )
    i_binned = intervals.withColumn(
        "__bin", F.explode(F.sequence(lo_bin, F.greatest(lo_bin, hi_bin)))
    )
    matched = (
        e_binned.join(i_binned, on="__bin", how="inner")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bin")
    )
    if how == "inner":
        return matched

    # consumed twice below (output union + matched-key anti) — cache it
    # rather than re-running the binned join per consumer.
    matched = materialize(matched)
    preserved = events if how == "left" else intervals
    keys = list(key_cols) if key_cols is not None else ["__pid"]
    # Anti join on the (unique) preserved-side key: rows that produced at
    # least one match are excluded; the rest come back null-extended
    # exactly once. Keying avoids the old full-column null-safe
    # condition, whose wide distinct + comparison chain dominated the
    # outer path's cost.
    matched_keys = matched.select(*keys).distinct()
    # eqNullSafe (still hash-joinable) so a NULL key matching in one bin
    # can't ALSO come back null-extended.
    cond = reduce(
        lambda a, b: a & b,
        [preserved[c].eqNullSafe(matched_keys[c]) for c in keys],
    )
    unmatched = preserved.join(matched_keys, on=cond, how="left_anti")
    out = matched.unionByName(unmatched, allowMissingColumns=True)
    return out.drop("__pid") if surrogate else out
