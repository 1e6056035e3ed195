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
) -> DataFrame:
    """Join events to intervals with ``start <= ts < end`` via time bins.

    Returns events ⨝ intervals rows (all columns of both). Interval ends
    are exclusive. ``bin_seconds`` trades bin-replication of intervals
    against per-bin candidate count — set it near the typical interval
    length.

    ``how``: 'inner', 'left' (keep unmatched events), or 'right' (keep
    unmatched intervals). The outer variants re-attach unmatched rows via
    an anti join on the preserved side's full column set (null-safe), so
    a row matching in one bin never also surfaces null-extended from
    another bin — the preserved side's rows should be unique.

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
    # Null-safe anti join on the preserved side's own columns: rows that
    # produced at least one match are excluded; the rest come back
    # null-extended exactly once (hence the uniqueness requirement).
    matched_keys = matched.select(*preserved.columns).distinct()
    cond = reduce(
        lambda a, b: a & b,
        [preserved[c].eqNullSafe(matched_keys[c]) for c in preserved.columns],
    )
    unmatched = preserved.join(matched_keys, on=cond, how="left_anti")
    return matched.unionByName(unmatched, allowMissingColumns=True)
