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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    """
    e_binned = events.withColumn(
        "__bin", (F.unix_timestamp(F.col(ts_col)) / bin_seconds).cast("long")
    )
    i_binned = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bin_seconds).cast("long"),
                # end exclusive: a zero-length tail bin is still generated,
                # the exact predicate filters it
                ((F.unix_timestamp(F.col(end_col)) - 1) / bin_seconds).cast("long"),
            )
        ),
    )
    return (
        e_binned.join(i_binned, on="__bin", how=how)
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bin")
    )
