"""Timeseries operators: counter-delta summation and visual
downsampling — the ClickHouse dashboard-query dialect
(``deltaSum``, ``largestTriangleThreeBuckets``) over event streams.

Spark-first shapes: ``delta_sum`` is one LAG window per series (a
single group-key shuffle + sort, everything else JVM column math);
LTTB is inherently sequential PER SERIES (each kept point depends on
the previous selection), so it is this module's one Arrow-batched
``applyInPandas`` op — parallel ACROSS series, which is the 100 TB
story (a metrics corpus is many series of bounded length, not one
unbounded series; callers with a monster series downsample it in two
passes: coarse time-bucket pre-aggregation, then LTTB).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def delta_sum(
    df: DataFrame,
    value_col: str,
    order_col: str | Column,
    group_cols: Sequence[str] = (),
    out_col: str = "delta_sum",
) -> DataFrame:
    """ClickHouse ``deltaSum``: per group, the sum of POSITIVE
    differences between consecutive values in ``order_col`` order —
    the total increase of a monotonic counter that occasionally resets
    (a reset's negative jump contributes nothing, so the answer is the
    true accumulated work, not inflated or cancelled by restarts).

    One LAG window per series; NULL values and NULL order keys are
    dropped first (a NULL inside the stream would otherwise make both
    its own and its successor's delta NULL — two lost gaps for one bad
    row). A group with a single surviving row sums zero deltas → 0,
    same as ClickHouse. Ties in ``order_col`` get an arbitrary but
    deterministic-per-plan relative order; pass a struct Column
    (``F.struct("ts", "event_id")``) for a total order if ties matter.
    """
    key = F.col(order_col) if isinstance(order_col, str) else order_col
    base = df.filter(F.col(value_col).isNotNull() & key.isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(key)
    diff = F.col(value_col) - F.lag(value_col).over(w)
    stepped = base.select(
        *group_cols, F.when(diff > 0, diff).otherwise(F.lit(0)).alias("__d")
    )
    return stepped.groupBy(*group_cols).agg(F.sum("__d").alias(out_col))


def lttb_downsample(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_out: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """ClickHouse ``largestTriangleThreeBuckets(n)``: per group,
    downsample the series to ``n_out`` points while preserving its
    visual shape. First and last points always survive; the interior
    is split into ``n_out - 2`` equal-count buckets and each bucket
    keeps the point forming the LARGEST TRIANGLE with the previously
    kept point and the next bucket's centroid (Steinarsson 2013, the
    standard dashboard downsampler).

    Output: ``group_cols + (x_col, y_col)`` — the kept points, doubles.
    Series with ≤ ``n_out`` points (after dropping NULL x/y) pass
    through untouched. Each SERIES must fit in one executor's Arrow
    batch (the algorithm is sequential in the kept-point chain); the
    operator is parallel across series. Deterministic: ties on
    triangle area keep the earliest point; input order never matters
    because each series is sorted by ``(x, y)`` inside the pass.
    """
    if n_out < 3:
        raise ValueError("n_out must be >= 3 (first + last + 1 bucket)")
    if not group_cols:
        raise ValueError(
            "group_cols is required: a groupless LTTB funnels the whole "
            "corpus through one task — add a series key, or pre-bucket"
        )
    out_schema = T.StructType(
        [df.schema[c] for c in group_cols]
        + [
            T.StructField(x_col, T.DoubleType()),
            T.StructField(y_col, T.DoubleType()),
        ]
    )
    gcols = list(group_cols)

    def one_series(keys, pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.dropna(subset=[x_col, y_col]).sort_values(
            [x_col, y_col], kind="mergesort"
        )
        x = pdf[x_col].to_numpy(dtype=float)
        y = pdf[y_col].to_numpy(dtype=float)
        n = len(x)
        if n == 0:
            return pd.DataFrame(columns=gcols + [x_col, y_col])
        if n <= n_out:
            keep = np.arange(n)
        else:
            # bucket i covers interior indices [edges[i], edges[i+1])
            edges = 1 + np.round(
                np.linspace(0, n - 2, n_out - 1)
            ).astype(int)
            keep_list = [0]
            prev = 0
            for i in range(n_out - 2):
                lo, hi = edges[i], edges[i + 1]
                nlo, nhi = (
                    (edges[i + 1], edges[i + 2])
                    if i + 1 < n_out - 2
                    else (n - 1, n)
                )
                cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
                # 2x triangle area vs (prev point, candidate, centroid)
                area = np.abs(
                    (x[prev] - cx) * (y[lo:hi] - y[prev])
                    - (x[prev] - x[lo:hi]) * (cy - y[prev])
                )
                prev = lo + int(np.argmax(area))  # argmax: earliest tie
                keep_list.append(prev)
            keep_list.append(n - 1)
            keep = np.array(keep_list)
        out = pd.DataFrame({x_col: x[keep], y_col: y[keep]})
        for c, v in zip(gcols, keys):
            out[c] = v
        return out[gcols + [x_col, y_col]]

    shaped = df.select(
        *gcols,
        F.col(x_col).cast("double").alias(x_col),
        F.col(y_col).cast("double").alias(y_col),
    )
    return shaped.groupBy(*gcols).applyInPandas(one_series, schema=out_schema)


def moving_sum(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    n: int,
    out: str = "moving_sum",
) -> DataFrame:
    """ClickHouse ``groupArrayMovingSum(n)(v)``, row-per-element form:
    for every row, the sum of the last ``n`` values (this row included)
    in ``order_col`` order within the group. ClickHouse materializes
    the whole group as one array cell; returning the running element
    beside each row is the distributed-friendly shape — downstream can
    ``collect_list`` it per group if the array form is really wanted.

    One ordered window (one group shuffle + sort), bounded ROWS frame —
    state per row is O(1) in the JVM's sliding-frame implementation.
    Rows with a NULL value contribute nothing but still emit (SQL sum
    semantics).
    """
    if n < 1:
        raise ValueError(f"moving_sum needs n >= 1, got {n}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    return df.withColumn(out, F.sum(value_col).over(w))


def moving_avg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    n: int,
    out: str = "moving_avg",
) -> DataFrame:
    """ClickHouse ``groupArrayMovingAvg(n)(v)``, row-per-element form.

    NOTE the ClickHouse quirk this mirrors deliberately: the divisor is
    always ``n``, even for the first rows whose frame holds fewer than
    ``n`` elements (ClickHouse docs call this out), so the leading edge
    ramps up from ``v/n`` instead of averaging the partial window. Use
    ``moving_sum`` / ``count`` for the partial-window mean.
    """
    if n < 1:
        raise ValueError(f"moving_avg needs n >= 1, got {n}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    return df.withColumn(
        out, F.sum(F.col(value_col).cast("double")).over(w) / F.lit(float(n))
    )
