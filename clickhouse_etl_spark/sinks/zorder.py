"""Z-order (Morton) layout — multi-dimensional clustering for file skipping.

A MergeTree compound sort key ``ORDER BY (a, b)`` prunes well on ``a``
but not on ``b`` alone; parquet row-group min/max stats have the same
asymmetry under a lexicographic sort. Z-ordering interleaves the bits of
per-column RANKS so rows close in every dimension land in the same
files — after ``repartitionByRange`` + ``sortWithinPartitions`` on the
z-value, each file covers a small rectangle of the (a, b, ...) space and
min/max stats prune scans filtered on ANY of the clustered columns (the
Delta/Databricks ``OPTIMIZE ZORDER BY`` technique, built here from plain
DataFrame primitives).

Ranks, not raw values: equi-depth bucket indices from quantile cut
points, so skew cannot collapse the curve (equi-width bucketing puts 99%
of a Zipf column into one bucket and z-ordering degenerates to a sort on
the other columns). Cut points come from one ``approxQuantile`` pass —
or pass ``boundaries`` explicitly (deterministic, and how the tests
mirror the whole computation in DuckDB).

Everything row-wise is a JVM expression: the per-column bucket index is
a fold over the cut-point literal array, the Morton code a fixed unroll
of shift/or — no Python, no UDF, no extra shuffle beyond the final
range partition.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8  # 256 equi-depth buckets per column


def _bucket_index(col: str, cuts: Sequence[float]) -> Column:
    """Equi-depth bucket of ``col`` = #cut points strictly below the
    value (nulls -> bucket 0, the lowest rectangle)."""
    cuts_arr = F.array(*[F.lit(float(c)) for c in cuts])
    return F.coalesce(
        F.aggregate(
            cuts_arr,
            F.lit(0),
            lambda acc, c: acc + F.when(F.col(col).cast("double") > c, 1).otherwise(0),
        ),
        F.lit(0),
    )


def _morton(indices: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each index: bit j of column c lands at
    position j * n_cols + c. Fixed unroll — pure codegen arithmetic."""
    n = len(indices)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for c, idx in enumerate(indices):
            bit = F.shiftright(idx.cast("long"), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + c))
    return z


def zorder_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = DEFAULT_BITS,
    boundaries: Mapping[str, Sequence[float]] | None = None,
    out_col: str = "__zorder",
) -> DataFrame:
    """Append the Morton code of the given columns' equi-depth ranks.

    ``boundaries[col]`` overrides the quantile cut points (must be
    sorted, length ``2**bits - 1``-or-less); otherwise one
    ``approxQuantile`` pass per call computes them at 1% relative error
    (rank resolution, not value precision — error only blurs bucket
    edges, never correctness).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{bits} bits x {len(cols)} cols exceeds the 63-bit z-value"
        )
    n_buckets = 1 << bits
    cut_map: dict[str, Sequence[float]] = {}
    for c in cols:
        if boundaries is not None and c in boundaries:
            cuts = list(boundaries[c])
            if len(cuts) > n_buckets - 1:
                # _morton drops bits above `bits`, which would silently
                # fold high buckets onto low ones — corrupt clustering,
                # not an error. Refuse instead.
                raise ValueError(
                    f"boundaries[{c!r}] has {len(cuts)} cut points; max is "
                    f"2**bits - 1 = {n_buckets - 1} (raise bits or thin the cuts)"
                )
            cut_map[c] = cuts
    missing = [c for c in cols if c not in cut_map]
    if missing:
        # One multi-column approxQuantile = one scan for every column.
        probs = [i / n_buckets for i in range(1, n_buckets)]
        for c, cuts in zip(missing, df.approxQuantile(missing, probs, 0.01)):
            cut_map[c] = cuts
    indices = [_bucket_index(c, cut_map[c]) for c in cols]
    return df.withColumn(out_col, _morton(indices, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int = DEFAULT_BITS,
    boundaries: Mapping[str, Sequence[float]] | None = None,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    z-curve: range-partition by z-value (equal-size files via range
    sampling), sort within each, drop the helper column. Row-group
    min/max stats on every clustered column then prune point/range
    scans regardless of which dimension the predicate touches."""
    zdf = zorder_value(df, cols, bits=bits, boundaries=boundaries)
    (
        zdf.repartitionByRange(n_files, F.col("__zorder"))
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
        .parquet(path)
    )
