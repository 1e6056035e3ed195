"""Per-group analytics: grouped-map (applyInPandas) operators — with
JVM twins where the "non-algebraic" aggregate is in fact expressible
with built-ins — plus the ClickHouse-dialect grouped aggregates the
reference's warehouse serves (:func:`top_k_per_group` ≙ topK,
:func:`histogram_fixed` ≙ histogram).

Median/MAD robust outlier flagging ships in BOTH forms:

- :func:`mad_outliers_jvm` (the default in the registered query): two
  ``percentile`` aggregations + joins — pure whole-stage codegen, no
  Python in the row path, no per-group memory cliff, skew handled by AQE
  like any aggregation (~6× faster than the pandas path at sf0.1).
- :func:`mad_outliers` (applyInPandas): the grouped-map UDF *seam* kept
  for logic that genuinely needs the whole group in Python; a single
  skewed user becomes a straggler/OOM group here, which is exactly why
  the JVM twin is the default. Equality asserted in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mad_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Flag per-group robust outliers: |x − median| > threshold × MAD.

    NULL values are excluded (SQL-aggregate semantics). Output: keys +
    value + group median + group MAD + is_outlier. Runs as
    ``groupBy(keys).applyInPandas`` — one vectorized numpy pass per group.
    """
    key_fields = [df.schema[k] for k in keys]
    out_schema = T.StructType(
        list(key_fields)
        + [
            T.StructField(value_col, T.DoubleType()),
            T.StructField("group_median", T.DoubleType()),
            T.StructField("group_mad", T.DoubleType()),
            T.StructField("is_outlier", T.BooleanType()),
        ]
    )
    keys_l = list(keys)

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        clean = pdf.dropna(subset=[value_col])
        if clean.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        vals = clean[value_col].to_numpy(dtype=np.float64)
        med = float(np.median(vals))
        mad = float(np.median(np.abs(vals - med)))
        flag = (mad > 0) & (np.abs(vals - med) > threshold * mad)
        out = clean[keys_l].copy()
        out[value_col] = vals
        out["group_median"] = med
        out["group_mad"] = mad
        out["is_outlier"] = flag
        return out

    return df.groupBy(*keys_l).applyInPandas(per_group, schema=out_schema)


def mad_outliers_jvm(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """JVM two-pass twin of :func:`mad_outliers` (same output contract).

    Pass 1: per-group median via ``percentile(value, 0.5)`` (Spark's
    interpolated percentile == numpy median). Pass 2: join the median
    back, aggregate the median of |x − median| (the MAD), join again,
    flag. Two shuffles on the group keys, zero Python — the plan is all
    HashAggregate/SortMergeJoin inside whole-stage codegen, so there is
    no per-group memory cliff and AQE splits skewed keys.
    """
    keys_l = list(keys)
    clean = df.filter(F.col(value_col).isNotNull())
    med = clean.groupBy(*keys_l).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("group_median")
    )

    # Null-SAFE key equality: groupBy keeps a NULL key as its own group
    # (as does the applyInPandas twin), so the join back must match it
    # too — a null-unsafe `on=keys` would silently drop NULL-keyed rows
    # and break the pinned twin equality.
    def nulljoin(left: DataFrame, right: DataFrame) -> DataFrame:
        cond = None
        for k in keys_l:
            c = left[k].eqNullSafe(right[k])
            cond = c if cond is None else cond & c
        return left.join(right, on=cond).drop(*[right[k] for k in keys_l])

    with_med = nulljoin(clean, med)
    mad = with_med.groupBy(*keys_l).agg(
        F.expr(f"percentile(abs({value_col} - group_median), 0.5)").alias(
            "group_mad"
        )
    )
    flagged = nulljoin(with_med, mad)
    return flagged.select(
        *keys_l,
        F.col(value_col).cast("double").alias(value_col),
        "group_median",
        "group_mad",
        (
            (F.col("group_mad") > 0)
            & (F.abs(F.col(value_col) - F.col("group_median"))
               > threshold * F.col("group_mad"))
        ).alias("is_outlier"),
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 5,
) -> DataFrame:
    """Per-group top-k most frequent values — the exact form of
    ClickHouse's ``topK(k)(col)`` (the reference's warehouse dialect;
    ClickHouse's version is approximate Filtered-Space-Saving, this one
    is exact with a deterministic (count desc, value asc) tiebreak).

    Plan: groupBy(group, value) count — the map-side partial collapses
    hot values per partition, so Zipf-headed columns shuffle one row
    per distinct (group, value) pair, not per occurrence — then one
    ranking window per group over the (much smaller) count table.
    NULL values are ignored (ClickHouse topK skips NULLs too).

    Output: ``(*group_cols, value_col, n, rank)``, ≤k rows per group.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be positive")
    counted = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("n").desc(), F.col(value_col).asc()
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def histogram_fixed(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    group_cols: Sequence[str] = (),
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equal-width histogram with EXACT counts — the engine's analog of
    ClickHouse ``histogram(bins)(col)`` (that one adapts bin edges per
    stream; fixed edges are the honest distributed form — adaptive
    edges depend on merge order, so two runs of the same query could
    disagree).

    With ``lo``/``hi`` given the plan is ONE aggregation pass. When
    omitted they come from a global min/max scalar aggregate first
    (a second, cheap pass — broadcast into the binning expression).
    Values land in ``floor((v - lo) / width)`` clamped to [0, bins-1]
    (the top edge closes the last bin, ClickHouse-style); NULLs and
    NaNs are dropped. Out-of-range values under explicit bounds are
    CLAMPED into the edge bins (so the histogram always accounts for
    every non-null row — the count invariant tests rely on it).

    Output: ``(*group_cols, bin, bin_lo, bin_hi, n)`` — only non-empty
    bins are emitted (a dense grid at 100 TB × many groups is mostly
    zeros; densify with a sequence() cross join when a consumer needs
    it).
    """
    if bins <= 0:
        raise ValueError("bins must be positive")
    if (lo is None) != (hi is None):
        # a lone bound would be silently ignored below — refuse instead
        raise ValueError("pass both lo and hi, or neither")
    if lo is not None and hi is not None and float(lo) >= float(hi):
        # a negative/zero width would route every row to bin 0 with
        # descending bin edges — refuse, mirroring the lone-bound check
        raise ValueError(f"lo must be < hi, got lo={lo} hi={hi}")
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & ~F.isnan(v))
    if lo is None or hi is None:
        bounds = base.agg(
            F.min(v).alias("__lo"), F.max(v).alias("__hi")
        )
        base = base.crossJoin(F.broadcast(bounds))
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
    else:
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    width = (hi_c - lo_c) / F.lit(bins)
    raw = F.when(width > 0, F.floor((v - lo_c) / width)).otherwise(F.lit(0))
    bin_idx = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        base.groupBy(*group_cols, bin_idx.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first(lo_c).alias("__lo0"),
            F.first(width).alias("__w"),
        )
        .select(
            *group_cols,
            "bin",
            (F.col("__lo0") + F.col("bin") * F.col("__w")).alias("bin_lo"),
            (F.col("__lo0") + (F.col("bin") + 1) * F.col("__w")).alias("bin_hi"),
            "n",
        )
    )


_SPARK_GLYPHS = "▁▂▃▄▅▆▇█"


def sparkbar(
    df: DataFrame,
    value_col: str,
    buckets: int = 20,
    group_cols: Sequence[str] = (),
    lo: float | None = None,
    hi: float | None = None,
    out: str = "sparkbar",
) -> DataFrame:
    """ClickHouse ``sparkbar(buckets)(x)``: the distribution of
    ``value_col`` rendered as a fixed-width unicode bar string per
    group — the glanceable histogram for dashboards and data cards.

    Bounds: with ``lo``/``hi`` omitted, each group is binned over its
    OWN min/max (ClickHouse semantics — a per-group bar must show that
    group's shape, not its position in the global range); the bounds
    come from one cheap pre-aggregation broadcast back onto the rows.
    Explicit ``lo``/``hi`` apply to every group with
    :func:`histogram_fixed`-style clamped edge bins.

    Rendering: empty buckets are a space, non-empty ones the 8
    block-element glyphs with ``ceil(8 * n / max_n)`` scaling, so the
    tallest bucket is always a full block. (ClickHouse's own glyph
    scaling differs in sub-glyph rounding; the shape reads the same.)
    All JVM: counts are one hash aggregation with map-side partials,
    the glyph assembly one collect_list over the ≤ ``buckets``
    non-empty bins per group.
    """
    if buckets <= 0:
        raise ValueError("buckets must be positive")
    if (lo is None) != (hi is None):
        raise ValueError("pass both lo and hi, or neither")
    if lo is not None and hi is not None and float(lo) >= float(hi):
        raise ValueError(f"lo must be < hi, got lo={lo} hi={hi}")
    gcols = list(group_cols)
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & ~F.isnan(v))
    if lo is None:
        bounds = base.groupBy(*gcols).agg(
            F.min(v).alias("__lo"), F.max(v).alias("__hi")
        )
        joined = (
            base.join(F.broadcast(bounds), on=gcols)
            if gcols
            else base.crossJoin(F.broadcast(bounds))
        )
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
    else:
        joined = base
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    width = (hi_c - lo_c) / F.lit(buckets)
    raw = F.when(width > 0, F.floor((v - lo_c) / width)).otherwise(F.lit(0))
    bin_idx = F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1)).cast("int")
    counts = joined.groupBy(*gcols, bin_idx.alias("__bin")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    entries = F.map_from_entries(
        F.collect_list(F.struct(F.col("__bin"), F.col("__n")))
    )
    # try_element_at, not element_at: missing keys must be NULL->0 even
    # under ANSI mode (a caller's own session may not pin ansi=false)
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(buckets - 1)),
        lambda i: F.coalesce(F.try_element_at(entries, i), F.lit(0)),
    )
    glyphs = F.array(*[F.lit(c) for c in _SPARK_GLYPHS])
    mx = F.array_max(dense)
    bar = F.array_join(
        F.transform(
            dense,
            lambda n: F.when(n == 0, F.lit(" ")).otherwise(
                F.try_element_at(glyphs, F.ceil(n * 8 / mx).cast("int"))
            ),
        ),
        "",
    )
    return counts.groupBy(*gcols).agg(bar.alias(out))
