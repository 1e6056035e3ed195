"""Grouped-map (applyInPandas) operators — per-group Python where the
whole group must be in hand at once — and their JVM twins where the
"non-algebraic" aggregate is in fact expressible with built-ins.

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
