"""Grouped-map (applyInPandas) operators — per-group Python where the
whole group must be in hand at once.

Median/MAD robust outlier flagging is the canonical case: the per-group
MEDIAN (and the median of absolute deviations around it) is not an
algebraic aggregate, so the clean expression is one Arrow batch per group.
Scale notes: group count is the parallelism unit (users/schools — many),
group size is the memory unit (bounded per key); skewed giant groups are
the thing to watch, same as any groupBy.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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
