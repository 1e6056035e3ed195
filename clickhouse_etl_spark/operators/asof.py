"""As-of (temporal) join — an operator Spark's join surface lacks.

Not present in the reference (SURVEY.md §2.4: equi-joins only); provided
as engine extension surface because time-series enrichment ("attach the
most recent quote/config/state at or before each event") is a staple the
reference's users would reach for next.

Scale design — the union+window trick, NOT a range-condition join:
a theta join on ``r.ts <= l.ts`` explodes into a near-cross-product per
key before taking the max; instead we union both sides, sort within each
key once (single shuffle), and carry the right side's last non-null
values forward with ``last(..., ignorenulls=True)``. Cost: one shuffle +
one sort over |L|+|R| — linear, skew-handled by AQE like any window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    suffix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same key group (backward as-of).

    ``value_cols``: right columns to carry (default: all non-key,
    non-ts). Right rows tie-broken deterministically: if several share a
    timestamp, the one latest in ``value_cols[0]``'s sort order wins —
    callers needing a specific policy should pre-dedup the right side
    (e.g. ``latest_row_per_key``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]

    # The right side's values travel as ONE struct (non-null per right
    # row even when every field is null), so the forward fill carries the
    # whole matched row atomically — per-column last(ignorenulls) would
    # stitch fields from DIFFERENT right rows whenever the most recent
    # one holds a null in some column, diverging from as-of semantics.
    r_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    r_struct_type = right.select(r_struct.alias("__rrow")).schema["__rrow"].dataType

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(r_struct_type).alias("__rrow"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l_tagged.schema["__lrow"].dataType
        ).alias("__lrow"),
        r_struct.alias("__rrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort BEFORE left rows at equal __ts → "at or before".
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("__rrow", ignorenulls=True).over(w).alias("__rfill")
    )
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"__rfill.{c}").alias(f"{suffix}{c}") for c in value_cols
    ]
    return filled.filter(F.col("__is_left") == 1).select(*out_cols)
