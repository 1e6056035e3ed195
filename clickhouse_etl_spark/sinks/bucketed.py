"""Bucketed tables — shuffle-free co-located joins (the 100 TB join plan).

The reference's biggest repeated cost would be the scores⨝students-style
join on every run. Bucketing both sides on the join key at WRITE time
(``bucketBy`` + ``sortBy``) lets every subsequent join run with zero
exchange: matching buckets are read task-aligned. This is the Spark
analog of MergeTree's co-located ``ORDER BY`` layout plus a bucket count.

Caveats encoded here:
- bucketed writes must go through ``saveAsTable`` (the bucket metadata
  lives in the catalog, not the parquet footer);
- both join sides need the SAME bucket count on the SAME key;
- sortBy within buckets additionally removes the in-task sort for
  sort-merge joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: str | Sequence[str],
    num_buckets: int = 16,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).bucketBy(num_buckets, *cols)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables — plans with no shuffle on
    either side (asserted in tests via the physical plan)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)
