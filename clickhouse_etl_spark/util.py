"""Small engine utilities shared across operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_compute(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Spread a *byte-small but CPU-heavy* input across the cluster.

    Parquet splits by bytes (spark.sql.files.maxPartitionBytes), so a few-MB
    documents table arrives as 1 partition and a per-row-expensive operator
    (MinHash shingling, SimHash, feature extraction) runs on one core. When
    the scan yields fewer partitions than the available parallelism,
    repartition up; when the input is already wide (the 100 TB case) this is
    a no-op — no shuffle added.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
