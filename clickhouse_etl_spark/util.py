"""Small engine utilities shared across operator modules."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Engine-wide materialization strategy (see :func:`materialize`).
_MATERIALIZE_MODE: str | None = None

_MATERIALIZE_MODES = ("localCheckpoint", "checkpoint", "persist", "none")


def set_materialize_mode(mode: str | None) -> None:
    """Set the engine-wide default for :func:`materialize`.

    ``localCheckpoint`` (default) | ``checkpoint`` | ``persist`` | ``none``.
    ``None`` resets to the built-in default. Can also be set via the
    ``SPARK_GRAFT_MATERIALIZE`` environment variable (the explicit setter
    wins).
    """
    if mode is not None and mode not in _MATERIALIZE_MODES:
        raise ValueError(f"materialize mode must be one of {_MATERIALIZE_MODES}")
    global _MATERIALIZE_MODE
    _MATERIALIZE_MODE = mode


def materialize(
    df: DataFrame, mode: str | None = None, cut_lineage: bool = False
) -> DataFrame:
    """Cache / checkpoint an intermediate that multiple downstream
    branches consume, with a cluster-appropriate strategy:

    - ``persist`` (default) — lazy MEMORY_AND_DISK cache; keeps lineage
      (fault recovery recomputes — cluster-safe), no eager barrier, no
      serialize-everything job. Measured fastest on local[32] too (the
      eager localCheckpoint serialization of wide intermediates cost
      more than it saved).
    - ``localCheckpoint`` — eager, executor-local blocks, TRUNCATES
      lineage. The blocks are unreplicated executor state: on a real
      cluster an executor loss kills the job — local-mode only.
    - ``checkpoint`` — eager, written to the reliable checkpoint dir
      (HDFS/object store), truncates lineage AND survives executor
      loss. The cluster mode for lineage cuts. Requires
      ``spark.sparkContext.setCheckpointDir(...)`` first.
    - ``none`` — pass-through (recompute per consumer).

    ``cut_lineage=True`` marks call sites that NEED plan truncation
    (fixed-point loops whose plans would otherwise grow each iteration):
    when the resolved mode doesn't truncate (persist/none), it is
    escalated to ``checkpoint`` if a checkpoint dir is configured, else
    ``localCheckpoint``.

    Resolution order: explicit ``mode`` arg → ``set_materialize_mode`` →
    ``$SPARK_GRAFT_MATERIALIZE`` → ``persist``.
    """
    mode = (
        mode
        or _MATERIALIZE_MODE
        or os.environ.get("SPARK_GRAFT_MATERIALIZE")
        or "persist"
    )
    if mode not in _MATERIALIZE_MODES:
        raise ValueError(f"materialize mode must be one of {_MATERIALIZE_MODES}")
    if cut_lineage and mode in ("persist", "none"):
        has_dir = df.sparkSession.sparkContext.getCheckpointDir() is not None
        mode = "checkpoint" if has_dir else "localCheckpoint"
    if mode == "none":
        return df
    if mode == "localCheckpoint":
        return df.localCheckpoint(eager=True)
    if mode == "checkpoint":
        if df.sparkSession.sparkContext.getCheckpointDir() is None:
            raise RuntimeError(
                "materialize(mode='checkpoint') needs a reliable checkpoint "
                "dir: call spark.sparkContext.setCheckpointDir('<hdfs/s3 path>')"
            )
        return df.checkpoint(eager=True)
    return df.persist()


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
