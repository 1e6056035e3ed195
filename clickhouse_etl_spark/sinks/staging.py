"""Staging → publish: atomic table swaps for full-refresh loads.

reference: both flagship loads land in ``*_staging`` tables
(apps/airflow/dags/student_scores_subject/
etl_student_scores_subject_month_to_clickhouse.py:590 →
``student_month_subject_score_staging``; …student_transcript/…:529 →
``student_transcript_staging``) so readers never see a half-loaded table.

Parquet analog: write the new snapshot to a versioned staging directory,
then flip a tiny ``_CURRENT`` pointer file — readers resolve the pointer
and always see a complete snapshot; the previous version stays on disk for
instant rollback. On object stores the pointer write is the only operation
that needs atomicity (single small file), which S3/GCS give.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


CURRENT_MARKER = "_CURRENT"


def publish_snapshot(
    df: DataFrame,
    table_root: str,
    version: str,
    partition_by: str | None = None,
) -> str:
    """Write ``df`` as ``{table_root}/v={version}`` and atomically point
    ``_CURRENT`` at it. Returns the snapshot path."""
    snap = f"{table_root}/v={version}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(snap)

    root = Path(table_root)
    root.mkdir(parents=True, exist_ok=True)
    tmp = root / f"{CURRENT_MARKER}.tmp"
    tmp.write_text(f"v={version}")
    os.replace(tmp, root / CURRENT_MARKER)  # atomic on POSIX
    return snap


def read_current(spark: SparkSession, table_root: str) -> DataFrame:
    """Resolve the ``_CURRENT`` pointer and read that snapshot."""
    pointer = Path(table_root) / CURRENT_MARKER
    version_dir = pointer.read_text().strip()
    return spark.read.parquet(f"{table_root}/{version_dir}")


def list_versions(table_root: str) -> list[str]:
    root = Path(table_root)
    return sorted(p.name for p in root.glob("v=*") if p.is_dir())


def rollback(table_root: str, version: str) -> None:
    """Point ``_CURRENT`` back at an existing older snapshot."""
    root = Path(table_root)
    if not (root / f"v={version}").is_dir():
        raise FileNotFoundError(f"no snapshot v={version} under {table_root}")
    tmp = root / f"{CURRENT_MARKER}.tmp"
    tmp.write_text(f"v={version}")
    os.replace(tmp, root / CURRENT_MARKER)