"""Staging → publish: atomic table swaps for full-refresh loads.

reference: both flagship loads land in ``*_staging`` tables
(apps/airflow/dags/student_scores_subject/
etl_student_scores_subject_month_to_clickhouse.py:590 →
``student_month_subject_score_staging``; …student_transcript/…:529 →
``student_transcript_staging``) so readers never see a half-loaded table.

Parquet analog: write the new snapshot to a versioned staging directory,
then flip a tiny ``_CURRENT`` pointer file — readers resolve the pointer
and always see a complete snapshot; the previous version stays on disk for
instant rollback.

POINTER I/O IS LOCAL-FILESYSTEM ONLY in this implementation (pathlib +
``os.replace``): ``table_root`` must be a path visible to the driver
(local disk, NFS, a fuse mount). An ``s3a://``/``gs://`` root would
write the PARQUET to the object store but the pointer to a bogus local
path — guarded below. The object-store port swaps the three pointer
touch points for the Hadoop FileSystem API (a single-object PUT, which
S3/GCS make atomic); the snapshot layout and swap protocol are
unchanged.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


CURRENT_MARKER = "_CURRENT"


def _require_local_root(table_root: str) -> None:
    """Pointer I/O uses pathlib/os.replace — driver-local paths only
    (see module doc). An object-store URI would silently write the
    pointer to a bogus local directory."""
    if "://" in table_root:
        raise ValueError(
            f"table_root {table_root!r} is a URI: the _CURRENT pointer "
            "is managed with local-filesystem I/O — use a driver-visible "
            "path, or port the pointer ops to the Hadoop FileSystem API "
            "for object stores"
        )


def publish_snapshot(
    df: DataFrame,
    table_root: str,
    version: str,
    partition_by: str | None = None,
) -> str:
    """Write ``df`` as ``{table_root}/v={version}`` and atomically point
    ``_CURRENT`` at it. Returns the snapshot path."""
    _require_local_root(table_root)
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
    _require_local_root(table_root)
    pointer = Path(table_root) / CURRENT_MARKER
    version_dir = pointer.read_text().strip()
    return spark.read.parquet(f"{table_root}/{version_dir}")


def current_version(table_root: str) -> str | None:
    """The version ``_CURRENT`` points at, or None when unpublished.
    Consumers that need replay idempotence (additive streaming merges)
    compare this against their batch id before applying."""
    _require_local_root(table_root)
    pointer = Path(table_root) / CURRENT_MARKER
    if not pointer.exists():
        return None
    return pointer.read_text().strip().removeprefix("v=")


def list_versions(table_root: str) -> list[str]:
    root = Path(table_root)
    return sorted(p.name for p in root.glob("v=*") if p.is_dir())


def rollback(table_root: str, version: str) -> None:
    """Point ``_CURRENT`` back at an existing older snapshot."""
    _require_local_root(table_root)
    root = Path(table_root)
    if not (root / f"v={version}").is_dir():
        raise FileNotFoundError(f"no snapshot v={version} under {table_root}")
    tmp = root / f"{CURRENT_MARKER}.tmp"
    tmp.write_text(f"v={version}")
    os.replace(tmp, root / CURRENT_MARKER)


def delete_versions_older_than(
    table_root: str, keep_latest: int = 2
) -> list[str]:
    """G4 retention: drop all but the newest ``keep_latest`` snapshots.

    The engine analog of the reference's log-retention DAG
    (apps/airflow/dags/cleanup/clean_logs.py:21-24 — delete artifacts
    older than a horizon, keep the recent tail). Versions sort
    lexicographically (timestamps/zero-padded counters — the publish
    convention), the ``_CURRENT`` target is never deleted regardless of
    age, and the pointer file is untouched. Returns the deleted version
    names (``v=...``).
    """
    _require_local_root(table_root)
    if keep_latest < 1:
        raise ValueError(f"keep_latest must be >= 1, got {keep_latest}")
    root = Path(table_root)
    versions = list_versions(table_root)
    pointer = root / CURRENT_MARKER
    current = pointer.read_text().strip() if pointer.exists() else None
    doomed = [
        v
        for v in versions[: max(0, len(versions) - keep_latest)]
        if v != current
    ]
    import shutil

    for v in doomed:
        shutil.rmtree(root / v)
    return doomed