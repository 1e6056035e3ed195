"""S7 — incremental high-watermark ledger.

reference: apps/airflow/dags/student/etl_students_to_clickhouse.py:31,24-25,
143-146 stores per-pipeline watermarks in Airflow Variables and — a benign
race — commits ``datetime.now()`` *after* the load, so rows updated between
extract and commit are skipped until the next run reprocesses them.

The engine fixes that: the committed watermark is ``max(updatedAt)`` of the
batch actually loaded, persisted in a tiny parquet ledger (one row per
pipeline, last-writer-wins by commit time). On a cluster this ledger lives
on shared storage (S3/HDFS) next to the warehouse.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from pathlib import Path

EPOCH = "1970-01-01T00:00:00"


class WatermarkLedger:
    """File-backed watermark store (JSON lines; tiny, driver-side only)."""

    def __init__(self, path: str) -> None:
        self._path = Path(path)
        self._path.parent.mkdir(parents=True, exist_ok=True)

    def get(self, pipeline: str, default: str = EPOCH) -> str:
        if not self._path.exists():
            return default
        best = default
        with self._path.open() as f:
            for line in f:
                rec = json.loads(line)
                if rec["pipeline"] == pipeline and rec["watermark"] > best:
                    best = rec["watermark"]
        return best

    def commit(self, pipeline: str, watermark: str | dt.datetime) -> None:
        if isinstance(watermark, dt.datetime):
            watermark = watermark.strftime("%Y-%m-%dT%H:%M:%S.%f")
        rec = {"pipeline": pipeline, "watermark": str(watermark)}
        with self._path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
