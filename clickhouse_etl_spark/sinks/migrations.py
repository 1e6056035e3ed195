"""K5 — idempotent, file-ordered migration runner.

reference: apps/clickhouse/custom_entrypoint.sh:36-56 applies
``migrations/*.sql`` once each, in filename order, tracking the applied set
in a ledger file. Same contract here over ``spark.sql`` DDL (CREATE
TABLE/VIEW IF NOT EXISTS against the session catalog), with the applied
set tracked in a local ledger.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import SparkSession


class MigrationRunner:
    def __init__(self, spark: SparkSession, migrations_dir: str, ledger_path: str) -> None:
        self.spark = spark
        self.migrations_dir = Path(migrations_dir)
        self.ledger_path = Path(ledger_path)

    def _applied(self) -> set[str]:
        if not self.ledger_path.exists():
            return set()
        return set(json.loads(self.ledger_path.read_text()))

    def run(self) -> list[str]:
        """Apply pending ``*.sql`` files in filename order; return applied."""
        applied = self._applied()
        newly: list[str] = []
        for sql_file in sorted(self.migrations_dir.glob("*.sql")):
            if sql_file.name in applied:
                continue
            for stmt in sql_file.read_text().split(";"):
                if stmt.strip():
                    self.spark.sql(stmt)
            applied.add(sql_file.name)
            newly.append(sql_file.name)
        self.ledger_path.parent.mkdir(parents=True, exist_ok=True)
        self.ledger_path.write_text(json.dumps(sorted(applied)))
        return newly
