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

    def _flush(self, applied: set[str]) -> None:
        self.ledger_path.parent.mkdir(parents=True, exist_ok=True)
        self.ledger_path.write_text(json.dumps(sorted(applied)))

    @staticmethod
    def _statements(sql_text: str) -> list[str]:
        """Split on semicolons OUTSIDE quoted literals ('...'/"...",
        with doubled-quote escapes) — a naive split(';') would truncate
        any statement containing ';' inside a string."""
        stmts, buf, quote = [], [], None
        i, n = 0, len(sql_text)
        while i < n:
            ch = sql_text[i]
            if quote:
                buf.append(ch)
                if ch == quote:
                    if i + 1 < n and sql_text[i + 1] == quote:  # escaped ''
                        buf.append(quote)
                        i += 1
                    else:
                        quote = None
            elif ch in ("'", '"'):
                quote = ch
                buf.append(ch)
            elif ch == ";":
                stmts.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
            i += 1
        stmts.append("".join(buf))
        return [s for s in stmts if s.strip()]

    def run(self) -> list[str]:
        """Apply pending ``*.sql`` files in filename order; return applied.

        The ledger is flushed after EVERY file (as the reference's
        entrypoint does): a failure in file N must not lose the record
        of files 1..N-1 applied in the same run, or their non-idempotent
        statements would re-execute on the next attempt.
        """
        applied = self._applied()
        newly: list[str] = []
        for sql_file in sorted(self.migrations_dir.glob("*.sql")):
            if sql_file.name in applied:
                continue
            for stmt in self._statements(sql_file.read_text()):
                self.spark.sql(stmt)
            applied.add(sql_file.name)
            newly.append(sql_file.name)
            self._flush(applied)
        return newly
