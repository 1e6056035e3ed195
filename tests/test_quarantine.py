"""Dead-letter ingestion — clean/quarantine split semantics."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import types as T

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.sources.quarantine import (
    read_csv_quarantined,
    read_jsonl_quarantined,
    write_quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_csv_split(spark, tmp_path):
    path = _write(
        tmp_path,
        "in.csv",
        [
            "id,name,amount",
            "1,alice,10.5",
            "2,bob,not_a_number",  # bad type -> quarantine
            "3,carol,7.25",
            '4,"dave',              # unterminated quote -> quarantine
        ],
    )
    batch = read_csv_quarantined(spark, path, SCHEMA)
    clean = {r.id: (r.name, r.amount) for r in batch.clean.collect()}
    assert clean == {1: ("alice", 10.5), 3: ("carol", 7.25)}
    q = batch.quarantine.collect()
    assert len(q) == 2
    raws = {r.raw_record for r in q}
    assert any("not_a_number" in r for r in raws)
    assert all(r.source_file.endswith("in.csv") for r in q)


def test_jsonl_split(spark, tmp_path):
    path = _write(
        tmp_path,
        "in.jsonl",
        [
            '{"id": 1, "name": "alice", "amount": 10.5}',
            '{"id": 2, "name": "bob", "amount": }',    # broken JSON
            '{"id": "x3", "name": "carol", "amount": 1.0}',  # bad type
            '{"id": 4, "name": "dave", "amount": 2.0}',
        ],
    )
    batch = read_jsonl_quarantined(spark, path, SCHEMA)
    clean_ids = {r.id for r in batch.clean.collect()}
    assert clean_ids == {1, 4}
    assert batch.quarantine.count() == 2


def test_clean_schema_has_no_corrupt_column(spark, tmp_path):
    path = _write(tmp_path, "a.csv", ["id,name,amount", "1,a,2.0"])
    batch = read_csv_quarantined(spark, path, SCHEMA)
    assert batch.clean.columns == ["id", "name", "amount"]
    assert set(batch.quarantine.columns) == {
        "raw_record", "source_file", "quarantined_at",
    }


def test_quarantine_roundtrip(spark, tmp_path):
    path = _write(
        tmp_path, "b.csv", ["id,name,amount", "1,a,2.0", "2,b,zzz"]
    )
    batch = read_csv_quarantined(spark, path, SCHEMA)
    qdir = str(tmp_path / "deadletter")
    write_quarantine(batch, qdir)
    back = spark.read.parquet(qdir)
    assert back.count() == 1
    assert "zzz" in back.first().raw_record
