"""S7 watermark ledger, K1/O2 MergeTree-mapped writes, K5 migrations."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.sinks.writers import write_mergetree_mapped
from clickhouse_etl_spark.sources.readers import commit_watermark, incremental_read
from clickhouse_etl_spark.sources.watermark import EPOCH, WatermarkLedger
from tests.conftest import SF_SMOKE


def test_watermark_ledger_roundtrip(tmp_path):
    ledger = WatermarkLedger(str(tmp_path / "wm.jsonl"))
    assert ledger.get("p1") == EPOCH
    ledger.commit("p1", "2024-01-15T00:00:00.000000")
    ledger.commit("p1", "2024-02-01T00:00:00.000000")
    ledger.commit("p2", "2024-03-01T00:00:00.000000")
    assert ledger.get("p1").startswith("2024-02-01")
    assert ledger.get("p2").startswith("2024-03-01")
    # stale commit never regresses the watermark (max wins)
    ledger.commit("p1", "2023-01-01T00:00:00.000000")
    assert ledger.get("p1").startswith("2024-02-01")


def test_incremental_read_and_commit(spark, tmp_path):
    ledger = WatermarkLedger(str(tmp_path / "wm.jsonl"))
    events = load_table(spark, SF_SMOKE, "events")
    full = events.count()

    batch1 = incremental_read(events, ledger, "events", ts_col="ts")
    assert batch1.count() == full  # epoch watermark → everything

    wm = commit_watermark(batch1, ledger, "events", ts_col="ts")
    assert wm is not None
    batch2 = incremental_read(events, ledger, "events", ts_col="ts")
    assert batch2.count() == 0  # nothing newer than max(ts) of batch1

    # committed watermark == max(ts): strictly-greater semantics exclude
    # the boundary row itself (no double-processing).
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    assert wm == max_ts.strftime("%Y-%m-%dT%H:%M:%S.%f")


def test_mergetree_mapped_write_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [("s1", 2, "b"), ("s1", 1, "a"), ("s2", 9, "z")],
        ["schoolId", "sortK", "v"],
    )
    out = str(tmp_path / "warehouse")
    write_mergetree_mapped(df, out, partition_by="schoolId", order_by=["sortK"])
    # hive partition dirs exist → partition pruning on read
    assert sorted(
        d for d in os.listdir(out) if d.startswith("schoolId=")
    ) == ["schoolId=s1", "schoolId=s2"]
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert set(back.columns) == {"schoolId", "sortK", "v"}
    # partition filter prunes files (plan shows partition filter count)
    pruned = back.filter(F.col("schoolId") == "s1")
    assert pruned.count() == 2


def test_staging_publish_swap_and_rollback(spark, tmp_path):
    from clickhouse_etl_spark.sinks.staging import (
        list_versions,
        publish_snapshot,
        read_current,
        rollback,
    )

    root = str(tmp_path / "fact_table")
    v1 = spark.createDataFrame([(1, "a")], ["k", "v"])
    v2 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])

    publish_snapshot(v1, root, "20240101")
    assert read_current(spark, root).count() == 1

    publish_snapshot(v2, root, "20240102")
    assert read_current(spark, root).count() == 2
    assert list_versions(root) == ["v=20240101", "v=20240102"]

    rollback(root, "20240101")
    assert read_current(spark, root).count() == 1  # instant rollback
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        rollback(root, "19990101")


def test_migration_runner_idempotent(spark, tmp_path):
    from clickhouse_etl_spark.sinks.migrations import MigrationRunner

    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_create.sql").write_text(
        "CREATE OR REPLACE TEMP VIEW mig_v1 AS SELECT 1 AS x"
    )
    (mdir / "002_more.sql").write_text(
        "CREATE OR REPLACE TEMP VIEW mig_v2 AS SELECT 2 AS x;"
        "CREATE OR REPLACE TEMP VIEW mig_v3 AS SELECT 3 AS x"
    )
    runner = MigrationRunner(spark, str(mdir), str(tmp_path / "applied.json"))
    assert runner.run() == ["001_create.sql", "002_more.sql"]  # filename order
    assert runner.run() == []  # idempotent
    assert spark.table("mig_v3").collect()[0]["x"] == 3
    # a new migration dropped in later applies alone
    (mdir / "003_late.sql").write_text(
        "CREATE OR REPLACE TEMP VIEW mig_v4 AS SELECT 4 AS x"
    )
    assert runner.run() == ["003_late.sql"]


def test_compact_dataset_unpartitioned(spark, tmp_path):
    """Fragmented → compacted: file count collapses to the byte budget,
    values survive the rewrite exactly."""
    from clickhouse_etl_spark.sinks.compaction import compact_dataset

    src = str(tmp_path / "frag")
    dest = str(tmp_path / "compact")
    df = spark.range(10_000).selectExpr("id", "id % 7 AS v")
    df.repartition(40).write.parquet(src)  # 40 tiny files
    assert len(list((tmp_path / "frag").glob("*.parquet"))) == 40

    stats = compact_dataset(spark, src, dest, target_file_bytes=1 << 30)
    assert stats["rows"] == 10_000
    assert stats["files_written"] == 1
    assert len(list((tmp_path / "compact").glob("*.parquet"))) == 1
    back = spark.read.parquet(dest)
    assert back.count() == 10_000
    assert back.selectExpr("sum(v)").first()[0] == df.selectExpr("sum(v)").first()[0]


def test_compact_dataset_partitioned(spark, tmp_path):
    """Hive layout preserved; each partition's file count matches its own
    byte budget (big partitions keep several files, small ones get one)."""
    from clickhouse_etl_spark.sinks.compaction import compact_dataset

    src = str(tmp_path / "frag")
    dest = str(tmp_path / "compact")
    df = spark.range(20_000).selectExpr(
        "id", "CASE WHEN id % 10 < 9 THEN 'big' ELSE 'small' END AS part"
    )
    df.repartition(30).write.partitionBy("part").parquet(src)
    assert len(list((tmp_path / "frag" / "part=big").glob("*.parquet"))) == 30

    stats = compact_dataset(
        spark, src, dest, target_file_bytes=40_000, partition_by="part"
    )
    assert stats["rows"] == 20_000
    big = list((tmp_path / "compact" / "part=big").glob("*.parquet"))
    small = list((tmp_path / "compact" / "part=small").glob("*.parquet"))
    assert 1 <= len(small) < len(big) <= 30
    back = spark.read.parquet(dest)
    assert back.count() == 20_000
    assert sorted(map(tuple, back.groupBy("part").count().collect())) == sorted(
        map(tuple, df.groupBy("part").count().collect())
    )
    assert (
        back.selectExpr("sum(id)").first()[0] == df.selectExpr("sum(id)").first()[0]
    )


def test_compact_dataset_null_partition_rows_survive(spark, tmp_path):
    """Hive reads __HIVE_DEFAULT_PARTITION__ back as NULL; the budget
    join must be null-safe or those rows vanish from the rewrite."""
    from clickhouse_etl_spark.sinks.compaction import compact_dataset

    src, dest = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None)], ["id", "part"]
    )
    df.write.partitionBy("part").parquet(src)
    stats = compact_dataset(spark, src, dest, partition_by=["part"])
    back = spark.read.parquet(dest)
    assert back.count() == 4 == stats["rows"]
    assert back.filter("part IS NULL").count() == 2


def test_migration_ledger_survives_mid_run_failure(spark, tmp_path):
    """File 1's application is recorded even when file 2 fails, so a
    retry never re-executes file 1."""
    import pytest

    from clickhouse_etl_spark.sinks.migrations import MigrationRunner

    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_ok.sql").write_text(
        "CREATE TABLE IF NOT EXISTS mig_t1 (x INT) USING PARQUET "
        f"LOCATION '{tmp_path / 'mig_t1'}'"
    )
    (mdir / "002_bad.sql").write_text("THIS IS NOT SQL")
    runner = MigrationRunner(spark, str(mdir), str(tmp_path / "ledger.json"))
    with pytest.raises(Exception):
        runner.run()
    assert runner._applied() == {"001_ok.sql"}
    # Retry with 002 fixed applies ONLY 002.
    (mdir / "002_bad.sql").write_text("SELECT 1")
    assert runner.run() == ["002_bad.sql"]


def test_migration_semicolon_inside_literal(spark, tmp_path):
    """Statements containing ';' in a string literal are not split."""
    from clickhouse_etl_spark.sinks.migrations import MigrationRunner

    assert MigrationRunner._statements("SELECT 'a;b' AS c; SELECT 2") == [
        "SELECT 'a;b' AS c",
        " SELECT 2",
    ]
    assert MigrationRunner._statements("SELECT 'it''s;ok'") == [
        "SELECT 'it''s;ok'"
    ]


def test_incremental_read_returns_cached_batch(spark, tmp_path):
    """The batch is an EAGER lineage-cut snapshot so the sink write and
    the watermark max read the SAME data even under cache eviction or
    executor loss — a lazy cache would recompute lost blocks from the
    live source, reopening the lost-row race."""
    from clickhouse_etl_spark.sources.readers import incremental_read
    from clickhouse_etl_spark.sources.watermark import WatermarkLedger

    ledger = WatermarkLedger(str(tmp_path / "wm"))
    df = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00")], ["id", "updatedAt"]
    ).selectExpr("id", "CAST(updatedAt AS timestamp) updatedAt")
    batch = incremental_read(df, ledger, "p1")
    # Lineage truncated: the analyzed plan is a materialized RDD scan,
    # not the original source expression tree.
    plan = batch._jdf.queryExecution().optimizedPlan().toString()
    cached = batch.storageLevel.useMemory or batch.storageLevel.useDisk
    assert cached or ("LogicalRDD" in plan or "Scan ExistingRDD" in plan)
    assert batch.count() == 1


def test_staging_rejects_object_store_uri(spark):
    """Pointer I/O is local-only; URI roots must fail loudly, not write
    the pointer to a bogus local path."""
    import pytest

    from clickhouse_etl_spark.sinks.staging import publish_snapshot

    df = spark.range(1)
    with pytest.raises(ValueError, match="URI"):
        publish_snapshot(df, "s3a://bucket/table", "v1")


def test_mongo_exclusion_projection_rejected(spark):
    import pytest

    from clickhouse_etl_spark.sources.documents import mongo_projection_columns

    with pytest.raises(ValueError, match="exclusion"):
        mongo_projection_columns({"_id": 0})
    assert len(mongo_projection_columns({"name": 1})) == 1


def test_snapshot_retention_keeps_tail_and_current(spark, tmp_path):
    """G4: old snapshots are pruned, the newest keep_latest and the
    _CURRENT target always survive, and the pointer still resolves."""
    import pytest

    from clickhouse_etl_spark.sinks.staging import (
        delete_versions_older_than,
        list_versions,
        publish_snapshot,
        read_current,
        rollback,
    )

    root = str(tmp_path / "snaps")
    for v in ("20240101", "20240102", "20240103", "20240104"):
        publish_snapshot(spark.range(3), root, v)
    # roll back so _CURRENT points at an OLD version, then retain 2
    rollback(root, "20240102")
    deleted = delete_versions_older_than(root, keep_latest=2)
    assert deleted == ["v=20240101"]  # 20240102 is old but is _CURRENT
    assert list_versions(root) == ["v=20240102", "v=20240103", "v=20240104"]
    assert read_current(spark, root).count() == 3

    with pytest.raises(ValueError):
        delete_versions_older_than(root, keep_latest=0)


def test_align_to_schema_rules(spark):
    """Casts compatible columns, NULL-fills missing nullable ones, drops
    extras, and raises on a missing required column or kept extras."""
    import pytest
    from pyspark.sql import types as T

    from clickhouse_etl_spark.sinks.writers import align_to_schema

    df = spark.createDataFrame(
        [(1, "9.5", "x")], "id int, score string, junk string"
    )
    target = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("score", T.DoubleType(), nullable=True),
            T.StructField("note", T.StringType(), nullable=True),
        ]
    )
    out = align_to_schema(df, target)
    assert [f.name for f in out.schema.fields] == ["id", "score", "note"]
    row = out.collect()[0]
    assert (row.id, row.score, row.note) == (1, 9.5, None)
    assert dict((f.name, f.dataType) for f in out.schema.fields) == {
        "id": T.LongType(), "score": T.DoubleType(), "note": T.StringType()
    }

    with pytest.raises(ValueError, match="junk"):
        align_to_schema(df, target, drop_extra=False)

    required = T.StructType([T.StructField("absent", T.LongType(), False)])
    with pytest.raises(ValueError, match="non-nullable"):
        align_to_schema(df, required)


def test_predicates_post_dedup_requires_the_combination(spark):
    """predicates_post_dedup=True on a read without BOTH predicates and
    dedup_latest fails loudly (r8 ADVICE) — the flag acknowledges the
    post-dedup semantics of that specific combination, so a misplaced
    opt-in (wrong read, or predicates later moved to source_where) must
    not silently mean nothing. Raises before any JDBC connection."""
    import pytest

    from clickhouse_etl_spark.sources.readers import read_jdbc_table

    with pytest.raises(ValueError, match="no predicates were passed"):
        read_jdbc_table(
            spark,
            "jdbc:derby:memory:neverconnected",
            "t",
            predicates_post_dedup=True,
        )
    with pytest.raises(ValueError, match="dedup_latest is None"):
        read_jdbc_table(
            spark,
            "jdbc:derby:memory:neverconnected",
            "t",
            predicates=["x > 1"],
            predicates_post_dedup=True,
        )
