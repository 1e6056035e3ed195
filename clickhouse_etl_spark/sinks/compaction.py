"""Small-file compaction for parquet datasets.

The operational counterpart of MergeTree's background merges (the
reference's storage engine merges parts continuously; a parquet lake has
to do it as an explicit job): long-running incremental ingestion (S7
watermark batches, streaming micro-batches) accretes thousands of tiny
files per partition, and at 100 TB the file count — not the byte count —
becomes the bottleneck (listing, footer reads, task scheduling).

``compact_dataset`` rewrites a dataset to approximately
``target_file_bytes`` per file:

- file sizes come from the filesystem listing (via Spark's Hadoop FS),
  not a guess;
- unpartitioned data is rewritten with one global ``repartition(n)``;
- hive-partitioned data keeps its partition layout: per-partition row
  counts (ONE aggregation — cardinality is the number of hive
  partitions, driver-safe by construction) size a per-partition file
  budget, and a deterministic salt spreads each partition's rows over
  exactly that many writer tasks — no partition ever collapses through
  one task, and no task writes hundreds of tiny files.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SALT = "__compaction_salt"


def _dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` from the Hadoop filesystem listing."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_dataset(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: str | Sequence[str] = (),
) -> dict[str, int]:
    """Rewrite ``src_path`` to ``dest_path`` with ~``target_file_bytes``
    files. Returns ``{"bytes": …, "rows": …, "files_written": …}``.

    ``partition_by`` must name the dataset's existing hive partition
    columns when it has them (the layout — and its pruning — is
    preserved). Compaction is a physical rewrite: values and schema pass
    through untouched, which the round-trip test pins.
    """
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df = spark.read.parquet(src_path)
    total_bytes = _dataset_bytes(spark, src_path)
    total_rows = df.count()
    if total_rows == 0:
        df.write.mode("overwrite").parquet(dest_path)
        return {"bytes": 0, "rows": 0, "files_written": 0}
    bytes_per_row = max(total_bytes / total_rows, 1e-9)

    if not parts:
        n_files = max(1, math.ceil(total_bytes / target_file_bytes))
        df.repartition(n_files).write.mode("overwrite").parquet(dest_path)
        return {
            "bytes": total_bytes,
            "rows": total_rows,
            "files_written": n_files,
        }

    # One row per hive partition — bounded by the partition count, which
    # a sane layout keeps in the thousands (driver-safe collect).
    sizes = df.groupBy(*parts).count().collect()
    budgets = [
        (row, max(1, math.ceil(row["count"] * bytes_per_row / target_file_bytes)))
        for row in sizes
    ]
    n_tasks = sum(k for _, k in budgets)
    budget_df = spark.createDataFrame(
        [tuple(row[p] for p in parts) + (k,) for row, k in budgets],
        parts + ["__files"],
    )
    # Deterministic salt in [0, __files): spreads each partition over
    # exactly its file budget. monotonically_increasing_id cycles through
    # pmod classes within every input split, so the spread is even.
    # Null-SAFE join keys: hive reads __HIVE_DEFAULT_PARTITION__ back as
    # NULL, and a null-unsafe `on=parts` would drop those rows from the
    # rewrite — silent data loss in a pure physical compaction.
    bcast = F.broadcast(budget_df)
    cond = None
    for p in parts:
        c = df[p].eqNullSafe(budget_df[p])
        cond = c if cond is None else cond & c
    salted = (
        df.join(bcast, on=cond, how="inner")
        .drop(*[budget_df[p] for p in parts])
        .withColumn(_SALT, F.pmod(F.monotonically_increasing_id(), F.col("__files")))
        .drop("__files")
    )
    (
        salted.repartition(n_tasks, *parts, F.col(_SALT))
        .drop(_SALT)
        .write.mode("overwrite")
        .partitionBy(*parts)
        .parquet(dest_path)
    )
    return {
        "bytes": total_bytes,
        "rows": total_rows,
        "files_written": n_tasks,
    }
