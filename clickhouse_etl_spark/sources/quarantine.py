"""Schema-enforced text ingestion with a bad-record quarantine.

The reference ingests whatever Postgres/Mongo hand it; a 100 TB landing
zone is messier — CSV/JSONL drops arrive with truncated lines, type
drift, and junk encodings, and a batch MUST NOT fail (or silently null
out) because 0.001% of rows are bad. The standard engine answer is the
dead-letter pattern implemented here:

- read PERMISSIVE with an explicit ``StructType`` + a
  ``columnNameOfCorruptRecord`` capture column (Spark's built-in
  malformed-row channel — the raw line is preserved verbatim);
- split the batch into (clean rows, quarantine rows) in ONE scan pass —
  the split is a filter on the corrupt column, no second read;
- the quarantine side carries the raw record, the source path
  (``input_file_name``) and ingest metadata so a human (or a repair
  job) can replay it later.

CSV caveat baked in: Spark's CSV parser only materializes the corrupt
column when the parsed schema carries it, and under column pruning a
count/filter on too few columns can skip parsing entirely — so the
reader appends the corrupt field to the declared schema itself (the
documented contract for ``columnNameOfCorruptRecord``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


@dataclass
class QuarantinedBatch:
    """One ingested batch, split into clean and dead-letter rows.

    ``parsed`` is the cached one-parse frame both sides read from; call
    :meth:`unpersist` once the batch is consumed — a long-running ingest
    loop that never releases it accumulates executor storage.
    """

    clean: DataFrame
    quarantine: DataFrame
    parsed: DataFrame

    def unpersist(self) -> None:
        """Release the batch's parse cache (call after consuming both
        sides)."""
        self.parsed.unpersist()


def _split(parsed: DataFrame, schema: T.StructType) -> QuarantinedBatch:
    # input_file_name() is only defined inside the scan stage, so it is
    # captured BEFORE the cache; and Spark forbids queries that touch
    # ONLY the corrupt column of a raw CSV/JSON scan
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser
    # could otherwise skip parsing entirely), so the parsed frame is
    # cached first (documented contract; also parses the file once for
    # both sides of the split).
    parsed = parsed.withColumn("__source_file", F.input_file_name()).cache()
    clean = (
        parsed.filter(F.col(CORRUPT_COL).isNull())
        .select(*[f.name for f in schema.fields])
    )
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record"),
        F.col("__source_file").alias("source_file"),
        F.current_timestamp().alias("quarantined_at"),
    )
    return QuarantinedBatch(clean=clean, quarantine=quarantine, parsed=parsed)


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> QuarantinedBatch:
    """CSV ingest against an explicit schema; malformed rows (wrong
    arity, unparsable types) land in ``quarantine`` instead of failing
    the batch or silently nulling fields."""
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .options(**options)
        .csv(path)
    )
    return _split(parsed, schema)


def read_jsonl_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> QuarantinedBatch:
    """JSON-lines ingest with the same dead-letter contract (broken
    JSON, schema-violating values)."""
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .json(path)
    )
    return _split(parsed, schema)


def write_quarantine(batch: QuarantinedBatch, path: str) -> None:
    """Append the dead-letter rows to the quarantine zone (parquet,
    partition-friendly append — replays read it back with
    ``spark.read.parquet``)."""
    batch.quarantine.write.mode("append").parquet(path)
