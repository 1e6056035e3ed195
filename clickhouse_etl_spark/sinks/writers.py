"""K1-K4 — typed, partitioned warehouse writes.

The reference loads by assembling one monolithic ``INSERT … VALUES`` SQL
string per batch and POSTing it to ClickHouse's HTTP port (reference:
apps/airflow/dags/student/etl_students_to_clickhouse.py:92-116), with
hand-rolled literal escaping (K2, …school/etl_school_to_clickhouse.py:27-45),
UUID wrapping (K3, …teacher/etl_teachers_to_clickhouse.py:69-83) and
nested-tuple rendering (K4, …student_transcript/
etl_student_transcript_to_clickhouse.py:496-512).

Typed DataFrame writes eliminate the entire literal-encoding class: nulls,
bools, NaN, decimals, nested Array(Struct) columns all serialize through
the format codec. The MergeTree physical layout
(``PARTITION BY schoolId`` + compound ``ORDER BY``; reference:
apps/clickhouse/migrations/2024_12_03_17_41_create_subject_table.sql:27-29)
maps to hive-partitioned parquet + ``sortWithinPartitions`` so min-max
row-group stats give the same sort-key pruning MergeTree's primary index
provides.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_mergetree_mapped(
    df: DataFrame,
    path: str,
    partition_by: str | Sequence[str] = "schoolId",
    order_by: Sequence[str] = (),
    mode: str = "overwrite",
    target_file_partitions: int | None = None,
) -> None:
    """Write ``df`` as partitioned, sorted parquet.

    - ``partition_by`` → hive partition dirs (partition pruning on read).
    - ``order_by``     → sortWithinPartitions (row-group min/max pruning,
      the MergeTree ORDER BY analog).
    - ``repartition`` on the partition key first so each hive partition is
      written by as few tasks as possible (avoids the many-small-files
      failure mode at 1000 executors); AQE coalesces the rest.
    """
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    out = df.repartition(*parts) if target_file_partitions is None else df.repartition(
        target_file_partitions, *parts
    )
    if order_by:
        out = out.sortWithinPartitions(*parts, *order_by)
    out.write.mode(mode).partitionBy(*parts).parquet(path)


def align_to_schema(
    df: DataFrame,
    target,
    add_missing_nullable: bool = True,
    drop_extra: bool = True,
) -> DataFrame:
    """Project ``df`` onto a declared sink schema — the schema-evolution
    half of the typed-write contract.

    The warehouse schema is FIXED at the sink (the reference's ClickHouse
    DDL; the engine's catalog StructTypes) while upstream extracts drift:
    new service fields appear, optional fields go missing, numeric widths
    change. Alignment rules, strictest-first:

    - column in both: cast to the target type (Spark cast semantics;
      an impossible type pair fails analysis at the terminal select —
      still plan time, never mid-write).
    - column only in target: filled with typed NULL when it is nullable
      and ``add_missing_nullable`` — a missing NON-nullable column always
      raises (silently inventing values for a required field is how a
      warehouse rots).
    - column only in df: dropped under ``drop_extra`` (the DDL is the
      contract), raised otherwise.

    Purely a projection — no shuffle, composes with
    :func:`write_mergetree_mapped` as ``align → write``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if not isinstance(target, T.StructType):
        raise TypeError("target must be a StructType")
    have = {f.name: f for f in df.schema.fields}
    extra = [n for n in have if n not in {f.name for f in target.fields}]
    if extra and not drop_extra:
        raise ValueError(f"df carries columns not in the target schema: {extra}")
    cols = []
    for f in target.fields:
        if f.name in have:
            src = have[f.name]
            if src.dataType == f.dataType:
                cols.append(F.col(f.name))
            else:
                # Column.cast only BUILDS the expression — an uncastable
                # type pair surfaces as an AnalysisException from the
                # select below, which is the plan-time failure we want.
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        elif f.nullable and add_missing_nullable:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(
                f"target column {f.name!r} is missing from df and is "
                + ("non-nullable" if not f.nullable else "not auto-fillable")
            )
    return df.select(*cols)
