"""S4 — document-store ingestion (the MongoDB-collection analog).

reference: half the reference's extractions are Mongo ``find`` calls with
field projections —
apps/airflow/dags/student_scores_subject/
etl_student_scores_subject_month_to_clickhouse.py:445-454 (evaluations,
scores) and apps/airflow/dags/applicant/etl_applicants_to_clickhouse.py:48-54
(applicants).

Spark-first shape: documents land as JSON-lines (the standard
change-stream / mongoexport landing zone) and are read with an EXPLICIT
schema — never inferred, so drifted upstream documents fail loudly instead
of silently widening types. The Mongo projection dict maps onto a
``select`` of (possibly nested) field paths, which Catalyst prunes all the
way into the JSON parser (schema pruning: unprojected fields are never
parsed). With the official Spark-Mongo connector the same ``projection``
translates to an aggregation-pipeline ``$project`` — only this reader
module would change, no downstream operator.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mongo_projection_columns(
    projection: Mapping[str, int | bool] | Sequence[str],
) -> list:
    """Translate a Mongo-style projection to select() columns.

    ``{"name": 1, "parent.id": 1}`` (or a plain list of paths) becomes
    ``[col("name"), col("parent.id").alias("parent_id")]`` — nested paths
    are flattened with ``_``-joined aliases, matching how the reference's
    transform code addresses them after ``find``.
    """
    if isinstance(projection, Mapping):
        paths = [p for p, keep in projection.items() if keep]
        if not paths and projection:
            # Mongo EXCLUSION projections ({'_id': 0} = "everything but
            # _id") have no inclusion list to translate — silently
            # returning zero columns would drop every field. Callers
            # should select over the landing-zone schema and drop.
            raise ValueError(
                "exclusion-only Mongo projections are not supported: "
                "list the fields to KEEP (inclusion form), or select "
                "all columns and .drop() the exclusions"
            )
    else:
        paths = list(projection)
    cols = []
    for p in paths:
        c = F.col(p)
        if "." in p:
            c = c.alias(p.replace(".", "_"))
        cols.append(c)
    return cols


def read_document_collection(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    projection: Mapping[str, int | bool] | Sequence[str] | None = None,
    predicate=None,
) -> DataFrame:
    """Read a JSONL document landing zone as a typed DataFrame.

    - ``schema`` is mandatory (strict at the boundary; malformed documents
      get NULL fields via PERMISSIVE mode with a ``_corrupt_record`` column
      when declared in the schema).
    - ``projection`` mirrors Mongo ``find(filter, projection)``'s second
      argument; ``predicate`` the first (a Column, pushed into the scan).
    """
    df = spark.read.schema(schema).json(path)
    if predicate is not None:
        df = df.filter(predicate)
    if projection is not None:
        df = df.select(*mongo_projection_columns(projection))
    return df


def normalize_object_id(col) -> F.Column:
    """Extract the hex id from either a plain string id or the extended-
    JSON ``{"$oid": "..."}`` form Mongo exports produce."""
    c = F.col(col) if isinstance(col, str) else col
    oid = F.get_json_object(c, "$.$oid")
    return F.coalesce(oid, c)
