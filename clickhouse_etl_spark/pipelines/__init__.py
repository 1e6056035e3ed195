"""Pipeline layer: task graph + the reference's three ETL lifecycles."""

from clickhouse_etl_spark.pipelines.graph import Pipeline, Stage
from clickhouse_etl_spark.pipelines.matview import MaterializedView
from clickhouse_etl_spark.pipelines.reference_etl import (
    copy_entity,
    monthly_subject_fact,
    monthly_subject_fact_incremental,
    student_transcript,
    student_transcript_incremental,
    synthetic_warehouse,
)

__all__ = [
    "MaterializedView",
    "Pipeline",
    "Stage",
    "copy_entity",
    "monthly_subject_fact",
    "monthly_subject_fact_incremental",
    "student_transcript",
    "student_transcript_incremental",
    "synthetic_warehouse",
]
