"""End-to-end daily-warehouse run — the reference's whole DAG suite as
one engine program.

What the reference operates as five Airflow DAGs + a migration shell
script + manual ClickHouse checks becomes: ingest (incremental,
deduped) → the two analytical lifecycles (wide fact + nested
transcript) → a data-quality gate → MergeTree-mapped publishes with
snapshot versioning and retention → an incrementally-maintained
summary view. Every stage is an engine API call; this module just
orders them the way a daily run would.

Run: ``python examples/reference_warehouse.py [sf_dir] [out_dir]``
(defaults: sf0.001, a temp dir). Smoke-covered in
``tests/test_examples.py`` — the examples are executable docs, not
dead snippets.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    from clickhouse_etl_spark.operators.quality import (
        check_expectations,
        in_range,
        not_null,
        unique,
    )
    from clickhouse_etl_spark.pipelines import MaterializedView
    from clickhouse_etl_spark.pipelines.reference_etl import (
        copy_entity,
        monthly_subject_fact,
        student_transcript,
        synthetic_warehouse,
    )
    from clickhouse_etl_spark.sinks.staging import (
        delete_versions_older_than,
        publish_snapshot,
    )
    from clickhouse_etl_spark.sinks.writers import write_mergetree_mapped

    wh = synthetic_warehouse(spark, sf_dir)

    # 1. Entity copy (P3 dedup + F1 normalize + F11 profile JSON).
    students = copy_entity(
        wh["students"].withColumn("updatedAt", F.current_timestamp()),
        key="studentId",
    )

    # 2. The two analytical lifecycles.
    fact = monthly_subject_fact(
        wh["evaluations"], wh["scores"], wh["students"],
        wh["structures"], wh["subject_dim"],
    ).drop("subjectParentId")
    transcript = student_transcript(
        wh["evaluations"], wh["scores"], wh["students"],
        wh["structures"], wh["subject_dim"], include_details=False,
    )

    # 3. Quality gate before anything publishes.
    gate = check_expectations(
        fact,
        [
            not_null("studentId"),
            not_null("subjectEvaluationId"),
            unique("subjectEvaluationId", "studentId"),
            in_range("gpa", 0.0, 4.0),
        ],
    )
    violations = {r["rule"]: r["n_violations"] for r in gate.collect()}

    # 4. MergeTree-mapped publish (partition by school, sorted) +
    #    versioned snapshot with retention.
    write_mergetree_mapped(
        fact,
        f"{out_dir}/fact",
        partition_by="schoolId",
        order_by=["subjectEvaluationId", "studentId"],
    )
    publish_snapshot(transcript, f"{out_dir}/transcript", version="00000000")
    publish_snapshot(transcript, f"{out_dir}/transcript", version="00000001")
    kept_after_retention = delete_versions_older_than(
        f"{out_dir}/transcript", keep_latest=1
    )

    # 5. An incrementally-maintained per-school score summary (the
    #    MATERIALIZED VIEW the reference would have wanted).
    view = MaterializedView(
        name="school_scores",
        table_root=f"{out_dir}/school_scores",
        source=lambda s: monthly_subject_fact(
            wh["evaluations"], wh["scores"], wh["students"],
            wh["structures"], wh["subject_dim"],
        ).select(
            "schoolId",
            F.col("score").alias("s"),
            F.coalesce(F.col("markedAt"), F.lit("1970-01-01").cast("timestamp")).alias("ts"),
        ),
        keys=["schoolId"],
        ts_col="ts",
        strategy="summing",
        sum_cols=["s"],
    )
    view.refresh_full(spark)

    return {
        "students": students.count(),
        "fact_rows": fact.count(),
        "fact_cols": len(fact.columns),
        "transcript_rows": transcript.count(),
        "violations": violations,
        "retention_deleted": kept_after_retention,
        "view_schools": view.read(spark).count(),
    }


if __name__ == "__main__":
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from clickhouse_etl_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    s = get_spark(master="local[8]")
    s.sparkContext.setLogLevel("ERROR")
    print(run(s, sf, out))
