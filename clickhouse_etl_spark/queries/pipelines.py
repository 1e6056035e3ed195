"""Registered queries for the M4 reference-lifecycle pipelines.

Each lifecycle runs over the deterministic synthetic warehouse
(pipelines/reference_etl.synthetic_warehouse) so the DuckDB oracle can
mirror the whole chain — fixture derivation included — in pure SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_etl_spark.functions.grading import grade_band_sql, grade_gpa_sql
from clickhouse_etl_spark.pipelines.graph import Pipeline
from clickhouse_etl_spark.pipelines.reference_etl import (
    copy_entity,
    monthly_subject_fact,
    student_transcript,
    synthetic_warehouse,
)
from clickhouse_etl_spark.queries import register

# ---------------------------------------------------------------------------
# Shared oracle CTE block: the synthetic warehouse + the fact chain in SQL.
# Mirrors reference semantics end-to-end: A1 per-eval averages, F7 guarded
# percentage, A3 coe-weighted rollup (coe≤0→1), direct-over-custom
# precedence, F2 banding, F1 gender normalization, J3 month hop.
# ---------------------------------------------------------------------------

_WAREHOUSE_SQL = """
students AS (
  SELECT c_custkey AS studentId, c_name AS firstName, c_mktsegment AS program,
         CASE c_custkey % 5 WHEN 0 THEN 'm' WHEN 1 THEN 'F' WHEN 2 THEN 'male'
              WHEN 3 THEN 'FEMALE' ELSE 'other' END AS gender,
         'id-' || c_custkey AS idCard, CAST(c_nationkey % 3 AS VARCHAR) AS schoolId
  FROM customer
),
evals AS (
  SELECT 'mo' || r_regionkey AS evaluationId, r_name AS name,
         'se' || (r_regionkey % 2) AS parentId, 'month' AS type,
         100.0 AS maxScore, 1 AS coe, 0.0 AS credit
  FROM region
  UNION ALL
  SELECT DISTINCT 'se' || (r_regionkey % 2), 'Semester ' || (r_regionkey % 2),
         'na', 'semester', 100.0, 1, 0.0
  FROM region
  UNION ALL
  SELECT 'su' || n_nationkey, n_name, 'mo' || n_regionkey, 'subject',
         100.0, CAST(n_nationkey % 4 AS INT), CAST(n_nationkey % 4 + 1 AS DOUBLE)
  FROM nation
  UNION ALL
  SELECT 'cu' || s_suppkey, s_name, 'su' || s_nationkey, 'custom',
         50.0 + (s_suppkey % 3) * 25.0, CAST((s_suppkey % 5) - 1 AS INT), 0.0
  FROM supplier
),
scores AS (
  SELECT l_orderkey * 10 + l_linenumber AS scoreId, o_custkey AS studentId,
         CASE WHEN l_linenumber % 3 = 0 THEN 'su' || (l_suppkey % 25)
              ELSE 'cu' || l_suppkey END AS evaluationId,
         CAST(l_quantity AS DOUBLE) AS score
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
"""

_FACT_SQL = f"""
{_WAREHOUSE_SQL},
per_eval AS (
  SELECT evaluationId, studentId, AVG(score) AS avg_score
  FROM scores GROUP BY 1, 2
),
subj AS (SELECT * FROM evals WHERE type = 'subject'),
direct AS (
  SELECT p.evaluationId AS subjectEvaluationId, p.studentId,
         CASE WHEN s.maxScore > 0 THEN p.avg_score / s.maxScore * 100
              ELSE 0 END AS percentage,
         'direct' AS path
  FROM per_eval p JOIN subj s ON p.evaluationId = s.evaluationId
),
custom_scored AS (
  SELECT c.parentId AS subjectEvaluationId, p.studentId,
         CASE WHEN c.maxScore > 0 THEN p.avg_score / c.maxScore * 100
              ELSE 0 END AS custom_pct,
         CASE WHEN c.coe IS NULL OR c.coe <= 0 THEN 1.0
              ELSE CAST(c.coe AS DOUBLE) END AS w
  FROM per_eval p
  JOIN (SELECT * FROM evals WHERE type = 'custom') c
    ON p.evaluationId = c.evaluationId
),
aggregated AS (
  SELECT subjectEvaluationId, studentId,
         SUM(custom_pct * w) / SUM(w) AS percentage, 'custom' AS path
  FROM custom_scored GROUP BY 1, 2
),
merged AS (
  SELECT * FROM direct
  UNION ALL
  SELECT a.* FROM aggregated a
  WHERE NOT EXISTS (SELECT 1 FROM direct d
                    WHERE d.subjectEvaluationId = a.subjectEvaluationId
                      AND d.studentId = a.studentId)
),
graded AS (
  SELECT m.*, {grade_band_sql('m.percentage')} AS grade,
         {grade_gpa_sql('m.percentage')} AS gpa
  FROM merged m
),
fact AS (
  SELECT mo.evaluationId AS monthEvaluationId, mo.name AS monthName,
         g.subjectEvaluationId, s.name AS subjectName,
         g.studentId, st.firstName AS studentFirstName,
         CASE WHEN lower(st.gender) IN ('m', 'male') THEN 'male'
              WHEN lower(st.gender) IN ('f', 'female') THEN 'female'
              ELSE st.gender END AS gender,
         st.schoolId,
         ROUND(g.percentage, 6) AS percentage,
         ROUND(g.percentage * s.maxScore / 100, 6) AS score,
         g.grade, g.gpa, s.credit, g.path,
         s.parentId AS month_parent
  FROM graded g
  JOIN subj s ON g.subjectEvaluationId = s.evaluationId
  LEFT JOIN (SELECT * FROM evals WHERE type = 'month') mo
    ON s.parentId = mo.evaluationId
  LEFT JOIN students st ON g.studentId = st.studentId
)
"""


# ---------------------------------------------------------------------------
# Lifecycle 1 — copy_entity (§3.1): dedup latest version, normalize, JSON.
# ---------------------------------------------------------------------------
@register(
    "pl_copy_students",
    oracle=f"""
    WITH {_WAREHOUSE_SQL.strip().lstrip()}
    SELECT studentId, firstName,
           CASE WHEN lower(gender) IN ('m', 'male') THEN 'male'
                WHEN lower(gender) IN ('f', 'female') THEN 'female'
                ELSE gender END AS gender,
           to_json(struct_pack(program := program, idCard := idCard)) AS profile,
           schoolId
    FROM students
    """,
)
def pl_copy_students(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two source versions per student (simulating re-extraction); the
    pipeline dedups to the latest, normalizes, serializes the profile.
    Runs through the G1-G3 Pipeline graph (staged, retryable)."""
    students = synthetic_warehouse(spark, sf_dir)["students"]
    v1 = students.withColumn(
        "updatedAt", F.lit("2024-01-01 00:00:00").cast("timestamp")
    ).withColumn("firstName", F.concat(F.col("firstName"), F.lit("_stale")))
    v2 = students.withColumn(
        "updatedAt", F.lit("2024-02-01 00:00:00").cast("timestamp")
    )

    pipe = Pipeline("copy_students")

    @pipe.stage("extract")
    def extract(ctx):
        return {"raw": v1.unionByName(v2)}

    @pipe.stage("transform", retries=2)
    def transform(ctx):
        return {"out": copy_entity(ctx["raw"])}

    return pipe.run({})["out"]


# ---------------------------------------------------------------------------
# Lifecycle 2 — monthly_subject_fact (§3.3 wide fact).
# ---------------------------------------------------------------------------
@register(
    "pl_monthly_subject_fact",
    oracle=f"""
    WITH {_FACT_SQL.strip()}
    SELECT monthEvaluationId, monthName, subjectEvaluationId, subjectName,
           studentId, studentFirstName, gender, schoolId, percentage, score,
           grade, gpa, credit, path
    FROM fact
    """,
)
def pl_monthly_subject_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    wh = synthetic_warehouse(spark, sf_dir)
    return monthly_subject_fact(wh["evaluations"], wh["scores"], wh["students"])


# ---------------------------------------------------------------------------
# Lifecycle 3a — transcript totals (A6 over the fact).
# ---------------------------------------------------------------------------
@register(
    "pl_transcript_totals",
    oracle=f"""
    WITH {_FACT_SQL.strip()}
    SELECT studentId,
           CAST(SUM(credit) AS DOUBLE) AS totalCredits,
           ROUND(SUM(credit * gpa) / SUM(credit), 6) AS totalGPA,
           count(*) AS subjectCount
    FROM fact GROUP BY studentId
    """,
)
def pl_transcript_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    wh = synthetic_warehouse(spark, sf_dir)
    t = student_transcript(
        wh["evaluations"], wh["scores"], wh["students"], include_details=False
    )
    return t.select(
        "studentId",
        F.col("totalCredits").cast("double").alias("totalCredits"),
        F.round("totalGPA", 6).alias("totalGPA"),
        F.col("subjectCount").cast("long").alias("subjectCount"),
    )


# ---------------------------------------------------------------------------
# Lifecycle 3b — transcript details re-exploded: proves the nested
# subjectDetails array content through a SQL-checkable (hashable) surface.
# ---------------------------------------------------------------------------
@register(
    "pl_transcript_details",
    oracle=f"""
    WITH {_FACT_SQL.strip()}
    SELECT f.studentId, f.subjectEvaluationId, f.subjectName, f.credit,
           f.score, f.percentage, f.grade, f.gpa, f.monthName,
           se.name AS semesterName
    FROM fact f
    LEFT JOIN (SELECT * FROM evals WHERE type = 'month') mo
      ON f.month_parent = mo.evaluationId
    LEFT JOIN (SELECT * FROM evals WHERE type = 'semester') se
      ON mo.parentId = se.evaluationId
    """,
)
def pl_transcript_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    wh = synthetic_warehouse(spark, sf_dir)
    t = student_transcript(wh["evaluations"], wh["scores"], wh["students"])
    d = t.select("studentId", F.explode("subjectDetails").alias("d"))
    return d.select(
        "studentId",
        F.col("d.subjectEvaluationId").alias("subjectEvaluationId"),
        F.col("d.subjectName").alias("subjectName"),
        F.col("d.credit").alias("credit"),
        F.col("d.score").alias("score"),
        F.col("d.percentage").alias("percentage"),
        F.col("d.grade").alias("grade"),
        F.col("d.gpa").alias("gpa"),
        F.col("d.monthName").alias("monthName"),
        F.col("d.semesterName").alias("semesterName"),
    )
