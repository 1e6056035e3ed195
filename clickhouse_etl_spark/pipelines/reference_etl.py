"""M4 — the reference's three ETL lifecycles as engine pipelines.

1. ``copy_entity``       — the §3.1 incremental entity copy
   (reference: apps/airflow/dags/student/etl_students_to_clickhouse.py:28-116)
2. ``monthly_subject_fact`` — the §3.3 wide denormalized score fact
   (reference: apps/airflow/dags/student_scores_subject/
   etl_student_scores_subject_month_to_clickhouse.py:111-433)
3. ``student_transcript``  — the nested-transcript build with subjectDetails
   (reference: apps/airflow/dags/student_transcript/
   etl_student_transcript_to_clickhouse.py:177-457; DDL
   apps/clickhouse/migrations/2025_02_25_15_30_create_transcript_table.sql:24-49)

``synthetic_warehouse`` derives deterministic warehouse-shaped fixtures
(students / evaluation tree / scores) from the driver's TPC-H-ish tables so
the pipelines run — and oracle-check — at every scale factor without
bespoke test data. The derivations are pure column expressions, hence
SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.functions.grading import grade_band
from clickhouse_etl_spark.functions.scalars import (
    gender_normalize,
    json_object,
    percentage,
    score_from_percentage,
    weighted_coe,
)
from clickhouse_etl_spark.operators.aggregates import (
    avg_null_dropped,
    credit_totals,
    nested_details,
    weighted_average,
)
from clickhouse_etl_spark.operators.dedup import (
    latest_row_per_key,
    scrub_invalid_keys,
)
from clickhouse_etl_spark.operators.joins import (
    anti_join,
    broadcast_dim_join,
    hierarchy_parent_join,
)


# ---------------------------------------------------------------------------
# Synthetic warehouse fixtures (deterministic; SQL-mirrorable)
# ---------------------------------------------------------------------------

def synthetic_students(spark: SparkSession, sf_dir: str) -> DataFrame:
    """students dim from customer — raw gender values deliberately dirty
    (m/F/male/FEMALE/other cycle) to exercise F1 normalization."""
    c = load_table(spark, sf_dir, "customer")
    gender_raw = (
        F.when(F.col("c_custkey") % 5 == 0, "m")
        .when(F.col("c_custkey") % 5 == 1, "F")
        .when(F.col("c_custkey") % 5 == 2, "male")
        .when(F.col("c_custkey") % 5 == 3, "FEMALE")
        .otherwise("other")
    )
    return c.select(
        F.col("c_custkey").alias("studentId"),
        F.col("c_name").alias("firstName"),
        F.col("c_mktsegment").alias("program"),
        gender_raw.alias("gender"),
        F.concat(F.lit("id-"), F.col("c_custkey")).alias("idCard"),
        (F.col("c_nationkey") % 3).cast("string").alias("schoolId"),
    )


def synthetic_evaluations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-level evaluation tree: semester(2) ← month(regions) ←
    subject(nations) ← custom(suppliers). coe/maxScore vary to exercise
    the F16/A3 defaulting paths; subject credit exercises A6."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")

    semesters = (
        region.select((F.col("r_regionkey") % 2).alias("k"))
        .distinct()
        .select(
            F.concat(F.lit("se"), F.col("k")).alias("evaluationId"),
            F.concat(F.lit("Semester "), F.col("k")).alias("name"),
            F.lit("na").alias("parentId"),
            F.lit("semester").alias("type"),
            F.lit(100.0).alias("maxScore"),
            F.lit(1).alias("coe"),
            F.lit(0.0).alias("credit"),
        )
    )
    months = region.select(
        F.concat(F.lit("mo"), F.col("r_regionkey")).alias("evaluationId"),
        F.col("r_name").alias("name"),
        F.concat(F.lit("se"), F.col("r_regionkey") % 2).alias("parentId"),
        F.lit("month").alias("type"),
        F.lit(100.0).alias("maxScore"),
        F.lit(1).alias("coe"),
        F.lit(0.0).alias("credit"),
    )
    subjects = nation.select(
        F.concat(F.lit("su"), F.col("n_nationkey")).alias("evaluationId"),
        F.col("n_name").alias("name"),
        F.concat(F.lit("mo"), F.col("n_regionkey")).alias("parentId"),
        F.lit("subject").alias("type"),
        F.lit(100.0).alias("maxScore"),
        (F.col("n_nationkey") % 4).cast("int").alias("coe"),
        (F.col("n_nationkey") % 4 + 1).cast("double").alias("credit"),
    )
    customs = supplier.select(
        F.concat(F.lit("cu"), F.col("s_suppkey")).alias("evaluationId"),
        F.col("s_name").alias("name"),
        F.concat(F.lit("su"), F.col("s_nationkey")).alias("parentId"),
        F.lit("custom").alias("type"),
        (50.0 + (F.col("s_suppkey") % 3) * 25.0).alias("maxScore"),
        ((F.col("s_suppkey") % 5) - 1).cast("int").alias("coe"),
        F.lit(0.0).alias("credit"),
    )
    return semesters.unionByName(months).unionByName(subjects).unionByName(customs)


def synthetic_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scores fact from lineitem ⨝ orders: every third line is a DIRECT
    subject score (precedence path), the rest hit custom evaluations."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(
        orders.select("o_orderkey", "o_custkey"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    eval_id = F.when(
        F.col("l_linenumber") % 3 == 0,
        F.concat(F.lit("su"), F.col("l_suppkey") % 25),
    ).otherwise(F.concat(F.lit("cu"), F.col("l_suppkey")))
    return joined.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("scoreId"),
        F.col("o_custkey").alias("studentId"),
        eval_id.alias("evaluationId"),
        F.col("l_quantity").cast("double").alias("score"),
        F.col("l_suppkey").alias("scorerId"),
        F.col("l_shipdate").alias("markedAt"),
    )


def synthetic_warehouse(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {
        "students": synthetic_students(spark, sf_dir),
        "evaluations": synthetic_evaluations(spark, sf_dir),
        "scores": synthetic_scores(spark, sf_dir),
    }


# ---------------------------------------------------------------------------
# Lifecycle 1 — copy_entity (§3.1)
# ---------------------------------------------------------------------------

def copy_entity(
    entities: DataFrame,
    key: str = "studentId",
    order_col: str = "updatedAt",
) -> DataFrame:
    """dedup-latest → normalize → JSON profile: the student copy pipeline.

    reference steps: P4 invalid-key scrub (…student_transcript/…:124),
    DISTINCT ON dedup (…:38-45), gender normalization (…:75-80), profile
    JSON serialization (…:82-86). The write step is write_mergetree_mapped
    — separated so the transform stays testable.
    """
    scrubbed = scrub_invalid_keys(entities, [key])
    deduped = latest_row_per_key(scrubbed, [key], order_col=order_col)
    return deduped.select(
        F.col(key),
        F.col("firstName"),
        gender_normalize(F.col("gender")).alias("gender"),
        json_object(
            program=F.col("program"), idCard=F.col("idCard")
        ).alias("profile"),
        F.col("schoolId"),
    )


# ---------------------------------------------------------------------------
# Lifecycle 2 — monthly_subject_fact (§3.3)
# ---------------------------------------------------------------------------

def monthly_subject_fact(
    evaluations: DataFrame,
    scores: DataFrame,
    students: DataFrame,
) -> DataFrame:
    """The wide per-(month, subject, student) score fact.

    Reference semantics chain (…student_scores_subject/…:111-433):
    P5 type-partition → J1 score⨝eval → A1 per-(eval,student) average →
    F7 percentage (custom maxScore) → J2 custom→subject hop → A3
    coe-weighted subject aggregate → direct-over-custom precedence
    (§2.8 anti-join union) → F2 grade banding → J5 student dim (F1
    gender) → J3 subject→month hop.
    """
    months = evaluations.filter(F.col("type") == "month")
    subject_evals = evaluations.filter(F.col("type") == "subject")
    customs = evaluations.filter(F.col("type") == "custom")

    # per-(evaluation, student) mean score — null-dropped (A1 semantics).
    # Materialized once: both the direct and the custom path consume it,
    # and recomputing means re-running the scores join + aggregation.
    per_eval = avg_null_dropped(
        scores, ["evaluationId", "studentId"], "score", alias="avg_score"
    ).localCheckpoint(eager=True)

    # DIRECT path: scores attached straight to subject evaluations.
    # Also materialized — it is read twice (union + precedence anti-join).
    direct = (
        broadcast_dim_join(
            per_eval,
            subject_evals.select("evaluationId", "maxScore"),
            on="evaluationId",
            how="inner",
        )
        .select(
            F.col("evaluationId").alias("subjectEvaluationId"),
            "studentId",
            percentage(F.col("avg_score"), F.col("maxScore")).alias("percentage"),
            F.lit("direct").alias("path"),
        )
        .localCheckpoint(eager=True)
    )

    # CUSTOM path: custom percentages roll up to the parent subject,
    # weighted by coe (≤0 → 1). The custom-evaluation dimension GROWS with
    # the corpus (unlike month/subject), so no broadcast hint — AQE
    # broadcasts while it fits and shuffle-joins beyond that.
    custom_scored = per_eval.join(
        customs.select("evaluationId", "parentId", "maxScore", "coe"),
        on="evaluationId",
        how="inner",
    ).select(
        F.col("parentId").alias("subjectEvaluationId"),
        "studentId",
        percentage(F.col("avg_score"), F.col("maxScore")).alias("custom_pct"),
        "coe",
    )
    aggregated = weighted_average(
        custom_scored,
        ["subjectEvaluationId", "studentId"],
        "custom_pct",
        "coe",
        alias="percentage",
    ).withColumn("path", F.lit("custom"))

    # precedence: direct wins; custom-only pairs fill the rest. The
    # anti-join's right side is the direct FACT's key set — it grows with
    # the data, so no forced broadcast (AQE still broadcasts while it
    # fits under the threshold, shuffle-joins beyond).
    custom_only = anti_join(
        aggregated,
        direct.select("subjectEvaluationId", "studentId"),
        on=["subjectEvaluationId", "studentId"],
        broadcast=False,
    )
    merged = direct.unionByName(custom_only)

    graded = merged.withColumn("g", grade_band(F.col("percentage"))).select(
        "subjectEvaluationId",
        "studentId",
        "percentage",
        "path",
        F.col("g.grade").alias("grade"),
        F.col("g.gpa").alias("gpa"),
    )

    # denormalize: subject name/credit + month ancestry + student dim.
    wide = hierarchy_parent_join(
        broadcast_dim_join(
            graded,
            subject_evals.select(
                F.col("evaluationId").alias("subjectEvaluationId"),
                F.col("name").alias("subjectName"),
                F.col("parentId"),
                F.col("maxScore").alias("subjectMaxScore"),
                F.col("credit"),
            ),
            on="subjectEvaluationId",
            how="inner",
        ),
        months.select("evaluationId", "name"),
        child_parent_col="parentId",
        parent_prefix="month_",
        how="left",
    )
    # students is a growing dim (one row per enrolled student) — leave the
    # strategy to AQE for the same reason as customs above.
    with_students = wide.join(
        students.select(
            "studentId",
            F.col("firstName").alias("studentFirstName"),
            gender_normalize(F.col("gender")).alias("gender"),
            "schoolId",
        ),
        on="studentId",
        how="left",
    )
    return with_students.select(
        F.col("month_evaluationId").alias("monthEvaluationId"),
        F.col("month_name").alias("monthName"),
        "subjectEvaluationId",
        "subjectName",
        "studentId",
        "studentFirstName",
        "gender",
        "schoolId",
        F.round("percentage", 6).alias("percentage"),
        F.round(
            score_from_percentage(F.col("percentage"), F.col("subjectMaxScore")), 6
        ).alias("score"),
        "grade",
        "gpa",
        "credit",
        "path",
    )


# ---------------------------------------------------------------------------
# Lifecycle 3 — student_transcript (§3.3 nested)
# ---------------------------------------------------------------------------

def student_transcript(
    evaluations: DataFrame,
    scores: DataFrame,
    students: DataFrame,
    include_details: bool = True,
) -> DataFrame:
    """Nested transcript: per-student subjectDetails array + A6 totals.

    The detail struct mirrors the 18-field ``subjectDetails`` tuple
    (transcript DDL …create_transcript_table.sql:24-49) over the fields
    the synthetic warehouse carries; the month→semester ancestry is the
    J4 two-hop self-join. ``include_details=False`` skips the nested
    collect_list for totals-only consumers (same fact chain, one agg
    instead of two).
    """
    fact = monthly_subject_fact(evaluations, scores, students)
    months = evaluations.filter(F.col("type") == "month")
    semesters = evaluations.filter(F.col("type") == "semester")

    with_sem = hierarchy_parent_join(
        broadcast_dim_join(
            fact,
            months.select(
                F.col("evaluationId").alias("monthEvaluationId"),
                F.col("parentId").alias("month_parentId"),
            ),
            on="monthEvaluationId",
            how="left",
        ),
        semesters.select("evaluationId", "name"),
        child_parent_col="month_parentId",
        parent_prefix="sem_",
        how="left",
    ).select(
        "studentId",
        "studentFirstName",
        "gender",
        "schoolId",
        "subjectEvaluationId",
        "subjectName",
        "credit",
        "percentage",
        "score",
        "grade",
        "gpa",
        "monthEvaluationId",
        "monthName",
        F.col("sem_evaluationId").alias("semesterEvaluationId"),
        F.col("sem_name").alias("semesterName"),
    )
    if not include_details:
        return credit_totals(with_sem, ["studentId"], credit="credit", gpa="gpa")

    # Both aggregations below consume this plan; materialize it once
    # instead of recomputing the whole fact chain per branch.
    with_sem = with_sem.localCheckpoint(eager=True)

    details = nested_details(
        with_sem,
        keys=["studentId", "studentFirstName", "gender", "schoolId"],
        detail_cols=[
            "subjectEvaluationId",
            "subjectName",
            "credit",
            "score",
            "percentage",
            "grade",
            "gpa",
            "monthEvaluationId",
            "monthName",
            "semesterEvaluationId",
            "semesterName",
        ],
        alias="subjectDetails",
    )
    totals = credit_totals(
        with_sem, ["studentId"], credit="credit", gpa="gpa"
    )
    # totals is per-student — one row per enrolled student, growing with
    # the data — so this is a plain join, not a broadcast_dim_join: both
    # sides are already hash-partitioned by studentId from their groupBys,
    # so the sort-merge join reuses that partitioning without a new
    # shuffle (and AQE still broadcasts while totals is small).
    return details.join(totals, on="studentId", how="inner")
