"""Physical-plan assertions — the 100 TB design contracts.

Not what the result is, but HOW Spark computes it: dims broadcast, filters
and projections reach the parquet scan, no Python in relational paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.queries.relational import (
    flagship_wide_fact,
    q1_pricing_summary,
)
from tests.conftest import SF_SMOKE


def _explain(df, mode="formatted") -> str:
    jvm_mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(jvm_mode.fromString(mode))


def test_flagship_broadcasts_constant_dims(spark):
    plan = _explain(flagship_wide_fact(spark, SF_SMOKE))
    # nation/region are hint-broadcast; customer is left to AQE (grows
    # with sf — would OOM the driver at 100×).
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q1_filter_pushed_to_parquet_scan(spark):
    plan = _explain(q1_pricing_summary(spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    df = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey")
    plan = _explain(df)
    # ReadSchema must contain ONLY the projected column.
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_no_python_udf_in_relational_queries(spark):
    from clickhouse_etl_spark.queries import QUERIES

    relational_names = [
        n for n in QUERIES
        if not n.startswith("ns_")  # text/multimodal tier may use Arrow UDFs
    ]
    for name in relational_names:
        plan = _explain(QUERIES[name](spark, SF_SMOKE), mode="simple")
        assert "BatchEvalPython" not in plan, f"{name} uses a row-Python UDF"
        assert "PythonUDF" not in plan, f"{name} ships rows through Python"


def test_no_unbroadcast_cartesian_anywhere(spark):
    """Every cross-product in the inventory must be the broadcast form
    (BroadcastNestedLoopJoin over a tiny side) — a plain CartesianProduct
    at 100 TB is a job-killer, so none may appear in ANY registered plan."""
    from clickhouse_etl_spark.queries import QUERIES

    for name, fn in QUERIES.items():
        plan = _explain(fn(spark, SF_SMOKE), mode="simple")
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian"


def test_no_forced_broadcast_on_fact_derived_sides(spark):
    """Fact-derived join sides (the precedence anti-join key set, the
    per-student totals, J9's extracted key set) must NOT carry a broadcast
    hint: they grow with the data, and a forced broadcast is the one
    plan shape that cannot survive a 100× scale-up. The optimized logical
    plans may still end up broadcast BY AQE at small sf — what we assert
    is the absence of the unconditional hint."""
    from clickhouse_etl_spark.pipelines.reference_etl import (
        monthly_subject_fact,
        student_transcript,
        synthetic_warehouse,
    )

    wh = synthetic_warehouse(spark, SF_SMOKE)

    fact = monthly_subject_fact(
        wh["evaluations"], wh["scores"], wh["students"],
        wh["structures"], wh["subject_dim"],
    )
    # the anti-join on (subjectEvaluationId, studentId) must be hint-free:
    # no hint line may mention the direct fact's key projection. Hints on
    # the bounded dims (subject/month evaluations) are expected and fine.
    fact_plan = fact._jdf.queryExecution().optimizedPlan().toString()
    for line in fact_plan.splitlines():
        if "LeftAnti" in line:
            assert "broadcast" not in line.lower(), f"forced broadcast on anti join: {line}"

    transcript = student_transcript(
        wh["evaluations"], wh["scores"], wh["students"],
        wh["structures"], wh["subject_dim"],
    )
    t_plan = transcript._jdf.queryExecution().optimizedPlan().toString()
    # the final details⨝totals join (both sides per-(student, structure)
    # aggregates) must not be hint-forced either.
    for line in t_plan.splitlines():
        if "Join Inner, (studentId" in line:
            assert "broadcast" not in line.lower(), f"forced broadcast on totals join: {line}"


def test_whole_stage_codegen_covers_q1(spark):
    plan = _explain(q1_pricing_summary(spark, SF_SMOKE), mode="codegen")
    # "Found N WholeStageCodegen subtrees" — the whole agg pipeline codegens.
    assert "WholeStageCodegen" in plan
