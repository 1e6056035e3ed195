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


def test_fact_precedence_is_single_full_outer_join(spark):
    """The direct-vs-aggregated precedence merge is ONE full-outer
    SortMergeJoin — not the old left-join + anti-join + union double
    pass (two SMJs, custom aggregate scanned twice)."""
    from clickhouse_etl_spark.pipelines.reference_etl import (
        monthly_subject_fact,
        synthetic_warehouse,
    )

    wh = synthetic_warehouse(spark, SF_SMOKE)
    fact = monthly_subject_fact(
        wh["evaluations"], wh["scores"], wh["students"],
        wh["structures"], wh["subject_dim"],
    )
    plan = _explain(fact, "simple")
    assert "FullOuter" in plan
    assert "LeftAnti" not in plan
    assert plan.count("SortMergeJoin") <= 1
    assert "CartesianProduct" not in plan
    spark.catalog.clearCache()


def test_range_join_query_has_no_row_level_outer_pass(spark):
    """ext_range_join_windows pushes aggregation below the outer join:
    the plan carries no anti join and no nested-loop/cartesian — the
    binned equi-join plus a left join on the aggregate rows."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["ext_range_join_windows"](spark, SF_SMOKE)
    plan = _explain(df, "simple")
    assert "LeftAnti" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_neardup_self_join_carries_ids_only(spark):
    """Per-kernel plan contracts (r7): the EXPR chain's LSH bucket
    self-join inputs are (id, table, bucket) — the vector must NOT ride
    the candidate exchange (it re-attaches to the deduped pair list via
    the payload joins). The GEMM chain (the default) has the opposite
    shape: vectors ride the LINEAR-sized bucket rows and there is NO
    join anywhere — sub-threshold candidates never exist as rows, and
    the only post-kernel machinery is the cross-table pair aggregate."""
    from clickhouse_etl_spark.text.similarity import embedding_cosine_neardup

    emb = load_table(spark, SF_SMOKE, "embeddings")
    df = embedding_cosine_neardup(emb, threshold=0.35, kernel="expr")
    plan = _explain(df, "formatted")
    shuffle_blocks = [
        b
        for b in plan.split("\n\n")
        if ("__table" in b and "__bucket" in b)
        and b.lstrip("(0123456789) ").startswith(
            ("Exchange", "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin", "Sort")
        )
    ]
    assert shuffle_blocks, "bucket self-join machinery not found in plan"
    assert all("__v" not in b for b in shuffle_blocks), (
        "vector column rides the bucket self-join"
    )
    gplan = _explain(
        embedding_cosine_neardup(emb, threshold=0.35, kernel="gemm"),
        "formatted",
    )
    assert "FlatMapGroupsInPandas" in gplan  # the per-bucket GEMM kernel
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in gplan, f"gemm chain must be join-free ({node})"
    spark.catalog.clearCache()


def test_new_grouped_and_retrieval_ops_plan_clean(spark):
    """Plan contract sweep for the late-round operators: no cartesian
    product, no row-Python in any of them."""
    from clickhouse_etl_spark.operators.grouped import (
        histogram_fixed,
        top_k_per_group,
    )
    from clickhouse_etl_spark.sinks.upsert import summing_merge
    from clickhouse_etl_spark.text.index import bm25_topk
    from clickhouse_etl_spark.text.packing import ngram_contamination

    li = load_table(spark, SF_SMOKE, "lineitem")
    docs = load_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    plans = {
        "top_k_per_group": top_k_per_group(li, ["l_returnflag"], "l_quantity"),
        "histogram_fixed": histogram_fixed(li, "l_quantity", group_cols=["l_returnflag"]),
        "summing_merge": summing_merge(
            summing_merge(None, li, ["l_returnflag"], ["l_quantity"]),
            li, ["l_returnflag"], ["l_quantity"],
        ),
        "bm25_topk": bm25_topk(docs, ["the", "data"]),
        "ngram_contamination": ngram_contamination(docs, bench, n=3),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian"
        assert "BatchEvalPython" not in plan, f"{name} row-Python"
        assert "ArrowEvalPython" not in plan, f"{name} arrow-eval in plan"


def test_incremental_tier_plans_clean(spark):
    """Plan sweep for the incremental-maintenance tier: no cartesian, no
    row-Python, and the merge joins never broadcast a growing side."""
    from clickhouse_etl_spark.operators.dedup import limit_by
    from clickhouse_etl_spark.operators.events import fill_time_gaps
    from clickhouse_etl_spark.sinks.upsert import (
        collapsing_merge,
        snapshot_diff,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    li = load_table(spark, SF_SMOKE, "lineitem")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    signed = li.selectExpr(
        "l_orderkey AS k",
        "CASE WHEN l_linenumber % 4 = 0 THEN -1 ELSE 1 END AS sign",
        "l_linenumber AS ver", "l_quantity AS q",
    )
    plans = {
        "limit_by": limit_by(ev, ["user_id"], 2, "value"),
        "fill_time_gaps": fill_time_gaps(
            hourly, "bucket", "1 hour", ["event_type"], ["n"], fill="locf"
        ),
        "collapsing_merge": collapsing_merge(signed, ["k"], order_col="ver"),
        "snapshot_diff": snapshot_diff(
            li.limit(100), li.limit(200), ["l_orderkey", "l_linenumber"]
        ),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian"
        assert "BatchEvalPython" not in plan, f"{name} row-Python"
    # snapshot_diff's full outer: both sides grow — no broadcast hint
    opt = plans["snapshot_diff"]._jdf.queryExecution().optimizedPlan().toString()
    for line in opt.splitlines():
        if "FullOuter" in line:
            assert "broadcast" not in line.lower()


def test_scd2_lookup_plans_as_equi_join(spark):
    """The temporal lookup must extract the key equality into a hash/
    sort-merge join (the interval test rides as a join predicate) — a
    nested-loop over two growing sides would be the scale-killer."""
    from clickhouse_etl_spark.sinks.upsert import scd2_history, scd2_lookup

    ch = spark.range(2000).selectExpr(
        "id % 500 AS k",
        "timestamp_seconds(1700000000 + id * 3600) AS ts",
        "CAST(id % 7 AS STRING) AS tier",
    )
    hist = scd2_history(ch, ["k"], "ts", ["tier"])
    facts = spark.range(5000).selectExpr(
        "id % 500 AS k",
        "timestamp_seconds(1700000000 + (id % 97) * 3600) AS fts",
        "CAST(id AS DOUBLE) AS amount",
    )
    plan = scd2_lookup(facts, hist, ["k"], "fts")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_stats_family_plan_contracts(spark):
    """The r6 statistical aggregates keep their shuffle contracts:
    entropy = exactly two exchanges (cells, then groups); the weighted
    quantile = ONE sort with both windows riding it; corrMatrix = a
    single aggregation pass with no window/sort/join; the t-test family
    never joins its two samples."""
    from clickhouse_etl_spark.operators.stats import (
        corr_matrix, entropy, quantile_exact_weighted)
    from clickhouse_etl_spark.operators.stattests import student_t_test

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        "l_quantity", "l_extendedprice", "l_discount",
        (F.col("l_orderkey") % 2).alias("ix"),
    )

    plan = _explain(entropy(li, ["g"], "l_quantity"), mode="simple")
    assert plan.count("Exchange") == 2
    assert "Sort" not in plan and "Window" not in plan

    plan = _explain(
        quantile_exact_weighted(li, ["g"], "l_extendedprice", "l_quantity", 0.5),
        mode="simple",
    )
    assert plan.count("Sort") == 1         # both windows share one sort
    assert plan.count("Window") == 2

    plan = _explain(
        corr_matrix(li, ["g"], ["l_quantity", "l_extendedprice", "l_discount"]),
        mode="simple",
    )
    assert plan.count("Exchange") == 1     # one aggregation pass
    assert "Join" not in plan and "Window" not in plan

    plan = _explain(student_t_test(li, ["g"], "l_quantity", "ix"),
                    mode="simple")
    assert "Join" not in plan              # conditional moments, no self-join
    assert plan.count("Exchange") == 1


def test_linear_fit_single_aggregation_pass(spark):
    """The OLS moment fold is ONE hash aggregation; the solver UDF runs
    on the one-row-per-group result, never on the data."""
    from clickhouse_etl_spark.operators.regression import linear_regression_fit

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        "l_quantity", "l_discount", "l_extendedprice",
    )
    plan = _explain(
        linear_regression_fit(li, ["g"], ["l_quantity", "l_discount"],
                              "l_extendedprice"),
        mode="simple",
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    # the Arrow UDF must sit ABOVE the final aggregate, not below it
    agg_pos = plan.rfind("HashAggregate")
    udf_pos = plan.find("ArrowEvalPython")
    assert udf_pos != -1 and udf_pos < agg_pos


def test_rotation6_registered_rows_plan_contracts(spark):
    """Plan pins for the round-10 promotions: the snapshot diff is ONE
    unbroadcast shuffle join (both sides fact-sized), the strict-order
    funnel is pure window machinery (zero joins), and the fuzzy row
    never plans a cartesian or row-Python."""
    from clickhouse_etl_spark.queries.extensions import (
        ext_funnel_strict_order,
        ext_fuzzy_pairs,
        ext_snapshot_diff,
    )

    d = ext_snapshot_diff(spark, SF_SMOKE)
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    n_joins = sum(
        plan.count(j)
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert n_joins == 1, f"snapshot diff should be ONE join, saw {n_joins}"
    opt = d._jdf.queryExecution().optimizedPlan().toString()
    for line in opt.splitlines():
        if "FullOuter" in line:
            assert "broadcast" not in line.lower()

    f = ext_funnel_strict_order(spark, SF_SMOKE)
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "strict-order funnel must not plan joins"
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    z = ext_fuzzy_pairs(spark, SF_SMOKE)
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
