"""Reference-surface operators (SURVEY.md §2) declared on the test tables.

Each query re-expresses one reference operator Spark-first on the driver's
TPC-H-ish tables (customer/orders/lineitem stand in for the reference's
student/evaluation/score shapes; events for the incremental tier).

Numeric policy for oracle parity: money aggregates are summed as
DECIMAL(18,2) (exact, order-independent) and only then cast to DOUBLE;
ratios/averages are rounded to 6 places on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.functions.grading import (
    grade_band_sql,
    grade_gpa_sql,
    grade_letter,
    grade_gpa,
)
from clickhouse_etl_spark.operators.aggregates import (
    avg_null_as_zero,
    avg_null_dropped,
    avg_of_avgs,
    weighted_average,
)
from clickhouse_etl_spark.operators.dedup import latest_row_per_key
from clickhouse_etl_spark.operators.joins import (
    anti_join,
    broadcast_dim_join,
    candidate_expansion,
    semi_join_pushdown,
)
from clickhouse_etl_spark.queries import register


def _dec_sum(col, alias, scale=2):
    """Exact (order-independent) money sum: decimal-sum → double."""
    return (
        F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double").alias(alias)
    )


# ---------------------------------------------------------------------------
# P3 / W1 — latest-row-per-key dedup (window)
# reference: apps/airflow/dags/student/etl_students_to_clickhouse.py:38-45
# ---------------------------------------------------------------------------
@register(
    "p3_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def p3_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # Project BEFORE the window: the dedup shuffles whole rows, and the
    # wide props column never reaches the output.
    slim = events.select("user_id", "event_id", "event_type", "value", "ts")
    return latest_row_per_key(
        slim, ["user_id"], order_col="ts", tiebreak=["event_id"]
    ).select("user_id", "event_id", "event_type", "value")


# ---------------------------------------------------------------------------
# S7 / P2 — incremental high-watermark predicate (pushed to the scan)
# reference: apps/airflow/dags/student/etl_students_to_clickhouse.py:31,44
# ---------------------------------------------------------------------------
@register(
    "s7_incremental_watermark",
    oracle="""
    SELECT event_type, count(*) AS n_rows,
           CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events
    WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY event_type
    """,
)
def s7_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    batch = events.filter(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
    return batch.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"), _dec_sum("value", "sum_value")
    )


# ---------------------------------------------------------------------------
# A1 + A2 — BOTH averaging semantics side by side: nulls-dropped (SQL AVG)
# vs null-as-zero (different denominator — the reference's silent semantic
# trap, SURVEY.md §5.3). One query, both library operators exercised.
# reference: …etl_student_scores_subject_month_to_clickhouse.py:160-204;
#            …etl_student_transcript_to_clickhouse.py:240-245
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-6 rotation,
# batch 2 (identical value-hash oracle there); BOTH averaging semantics
# stay driver-verified composed inside pl_monthly_subject_fact.
def a12_avg_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a1 = avg_null_dropped(events, ["event_type"], "value", alias="avg_value")
    a2 = avg_null_as_zero(events, ["event_type"], "value", alias="avg_value_z")
    # 5-row grouped outputs; the join is trivially broadcast by AQE.
    return a1.join(a2, on="event_type").select(
        "event_type",
        F.round("avg_value", 6).alias("avg_value"),
        F.round("avg_value_z", 6).alias("avg_value_z"),
    )


# ---------------------------------------------------------------------------
# A3 — weighted average with coe≤0→1 defaulting
# reference: …etl_student_scores_subject_month_to_clickhouse.py:284-302
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-6 registry
# rotation (identical value-hash oracle there); weighted_average also
# composes inside pl_transcript_totals, which stays registered.
def a3_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = weighted_average(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", alias="weighted_price"
    )
    return out.withColumn("weighted_price", F.round("weighted_price", 6))


# ---------------------------------------------------------------------------
# F2 — grade banding ladder (closed lower bounds)
# reference: …etl_student_scores_subject_month_to_clickhouse.py:84-109
# ---------------------------------------------------------------------------
_PCT = "CAST(o_orderkey % 101 AS DOUBLE)"

@register(
    "f2_grade_distribution",
    oracle=f"""
    SELECT {grade_band_sql(_PCT)} AS grade,
           {grade_gpa_sql(_PCT)} AS gpa,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def f2_grade_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pct = (F.col("o_orderkey") % 101).cast("double")
    return (
        orders.select(
            grade_letter(pct).alias("grade"), grade_gpa(pct).alias("gpa")
        )
        .groupBy("grade", "gpa")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# J1/J5 — fact ⨝ broadcast dims (the reference's dict hash joins)
# reference: …etl_student_scores_subject_month_to_clickhouse.py:121,143,361
# ---------------------------------------------------------------------------
@register(
    "j1_revenue_per_nation",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS n_orders,
           CAST(CAST(SUM(CAST(CAST(o.o_totalprice AS VARCHAR) AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j1_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    enriched = broadcast_dim_join(
        orders,
        customer.select("c_custkey", "c_nationkey"),
        on=[orders.o_custkey == F.col("c_custkey")],
        how="inner",
    )
    enriched = broadcast_dim_join(
        enriched,
        nation.select("n_nationkey", "n_name"),
        on=[F.col("c_nationkey") == F.col("n_nationkey")],
        how="inner",
    )
    return enriched.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_orders"), _dec_sum("o_totalprice", "revenue")
    )


# ---------------------------------------------------------------------------
# J2-J4 — hierarchy hop (child ⨝ parent dim)
# reference: …etl_student_scores_subject_month_to_clickhouse.py:154-158,356-358
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-5 registry
# rotation (near-twin of j1's broadcast dim-join ladder; J2-J4 also pass
# through pl_monthly_subject_fact's registered row).
def j2_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    df = broadcast_dim_join(
        customer,
        nation.select("n_nationkey", "n_regionkey"),
        on=[F.col("c_nationkey") == F.col("n_nationkey")],
        how="inner",
    )
    df = broadcast_dim_join(
        df,
        region.select("r_regionkey", "r_name"),
        on=[F.col("n_regionkey") == F.col("r_regionkey")],
        how="inner",
    )
    return df.groupBy(F.col("r_name").alias("region")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        _dec_sum("c_acctbal", "total_acctbal"),
    )


# ---------------------------------------------------------------------------
# S5/J9 — keyed-lookup extraction as left-semi join
# reference: …etl_student_scores_subject_month_to_clickhouse.py:466-511
# ---------------------------------------------------------------------------
@register(
    "j9_semi_customers_with_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def j9_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # the key set derives from the orders FACT (grows with sf) — no
    # forced broadcast; AQE picks the strategy at runtime.
    keys = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    active = semi_join_pushdown(customer, keys, on="c_custkey", broadcast=False)
    return active.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# (anti-join negative membership — "if key in processed: continue",
# reference …etl_student_scores_subject_month_to_clickhouse.py:273-276 —
# is oracle-checked in tests/test_demoted_oracles.py, both standalone and
# through set_union_anti_merge: the registry is capped at the driver's
# 50-query correctness window.)


# ---------------------------------------------------------------------------
# J10 — cartesian candidate expansion then left join + filter
# reference: apps/airflow/dags/student_transcript/
# etl_student_transcript_to_clickhouse.py:276-304
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-6 registry
# rotation (identical value-hash oracle there); candidate_expansion also
# composes inside the LSH/ANN bucket grids, which stay registered.
def j10_candidate_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    grid = candidate_expansion(
        region.select("r_name").distinct(),
        orders.select(F.col("o_orderstatus")),
        student_key="o_orderstatus",
    )
    actual = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        grid.join(actual, on=["r_name", "o_orderstatus"], how="left")
        .select(
            F.col("r_name").alias("region"),
            F.col("o_orderstatus").alias("status"),
            F.coalesce(F.col("__n"), F.lit(0)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# A4 — average of averages (two-level groupBy)
# reference: …etl_student_transcript_to_clickhouse.py:255-265
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-5 registry
# rotation (same two-level average family as a12/a3's registered rows).
def a4_avg_of_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"),
    )
    out = avg_of_avgs(
        joined,
        inner_keys=["c_nationkey", "o_custkey"],
        outer_keys=["c_nationkey"],
        value="o_totalprice",
        alias="avg_customer_order_value",
    )
    return out.select(
        F.col("c_nationkey").alias("nationkey"),
        F.round("avg_customer_order_value", 6).alias("avg_customer_order_value"),
    )


# (A6 credit totals / weighted GPA — reference
# …etl_student_transcript_to_clickhouse.py:409-412,440-442 — is
# registry-covered by pl_transcript_totals, whose lifecycle computes the
# same A6 semantics INLINE (fused with the details aggregation; its
# zero-credit guard returns 0.0 where the standalone
# operators.credit_totals divides to NULL — both oracle-checked, the
# standalone one in tests/test_demoted_oracles.py: registry capped at
# the driver's 50-query correctness window.)


# ---------------------------------------------------------------------------
# A7 — nested-list aggregation (collect_list)
# reference: …etl_student_transcript_to_clickhouse.py:368-394,399-452
# ---------------------------------------------------------------------------
@register(
    "a7_nested_order_lines",
    oracle="""
    SELECT l_orderkey AS orderkey,
           ARRAY_TO_STRING(LIST_SORT(LIST(l_linenumber)), ',') AS line_numbers,
           count(*) AS line_count
    FROM lineitem GROUP BY l_orderkey
    """,
)
def a7_nested_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered query serializes the array to a CSV string so the
    driver's order-insensitive value-hash (pandas) can canonicalize it; the
    warehouse write path keeps the typed array via operators.nested_details."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.concat_ws(",", F.sort_array(F.collect_list("l_linenumber"))).alias(
            "line_numbers"
        ),
        F.count(F.lit(1)).alias("line_count"),
    )


# ---------------------------------------------------------------------------
# A5 — hierarchical rollup (region ← nation ← customer tree; leaf scores =
# order totals). One pass over the fact; bounded tree walk above it.
# reference: apps/airflow/dags/score/etl_scores_by_subject_to_clickhouse.py:48-106
# ---------------------------------------------------------------------------
@register(
    "a5_hierarchical_rollup",
    oracle="""
    -- leaf averages come from orders only (not customer LEFT JOIN
    -- orders): a customer with no orders must be NULL like the engine's
    -- unscored leaf, not avg(coalesce(NULL,0)) = 0.
    WITH leaf_real AS (
      SELECT 'c' || o.o_custkey AS id,
             AVG(COALESCE(o.o_totalprice, 0)) AS v
      FROM orders o GROUP BY o.o_custkey
    ),
    cust AS (
      SELECT 'c' || c.c_custkey AS id, c.c_nationkey, lr.v
      FROM customer c LEFT JOIN leaf_real lr ON lr.id = 'c' || c.c_custkey
    ),
    nat AS (
      SELECT n.n_nationkey, n.n_regionkey, AVG(cu.v) AS v
      FROM nation n LEFT JOIN cust cu ON cu.c_nationkey = n.n_nationkey
      GROUP BY n.n_nationkey, n.n_regionkey
    ),
    reg AS (
      SELECT r.r_regionkey, AVG(na.v) AS v
      FROM region r LEFT JOIN nat na ON na.n_regionkey = r.r_regionkey
      GROUP BY r.r_regionkey
    )
    SELECT id, ROUND(v, 6) AS value FROM cust
    UNION ALL
    SELECT 'n' || n_nationkey AS id, ROUND(v, 6) AS value FROM nat
    UNION ALL
    SELECT 'r' || r_regionkey AS id, ROUND(v, 6) AS value FROM reg
    """,
)
def a5_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")

    # Build the evaluation-tree shape: region roots, nation mid, customer leaves.
    evals = (
        region.select(
            F.concat(F.lit("r"), F.col("r_regionkey")).alias("evaluationId"),
            F.lit("na").alias("parentId"),
            F.lit("region").alias("type"),
        )
        .unionByName(
            nation.select(
                F.concat(F.lit("n"), F.col("n_nationkey")).alias("evaluationId"),
                F.concat(F.lit("r"), F.col("n_regionkey")).alias("parentId"),
                F.lit("nation").alias("type"),
            )
        )
        .unionByName(
            customer.select(
                F.concat(F.lit("c"), F.col("c_custkey")).alias("evaluationId"),
                F.concat(F.lit("n"), F.col("c_nationkey")).alias("parentId"),
                F.lit("customer").alias("type"),
            )
        )
    )
    scores = orders.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("evaluationId"),
        F.col("o_totalprice").alias("score"),
    )
    # The level ordering is known (customer→nation→region), so the
    # single-plan leveled fast path applies — no per-level driver actions.
    # Generic fixed-point hierarchical_rollup stays for unknown shapes;
    # tests assert both agree on this tree.
    from clickhouse_etl_spark.operators.rollup import hierarchical_rollup_by_level

    rolled = hierarchical_rollup_by_level(
        evals, scores, level_types=["customer", "nation", "region"]
    )
    return rolled.select(
        F.col("evaluationId").alias("id"), F.round("value", 6).alias("value")
    )


# ---------------------------------------------------------------------------
# W2 — "latest marked" representative via max_by
# reference: …etl_student_transcript_to_clickhouse.py:296-301,330-332
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-5 registry
# rotation (ranking/representative family also registered via
# p3_latest_event_per_user; tiebreak totality micro-pinned there too).
def w2_latest_marked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.dedup import representative_latest

    events = load_table(spark, sf_dir, "events")
    out = representative_latest(
        events, ["user_id"], payload_cols=["event_type"], order_col="event_id"
    )
    return out.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("event_id").alias("last_event_id"),
    )


# ---------------------------------------------------------------------------
# O1 — ordered top-k (sort + limit, deterministic tiebreak)
# reference: ORDER BY in extraction SQL, apps/airflow/dags/subject/
# etl_subjects_to_clickhouse.py:188
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-5 registry
# rotation (TakeOrdered top-k also exercised by ext_bm25_topk's ranked
# cut; the TakeOrdered plan shape is micro-pinned in the demoted test).
def o1_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.8 — union-with-anti-join merge (direct ∪ custom-only)
# reference: …etl_student_scores_subject_month_to_clickhouse.py:233-342
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-5 registry
# rotation (anti-join membership was already oracle-checked there;
# the semi-join side keeps its registered row via j9).
def set_union_anti_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    direct = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", F.lit("direct").alias("path")
    )
    custom_only = anti_join(
        customer.filter(F.col("c_acctbal") > 5000),
        customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
        on="c_custkey",
        broadcast=False,  # right side grows with the customer table
    ).select("c_custkey", F.lit("custom").alias("path"))
    return direct.unionByName(custom_only)


# ---------------------------------------------------------------------------
# J7 — last-write-wins dim dedup (the reference dict comprehension keeps
# the last subject per structureRecordId; engine policy: max of an explicit
# order column, deterministic).
# reference: …etl_student_scores_subject_month_to_clickhouse.py:149
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-5 registry
# rotation (ranking-window dedup family also registered via
# p3_latest_event_per_user).
def j7_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.dedup import last_write_wins

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return last_write_wins(orders, "o_custkey", order_col="o_orderkey")


# ---------------------------------------------------------------------------
# A8 — JSON-array aggregation (customEvaluations column + count)
# reference: …etl_student_scores_subject_month_to_clickhouse.py:216-231,
# 373-374,426-427
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-9 rotation,
# batch 5 (identical value-hash oracle there): the per-order nested
# detail aggregation keeps a7_nested_order_lines as its driver row —
# A7 and A8 group the same lineitem keys through the same sort_array/
# collect_list machinery and differ only in the JSON serialization of
# the collected structs (json_details vs nested_details), which stays
# composed-and-driver-checked inside pl_transcript_details. The
# registry slot goes to the promoted ext_collapsing_merge row.
def a8_json_custom_evals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.aggregates import json_details

    li = load_table(spark, sf_dir, "lineitem")
    return json_details(
        li.select(F.col("l_orderkey").alias("orderkey"), "l_linenumber", "l_returnflag"),
        keys=["orderkey"],
        detail_cols=["l_linenumber", "l_returnflag"],
    )


# ---------------------------------------------------------------------------
# As-of join (extension): for each 'click' event, the most recent
# 'purchase' value at-or-before it per user. Right side pre-deduped per
# (user, ts) so the tie policy is explicit on both engines; DuckDB oracle
# uses its native ASOF JOIN.
# ---------------------------------------------------------------------------
@register(
    "ext_asof_last_purchase",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id,
           ROUND(p.purchase_value, 6) AS last_purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def ext_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(
        clicks, purchases, on="user_id", value_cols=["purchase_value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("asof_purchase_value", 6).alias("last_purchase_value"),
    )


# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (A1+A3+F7 composition) — also
# the headline bench query.
#
# Oracle cast mediation (r10, closes the standing gen10 1-ulp miss):
# every double<->decimal boundary goes through VARCHAR on the DuckDB
# side, because the engines' native casts round differently —
#   * double -> DECIMAL: Spark rounds the double's SHORTEST DECIMAL
#     REPRESENTATION half-up (BigDecimal.valueOf + HALF_UP); DuckDB's
#     direct cast rounds in double arithmetic (scale by 10^s, llround),
#     so a value whose shortest repr ends in '5' one digit past the
#     scale can round the other way (tests/test_cast_divergence.py).
#     DuckDB's double->VARCHAR prints the shortest repr and its
#     VARCHAR->DECIMAL parse rounds half-up — composing them IS Spark's
#     semantics.
#   * DECIMAL -> double: Spark is correctly rounded
#     (BigDecimal.doubleValue); DuckDB's direct cast divides in double
#     arithmetic (two roundings — observed 1 ulp off on a gen10 group
#     sum); DECIMAL->VARCHAR->DOUBLE is exact-print + correctly-rounded
#     parse. Same mediation applied to every decimal-summing oracle in
#     this inventory (j1, p3, flagship, ext_rollup/running/range/
#     hypertable).
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.util import rebalance_for_compute

    # The test files are single-row-group parquet, so the scan (and its
    # partial aggregation) cannot split; spread the decimal arithmetic.
    # No-op whenever the scan already yields >= parallelism splits — any
    # real deployment — so the map-side combine is preserved at scale.
    li = rebalance_for_compute(load_table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity", "sum_qty"),
            _dec_sum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price.cast("decimal(18,6)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Flagship: the §3.3 wide denormalized fact re-shaped onto TPC-H — multi-way
# broadcast join + window dedup + grade banding + nested JSON details.
# reference lifecycle: SURVEY.md §3.3
# ---------------------------------------------------------------------------
@register(
    "flagship_wide_fact",
    oracle=f"""
    SELECT o.o_orderkey AS orderkey, c.c_name AS customer_name,
           n.n_name AS nation, r.r_name AS region,
           CAST(CAST(SUM(CAST(CAST(l.l_extendedprice * (1 - l.l_discount) AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           count(*) AS line_count,
           {grade_band_sql("CAST(o.o_orderkey % 101 AS DOUBLE)")} AS grade
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY o.o_orderkey, c.c_name, n.n_name, r.r_name
    """,
)
def flagship_wide_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    # customer is NOT force-broadcast: it grows with sf (would stop fitting
    # at ~100×), so AQE picks the strategy at runtime (still broadcast at
    # small sf, shuffle join when it outgrows the threshold). nation/region
    # are constant-size — always broadcast.
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    pct = (F.col("o_orderkey") % 101).cast("double")
    return (
        joined.groupBy(
            F.col("o_orderkey").alias("orderkey"),
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            grade_letter(pct).alias("grade"),
        )
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .select(
            "orderkey", "customer_name", "nation", "region",
            "revenue", "line_count", "grade",
        )
    )


# ---------------------------------------------------------------------------
# F-suite — the whole scalar function zoo in ONE row-level pass, checked
# value-by-value against DuckDB: F3 ISO parse, F4 legacy-date rescue,
# F5 ISO stringify, F7 guarded percentage, F9 path split, F11 JSON
# extraction (string + typed from_json with malformed→NULL), F12/F16
# coalesce defaults, F13 UUID validation, F14 NaN→NULL.
# ---------------------------------------------------------------------------
@register(
    "f_scalar_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           ROUND(COALESCE(value, 0), 6) AS value_or_zero,
           CASE WHEN 100.0 > 0 THEN ROUND(COALESCE(value,0) / 100.0 * 100, 6) ELSE 0 END AS pct,
           regexp_extract('datetime.date@version=2(' || strftime(ts, '%Y-%m-%d') || ')',
                          '\\((\\d{4}-\\d{2}-\\d{2})\\)', 1) AS rescued_date,
           split_part('#' || CAST(user_id AS VARCHAR) || '#tail', '#', 2) AS path_id,
           strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'), '%Y-%m-%dT%H:%M:%SZ')
             AS parsed_ts,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_str,
           CASE WHEN event_id % 2 = 0 THEN
             regexp_matches(
               substr(md5(CAST(event_id AS VARCHAR)), 1, 8) || '-' ||
               substr(md5(CAST(event_id AS VARCHAR)), 9, 4) || '-' ||
               substr(md5(CAST(event_id AS VARCHAR)), 13, 4) || '-' ||
               substr(md5(CAST(event_id AS VARCHAR)), 17, 4) || '-' ||
               substr(md5(CAST(event_id AS VARCHAR)), 21, 12),
               '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')
           ELSE
             regexp_matches('not-a-uuid',
               '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')
           END AS uuid_ok,
           value AS value_clean,
           CASE WHEN event_id % 10 = 0 THEN NULL
                ELSE CAST(props->>'$.k' AS BIGINT) END AS k_typed,
           (event_id % 10 = 0) AS was_malformed
    FROM events
    """,
)
def f_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.functions.scalars import (
        coalesce_default,
        is_uuid,
        nan_to_null,
        path_first_id,
        path_synthesize,
        percentage,
    )
    from clickhouse_etl_spark.functions.timestamps import (
        iso_timestamp,
        timestamp_to_iso_string,
    )

    # Single-row-group input + 12-column scalar zoo = a CPU-bound
    # single-task projection; spread it (no-op when the scan already
    # yields >= parallelism splits, i.e. any real deployment).
    from clickhouse_etl_spark.util import rebalance_for_compute

    events = rebalance_for_compute(load_table(spark, sf_dir, "events"))
    legacy = F.concat(
        F.lit("datetime.date@version=2("),
        F.date_format("ts", "yyyy-MM-dd"),
        F.lit(")"),
    )
    path = F.concat(path_synthesize(F.col("user_id")), F.lit("#tail"))
    md5 = F.md5(F.col("event_id").cast("string"))
    uuid_like = F.concat_ws(
        "-",
        F.substring(md5, 1, 8),
        F.substring(md5, 9, 4),
        F.substring(md5, 13, 4),
        F.substring(md5, 17, 4),
        F.substring(md5, 21, 12),
    )
    candidate = F.when(F.col("event_id") % 2 == 0, uuid_like).otherwise(
        F.lit("not-a-uuid")
    )
    # F14: inject NaN for NULL values, then scrub it back to NULL.
    with_nan = F.when(F.col("value").isNull(), F.lit(float("nan"))).otherwise(
        F.col("value")
    )
    # F11 typed: from_json with malformed-input → NULL semantics.
    dirty = F.when(F.col("event_id") % 10 == 0, F.lit("{not json")).otherwise(
        F.col("props")
    )
    parsed = F.from_json(dirty, "k BIGINT")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
        F.round(coalesce_default(F.col("value"), 0), 6).alias("value_or_zero"),
        F.round(
            percentage(coalesce_default(F.col("value"), 0), F.lit(100.0)), 6
        ).alias("pct"),
        F.regexp_extract(legacy, r"\((\d{4}-\d{2}-\d{2})\)", 1).alias("rescued_date"),
        path_first_id(path).alias("path_id"),
        iso_timestamp(F.concat(timestamp_to_iso_string(F.col("ts")), F.lit("Z")))
        .alias("parsed_ts"),
        timestamp_to_iso_string(F.col("ts")).alias("iso_str"),
        is_uuid(candidate).alias("uuid_ok"),
        nan_to_null(with_nan).alias("value_clean"),
        parsed.getField("k").alias("k_typed"),
        (F.col("event_id") % 10 == 0).alias("was_malformed"),
    )
