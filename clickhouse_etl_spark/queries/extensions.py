"""Extension queries — analytic surface the reference lacks but Spark
gives for free (SURVEY.md §2.5/§2.6 notes: no grouping sets, no lag/lead,
no running totals anywhere in the reference). Exposed as first-class,
oracle-checked operators so a reference user gets them on day one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.queries import register


# ---------------------------------------------------------------------------
# ROLLUP / grouping sets — subtotal hierarchies in one pass.
# ---------------------------------------------------------------------------
@register(
    "ext_rollup_part_stats",
    oracle="""
    SELECT p_brand, CAST(p_size % 5 AS INT) AS size_band,
           count(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part
    GROUP BY ROLLUP (p_brand, CAST(p_size % 5 AS INT))
    """,
)
def ext_rollup_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.rollup("p_brand", (F.col("p_size") % 5).cast("int").alias("size_band"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Running total — window frame (ROWS UNBOUNDED PRECEDING).
# ---------------------------------------------------------------------------
@register(
    "ext_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_revenue
    FROM orders
    """,
)
def ext_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_revenue"),
    )


# ---------------------------------------------------------------------------
# COUNT DISTINCT per group — exact here (oracle-checkable); the approximate
# HLL form (approx_count_distinct) is pinned against this in pytest with a
# documented error bound, since an approximate result can't hash-match.
# ---------------------------------------------------------------------------
@register(
    "ext_distinct_users_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def ext_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Exact percentiles — the ClickHouse quantile() analog (interpolated).
# Exact is the ORACLE form only (it buffers each group's values); the
# 100 TB path is approx_percentile's bounded sketch — pinned against this
# within 2% in tests/test_scale_ops.py::test_approx_percentile_within_bound
# (same pattern as the HLL twin above).
# ---------------------------------------------------------------------------
@register(
    "ext_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def ext_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("p95"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Pivot / cross-tab — one row per region, one column per order status.
# ---------------------------------------------------------------------------
@register(
    "ext_pivot_status_by_region",
    oracle="""
    SELECT r.r_name AS region,
           COUNT(*) FILTER (o.o_orderstatus = 'F') AS status_F,
           COUNT(*) FILTER (o.o_orderstatus = 'O') AS status_O,
           COUNT(*) FILTER (o.o_orderstatus = 'P') AS status_P
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def ext_pivot_status_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "region",
            F.coalesce("F", F.lit(0)).alias("status_F"),
            F.coalesce("O", F.lit(0)).alias("status_O"),
            F.coalesce("P", F.lit(0)).alias("status_P"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic sampling — reproducible hash-mod subsets (the training-data
# sampling primitive: same rows every run, no RNG state, pushes down).
# ---------------------------------------------------------------------------
@register(
    "ext_deterministic_sample",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE (event_id * 2654435761) % 100 < 10
    """,
)
def ext_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        F.pmod(F.col("event_id") * F.lit(2654435761), F.lit(100)) < 10
    ).select("event_id", "user_id", "event_type")


# ---------------------------------------------------------------------------
# Range join (binned): events falling inside derived maintenance windows
# ([02:00,03:30) and [14:00,15:30) of every active day). The oracle is the
# exact theta join — the engine's binned equi-join must match it row for
# row while planning as a hash join, not a nested loop.
# ---------------------------------------------------------------------------
@register(
    "ext_range_join_windows",
    oracle="""
    WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events),
    intervals AS (
      SELECT 'am_' || strftime(d, '%Y%m%d') AS interval_id,
             d + INTERVAL 2 HOUR AS s, d + INTERVAL 210 MINUTE AS e FROM days
      UNION ALL
      SELECT 'pm_' || strftime(d, '%Y%m%d'),
             d + INTERVAL 14 HOUR, d + INTERVAL 930 MINUTE FROM days
    )
    SELECT i.interval_id, count(ev.ts) AS n_events,
           CAST(SUM(CAST(ev.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM intervals i
    LEFT JOIN events ev ON ev.ts >= i.s AND ev.ts < i.e
    GROUP BY i.interval_id
    """,
)
def ext_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.rangejoin import range_join_binned

    events = load_table(spark, sf_dir, "events")
    days = events.select(F.date_trunc("day", "ts").alias("d")).distinct()
    intervals = days.select(
        F.concat(F.lit("am_"), F.date_format("d", "yyyyMMdd")).alias("interval_id"),
        (F.col("d") + F.expr("INTERVAL 2 HOURS")).alias("start"),
        (F.col("d") + F.expr("INTERVAL 3 HOURS 30 MINUTES")).alias("end"),
    ).unionByName(
        days.select(
            F.concat(F.lit("pm_"), F.date_format("d", "yyyyMMdd")).alias(
                "interval_id"
            ),
            (F.col("d") + F.expr("INTERVAL 14 HOURS")).alias("start"),
            (F.col("d") + F.expr("INTERVAL 15 HOURS 30 MINUTES")).alias("end"),
        )
    )
    # Aggregation pushed BELOW the outer join: the INNER binned join
    # (which skips all outer machinery) aggregates first, then the tiny
    # interval dim left-joins onto the ≤|intervals| aggregate rows to
    # re-attach unmatched windows with count 0 / sum NULL — identical to
    # the oracle's LEFT JOIN + GROUP BY, without paying a row-level
    # outer reattachment over the full match set. At 100 TB this is the
    # only sane shape: outer semantics on 60 aggregate rows, not 10^11
    # match rows.
    matched = range_join_binned(
        events.select("ts", "value"), intervals, bin_seconds=3600, how="inner"
    )
    agg = matched.groupBy("interval_id").agg(
        F.count("ts").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    return (
        intervals.select("interval_id")
        .join(agg, on="interval_id", how="left")
        .select(
            "interval_id",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Hypertable-style cascade rollup: daily aggregates computed FROM hourly
# partials (the continuous-aggregate shape — coarser resolutions reuse
# finer ones instead of rescanning the fact).
# ---------------------------------------------------------------------------
@register(
    "ext_hypertable_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ext_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_dec"),
    )
    daily = hourly.groupBy(
        F.to_date(F.date_trunc("day", "hour")).alias("day"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_dec").cast("double").alias("sum_value"),
    )
    return daily


# ---------------------------------------------------------------------------
# lag/lead — inter-event gaps (the analytics the streaming tier's
# sessionization is built on, exposed as a batch operator).
# ---------------------------------------------------------------------------
@register(
    "ext_event_gaps",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - epoch_us(LAG(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us,
           LEAD(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def ext_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )
