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
           CAST(CAST(SUM(CAST(CAST(p_retailprice AS VARCHAR) AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
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
           CAST(CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE) AS running_revenue
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
# Demoted to tests/test_demoted_oracles.py in the round-6 registry
# rotation (identical value-hash oracle there) — near-twin of the
# registered time-bucket aggregates (ext_hypertable_rollup).
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
# Demoted to tests/test_demoted_oracles.py in the round-8 rotation,
# batch 4 (identical value-hash oracle there): the quantile machinery
# (percentile_approx-family interpolation) stays driver-verified via
# the still-registered ext_quantiles_weighted, which rides the same
# sorted-cume interpolation with the harder weighted contract.
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
# Demoted to tests/test_demoted_oracles.py in the round-6 registry
# rotation (identical value-hash oracle there) — the map-only filter
# shape is already exercised by every registered scan query.
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
           CAST(CAST(SUM(CAST(CAST(ev.value AS VARCHAR) AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
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
           CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
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
# Demoted to tests/test_demoted_oracles.py in the round-6 registry
# rotation (identical value-hash oracle there) — its lag/lead family
# gains two deeper registered rows (ext_window_funnel, ext_retention).
def ext_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# ---------------------------------------------------------------------------
# Round-5 registry rotation: operators that previously lived only in
# tests/test_demoted_oracles.py / tests/test_upsert.py promoted into the
# driver's 50-query correctness window, in place of near-twin relational
# rows (j2/a4/w2/o1/j7/set_union — demoted with identical oracles).
# ---------------------------------------------------------------------------

# BM25 ranked retrieval (text/index.py) — query-term-filtered joins,
# corpus scalars broadcast, TakeOrdered top-k.
@register(
    "ext_bm25_topk",
    oracle="""
    WITH td AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
      ) WHERE term <> '' GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, SUM(tf) AS len FROM td GROUP BY doc_id),
    corpus AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM dl),
    dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM td
            WHERE term IN ('the', 'data', 'pipeline') GROUP BY term)
    SELECT td.doc_id,
           ROUND(SUM(
             ln(1 + (corpus.n - dft.df + 0.5) / (dft.df + 0.5))
             * td.tf * 2.2
             / (td.tf + 1.2 * (0.25 + 0.75 * dl.len / corpus.avgdl))
           ), 6) AS score
    FROM td
    JOIN dft ON td.term = dft.term
    JOIN dl ON td.doc_id = dl.doc_id
    CROSS JOIN corpus
    GROUP BY td.doc_id
    ORDER BY score DESC, td.doc_id ASC
    LIMIT 15
    """,
)
def ext_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.text.index import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, ["the", "data", "pipeline"], k=15, k1=1.2, b=0.75)


# SummingMergeTree state maintenance (sinks/upsert.py): snapshot(half 1)
# folded with delta(half 2) must equal one GROUP BY over the whole table.
# Demoted to tests/test_demoted_oracles.py in the round-10 rotation,
# batch 6 (identical value-hash oracle there): the MergeTree merge
# family keeps ext_collapsing_merge as its driver row — the same
# keyed aggregation-shuffle fold with the harder (signed) semantics.
def ext_summing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.sinks.upsert import summing_merge

    li = load_table(spark, sf_dir, "lineitem")
    h1 = li.filter(F.col("l_orderkey") % 2 == 0)
    h2 = li.filter(F.col("l_orderkey") % 2 == 1)
    args = dict(keys=["l_returnflag"], sum_cols=["l_quantity"],
                max_cols=["l_extendedprice"])
    merged = summing_merge(summing_merge(None, h1, **args), h2, **args)
    return merged.select(
        "l_returnflag",
        F.round("l_quantity", 3).alias("total_qty"),
        F.round("l_extendedprice", 3).alias("max_price"),
    )


# CollapsingMergeTree sign collapse (sinks/upsert.py:collapsing_merge),
# promoted in the round-9 rotation, batch 5 — the r8 VERDICT's named
# upsert-family candidate. Every 4th lineitem line acts as a cancel
# (sign=-1); keys with net<=0 vanish, survivors keep the max-version +1
# payload. `ver` (l_linenumber) is unique per key among +1 rows, so the
# max_by tiebreak is total on both engines. ONE aggregation shuffle on
# the key (map-side partial folds the ±1 counts early).
@register(
    "ext_collapsing_merge",
    oracle="""
    WITH r AS (
      SELECT l_orderkey AS k,
             CASE WHEN l_linenumber % 4 = 0 THEN -1 ELSE 1 END AS sign,
             l_linenumber AS ver, l_quantity AS q
      FROM lineitem
    ),
    net AS (SELECT k FROM r GROUP BY k HAVING SUM(sign) > 0),
    last AS (
      SELECT k, ver, q,
             ROW_NUMBER() OVER (PARTITION BY k
                                ORDER BY ver DESC, q DESC) AS rn
      FROM r WHERE sign = 1
    )
    SELECT last.k, last.ver, last.q
    FROM last JOIN net ON last.k = net.k WHERE rn = 1
    """,
)
def ext_collapsing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.sinks.upsert import collapsing_merge

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.selectExpr(
        "l_orderkey AS k",
        "CASE WHEN l_linenumber % 4 = 0 THEN -1 ELSE 1 END AS sign",
        "l_linenumber AS ver",
        "l_quantity AS q",
    )
    return collapsing_merge(rows, ["k"], order_col="ver")


# ---------------------------------------------------------------------------
# Round-10 registry rotation, batch 6: the last pytest-only tiers into
# the driver window — snapshot diff (incremental maintenance beyond
# summing/collapsing), the strict-order funnel (completes the ClickHouse
# event family), and fuzzy edit-distance pairs (entity resolution).
# Demoted near-twins (identical oracles in tests/test_demoted_oracles.py):
# ext_summing_merge, ext_scd2_lookup, ext_window_funnel.
# ---------------------------------------------------------------------------


# Snapshot diff (sinks/upsert.py:snapshot_diff): row-level
# insert/update/delete classification between two keyed snapshots — the
# CDC retrofit for sources that only expose periodic full extracts (the
# reference's daily re-extract DAGs are exactly that shape, e.g.
# apps/airflow/dags/student/etl_students_to_clickhouse.py's full-table
# reload). Old = orders minus every 7th key (those become inserts);
# new = orders minus every 11th key (deletes), with every 3rd key's
# totalprice bumped 10% (updates). ONE full-outer hash join on the key;
# unchanged rows never leave the join. Deletes carry the OLD payload.
@register(
    "ext_snapshot_diff",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ),
    old AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS o_totalprice
      FROM base WHERE o_orderkey % 11 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change,
           CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus
                ELSE n.o_orderstatus END AS o_orderstatus,
           CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice
                ELSE n.o_totalprice END AS o_totalprice
    FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
)
def ext_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.sinks.upsert import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    old = base.filter(F.col("o_orderkey") % 7 != 0)
    new = base.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(old, new, ["o_orderkey"])


# ---------------------------------------------------------------------------
# ROTATION-9 candidate, proven ahead (r12, the r10/r11 pattern):
# snapshot_cdc round-trip (sinks/upsert.py:514). The row composes TWO
# engine paths — snapshot_cdc(old, new) to manufacture the CDC batch
# (inserts/updates with new payload, tombstoned deletes), then
# merge_upsert_with_deletes(old, batch) to apply it — and returns the
# merged table. The oracle is simply `new` computed in SQL, so a
# value-hash match IS a proof of the defining invariant
# ``old + snapshot_cdc(old, new) == new`` at the gated SF (the pytest
# round-trip in tests/test_upsert.py:470 pins it symbolically; this
# form makes it driver-checkable). Same old/new fixture as the
# registered ext_snapshot_diff: % 7 keys missing from old (inserts),
# % 11 keys missing from new (deletes), % 3 keys price-bumped
# (updates). Plan: two key-hash shuffles (the diff's full-outer join,
# the merge's dedup) — merge-family physics, nothing broadcast,
# nothing collected.
# ---------------------------------------------------------------------------
_SNAPSHOT_CDC_ORACLE = """
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 11 <> 0
    """


def ext_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.sinks.upsert import (
        merge_upsert_with_deletes,
        snapshot_cdc,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    old = base.filter(F.col("o_orderkey") % 7 != 0)
    new = base.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice")),
    )
    cdc = snapshot_cdc(old, new, ["o_orderkey"])
    applied = merge_upsert_with_deletes(
        old.withColumn("ver", F.lit(0)),
        cdc.withColumn("ver", F.lit(1)),
        ["o_orderkey"],
        order_col="ver",
    )
    return applied.select("o_orderkey", "o_orderstatus", "o_totalprice")


# ClickHouse windowFunnel(strict_order) (operators/events.py:
# window_funnel_strict_order): consecutive-event funnel — an unrelated
# event between steps INTERRUPTS the chain, unlike the relaxed mode.
# ClickHouse parity per r10 ADVICE: the level is the MAX over ALL
# step-1 anchors (windowFunnel reports the longest chain, not the
# first — the earlier first-anchor form was a documented
# approximation). Oracle: the LEAD-chain formulation proven in
# tests/test_events.py — the next (k-1) events after each step-1
# anchor must match the next steps in order within that anchor's
# window, then MAX over anchors. Per-user window sort + LEADs + one
# partial-aggregated max: one user-keyed shuffle, no joins.
#
# Demoted in the round-11 rotation (identical oracle in
# tests/test_demoted_oracles.py): the funnel family's driver rows are
# now ext_window_funnel_dedup + ext_sequence_count — the two modes
# whose order-dependent automata needed the recursive-CTE oracle
# construction; strict_order is the family's pure-LEAD restriction and
# keeps full rigor in pytest.
_FUNNEL_STRICT_ORDER_ORACLE = """
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             event_type = 'signup' AS s0,
             LEAD(event_type = 'view', 1) OVER w AS n1t,
             LEAD(epoch_us(ts), 1) OVER w AS n1ts,
             LEAD(event_type = 'purchase', 2) OVER w AS n2t,
             LEAD(epoch_us(ts), 2) OVER w AS n2ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    leveled AS (
      SELECT user_id, ts_us, event_id,
             1
             + CASE WHEN COALESCE(n1t, FALSE)
                     AND n1ts <= ts_us + 86400000000
                     AND n1ts > ts_us THEN 1 ELSE 0 END
             + CASE WHEN COALESCE(n1t, FALSE)
                     AND n1ts <= ts_us + 86400000000
                     AND n1ts > ts_us
                     AND COALESCE(n2t, FALSE)
                     AND n2ts <= ts_us + 86400000000
                     AND n2ts > n1ts THEN 1 ELSE 0 END
               AS lvl
      FROM flagged WHERE s0
    )
    SELECT user_id, MAX(lvl) AS funnel_level FROM leveled GROUP BY user_id
    """


def ext_funnel_strict_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.events import (
        window_funnel_strict_order,
    )

    events = load_table(spark, sf_dir, "events")
    return window_funnel_strict_order(
        events,
        ["event_type = 'signup'", "event_type = 'view'",
         "event_type = 'purchase'"],
        window_seconds=86400,
        tiebreak_col="event_id",
    )


# ---------------------------------------------------------------------------
# ClickHouse windowFunnel(strict_dedup) + sequenceCount — the two event
# automata whose semantics NO fixed-depth LEAD or join ladder can
# express (any event anywhere in a wait gap can kill or extend a
# chain). Promoted in the round-11 rotation after round 10 proved both
# SQL-expressible via event-by-event recursive-CTE simulation (commits
# 819f49f / 5900948): the oracle drives the SAME automaton one event
# rank at a time — state per user = the candidate chains + the count —
# so the driver gate replays the full order-dependent semantics, not a
# weakened projection. Recursion depth = max per-user event count
# (~100 at every generated factor: the events fixture fans out the
# user key with sf, so depth stays flat while width grows — the oracle
# scales the same way the operator does).
#
# The Spark side is the family's Arrow-batched per-user scan
# (operators/events.py): step flags precomputed JVM-side, ONE user-key
# shuffle, O(k) state per user — the standard user-keyed-aggregate
# distribution story at 100 TB.
# ---------------------------------------------------------------------------

def _strict_dedup_oracle(window_seconds: int = 86400) -> str:
    """Recursive-CTE simulation of the strict_dedup automaton: state
    per user is (anchor t1, level, last-advance ts, dead); a repeat of
    an already-matched condition while waiting sets dead, an advance
    wins over a simultaneous re-match (dedup only interrupts while
    waiting — mirrors operators/events.py:window_funnel_strict_dedup).
    """
    w = window_seconds * 1_000_000
    return f"""
    WITH RECURSIVE ev AS MATERIALIZED (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             epoch_us(ts) AS ts_us,
             event_type = 'signup' AS s0,
             event_type = 'view' AS s1,
             event_type = 'purchase' AS s2
      FROM events WHERE ts IS NOT NULL
    ),
    nev AS MATERIALIZED (SELECT user_id, MAX(rn) AS mx FROM ev GROUP BY user_id),
    st AS (
      SELECT user_id, 0 AS rn, CAST(NULL AS BIGINT) AS t1,
             0 AS lvl, CAST(NULL AS BIGINT) AS tp, FALSE AS dead
      FROM nev
      UNION ALL
      SELECT user_id, rn,
             CASE WHEN NOT started AND s0 THEN ts_us ELSE t1 END,
             CASE WHEN NOT started AND s0 THEN 1
                  WHEN adv THEN lvl + 1 ELSE lvl END,
             CASE WHEN NOT started AND s0 THEN ts_us
                  WHEN adv THEN ts_us ELSE tp END,
             CASE WHEN started AND NOT adv AND live
                   AND ((lvl >= 1 AND s0) OR (lvl >= 2 AND s1))
                  THEN TRUE ELSE dead END
      FROM (
        SELECT *,
               (live AND ts_us > tp AND ts_us <= t1 + {w}
                AND ((lvl = 1 AND s1) OR (lvl = 2 AND s2))) AS adv
        FROM (
          SELECT s.user_id, e.rn, e.ts_us, e.s0, e.s1, e.s2,
                 s.t1, s.lvl, s.tp, s.dead, s.t1 IS NOT NULL AS started,
                 (s.t1 IS NOT NULL AND NOT s.dead AND s.lvl < 3) AS live
          FROM st s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
        )
      )
    )
    SELECT st.user_id, st.lvl AS funnel_level
    FROM st JOIN nev ON st.user_id = nev.user_id AND st.rn = nev.mx
    WHERE st.t1 IS NOT NULL
    """


@register("ext_window_funnel_dedup", oracle=_strict_dedup_oracle())
def ext_window_funnel_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel(strict_dedup): a repeat of an ALREADY-MATCHED step
    condition interrupts the chain while waiting (A→B→A→C reads level
    2). Level <= the default mode's level, pinned in tests."""
    from clickhouse_etl_spark.operators.events import (
        window_funnel_strict_dedup,
    )

    events = load_table(spark, sf_dir, "events")
    return window_funnel_strict_dedup(
        events,
        ["event_type = 'signup'", "event_type = 'view'",
         "event_type = 'purchase'"],
        86400,
        tiebreak_col="event_id",
    )


def _sequence_count_oracle(window_seconds: int = 86400) -> str:
    """Recursive-CTE simulation of the sequenceCount greedy automaton
    (max-anchor dominance, window expiry, reset-on-completion,
    re-anchoring): state per user = the k-1 candidate (anchor, last)
    pairs + the running count — mirrors
    operators/events.py:sequence_count event-for-event."""
    w = window_seconds * 1_000_000
    return f"""
    WITH RECURSIVE ev AS MATERIALIZED (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             epoch_us(ts) AS ts_us,
             event_type = 'signup' AS s0,
             event_type = 'view' AS s1,
             event_type = 'purchase' AS s2
      FROM events WHERE ts IS NOT NULL
    ),
    nev AS MATERIALIZED (SELECT user_id, MAX(rn) AS mx FROM ev GROUP BY user_id),
    st AS (
      SELECT user_id, 0 AS rn,
             CAST(NULL AS BIGINT) AS c1a, CAST(NULL AS BIGINT) AS c1l,
             CAST(NULL AS BIGINT) AS c2a, CAST(NULL AS BIGINT) AS c2l,
             CAST(0 AS BIGINT) AS n
      FROM nev
      UNION ALL
      SELECT user_id, rn,
             CASE WHEN done THEN NULL
                  WHEN s0 AND (x1a IS NULL OR ts_us > x1a) THEN ts_us
                  ELSE x1a END,
             CASE WHEN done THEN NULL
                  WHEN s0 AND (x1a IS NULL OR ts_us > x1a) THEN ts_us
                  ELSE x1l END,
             CASE WHEN done THEN NULL
                  WHEN ext AND (x2a IS NULL OR x1a > x2a) THEN x1a
                  ELSE x2a END,
             CASE WHEN done THEN NULL
                  WHEN ext AND (x2a IS NULL OR x1a > x2a) THEN ts_us
                  ELSE x2l END,
             n + CASE WHEN done THEN 1 ELSE 0 END
      FROM (
        SELECT *, (s2 AND x2a IS NOT NULL AND ts_us > x2l) AS done,
               (s1 AND x1a IS NOT NULL AND ts_us > x1l) AS ext
        FROM (
          SELECT s.user_id, e.rn, e.ts_us, e.s0, e.s1, e.s2, s.n,
                 CASE WHEN s.c1a IS NOT NULL AND e.ts_us > s.c1a + {w}
                      THEN NULL ELSE s.c1a END AS x1a,
                 CASE WHEN s.c1a IS NOT NULL AND e.ts_us > s.c1a + {w}
                      THEN NULL ELSE s.c1l END AS x1l,
                 CASE WHEN s.c2a IS NOT NULL AND e.ts_us > s.c2a + {w}
                      THEN NULL ELSE s.c2a END AS x2a,
                 CASE WHEN s.c2a IS NOT NULL AND e.ts_us > s.c2a + {w}
                      THEN NULL ELSE s.c2l END AS x2l
          FROM st s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
        )
      )
    )
    SELECT st.user_id, st.n AS n_sequences
    FROM st JOIN nev ON st.user_id = nev.user_id AND st.rn = nev.mx
    """


@register("ext_sequence_count", oracle=_sequence_count_oracle())
def ext_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceCount: greedy NON-OVERLAPPING completed chains per user
    (earliest-completing chain wins, events never shared, abandoned
    windows re-anchor) — the interval-scheduling maximum."""
    from clickhouse_etl_spark.operators.events import sequence_count

    events = load_table(spark, sf_dir, "events")
    return sequence_count(
        events,
        ["event_type = 'signup'", "event_type = 'view'",
         "event_type = 'purchase'"],
        86400,
        tiebreak_col="event_id",
    )


# ---------------------------------------------------------------------------
# Materialized-view incremental maintenance as a DRIVER row (promoted
# round 11, VERDICT ask #5): the reference maintains every derived
# table by full daily rebuild + staging swap (apps/airflow/dags/
# student_scores_subject/etl_student_scores_subject_month_to_
# clickhouse.py:583-590) — exactly the matview maintenance problem
# pipelines/matview.py solves incrementally. This row REPLAYS an
# arriving-data timeline inside one call: refresh_full over the orders
# that "exist" at the first cutoff, then two refresh_incremental folds
# as later order dates arrive (each reads ONLY rows past the committed
# watermark and merges O(delta + touched keys)), and returns the final
# published snapshot. The oracle is one flat GROUP BY over the full
# table — so the driver gate checks the refresh-path-equivalence
# invariant itself (any incremental interleaving == one full rebuild),
# not just a happy-path aggregation. Sums fold in DECIMAL(18,2) so the
# states are exact under any partition/merge order; ts folds as a max
# state (how repair_check knows how far the view has seen).
# ---------------------------------------------------------------------------
@register(
    "ext_matview_incremental",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           count(*) AS n_orders,
           MAX(o_orderdate) AS last_order_ts
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def ext_matview_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from clickhouse_etl_spark.pipelines.matview import MaterializedView

    orders = load_table(spark, sf_dir, "orders")
    proj = orders.select(
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_state"),
        F.lit(1).cast("long").alias("n_state"),
        F.col("o_orderdate").alias("order_ts"),
    )
    # The arriving-data clock: the source closure sees only rows up to
    # the current cutoff, like a table receiving time-ordered appends
    # between refreshes. The testdata's order dates span 1995-01-01 ..
    # 2001-08-01, so the cutoffs split that range into three non-empty
    # deltas at every SF.
    clock = {"cutoff": "1997-06-30"}

    def src(_spark: SparkSession) -> DataFrame:
        return proj.filter(
            F.col("order_ts") <= F.lit(clock["cutoff"]).cast("timestamp")
        )

    # Scratch storage for the view's snapshots. The returned DataFrame
    # reads from it lazily, so it must outlive this call — reclaim at
    # interpreter exit instead (every gate/sweep/bench invocation is its
    # own process, so nothing accumulates across runs).
    scratch = tempfile.mkdtemp(prefix="ext_matview_row_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    view = MaterializedView(
        name="orders_by_status_priority",
        table_root=scratch,
        source=src,
        keys=["o_orderstatus", "o_orderpriority"],
        ts_col="order_ts",
        strategy="summing",
        sum_cols=["price_state", "n_state"],
    )
    view.refresh_full(spark)
    clock["cutoff"] = "1999-06-30"
    view.refresh_incremental(spark)
    clock["cutoff"] = "2100-01-01"  # past the last order date: the rest
    view.refresh_incremental(spark)
    return view.read(spark).select(
        "o_orderstatus",
        "o_orderpriority",
        F.col("price_state").cast("double").alias("total_price"),
        F.col("n_state").alias("n_orders"),
        F.col("order_ts").alias("last_order_ts"),
    )


# Fuzzy edit-distance pairs (operators/fuzzy.py:fuzzy_self_pairs):
# entity resolution at data scale. The fixture manufactures a dirty
# entity table deterministically on BOTH engines: each customer's name
# is the first 12 hex chars of md5(custkey) — gram-SELECTIVE, like real
# entity names and unlike the zero-padded synthetic c_name whose
# constant-prefix grams make candidates ≈ all pairs (measured: gen1→3
# exponent 1.8 on c_name vs sub-linear here) — and every 10th customer
# is a planted TYPO of its predecessor ('z' + the partner's md5 tail:
# exactly one substitution, distance 1). Output is therefore ~n/10
# pairs, linear in the corpus.
#
# Oracle: q-gram candidate prefilter + exact levenshtein verify. With
# q=5, k=1 every 12-char name is LONG (12 >= q*(k+1) = 10), so the
# q-gram completeness bound is a THEOREM here (one edit destroys <= 5
# of the 8 grams, leaving >= 3 shared) — the oracle mirrors candidate
# generation the way the MinHash/LSH oracles reproduce theirs, and
# tests/test_fuzzy.py pins oracle == brute-force n² at the gate SFs so
# the prefilter's completeness is also checked empirically.
@register(
    "ext_fuzzy_pairs",
    oracle="""
    WITH names AS (
      SELECT c_custkey AS id,
             CASE WHEN c_custkey % 10 = 0 AND c_custkey > 0
                  THEN 'z' || substr(md5(CAST(c_custkey - 1 AS VARCHAR)), 2, 11)
                  ELSE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12)
             END AS name
      FROM customer
    ),
    grams AS (
      SELECT id, name,
             unnest(list_distinct(list_transform(
               generate_series(1, len(name) - 4),
               i -> substr(name, i, 5)))) AS g
      FROM names
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                      a.name AS name_a, b.name AS name_b
      FROM grams a JOIN grams b ON a.g = b.g AND a.id < b.id
    )
    SELECT id_a, id_b, name_a, name_b,
           levenshtein(name_a, name_b) AS distance
    FROM cand WHERE levenshtein(name_a, name_b) <= 1
    """,
)
def ext_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.fuzzy import fuzzy_self_pairs

    customer = load_table(spark, sf_dir, "customer")
    key_str = F.col("c_custkey").cast("string")
    partner_str = (F.col("c_custkey") - 1).cast("string")
    names = customer.select(
        "c_custkey",
        F.when(
            (F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") > 0),
            F.concat(
                F.lit("z"),
                F.substring(F.md5(F.encode(partner_str, "UTF-8")), 2, 11),
            ),
        )
        .otherwise(F.substring(F.md5(F.encode(key_str, "UTF-8")), 1, 12))
        .alias("name"),
    )
    return fuzzy_self_pairs(names, "name", max_distance=1,
                            id_col="c_custkey", q=5)


# ---------------------------------------------------------------------------
# ROTATION candidate, proven ahead (r12): sequenceNextNode(forward,
# first_match) (operators/events.py:212) — the last unregistered
# ClickHouse event-family op: per user, the value of the event
# immediately following the first CONSECUTIVE signup→view run ("what
# do users do next after the funnel"). Pure-LEAD plan: one window sort
# per user, zero joins. The oracle is the LEAD-chain mirror already
# pinned micro + full-corpus in tests/test_events.py:610,639; driver
# canon needs the NULL-at-stream-end next_value kept (atomic string).
# ---------------------------------------------------------------------------
_SEQUENCE_NEXT_NODE_ORACLE = """
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             event_type = 'signup' AS s0,
             LEAD(event_type = 'view', 1) OVER w AS n1,
             LEAD(event_type, 2) OVER w AS nxt
      FROM events
      WHERE ts IS NOT NULL  -- engine drops NULL ts pre-window
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    hits AS (
      SELECT user_id, nxt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS rn
      FROM flagged WHERE s0 AND COALESCE(n1, FALSE)
    )
    SELECT user_id, nxt AS next_value FROM hits WHERE rn = 1
    """


def ext_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.events import sequence_next_node

    events = load_table(spark, sf_dir, "events")
    return sequence_next_node(
        events,
        ["event_type = 'signup'", "event_type = 'view'"],
        tiebreak_col="event_id",
    )


# ---------------------------------------------------------------------------
# ROTATION candidate, proven ahead (r12): the two-table fuzzy join
# (operators/fuzzy.py:fuzzy_join) in driver-canon shape — link a dirty
# right-side feed (every 3rd customer, half with a planted
# substitution typo) against the canonical 12-hex-char name table.
# Same oracle construction as ext_fuzzy_pairs: the q-gram candidate
# prefilter is a theorem at q=5/k=1 over 12-char names, mirrored gram
# for gram across BOTH sides, and tests/test_fuzzy.py pins
# prefilter == brute force n×m at the gate SFs. Plan: one gram-keyed
# hash join between the two exploded gram sets + JVM levenshtein —
# both sides fact-sized, nothing broadcast, nothing collected.
# ---------------------------------------------------------------------------
_FUZZY_JOIN_ORACLE = """
    WITH lnames AS (
      SELECT c_custkey AS id,
             substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS name
      FROM customer
    ),
    rnames AS (
      SELECT c_custkey + 1000000 AS id,
             CASE WHEN c_custkey % 2 = 0
                  THEN 'z' || substr(md5(CAST(c_custkey AS VARCHAR)), 2, 11)
                  ELSE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12)
             END AS name
      FROM customer WHERE c_custkey % 3 = 0
    ),
    lg AS (
      SELECT id, name,
             unnest(list_distinct(list_transform(
               generate_series(1, len(name) - 4),
               i -> substr(name, i, 5)))) AS g
      FROM lnames
    ),
    rg AS (
      SELECT id, name,
             unnest(list_distinct(list_transform(
               generate_series(1, len(name) - 4),
               i -> substr(name, i, 5)))) AS g
      FROM rnames
    ),
    cand AS (
      SELECT DISTINCT l.id AS id_l, r.id AS id_r,
                      l.name AS name_l, r.name AS name_r
      FROM lg l JOIN rg r ON l.g = r.g
    )
    SELECT id_l, id_r, name_l, name_r,
           levenshtein(name_l, name_r) AS distance
    FROM cand WHERE levenshtein(name_l, name_r) <= 1
    """


def ext_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.fuzzy import fuzzy_join

    customer = load_table(spark, sf_dir, "customer")
    key_str = F.col("c_custkey").cast("string")
    left = customer.select(
        "c_custkey",
        F.substring(F.md5(F.encode(key_str, "UTF-8")), 1, 12).alias("name"),
    )
    right = customer.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.concat(
                F.lit("z"),
                F.substring(F.md5(F.encode(key_str, "UTF-8")), 2, 11),
            ),
        )
        .otherwise(F.substring(F.md5(F.encode(key_str, "UTF-8")), 1, 12))
        .alias("name"),
    )
    return fuzzy_join(
        left, right, "name", max_distance=1,
        left_id="c_custkey", right_id="c_custkey", q=5,
    )


# SCD2 temporal lookup (sinks/upsert.py): build a type-2 history of each
# customer's order-status timeline (ts made unique by adding o_orderkey
# seconds), then join facts at ts+45 days to the version valid THEN.
# Demoted to tests/test_demoted_oracles.py in the round-10 rotation,
# batch 6 (identical value-hash oracle there): its Spark path COMPOSES
# scd2_history + scd2_lookup, and the round-10 promotion
# ext_snapshot_diff puts the incremental-maintenance story
# (sinks/upsert.py beyond summing/collapsing) in the driver window.
_SCD2_LOOKUP_ORACLE = """
    WITH ch AS (
      SELECT o_custkey AS id,
             o_orderdate + o_orderkey * INTERVAL 1 SECOND AS ts,
             o_orderstatus AS status
      FROM orders
    ),
    dedup AS (
      SELECT * FROM (
        SELECT id, ts, status, LAG(status) OVER w AS prev
        FROM ch WINDOW w AS (PARTITION BY id ORDER BY ts)
      ) WHERE prev IS NULL OR prev IS DISTINCT FROM status
    ),
    hist AS (
      SELECT id, status, ts AS valid_from,
             COALESCE(LEAD(ts) OVER (PARTITION BY id ORDER BY ts),
                      TIMESTAMP '9999-12-31 23:59:59') AS valid_to
      FROM dedup
    ),
    f AS (
      SELECT o_orderkey AS fact_id, o_custkey AS id,
             o_orderdate + o_orderkey * INTERVAL 1 SECOND
               + INTERVAL 45 DAY AS ts,
             o_totalprice AS amount
      FROM orders
    )
    SELECT f.fact_id, f.id, f.amount, hist.status
    FROM f LEFT JOIN hist
      ON f.id = hist.id AND hist.valid_from <= f.ts AND f.ts < hist.valid_to
    """


def ext_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.sinks.upsert import scd2_history, scd2_lookup

    orders = load_table(spark, sf_dir, "orders")
    uniq_ts = F.expr("timestampadd(SECOND, o_orderkey, o_orderdate)")
    changes = orders.select(
        F.col("o_custkey").alias("id"),
        uniq_ts.alias("ts"),
        F.col("o_orderstatus").alias("status"),
    )
    hist = scd2_history(changes, ["id"], "ts", ["status"])
    facts = orders.select(
        F.col("o_orderkey").alias("fact_id"),
        F.col("o_custkey").alias("id"),
        F.expr("timestampadd(DAY, 45, timestampadd(SECOND, o_orderkey, "
               "o_orderdate))").alias("ts"),
        F.col("o_totalprice").alias("amount"),
    )
    out = scd2_lookup(facts, hist, ["id"], "ts")
    return out.select("fact_id", "id", "amount", "status")


# WITH FILL densification (operators/events.py): hourly series per
# event_type with real gaps, LOCF-filled.
@register(
    "ext_fill_time_gaps",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    )
    SELECT grid.event_type, grid.bucket,
           LAST_VALUE(hourly.n IGNORE NULLS) OVER (
             PARTITION BY grid.event_type ORDER BY grid.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
    FROM grid LEFT JOIN hourly
      ON grid.event_type = hourly.event_type
     AND grid.bucket = hourly.bucket
    """,
)
def ext_fill_time_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.events import fill_time_gaps

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        # sparse series: only buckets with >= 3 events survive, so the
        # fill has real gaps to close
        .filter(F.col("n") >= 3)
    )
    return fill_time_gaps(hourly, "bucket", "1 hour", ["event_type"], ["n"],
                          fill="locf")


# ---------------------------------------------------------------------------
# Round-6 registry rotation: the event-sequence tier (operators/events.py)
# promoted into the driver's correctness window, in place of near-twin
# scalar/window/stream rows (a3/j10/ext_deterministic_sample/
# ext_distinct_users_daily/ext_event_gaps/stream_tumbling_hourly —
# demoted to tests/test_demoted_oracles.py with identical oracles).
# ---------------------------------------------------------------------------

# ClickHouse windowFunnel (greedy-from-earliest variant; see
# operators/events.py module doc): one user-keyed join per funnel step,
# each shuffling only the user key.
# Demoted to tests/test_demoted_oracles.py in the round-10 rotation,
# batch 6 (identical value-hash oracle there): the funnel family keeps
# ext_funnel_strict_order as its driver row — the strict mode is a
# RESTRICTION of this relaxed one (pinned in tests/test_events.py) and
# exercises the same per-user event machinery plus the interruption
# semantics this row can't.
_WINDOW_FUNNEL_ORACLE = """
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > t1.t1
        AND e.ts <= t1.t1 + INTERVAL 86400 SECONDS
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN t1 USING (user_id) JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > t2.t2
        AND e.ts <= t1.t1 + INTERVAL 86400 SECONDS
      GROUP BY e.user_id
    )
    SELECT t1.user_id,
           CASE WHEN t3.user_id IS NOT NULL THEN 3
                WHEN t2.user_id IS NOT NULL THEN 2
                ELSE 1 END AS funnel_level
    FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
    """


def ext_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.events import window_funnel

    events = load_table(spark, sf_dir, "events")
    return window_funnel(
        events,
        ["event_type = 'signup'", "event_type = 'view'",
         "event_type = 'purchase'"],
        window_seconds=86400,
    )


# ClickHouse retention(): per-user cohort-conditioned flags in ONE
# aggregation pass (no joins, no windows).
# Demoted to tests/test_demoted_oracles.py in the round-8 rotation,
# batch 4 (identical value-hash oracle there): retention flags ride the
# same conditional-aggregation event machinery as the still-registered
# ext_window_funnel (operators/events.py).
def ext_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.events import retention_flags

    events = load_table(spark, sf_dir, "events")
    return retention_flags(
        events,
        ["event_type = 'signup'", "event_type = 'click'",
         "event_type = 'purchase'"],
    )


# ---------------------------------------------------------------------------
# Round-6 rotation, batch 2: the statistical-aggregate family gets driver
# CORRECTNESS rows. Rotated in for a12_avg_null_semantics (both averaging
# semantics stay driver-verified inside pl_monthly_subject_fact),
# ns_dedup_exact (exact dedup is the core of the still-registered
# ns_url_dedup), and ns_multimodal_features (subsumed by ns_mm_pipeline,
# the same Arrow-UDF path) — all three keep identical value-hash oracles
# in tests/test_demoted_oracles.py.
# ---------------------------------------------------------------------------
@register(
    "ext_cramers_v",
    oracle="""
    WITH src AS (
      SELECT o_orderpriority AS g, o_orderstatus AS a,
             CAST(o_custkey % 4 AS VARCHAR) AS b
      FROM orders WHERE o_orderstatus IS NOT NULL
    ), cells AS (
      SELECT g, a, b, COUNT(*) AS c FROM src GROUP BY g, a, b
    ), marg AS (
      SELECT g, a, b, c,
             SUM(c) OVER (PARTITION BY g, a) AS ra,
             SUM(c) OVER (PARTITION BY g, b) AS cb,
             SUM(c) OVER (PARTITION BY g) AS n
      FROM cells
    )
    SELECT g,
           ROUND(SQRT((SUM((c - ra*cb/n)*(c - ra*cb/n)/(ra*cb/n))
                       + (ANY_VALUE(n) - SUM(ra*cb/n)))
                      / ANY_VALUE(n)
                      / (LEAST(COUNT(DISTINCT a), COUNT(DISTINCT b)) - 1)), 6)
             AS cramers_v
    FROM marg GROUP BY g
    """,
)
def ext_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``cramersV``: categorical association from contingency
    cells + marginal windows (operators/stats.py)."""
    from clickhouse_etl_spark.operators.stats import cramers_v

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderstatus").alias("a"),
        (F.col("o_custkey") % 4).cast("string").alias("b"),
    )
    out = cramers_v(o, ["g"], "a", "b")
    return out.select("g", F.round("cramers_v", 6).alias("cramers_v"))


@register(
    "ext_quantiles_weighted",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS g, l_extendedprice AS v, SUM(l_quantity) AS w
      FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_quantity > 0
      GROUP BY g, v
    ), ranked AS (
      SELECT g, v,
             SUM(w) OVER (PARTITION BY g ORDER BY v) AS cum,
             SUM(w) OVER (PARTITION BY g) AS tot
      FROM cells
    )
    SELECT g,
           MIN(CASE WHEN cum >= 0.25 * tot THEN v END) AS q25,
           MIN(CASE WHEN cum >= 0.5 * tot THEN v END) AS q50,
           MIN(CASE WHEN cum >= 0.95 * tot THEN v END) AS q95
    FROM ranked GROUP BY g
    """,
)
def ext_quantiles_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantilesExactWeighted``: all three quantiles from
    ONE cells+window pass (operators/stats.py)."""
    from clickhouse_etl_spark.operators.stats import quantiles_exact_weighted

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"), "l_extendedprice", "l_quantity"
    )
    out = quantiles_exact_weighted(
        li, ["g"], "l_extendedprice", "l_quantity", [0.25, 0.5, 0.95]
    )
    return out.select(
        "g",
        F.col("quantiles")[0].alias("q25"),
        F.col("quantiles")[1].alias("q50"),
        F.col("quantiles")[2].alias("q95"),
    )


# Demoted in the round-12 rotation, batch 8 (identical value-hash
# oracle in tests/test_demoted_oracles.py, which IMPORTS this
# constant): near-twin of the registered ext_cramers_v — both are
# two-column association statistics out of operators/stattests.py
# whose driver-visible physics (rank/contingency pass + one JVM
# aggregate) overlap; Cramer's V keeps the driver window.
_RANK_CORR_ORACLE = """
    WITH src AS (
      SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ), ranked AS (
      SELECT g,
             RANK() OVER (PARTITION BY g ORDER BY x)
               + (COUNT(*) OVER (PARTITION BY g, x) - 1) / 2.0 AS rx,
             RANK() OVER (PARTITION BY g ORDER BY y)
               + (COUNT(*) OVER (PARTITION BY g, y) - 1) / 2.0 AS ry
      FROM src
    )
    SELECT g, ROUND(CORR(rx, ry), 6) AS rank_corr
    FROM ranked GROUP BY g
    """


def ext_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``rankCorr``: Spearman via midrank windows + JVM corr
    (operators/stattests.py)."""
    from clickhouse_etl_spark.operators.stattests import spearman_rank_corr

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"), "l_quantity", "l_extendedprice"
    )
    out = spearman_rank_corr(li, ["g"], "l_quantity", "l_extendedprice")
    return out.select("g", F.round("rank_corr", 6).alias("rank_corr"))


# ---------------------------------------------------------------------------
# Round-8 rotation, batch 4: the fit/selection tier gets driver rows.
# linear_regression_fit (operators/regression.py) — per-group OLS via
# one moment-aggregation pass + p×p solve — against a Cramer's-rule
# DuckDB oracle over the SAME moments. Features are centered/scaled in
# the query (the standard conditioning move): on raw TPC-H magnitudes
# the normal equations cancel catastrophically (~8 digits), so NO two
# float paths could agree to the rounding grain — and neither would be
# trustworthy. Centered, the moment matrix is well-conditioned
# (cond ≈ 200) and numpy-LU vs Cramer agree to ~1e-12; the moments
# themselves are bit-identical (plain JVM/DuckDB sums of identical
# doubles; verified empirically at sf0.001/0.01/0.1).
# ---------------------------------------------------------------------------
_LINREG_X1 = "CAST(l_quantity AS DOUBLE) - 25.0"
_LINREG_X2 = "(CAST(l_discount AS DOUBLE) - 0.05) * 500.0"
_LINREG_Y = (
    "(CAST(l_extendedprice AS DOUBLE) * (1.0 - CAST(l_discount AS DOUBLE))"
    " - 50000.0) / 1000.0"
)


# Demoted in the round-12 rotation, batch 8 (identical value-hash
# oracle in tests/test_demoted_oracles.py, which IMPORTS this
# constant): near-twin of the registered ext_logreg_fit — both fits
# out of operators/regression.py built on the same per-group
# moment-aggregation physics; the iterative IRLS row (the harder
# engine path) keeps the driver window.
_LINREG_FIT_ORACLE = f"""
    WITH b AS (
      SELECT l_returnflag AS g, {_LINREG_X1} AS x1, {_LINREG_X2} AS x2,
             {_LINREG_Y} AS y
      FROM lineitem
    ),
    m AS (
      SELECT g, COUNT(*)::DOUBLE AS n, SUM(y) AS sy, SUM(y*y) AS syy,
             SUM(x1) AS s1, SUM(x2) AS s2, SUM(x1*y) AS s1y,
             SUM(x2*y) AS s2y, SUM(x1*x1) AS s11, SUM(x1*x2) AS s12,
             SUM(x2*x2) AS s22
      FROM b GROUP BY g
    ),
    s AS (
      -- Cramer on A = [[s11,s12,s1],[s12,s22,s2],[s1,s2,n]], rhs
      -- [s1y,s2y,sy] (the intercept-augmented normal equations)
      SELECT *,
        (s11*(s22*n - s2*s2) - s12*(s12*n - s2*s1)
          + s1*(s12*s2 - s22*s1)) AS det,
        (s1y*(s22*n - s2*s2) - s12*(s2y*n - s2*sy)
          + s1*(s2y*s2 - s22*sy)) AS det1,
        (s11*(s2y*n - s2*sy) - s1y*(s12*n - s2*s1)
          + s1*(s12*sy - s2y*s1)) AS det2,
        (s11*(s22*sy - s2*s2y) - s12*(s12*sy - s1*s2y)
          + s1y*(s12*s2 - s22*s1)) AS det3
      FROM m
    )
    SELECT g, ROUND(det1/det, 6) AS b_qty, ROUND(det2/det, 6) AS b_disc,
           ROUND(det3/det, 6) AS icpt,
           ROUND(1.0 - (syy - 2*(det1/det*s1y + det2/det*s2y + det3/det*sy)
                  + ((det1/det)^2*s11 + (det2/det)^2*s22 + (det3/det)^2*n
                     + 2*(det1/det)*(det2/det)*s12
                     + 2*(det1/det)*(det3/det)*s1
                     + 2*(det2/det)*(det3/det)*s2))
                 / (syy - sy*sy/n), 6) AS r2,
           CAST(n AS BIGINT) AS n
    FROM s
    """


def ext_linreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``stochasticLinearRegression``, batch-correct: per-group
    OLS of the discounted price on centered quantity/discount — one JVM
    moment-aggregation pass (map-side combinable), p×p solves on the
    k-row moment table only (operators/regression.py:40)."""
    from clickhouse_etl_spark.operators.regression import linear_regression_fit

    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag AS g",
        f"{_LINREG_X1} AS x1",
        f"{_LINREG_X2} AS x2",
        f"{_LINREG_Y} AS y",
    )
    out = linear_regression_fit(li, ["g"], ["x1", "x2"], "y")
    return out.select(
        "g",
        F.round(F.col("coefs")[0], 6).alias("b_qty"),
        F.round(F.col("coefs")[1], 6).alias("b_disc"),
        F.round("intercept", 6).alias("icpt"),
        F.round("r2", 6).alias("r2"),
        "n",
    )


# ---------------------------------------------------------------------------
# logistic_regression_fit (operators/regression.py:165) — per-group
# Newton/IRLS where every iteration is one aggregation pass — against a
# DuckDB RECURSIVE-CTE oracle that replicates the exact iteration: same
# mu clipping (1e-12), same 2×2 Newton solve (closed form), same
# max|step| < 1e-8 stop rule, same max_iter. Newton is self-correcting,
# so the two float paths land on the same optimum to ~1e-12 (verified
# at sf0.001/0.01/0.1); the discrete n_iter can only flip if a step
# lands within ~1e-15 of the tol boundary — the same measure-zero
# adjudication as the threshold gates elsewhere in the registry.
# ---------------------------------------------------------------------------
_LOGREG_X = "(CAST(o_totalprice AS DOUBLE) - 250000.0) / 150000.0"
_LOGREG_Y = "CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END"


@register(
    "ext_logreg_fit",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT o_orderpriority AS g, {_LOGREG_X} AS x, {_LOGREG_Y} AS y
      FROM orders
    ),
    it AS (
      SELECT g, 0 AS k, 0.0::DOUBLE AS b0, 0.0::DOUBLE AS b1,
             1.0::DOUBLE AS step
      FROM (SELECT DISTINCT g FROM d)
      UNION ALL
      SELECT g, k + 1, b0 + db0, b1 + db1, greatest(abs(db0), abs(db1))
      FROM (
        SELECT g, k, b0, b1,
          -- closed-form 2x2 Newton solve: H [db1, db0] = grad with
          -- feats = [x, 1] (b1 multiplies x, b0 the intercept)
          ( h00*g1 - h01*g0) / (h11*h00 - h01*h01) AS db1,
          ( h11*g0 - h01*g1) / (h11*h00 - h01*h01) AS db0
        FROM (
          SELECT it.g, it.k, it.b0, it.b1,
            SUM(w) AS h00, SUM(w * x) AS h01, SUM(w * x * x) AS h11,
            SUM(r) AS g0, SUM(r * x) AS g1
          FROM (SELECT * FROM it WHERE k < 25 AND step >= 1e-8) it
          JOIN d USING (g),
            LATERAL (SELECT least(greatest(
              1.0/(1.0+exp(-(it.b0 + it.b1*d.x))), 1e-12), 1.0-1e-12)
              AS mu) m,
            LATERAL (SELECT mu*(1.0-mu) AS w, d.y - mu AS r) v
          GROUP BY it.g, it.k, it.b0, it.b1
        )
      )
    )
    SELECT g, ROUND(b1, 6) AS coef, ROUND(b0, 6) AS icpt,
           k AS n_iter, step < 1e-8 AS converged
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY g ORDER BY k DESC) AS rn
      FROM it
    ) WHERE rn = 1
    """,
)
def ext_logreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``stochasticLogisticRegression``, batch-correct:
    per-priority Newton/IRLS fit of P(order fully shipped) on the
    centered total price; each iteration is one broadcast-join +
    aggregation pass over the data (operators/regression.py:165)."""
    from clickhouse_etl_spark.operators.regression import (
        logistic_regression_fit,
    )

    orders = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority AS g", f"{_LOGREG_X} AS x", f"{_LOGREG_Y} AS y"
    )
    out = logistic_regression_fit(orders, ["g"], ["x"], "y")
    return out.select(
        "g",
        F.round(F.col("coefs")[0], 6).alias("coef"),
        F.round("intercept", 6).alias("icpt"),
        F.col("n_iter").cast("int").alias("n_iter"),
        "converged",
    )


# ---------------------------------------------------------------------------
# Data-quality expectation gate (operators/quality.py) in driver-canon
# shape — proven ahead in r11 (full value-hash oracle below,
# driver-gate-rigor pytest in tests/test_demoted_oracles.py, atomic
# output columns, gen1/3/10 curves in BENCH_SCALE.md) and REGISTERED
# in the round-12 rotation, batch 8.
# The battery mixes passing and failing rules on purpose (the gate's
# value is catching violations, not confirming clean data): the
# accepted-values rule omits status 'P' and the price ceiling sits
# inside the data's range, so both carry nonzero violation counts at
# every SF. One aggregate pass for the row-level rules + one
# distinct-count job for the unique rule — the operator's documented
# plan; oracle mirrors each violation predicate exactly (NULL
# semantics included: accepted_values/in_range/matches pass NULLs —
# compose with not_null to forbid them — predicate counts NULL
# conditions as violations).
# ---------------------------------------------------------------------------
_QUALITY_GATE_ORACLE = """
    SELECT rule, kind, CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed FROM (
      SELECT 'custkey_not_null' AS rule, 'not_null' AS kind,
             COALESCE(SUM(CASE WHEN o_custkey IS NULL
                               THEN 1 ELSE 0 END), 0) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'status_known', 'accepted_values',
             COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
                                AND o_orderstatus NOT IN ('O', 'F')
                               THEN 1 ELSE 0 END), 0)
      FROM orders
      UNION ALL
      SELECT 'price_range', 'in_range',
             COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL
                                AND o_totalprice NOT BETWEEN 0 AND 300000
                               THEN 1 ELSE 0 END), 0)
      FROM orders
      UNION ALL
      SELECT 'priority_format', 'matches',
             COALESCE(SUM(CASE WHEN o_orderpriority IS NOT NULL
                                AND NOT regexp_full_match(
                                      o_orderpriority, '[1-5]-[A-Z ]+')
                               THEN 1 ELSE 0 END), 0)
      FROM orders
      UNION ALL
      SELECT 'recent_dates', 'predicate',
             COALESCE(SUM(CASE WHEN NOT COALESCE(
                    o_orderdate >= TIMESTAMP '1996-01-01 00:00:00', FALSE)
                               THEN 1 ELSE 0 END), 0)
      FROM orders
      UNION ALL
      SELECT 'orderkey_unique', 'unique',
             (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
    )
    ORDER BY rule
    """


@register("ext_quality_gate", oracle=_QUALITY_GATE_ORACLE)
def ext_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative expectation gate over orders: six rules (four
    row-level sharing ONE aggregate pass, one predicate, one unique via
    a distinct-count job) — (rule, kind, n_violations, passed) rows,
    mixed pass/fail by construction."""
    from dataclasses import replace

    from clickhouse_etl_spark.operators.quality import (
        accepted_values,
        check_expectations,
        in_range,
        matches,
        not_null,
        predicate,
        unique,
    )

    orders = load_table(spark, sf_dir, "orders")
    rules = [
        replace(not_null("o_custkey"), name="custkey_not_null"),
        replace(
            accepted_values("o_orderstatus", ["O", "F"]),
            name="status_known",
        ),
        replace(in_range("o_totalprice", 0, 300000), name="price_range"),
        replace(
            matches("o_orderpriority", "[1-5]-[A-Z ]+"),
            name="priority_format",
        ),
        predicate(
            "recent_dates", "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
        ),
        replace(unique("o_orderkey"), name="orderkey_unique"),
    ]
    # Output order pinned on BOTH sides (oracle ORDER BY rule): the
    # driver's value-hash is order-sensitive where the local checker's
    # is not (r12 VERDICT ask #1a).
    return check_expectations(orders, rules).orderBy("rule")


# ---------------------------------------------------------------------------
# Z-order clustered layout (sinks/zorder.py) in driver-canon shape —
# proven ahead in r11 and REGISTERED in the round-12 rotation,
# batch 8. With literal boundary
# cuts the whole chain is deterministic arithmetic: bucket index =
# #cuts strictly below the value (NULL -> 0), Morton code = bit j of
# column c at position j*n_cols + c — so the oracle mirrors it
# exactly (len(list_filter) for the bucket, integer div/mod/multiply
# for the interleave; no approxQuantile in the fixture, the quantile
# path is pytest-pinned separately in tests/test_zorder.py). The
# second cluster column is o_custkey % 1000, giving an SF-invariant
# value distribution so every driver-gate SF exercises the full
# bucket range.
# ---------------------------------------------------------------------------
_ZORDER_CK_CUTS = [float(c) for c in range(64, 960, 64)]  # 14 cuts
_ZORDER_PRICE_CUTS = [float(p) for p in range(20000, 300001, 20000)]  # 15


def _zorder_oracle() -> str:
    def idx(expr: str, cuts: list[float]) -> str:
        lst = ", ".join(repr(c) for c in cuts)
        return (
            f"len(list_filter([{lst}], c -> CAST({expr} AS DOUBLE) > c))"
        )

    i0 = idx("(o_custkey % 1000)", _ZORDER_CK_CUTS)
    i1 = idx("o_totalprice", _ZORDER_PRICE_CUTS)
    terms = []
    for j in range(4):  # bits
        for c, src in enumerate(("i0", "i1")):
            terms.append(f"(({src} // {1 << j}) % 2) * {1 << (j * 2 + c)}")
    return f"""
    SELECT o_orderkey, CAST({' + '.join(terms)} AS BIGINT) AS zval
    FROM (SELECT o_orderkey, {i0} AS i0, {i1} AS i1 FROM orders)
    """


@register("ext_zorder_layout", oracle=_zorder_oracle())
def ext_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values for a 2-D (custkey-band, price) clustering of
    orders — the value column write_zordered range-partitions and
    sorts by; emitting it per row makes the layout itself
    value-hash-checkable."""
    from clickhouse_etl_spark.sinks.zorder import zorder_value

    orders = load_table(spark, sf_dir, "orders")
    proj = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 1000).cast("double").alias("ck_mod"),
        "o_totalprice",
    )
    out = zorder_value(
        proj,
        ["ck_mod", "o_totalprice"],
        bits=4,
        boundaries={
            "ck_mod": _ZORDER_CK_CUTS,
            "o_totalprice": _ZORDER_PRICE_CUTS,
        },
        out_col="zval",
    )
    return out.select("o_orderkey", "zval")
