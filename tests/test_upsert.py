"""Incremental merge (ReplacingMergeTree analog) + SCD2 history tests.

Each batch op is cross-checked against a DuckDB oracle over the same
rows — the in-repo twin of the driver's correctness gate for sink-tier
ops the registry doesn't carry (the 50-query window is full).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from clickhouse_etl_spark.sinks.upsert import (
    OPEN_END,
    merge_upsert,
    merge_upsert_with_deletes,
    scd2_apply,
    scd2_history,
    snapshot_at,
)
from tests.conftest import rows_set


@pytest.fixture()
def dim_frames(spark):
    current = spark.createDataFrame(
        [
            (1, "alice", "A", 100),
            (2, "bob", "B", 100),
            (3, "carol", "C", 100),
        ],
        "id int, name string, grade string, ver int",
    )
    delta = spark.createDataFrame(
        [
            (2, "bobby", "B+", 200),   # update
            (2, "bobbie", "B-", 150),  # older delta write — loses to ver=200
            (4, "dave", "D", 200),     # insert
            (3, "carol", "C", 50),     # stale (older than current) — ignored
        ],
        "id int, name string, grade string, ver int",
    )
    return current, delta


def test_merge_upsert_matches_duckdb(spark, dim_frames):
    current, delta = dim_frames
    out = merge_upsert(current, delta, ["id"], "ver")

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE cur(id int, name varchar, grade varchar, ver int);"
        "INSERT INTO cur VALUES (1,'alice','A',100),(2,'bob','B',100),(3,'carol','C',100);"
        "CREATE TABLE del(id int, name varchar, grade varchar, ver int);"
        "INSERT INTO del VALUES (2,'bobby','B+',200),(2,'bobbie','B-',150),"
        "(4,'dave','D',200),(3,'carol','C',50);"
    )
    oracle = con.execute(
        """
        SELECT id, name, grade, ver FROM (
          SELECT *, row_number() OVER (
            PARTITION BY id ORDER BY ver DESC, src DESC) AS rn
          FROM (SELECT *, 0 AS src FROM cur UNION ALL SELECT *, 1 AS src FROM del)
        ) WHERE rn = 1
        """
    ).fetchall()
    assert rows_set(out) == set(oracle)
    # delta beats current at equal version: carol's ver-100 current row
    # survives only because the delta row is OLDER (ver=50).
    assert ("carol", "C", 100) in {(r[1], r[2], r[3]) for r in oracle}


def test_merge_upsert_tie_prefers_delta(spark):
    current = spark.createDataFrame([(1, "old", 100)], "id int, v string, ver int")
    delta = spark.createDataFrame([(1, "new", 100)], "id int, v string, ver int")
    out = merge_upsert(current, delta, ["id"], "ver")
    assert rows_set(out) == {(1, "new", 100)}


def test_merge_upsert_with_deletes(spark, dim_frames):
    current, _ = dim_frames
    delta = spark.createDataFrame(
        [
            (2, "bobby", "B+", 200, False),
            (3, None, None, 200, True),     # tombstone wins → key 3 gone
            (4, "dave", "D", 200, False),
            (1, None, None, 50, True),      # stale tombstone → key 1 stays
        ],
        "id int, name string, grade string, ver int, is_deleted boolean",
    )
    out = merge_upsert_with_deletes(current, delta, ["id"], "ver")
    assert rows_set(out.select("id", "name")) == {
        (1, "alice"),
        (2, "bobby"),
        (4, "dave"),
    }


def test_merge_upsert_plan_has_no_broadcast(spark, dim_frames):
    """Both sides of a merge grow with the table — the plan must be a
    single shuffle on the key, never a broadcast of either side."""
    current, delta = dim_frames
    plan = merge_upsert(current, delta, ["id"], "ver")._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" not in plan
    assert plan.count("Exchange") == 1


CHANGES_ROWS = [
    # id, ts, name, tier
    (1, "2024-01-01 00:00:00", "alice", "gold"),
    (1, "2024-02-01 00:00:00", "alice", "gold"),      # no-op → collapses
    (1, "2024-03-01 00:00:00", "alice", "platinum"),
    (2, "2024-01-15 00:00:00", "bob", "silver"),
    (2, "2024-04-01 00:00:00", "bobby", "silver"),
]


def _changes_df(spark, rows=CHANGES_ROWS):
    return spark.createDataFrame(
        [(i, ts, n, t) for i, ts, n, t in rows],
        "id int, ts string, name string, tier string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_scd2_history_intervals(spark):
    hist = scd2_history(_changes_df(spark), ["id"], "ts", ["name", "tier"])
    got = {
        (r.id, str(r.valid_from), str(r.valid_to), r.is_current, r.name, r.tier)
        for r in hist.collect()
    }
    assert got == {
        (1, "2024-01-01 00:00:00", "2024-03-01 00:00:00", False, "alice", "gold"),
        (1, "2024-03-01 00:00:00", OPEN_END, True, "alice", "platinum"),
        (2, "2024-01-15 00:00:00", "2024-04-01 00:00:00", False, "bob", "silver"),
        (2, "2024-04-01 00:00:00", OPEN_END, True, "bobby", "silver"),
    }


def test_scd2_history_matches_duckdb(spark):
    hist = scd2_history(_changes_df(spark), ["id"], "ts", ["name", "tier"])
    con = duckdb.connect()
    con.execute("CREATE TABLE ch(id int, ts timestamp, name varchar, tier varchar)")
    con.executemany(
        "INSERT INTO ch VALUES (?, ?, ?, ?)",
        [list(r) for r in CHANGES_ROWS],
    )
    oracle = con.execute(
        f"""
        WITH dedup AS (
          SELECT * FROM (
            SELECT *, lag((name, tier)) OVER w AS prev
            FROM ch WINDOW w AS (PARTITION BY id ORDER BY ts)
          ) WHERE prev IS NULL OR prev IS DISTINCT FROM (name, tier)
        )
        SELECT id, name, tier, ts AS valid_from,
               coalesce(lead(ts) OVER (PARTITION BY id ORDER BY ts),
                        TIMESTAMP '{OPEN_END}') AS valid_to
        FROM dedup
        """
    ).fetchall()
    got = rows_set(hist.select("id", "name", "tier", "valid_from", "valid_to"))
    assert got == set(oracle)


def test_scd2_apply_equals_full_rebuild(spark):
    """Incremental apply over a change batch == rebuilding the history
    from the concatenated change log (the defining invariant)."""
    first = _changes_df(spark, CHANGES_ROWS[:3])
    late_rows = [
        (2, "2024-01-15 00:00:00", "bob", "silver"),
        (2, "2024-04-01 00:00:00", "bobby", "silver"),
        (1, "2024-05-01 00:00:00", "alice", "diamond"),
        (3, "2024-06-01 00:00:00", "carol", "gold"),
    ]
    batch = _changes_df(spark, late_rows)
    hist0 = scd2_history(first, ["id"], "ts", ["name", "tier"])
    applied = scd2_apply(hist0, batch, ["id"], "ts", ["name", "tier"])
    full = scd2_history(
        _changes_df(spark, CHANGES_ROWS[:3] + late_rows),
        ["id"], "ts", ["name", "tier"],
    )
    cols = ["id", "name", "tier", "valid_from", "valid_to", "is_current"]
    assert rows_set(applied.select(*cols)) == rows_set(full.select(*cols))


def test_scd2_apply_prunes_untouched_keys(spark):
    """The apply plan must semi/anti-join history on the affected keys —
    untouched keys pass through without re-sorting (delta-sized shuffle)."""
    hist = scd2_history(_changes_df(spark), ["id"], "ts", ["name", "tier"])
    batch = _changes_df(spark, [(1, "2024-05-01 00:00:00", "alice", "diamond")])
    plan = scd2_apply(hist, batch, ["id"], "ts", ["name", "tier"])
    txt = plan._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in txt and "LeftAnti" in txt
    # key 2's history unchanged
    k2 = {
        (str(r.valid_from), str(r.valid_to))
        for r in plan.filter(F.col("id") == 2).collect()
    }
    assert k2 == {
        ("2024-01-15 00:00:00", "2024-04-01 00:00:00"),
        ("2024-04-01 00:00:00", OPEN_END),
    }


def test_snapshot_at(spark):
    hist = scd2_history(_changes_df(spark), ["id"], "ts", ["name", "tier"])
    snap = snapshot_at(hist, "2024-02-10 00:00:00")
    assert rows_set(snap.select("id", "name", "tier")) == {
        (1, "alice", "gold"),
        (2, "bob", "silver"),
    }


def test_scd2_apply_drops_extra_history_columns(spark):
    """A history carrying extra change-log columns (CDC op, metadata)
    applies cleanly: output is the canonical SCD2 schema."""
    from clickhouse_etl_spark.sinks.upsert import scd2_apply, scd2_history

    log = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a", "ins"),
         (1, "2024-02-01 00:00:00", "b", "upd"),
         (2, "2024-01-15 00:00:00", "x", "ins")],
        ["k", "ts", "attr", "op"],
    ).selectExpr("k", "CAST(ts AS timestamp) ts", "attr", "op")
    hist = scd2_history(log, ["k"], "ts", ["attr"])
    assert "op" in hist.columns
    changes = spark.createDataFrame(
        [(1, "2024-03-01 00:00:00", "c")], ["k", "ts", "attr"]
    ).selectExpr("k", "CAST(ts AS timestamp) ts", "attr")
    out = scd2_apply(hist, changes, ["k"], "ts", ["attr"])
    assert "op" not in out.columns
    k1 = sorted(
        (r.attr, r.is_current) for r in out.filter("k = 1").collect()
    )
    assert k1 == [("a", False), ("b", False), ("c", True)]
    assert out.filter("k = 2").count() == 1


def test_summing_merge_incremental_equals_full(spark):
    """SummingMergeTree invariant: merging day-2 raw rows into the day-1
    snapshot equals aggregating both days at once — sums, mins, maxes,
    new keys on either side, and all-NULL measure keys included."""
    from clickhouse_etl_spark.sinks.upsert import summing_merge

    schema = "k string, amount int, lo int, hi int"
    d1 = spark.createDataFrame(
        [("a", 1, 5, 5), ("a", 2, 3, 9), ("b", None, None, None),
         ("c", 10, 1, 1)],
        schema,
    )
    d2 = spark.createDataFrame(
        [("a", 4, 2, 20), ("b", None, None, None), ("d", 7, 7, 7),
         ("c", None, 0, None)],
        schema,
    )
    args = dict(keys=["k"], sum_cols=["amount"], min_cols=["lo"], max_cols=["hi"])
    incr = summing_merge(summing_merge(None, d1, **args), d2, **args)
    full = summing_merge(None, d1.unionByName(d2), **args)
    assert rows_set(incr) == rows_set(full)
    got = {r.k: (r.amount, r.lo, r.hi) for r in incr.collect()}
    assert got == {
        "a": (7, 2, 20),
        "b": (None, None, None),   # all-NULL stays NULL, never 0
        "c": (10, 0, 1),
        "d": (7, 7, 7),
    }


def test_summing_merge_oracle(spark):
    """State merge vs DuckDB: snapshot(lineitem half 1) + delta(half 2)
    must equal a plain GROUP BY over the whole table."""
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.sinks.upsert import summing_merge

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    h1 = li.filter(F.col("l_orderkey") % 2 == 0)
    h2 = li.filter(F.col("l_orderkey") % 2 == 1)
    snap = summing_merge(None, h1, keys=["l_returnflag"],
                         sum_cols=["l_quantity"], max_cols=["l_extendedprice"])
    merged = summing_merge(snap, h2, keys=["l_returnflag"],
                           sum_cols=["l_quantity"], max_cols=["l_extendedprice"])
    out = merged.select(
        "l_returnflag",
        F.round("l_quantity", 3).alias("total_qty"),
        F.round("l_extendedprice", 3).alias("max_price"),
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            "'/root/testdata/sf0.001/lineitem.parquet'"
        )
        drows = con.execute(
            """
            SELECT l_returnflag, ROUND(SUM(l_quantity), 3) AS total_qty,
                   ROUND(MAX(l_extendedprice), 3) AS max_price
            FROM lineitem GROUP BY l_returnflag
            """
        ).fetchall()
    finally:
        con.close()
    assert rows_set(out) == {tuple(r) for r in drows}


def test_summing_merge_plan_no_broadcast(spark):
    """Both merge sides grow with the data: the full-outer state join
    must not be broadcast-forced, and nothing python-evaluates."""
    from clickhouse_etl_spark.sinks.upsert import summing_merge

    big1 = spark.range(10_000).selectExpr("id % 100 AS k", "id AS v")
    big2 = spark.range(10_000).selectExpr("id % 100 AS k", "id AS v")
    merged = summing_merge(
        summing_merge(None, big1, keys=["k"], sum_cols=["v"]),
        big2, keys=["k"], sum_cols=["v"],
    )
    opt = merged._jdf.queryExecution().optimizedPlan().toString()
    for line in opt.splitlines():
        if "FullOuter" in line:
            assert "broadcast" not in line.lower()
    phys = merged._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys


def test_summing_merge_validates(spark):
    from clickhouse_etl_spark.sinks.upsert import summing_merge

    d = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(ValueError):
        summing_merge(None, d, keys=["k"], sum_cols=[])
    snap = summing_merge(None, d, keys=["k"], sum_cols=["v"])
    with pytest.raises(ValueError):
        summing_merge(snap.drop("v"), d, keys=["k"], sum_cols=["v"])


def test_collapsing_merge_semantics(spark):
    """Sign collapse: cancels annihilate inserts, net<=0 keys vanish,
    the latest +1 state (by order_col) survives, and a bad sign raises
    inside the pass."""
    from clickhouse_etl_spark.sinks.upsert import collapsing_merge

    rows = spark.createDataFrame(
        [
            # key a: insert v1, cancel v1, insert v2 -> survives as v2
            ("a", 1, 1, "v1"),
            ("a", -1, 1, "v1"),
            ("a", 1, 2, "v2"),
            # key b: insert then cancel -> deleted
            ("b", 1, 1, "x"),
            ("b", -1, 1, "x"),
            # key c: plain insert
            ("c", 1, 1, "y"),
            # key d: stray cancel only -> net<=0, deleted
            ("d", -1, 1, "z"),
        ],
        "k string, sign int, ver int, state string",
    )
    out = collapsing_merge(rows, ["k"], order_col="ver")
    got = {r.k: (r.ver, r.state) for r in out.collect()}
    assert got == {"a": (2, "v2"), "c": (1, "y")}

    import pyspark.errors

    bad = spark.createDataFrame([("a", 2, 1, "v")], "k string, sign int, ver int, state string")
    with pytest.raises(Exception) as ei:
        collapsing_merge(bad, ["k"], order_col="ver").collect()
    assert "must be +1 or -1" in str(ei.value)


def test_collapsing_merge_oracle(spark):
    """Collapse vs DuckDB: net>0 keys keep the arg_max(+1) state."""
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.sinks.upsert import collapsing_merge

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    rows = li.selectExpr(
        "l_orderkey AS k",
        "CASE WHEN l_linenumber % 4 = 0 THEN -1 ELSE 1 END AS sign",
        "l_linenumber AS ver",
        "l_quantity AS q",
    )
    out = collapsing_merge(rows, ["k"], order_col="ver")
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            "'/root/testdata/sf0.001/lineitem.parquet'"
        )
        drows = con.execute(
            """
            WITH r AS (
              SELECT l_orderkey AS k,
                     CASE WHEN l_linenumber % 4 = 0 THEN -1 ELSE 1 END AS sign,
                     l_linenumber AS ver, l_quantity AS q
              FROM lineitem
            )
            , net AS (SELECT k FROM r GROUP BY k HAVING SUM(sign) > 0),
            last AS (
              SELECT k, ver, q,
                     ROW_NUMBER() OVER (PARTITION BY k
                                        ORDER BY ver DESC, q DESC) AS rn
              FROM r WHERE sign = 1
            )
            SELECT last.k, last.ver, last.q
            FROM last JOIN net ON last.k = net.k WHERE rn = 1
            """
        ).fetchall()
    finally:
        con.close()
    assert rows_set(out) == {tuple(r) for r in drows}


def test_summing_merge_hll_states(spark):
    """uniqState/uniqMerge analog: HLL sketch states merge across
    incremental batches to the same estimate as one full aggregation,
    and the estimate matches the exact distinct count on this scale."""
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.sinks.upsert import summing_merge

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    rows = li.selectExpr("l_returnflag AS k", "l_quantity AS v",
                         "l_partkey AS who")
    h1 = rows.filter(F.col("who") % 2 == 0)
    h2 = rows.filter(F.col("who") % 2 == 1)
    args = dict(keys=["k"], sum_cols=["v"], hll_cols={"uniq_who": "who"})
    incr = summing_merge(summing_merge(None, h1, **args), h2, **args)
    full = summing_merge(None, rows, **args)

    def estimates(df):
        return {
            r.k: (round(r.v, 3), r.est)
            for r in df.select(
                "k", "v",
                F.hll_sketch_estimate("uniq_who").alias("est"),
            ).collect()
        }

    ei, ef = estimates(incr), estimates(full)
    assert ei == ef  # register-max union is exactly associative
    exact = {
        r.k: r.n
        for r in rows.groupBy("k").agg(
            F.countDistinct("who").alias("n")
        ).collect()
    }
    for k, (_, est) in ei.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_snapshot_diff_classifies(spark):
    """insert/update/delete classification, null-safe payload compare,
    unchanged keys absent."""
    from clickhouse_etl_spark.sinks.upsert import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "id int, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),          # unchanged -> absent
         (2, "b", None),         # unchanged incl. NULL payload -> absent
         (3, "c2", 3.0),         # update
         (5, "e", 5.0)],         # insert; 4 deleted
        "id int, name string, v double",
    )
    got = {r.id: (r.change, r.name) for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {3: ("update", "c2"), 4: ("delete", "d"), 5: ("insert", "e")}


def test_snapshot_cdc_round_trip(spark):
    """Defining invariant: old + snapshot_cdc(old, new) == new, via
    merge_upsert_with_deletes (retrofitting incremental maintenance
    onto full-snapshot sources)."""
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.sinks.upsert import (
        merge_upsert_with_deletes,
        snapshot_cdc,
    )

    cust = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    old = cust.filter(F.col("c_custkey") % 7 != 0)        # some keys absent
    new = cust.filter(F.col("c_custkey") % 5 != 0).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 1)
        .otherwise(F.col("c_acctbal")),                   # some updated
    )
    cdc = snapshot_cdc(old, new, ["c_custkey"])
    ver = F.lit(1)
    merged = merge_upsert_with_deletes(
        old.withColumn("ver", ver),
        cdc.withColumn("ver", ver + 1),
        ["c_custkey"], "ver",
    ).drop("ver")
    assert rows_set(merged) == rows_set(new)
    # and the CDC batch is delta-sized, not table-sized
    assert cdc.count() < new.count()


def test_scd2_lookup_temporal_join(spark):
    """Each fact joins the version valid at ITS OWN timestamp; facts
    before the first version keep NULLs (left) or drop (inner); at-most-
    one-match is structural (intervals partition the timeline)."""
    from clickhouse_etl_spark.sinks.upsert import scd2_history, scd2_lookup

    hist = scd2_history(_changes_df(spark), ["id"], "ts", ["name", "tier"])
    facts = spark.createDataFrame(
        [
            (1, "2024-02-15 00:00:00", 10.0),   # inside alice/gold
            (1, "2024-03-01 00:00:00", 20.0),   # ON the boundary -> platinum
            (1, "2023-12-01 00:00:00", 30.0),   # before first version
            (2, "2024-05-01 00:00:00", 40.0),   # open interval -> bobby
            (9, "2024-05-01 00:00:00", 50.0),   # unknown key
        ],
        "id int, ts string, amount double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    left = scd2_lookup(facts, hist, ["id"], "ts")
    assert left.count() == facts.count()  # at most one match per fact
    got = {(r.id, str(r.ts)): r.tier for r in left.collect()}
    assert got[(1, "2024-02-15 00:00:00")] == "gold"
    assert got[(1, "2024-03-01 00:00:00")] == "platinum"  # closed lower bound
    assert got[(1, "2023-12-01 00:00:00")] is None
    assert got[(2, "2024-05-01 00:00:00")] == "silver"
    assert got[(9, "2024-05-01 00:00:00")] is None

    inner = scd2_lookup(facts, hist, ["id"], "ts", how="inner")
    assert inner.count() == 3

    # DuckDB oracle on the same rows
    con = duckdb.connect()
    con.execute("CREATE TABLE ch(id int, ts timestamp, name varchar, tier varchar)")
    con.executemany("INSERT INTO ch VALUES (?, ?, ?, ?)",
                    [list(r) for r in CHANGES_ROWS])
    con.execute("CREATE TABLE f(id int, ts timestamp, amount double)")
    con.executemany(
        "INSERT INTO f VALUES (?, ?, ?)",
        [[1, "2024-02-15 00:00:00", 10.0], [1, "2024-03-01 00:00:00", 20.0],
         [1, "2023-12-01 00:00:00", 30.0], [2, "2024-05-01 00:00:00", 40.0],
         [9, "2024-05-01 00:00:00", 50.0]],
    )
    oracle = con.execute(
        f"""
        WITH dedup AS (
          SELECT * FROM (
            SELECT *, lag((name, tier)) OVER w AS prev
            FROM ch WINDOW w AS (PARTITION BY id ORDER BY ts)
          ) WHERE prev IS NULL OR prev IS DISTINCT FROM (name, tier)
        ),
        hist AS (
          SELECT id, name, tier, ts AS valid_from,
                 coalesce(lead(ts) OVER (PARTITION BY id ORDER BY ts),
                          TIMESTAMP '{OPEN_END}') AS valid_to
          FROM dedup
        )
        SELECT f.id, f.ts, f.amount, hist.tier
        FROM f LEFT JOIN hist
          ON f.id = hist.id AND hist.valid_from <= f.ts AND f.ts < hist.valid_to
        """
    ).fetchall()
    assert rows_set(left.select("id", "ts", "amount", "tier")) == set(oracle)


def test_scd2_lookup_renames_colliding_history_columns(spark):
    """A dimension attribute sharing a fact column's name survives as
    dim_<name> instead of being silently dropped."""
    from clickhouse_etl_spark.sinks.upsert import scd2_history, scd2_lookup

    ch = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 99.0)], "id int, ts string, amount double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hist = scd2_history(ch, ["id"], "ts", ["amount"])
    facts = spark.createDataFrame(
        [(1, "2024-06-01 00:00:00", 5.0)], "id int, fts string, amount double"
    ).withColumn("fts", F.col("fts").cast("timestamp"))
    out = scd2_lookup(facts, hist, ["id"], "fts")
    row = out.collect()[0]
    assert row.amount == 5.0 and row.dim_amount == 99.0


def test_summing_merge_null_keys_merge(spark):
    """NULL-keyed state rows must MERGE across batches (null-safe key
    equality), preserving incremental == full — a plain `on=keys` join
    would leave duplicate (NULL, x) rows in the snapshot."""
    from clickhouse_etl_spark.sinks.upsert import summing_merge

    schema = "k string, v int"
    d1 = spark.createDataFrame([(None, 1), ("a", 10)], schema)
    d2 = spark.createDataFrame([(None, 2), ("a", 5)], schema)
    args = dict(keys=["k"], sum_cols=["v"])
    incr = summing_merge(summing_merge(None, d1, **args), d2, **args)
    full = summing_merge(None, d1.unionByName(d2), **args)
    assert rows_set(incr) == rows_set(full) == {(None, 3), ("a", 15)}


def test_snapshot_diff_null_keys(spark):
    """A NULL key present in both snapshots is the SAME key: unchanged
    payload → no diff row; changed payload → one 'update', never an
    insert+delete pair."""
    from clickhouse_etl_spark.sinks.upsert import snapshot_diff

    schema = "k string, v int"
    old = spark.createDataFrame([(None, 1), ("a", 1)], schema)
    same = spark.createDataFrame([(None, 1), ("a", 1)], schema)
    assert snapshot_diff(old, same, ["k"]).count() == 0
    new = spark.createDataFrame([(None, 2), ("a", 1)], schema)
    assert rows_set(snapshot_diff(old, new, ["k"]).select("k", "change", "v")) == {
        (None, "update", 2)
    }


def test_summing_merge_hist_states(spark):
    """Fixed-bin histogram states: incremental == full bit-for-bit
    (element-wise bin sums are exactly associative), and quantile reads
    land within one bin width of DuckDB's exact quantile_cont."""
    import duckdb

    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.sinks.upsert import (
        histogram_quantile,
        summing_merge,
    )

    SF_SMOKE = "/root/testdata/sf0.001"
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    # deterministic row-exact split (subtract would dedup duplicates)
    d1 = li.filter(F.col("l_orderkey") % 2 == 0)
    d2 = li.filter(F.col("l_orderkey") % 2 != 0)
    LO, HI, NB = 0.0, 110_000.0, 44
    args = dict(
        keys=["l_returnflag"],
        sum_cols=[],
        hist_cols={"price_hist": ("l_extendedprice", LO, HI, NB)},
    )
    # sum-free path must be accepted
    inc = summing_merge(summing_merge(None, d1, **args), d2, **args)
    full = summing_merge(None, li, **args)
    got_inc = {r.l_returnflag: list(r.price_hist) for r in inc.collect()}
    got_full = {r.l_returnflag: list(r.price_hist) for r in full.collect()}
    assert got_inc == got_full
    # counts conserve
    n = li.count()
    assert sum(sum(v) for v in got_full.values()) == n

    est = {
        r.l_returnflag: (r.p50, r.p95)
        for r in full.select(
            "l_returnflag",
            histogram_quantile("price_hist", 0.5, LO, HI, NB).alias("p50"),
            histogram_quantile("price_hist", 0.95, LO, HI, NB).alias("p95"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_SMOKE}/lineitem.parquet'"
    )
    want = {
        f: (p50, p95)
        for f, p50, p95 in con.execute(
            "SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5),"
            " quantile_cont(l_extendedprice, 0.95)"
            " FROM lineitem GROUP BY l_returnflag"
        ).fetchall()
    }
    con.close()
    binw = (HI - LO) / NB
    for f, (p50, p95) in want.items():
        assert abs(est[f][0] - p50) <= binw, (f, est[f][0], p50)
        assert abs(est[f][1] - p95) <= binw, (f, est[f][1], p95)


def test_histogram_state_validates(spark):
    import pytest

    from clickhouse_etl_spark.sinks.upsert import (
        histogram_quantile,
        histogram_state_agg,
    )

    with pytest.raises(ValueError, match="nbins"):
        histogram_state_agg("x", 0.0, 1.0, 0)
    with pytest.raises(ValueError, match="lo < hi"):
        histogram_state_agg("x", 2.0, 1.0, 4)
    with pytest.raises(ValueError, match="q must"):
        histogram_quantile("h", 1.5, 0.0, 1.0, 4)


def test_histogram_quantile_edges(spark):
    """Under/overflow clamp to the declared bounds; empty/NULL states
    read NULL; a one-bin state interpolates inside the bin."""
    from clickhouse_etl_spark.sinks.upsert import (
        histogram_quantile,
        histogram_state_agg,
        summing_merge,
    )

    df = spark.createDataFrame(
        [("a", -5.0), ("a", -1.0), ("b", 99.0), ("c", 5.0), ("c", 5.5),
         ("d", None)],
        "k string, v double",
    )
    st = summing_merge(
        None, df, keys=["k"], sum_cols=[],
        hist_cols={"h": ("v", 0.0, 10.0, 10)},
    )
    got = {
        r.k: r.q
        for r in st.select(
            "k", histogram_quantile("h", 0.5, 0.0, 10.0, 10).alias("q")
        ).collect()
    }
    assert got["a"] == 0.0      # all underflow -> lo
    assert got["b"] == 10.0     # all overflow -> hi
    assert 5.0 <= got["c"] <= 6.0  # inside the [5,6) bin
    assert got["d"] is None     # no observed values


def test_summing_merge_moment_states(spark):
    """avgState/varState analog: incremental == full for the (n, s, s2)
    struct state, and the avg/var/stddev readers match DuckDB on the
    merged snapshot."""
    import duckdb

    from clickhouse_etl_spark.sinks.upsert import (
        moment_avg,
        moment_stddev,
        moment_var,
        summing_merge,
    )

    schema = "k string, v double"
    d1 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None), ("c", 10.0)], schema)
    d2 = spark.createDataFrame(
        [("a", 6.0), ("b", None), ("d", 7.0), ("c", 2.0)], schema)
    args = dict(keys=["k"], sum_cols=[], moment_cols={"v_state": "v"})
    incr = summing_merge(summing_merge(None, d1, **args), d2, **args)
    full = summing_merge(None, d1.unionByName(d2), **args)
    read = lambda df: {
        r.k: (r.n, r.avg, r.var_s, r.sd)
        for r in df.select(
            "k",
            F.col("v_state")["n"].alias("n"),
            F.round(moment_avg("v_state"), 9).alias("avg"),
            F.round(moment_var("v_state"), 9).alias("var_s"),
            F.round(moment_stddev("v_state"), 9).alias("sd"),
        ).collect()
    }
    gi, gf = read(incr), read(full)
    assert gi == gf

    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in duckdb.sql("""
            SELECT k, COUNT(v), ROUND(AVG(v), 9), ROUND(VAR_SAMP(v), 9),
                   ROUND(STDDEV_SAMP(v), 9)
            FROM (VALUES ('a', 1.0), ('a', 2.0), ('b', NULL), ('c', 10.0),
                         ('a', 6.0), ('b', NULL), ('d', 7.0), ('c', 2.0))
                 t(k, v)
            GROUP BY k
        """).fetchall()
    }
    assert gi == want

    # population variance reader + constant-data clamp (no negative var)
    const = spark.createDataFrame([("x", 0.1), ("x", 0.1), ("x", 0.1)], schema)
    snap = summing_merge(None, const, **args)
    row = snap.select(
        moment_var("v_state", sample=False).alias("vp"),
        moment_var("v_state").alias("vs"),
    ).collect()[0]
    assert row.vp == 0.0 and row.vs == 0.0


def test_moment_state_large_magnitude_values(spark):
    """Catastrophic-cancellation regression: epoch-second-magnitude
    values (mean ~1.7e9, spread ~30). The naive (n, sum, sum_sq) state
    computed variance -38923 here and a zero-clamp read it as 0.0; the
    centered (n, mean, m2) state with Chan's merge must stay accurate
    across an incremental merge chain."""
    import statistics

    from clickhouse_etl_spark.sinks.upsert import (
        moment_avg,
        moment_var,
        summing_merge,
    )

    base = 1_700_000_000.0
    vals1 = [base + (i % 60) for i in range(500)]
    vals2 = [base + ((i * 7) % 60) for i in range(500)]
    d1 = spark.createDataFrame([("k", v) for v in vals1], "k string, v double")
    d2 = spark.createDataFrame([("k", v) for v in vals2], "k string, v double")
    args = dict(keys=["k"], sum_cols=[], moment_cols={"v_state": "v"})
    snap = summing_merge(summing_merge(None, d1, **args), d2, **args)
    got = snap.select(
        moment_avg("v_state").alias("avg"),
        moment_var("v_state").alias("var"),
    ).collect()[0]
    want_var = statistics.variance(vals1 + vals2)
    assert got.avg == pytest.approx(statistics.mean(vals1 + vals2), rel=1e-12)
    assert want_var > 100  # the spread is real
    assert got.var == pytest.approx(want_var, rel=1e-6)


def test_merge_upsert_strategies_agree_on_hot_key(spark):
    """r11 skew fixture (BENCH_SCALE.md round 11): 20% of rows on ONE
    key. All three dedup_strategy forms must return identical rows
    (the choice is purely physical), the agg form must stay a single
    non-broadcast exchange, and an unknown strategy must raise."""
    import pytest
    from pyspark.sql import functions as F

    base = spark.range(0, 2000).select(
        F.when(F.col("id") % 5 == 0, F.lit(-1))
        .otherwise(F.col("id") % 97).alias("id_k"),
        F.col("id").alias("rowid"),
        (F.col("id") % 13).alias("ver"),
    )
    current = base.filter(F.col("rowid") % 10 < 7)
    delta = base.filter(F.col("rowid") % 10 >= 7).withColumn(
        "ver", F.col("ver") + 5
    )
    outs = {
        s: merge_upsert(current, delta, ["id_k"], "ver", dedup_strategy=s)
        for s in ("window", "agg", "auto")
    }
    # (order_col, __src) is NOT total per key here (many rowids share a
    # ver) — compare on the keyed winning version, which IS determined.
    vals = {
        s: {(r.id_k, r.ver) for r in df.collect()} for s, df in outs.items()
    }
    assert vals["window"] == vals["agg"] == vals["auto"]

    # plan pin on a FRESH (un-executed) frame — after a collect, AQE's
    # toString prints Final+Initial sections and double-counts nodes
    fresh = merge_upsert(current, delta, ["id_k"], "ver",
                         dedup_strategy="agg")
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" not in plan
    assert plan.count("Exchange") == 1

    with pytest.raises(ValueError, match="dedup_strategy"):
        merge_upsert(current, delta, ["id_k"], "ver", dedup_strategy="salt")
