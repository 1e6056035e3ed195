"""J1-J10 golden tests — join templates on small hand-built frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_etl_spark.operators.joins import (
    anti_join,
    broadcast_dim_join,
    candidate_expansion,
    hierarchy_parent_join,
    semi_join_pushdown,
)


def test_j1_broadcast_dim_join_left_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (3, "zz")], ["k", "v"])
    dim = spark.createDataFrame([(1, "dim1"), (2, "dim2")], ["k", "name"])
    out = broadcast_dim_join(fact, dim, on="k", how="left").collect()
    by_k = {r["k"]: r["name"] for r in out}
    assert by_k == {1: "dim1", 2: "dim2", 3: None}


def test_j9_semi_join_no_duplication(spark):
    src = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    keys = spark.createDataFrame([(1,), (1,), (2,)], ["k"])  # dup keys
    out = semi_join_pushdown(src, keys, on="k")
    assert sorted(r["k"] for r in out.collect()) == [1, 2]  # no fan-out


def test_anti_join(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(2,)], ["k"])
    assert sorted(r["k"] for r in anti_join(left, right, on="k").collect()) == [1, 3]


def test_j2_hierarchy_parent_join_prefix_and_left(spark):
    child = spark.createDataFrame(
        [("c1", "p1"), ("c2", "p_missing")], ["evaluationId", "parentId"]
    )
    parent = spark.createDataFrame(
        [("p1", "Month One")], ["evaluationId", "name"]
    )
    out = {
        r["evaluationId"]: r["parent_name"]
        for r in hierarchy_parent_join(child, parent).collect()
    }
    assert out == {"c1": "Month One", "c2": None}


def test_j4_two_hop_ancestry(spark):
    evals = spark.createDataFrame(
        [("sem", None, "semester"), ("mon", "sem", "month"), ("sub", "mon", "subject")],
        ["evaluationId", "parentId", "type"],
    )
    subjects = evals.filter(F.col("type") == "subject")
    months = evals.filter(F.col("type") == "month")
    semesters = evals.filter(F.col("type") == "semester")
    hop1 = hierarchy_parent_join(subjects, months, parent_prefix="month_")
    hop2 = hierarchy_parent_join(
        hop1,
        semesters,
        child_parent_col="month_parentId",
        parent_prefix="sem_",
    )
    r = hop2.collect()[0]
    assert r["month_evaluationId"] == "mon" and r["sem_evaluationId"] == "sem"


def test_asof_join_backward_semantics(spark):
    """At-or-before: equal timestamps match; later right rows never leak
    backward; keys with no prior right row get NULL."""
    import datetime as dt

    from clickhouse_etl_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [("u1", t(10), "e1"), ("u1", t(20), "e2"), ("u2", t(5), "e3")],
        ["user_id", "ts", "eid"],
    )
    right = spark.createDataFrame(
        [("u1", t(10), 100.0), ("u1", t(15), 200.0), ("u2", t(30), 999.0)],
        ["user_id", "ts", "v"],
    )
    out = {
        r["eid"]: r["asof_v"]
        for r in asof_join(left, right, on="user_id", value_cols=["v"]).collect()
    }
    assert out["e1"] == 100.0  # equal ts counts as "at or before"
    assert out["e2"] == 200.0  # latest of the two priors
    assert out["e3"] is None  # u2's only right row is in the future


def test_range_join_binned_boundaries(spark):
    """start inclusive, end exclusive, and intervals straddling a bin
    boundary must still catch events in every covered bin."""
    import datetime as dt

    from clickhouse_etl_spark.operators.rangejoin import range_join_binned

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    events = spark.createDataFrame(
        [(t(1, 59), "before"), (t(2, 0), "at_start"), (t(3, 29), "inside"),
         (t(3, 30), "at_end"), (t(2, 45), "mid")],
        ["ts", "tag"],
    )
    intervals = spark.createDataFrame(
        [(t(2), t(3, 30), "win")], ["start", "end", "interval_id"]
    )
    out = range_join_binned(events, intervals, bin_seconds=3600)
    tags = sorted(r["tag"] for r in out.collect())
    assert tags == ["at_start", "inside", "mid"]  # ends exclusive, start in


def test_asof_join_row_atomicity(spark):
    """All carried columns come from the SAME matched right row: a NULL in
    one column of the most recent row must NOT be backfilled from an older
    row (the per-column forward-fill bug)."""
    import datetime as dt

    from clickhouse_etl_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame([("u1", t(20), "e1")], ["user_id", "ts", "eid"])
    right = spark.createDataFrame(
        [("u1", t(5), 1.0, "old"), ("u1", t(10), None, "new")],
        ["user_id", "ts", "a", "b"],
    )
    r = asof_join(left, right, on="user_id", value_cols=["a", "b"]).collect()[0]
    # the t(10) row is the match: a must be its NULL, not t(5)'s 1.0
    assert r["asof_a"] is None and r["asof_b"] == "new"


def test_range_join_subsecond_end(spark):
    """A sub-second interval end must not truncate away the final bin:
    events in [floor(end), end) still match."""
    import datetime as dt

    from clickhouse_etl_spark.operators.rangejoin import range_join_binned

    events = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 3, 0, 0, 200_000), "tail_in"),
         (dt.datetime(2024, 1, 1, 3, 0, 0, 700_000), "tail_out")],
        ["ts", "tag"],
    )
    intervals = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 2), dt.datetime(2024, 1, 1, 3, 0, 0, 500_000),
          "win")],
        ["start", "end", "interval_id"],
    )
    out = range_join_binned(events, intervals, bin_seconds=3600)
    assert [r["tag"] for r in out.collect()] == ["tail_in"]


def test_range_join_outer_and_inverted(spark):
    """how='right' keeps unmatched intervals exactly once (even spanning
    several bins); inverted intervals don't generate spurious matches."""
    import datetime as dt

    from clickhouse_etl_spark.operators.rangejoin import range_join_binned

    t = lambda h: dt.datetime(2024, 1, 1, h)
    events = spark.createDataFrame([(t(2), "hit")], ["ts", "tag"])
    intervals = spark.createDataFrame(
        [(t(2), t(3), "matched"),
         (t(10), t(14), "empty_wide"),   # 4 bins, no events
         (t(6), t(5), "inverted")],      # end < start
        ["start", "end", "interval_id"],
    )
    out = range_join_binned(events, intervals, bin_seconds=3600, how="right")
    rows = {r["interval_id"]: r["tag"] for r in out.collect()}
    assert rows == {"matched": "hit", "empty_wide": None, "inverted": None}
    assert out.count() == 3  # one row per unmatched interval, not per bin


def test_salted_join_rejects_replicating_sides(spark):
    from clickhouse_etl_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    try:
        salted_join(df, df, on=["k"], salt_from=["v"], how="right")
        raise AssertionError("expected ValueError for how='right'")
    except ValueError:
        pass


def test_j10_candidate_expansion(spark):
    subjects = spark.createDataFrame([("s1",), ("s2",)], ["subj"])
    students = spark.createDataFrame([(1,), (1,), (2,)], ["studentId"])
    out = candidate_expansion(subjects, students)
    assert out.count() == 4  # 2 subjects × 2 distinct students


def test_j10_broadcast_sides_equivalent(spark):
    """All three broadcast_side strategies produce the same grid (same
    columns, same rows) — 'subjects' is the millions-of-students scale
    form, 'students' matches the reference loop."""
    subjects = spark.createDataFrame([("s1", 10), ("s2", 20)], ["subj", "w"])
    students = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["studentId"])
    grids = {
        side: candidate_expansion(subjects, students, broadcast_side=side)
        for side in ("students", "subjects", "none")
    }
    base = sorted(map(tuple, grids["students"].collect()))
    for side, g in grids.items():
        assert g.columns == ["subj", "w", "studentId"], side
        assert sorted(map(tuple, g.collect())) == base, side
    try:
        candidate_expansion(subjects, students, broadcast_side="bogus")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_range_join_left_outer(spark):
    """how='left' keeps unmatched events exactly once with null interval
    columns."""
    import datetime as dt

    from clickhouse_etl_spark.operators.rangejoin import range_join_binned

    t = lambda h: dt.datetime(2024, 1, 1, h)
    events = spark.createDataFrame(
        [(t(2), "hit"), (t(9), "miss")], ["ts", "tag"]
    )
    intervals = spark.createDataFrame(
        [(t(2), t(3), "win")], ["start", "end", "interval_id"]
    )
    out = range_join_binned(events, intervals, bin_seconds=3600, how="left")
    rows = {r["tag"]: r["interval_id"] for r in out.collect()}
    assert rows == {"hit": "win", "miss": None}


def test_range_join_outer_key_cols(spark):
    """key_cols anti-joins on the declared unique key (no surrogate
    snapshot): a multi-bin matched interval surfaces once per match and
    never ALSO null-extended; unmatched intervals come back exactly once."""
    import datetime as dt

    from clickhouse_etl_spark.operators.rangejoin import range_join_binned

    t = lambda h: dt.datetime(2024, 1, 1, h)
    events = spark.createDataFrame(
        [(t(2), "a"), (t(4), "b")], ["ts", "tag"]
    )
    intervals = spark.createDataFrame(
        [(t(1), t(5), "wide"),      # spans 4 bins, matches both events
         (t(10), t(11), "empty")],
        ["start", "end", "interval_id"],
    )
    out = range_join_binned(
        events, intervals, bin_seconds=3600, how="right",
        key_cols=["interval_id"],
    )
    got = sorted((r["interval_id"], r["tag"]) for r in out.collect())
    assert got == [("empty", None), ("wide", "a"), ("wide", "b")]

    try:
        range_join_binned(events, intervals, how="right", key_cols=[])
        raise AssertionError("expected ValueError for empty key_cols")
    except ValueError:
        pass
