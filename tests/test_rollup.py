"""A5 golden tests — hierarchical rollup on a hand-built 3-level tree,
including the cycle and unscored-leaf cases the reference would break on
(SURVEY.md §5.3; reference recursion at apps/airflow/dags/score/
etl_scores_by_subject_to_clickhouse.py:63-81 has no cycle guard).
"""

from __future__ import annotations

import pytest

from clickhouse_etl_spark.operators.rollup import hierarchical_rollup

#   root ─┬─ mid1 ─┬─ leafA (scores: 10, 30  → 20)
#         │        └─ leafB (score: None→0, 80 → 40)
#         └─ mid2 ─── leafC (no scores → NULL)
TREE = [
    ("root", "na", "semester"),
    ("mid1", "root", "month"),
    ("mid2", "root", "month"),
    ("leafA", "mid1", "subject"),
    ("leafB", "mid1", "subject"),
    ("leafC", "mid2", "subject"),
]
SCORES = [("leafA", 10.0), ("leafA", 30.0), ("leafB", None), ("leafB", 80.0)]


@pytest.fixture(scope="module")
def rolled(spark):
    evals = spark.createDataFrame(TREE, ["evaluationId", "parentId", "type"])
    scores = spark.createDataFrame(SCORES, ["evaluationId", "score"])
    return {
        r["evaluationId"]: r["value"]
        for r in hierarchical_rollup(evals, scores).collect()
    }


def test_leaf_null_as_zero_average(rolled):
    assert rolled["leafA"] == pytest.approx(20.0)
    assert rolled["leafB"] == pytest.approx(40.0)  # (0 + 80) / 2


def test_unscored_leaf_is_null_and_skipped_by_parent(rolled):
    assert rolled["leafC"] is None
    # mid2's only child is NULL → avg over no non-null values → NULL.
    assert rolled["mid2"] is None


def test_internal_averages_of_children(rolled):
    assert rolled["mid1"] == pytest.approx(30.0)  # mean(20, 40)
    # root: mean of child values ignoring NULL mid2 → 30.
    assert rolled["root"] == pytest.approx(30.0)


def test_every_node_gets_exactly_one_row(rolled):
    assert len(rolled) == len(TREE)


def test_leveled_fast_path_matches_generic(spark):
    """On a rigid-typed tree the single-plan leveled rollup must agree
    with the generic fixed-point loop row for row."""
    from clickhouse_etl_spark.operators.rollup import hierarchical_rollup_by_level

    evals = spark.createDataFrame(TREE, ["evaluationId", "parentId", "type"])
    scores = spark.createDataFrame(SCORES, ["evaluationId", "score"])
    generic = {
        r["evaluationId"]: r["value"]
        for r in hierarchical_rollup(evals, scores).collect()
    }
    leveled = {
        r["evaluationId"]: r["value"]
        for r in hierarchical_rollup_by_level(
            evals, scores, ["subject", "month", "semester"]
        ).collect()
    }
    assert leveled == generic


def test_cycle_terminates(spark):
    # a → b → a cycle plus a normal leaf; must terminate, cycle nodes
    # simply never resolve (absent), the clean branch still computes.
    evals = spark.createDataFrame(
        [
            ("a", "b", "x"),
            ("b", "a", "x"),
            ("ok_parent", "na", "x"),
            ("ok_leaf", "ok_parent", "x"),
        ],
        ["evaluationId", "parentId", "type"],
    )
    scores = spark.createDataFrame([("ok_leaf", 42.0)], ["evaluationId", "score"])
    out = {
        r["evaluationId"]: r["value"]
        for r in hierarchical_rollup(evals, scores, max_depth=4).collect()
    }
    assert out["ok_leaf"] == pytest.approx(42.0)
    assert out["ok_parent"] == pytest.approx(42.0)
    assert "a" not in out and "b" not in out  # unresolvable, not looping


def test_child_type_filter_starves_parent(spark):
    # parent whose children are all filtered out by type → NULL (reference
    # returns None for empty child_scores).
    evals = spark.createDataFrame(
        [("p", "na", "month"), ("c1", "p", "custom"), ("c2", "p", "custom")],
        ["evaluationId", "parentId", "type"],
    )
    scores = spark.createDataFrame([("c1", 10.0)], ["evaluationId", "score"])
    out = {
        r["evaluationId"]: r["value"]
        for r in hierarchical_rollup(
            evals, scores, child_type_filter="subject"
        ).collect()
    }
    assert out["p"] is None


def test_deep_tree_past_max_depth_raises(spark):
    """A legitimate tree deeper than max_depth raises instead of
    silently returning a truncated result."""
    # chain: n0 <- n1 <- ... <- n5 (n5 is the leaf), max_depth=3.
    edges = [(f"n{i}", f"n{i-1}" if i else "na", "x") for i in range(6)]
    evals = spark.createDataFrame(edges, ["evaluationId", "parentId", "type"])
    scores = spark.createDataFrame([("n5", 10.0)], ["evaluationId", "score"])
    with pytest.raises(RuntimeError, match="max_depth"):
        hierarchical_rollup(evals, scores, max_depth=3)
    # Same tree resolves fully with enough depth.
    out = hierarchical_rollup(evals, scores, max_depth=8)
    assert {r.evaluationId for r in out.collect()} == {f"n{i}" for i in range(6)}
