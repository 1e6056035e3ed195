"""A5 — bounded hierarchical rollup over the evaluation tree.

reference: apps/airflow/dags/score/etl_scores_by_subject_to_clickhouse.py:48-106
(``calculate_average_scores`` / ``calculate_scores_recursively``): a node's
value is

- leaf (no children): mean of its direct scores with None→0
  (reference :79-81), no scores → NULL;
- internal: mean of its children's values (reference :67-75), optionally
  restricted to children of a given type (reference :72 filters
  ``type == 'Subject'`` — note the case mismatch against lowercase data, a
  reference quirk the pipeline layer can opt into).

Scale design: the *fact* (scores) is touched exactly once — one hash
aggregation for leaf averages. The tree walk then runs over the evaluation
dimension only (small; broadcastable), as a depth-bounded loop of
join+groupBy — no recursion, no driver-side row data, and a cycle in
``parentId`` terminates at the depth cap instead of recursing forever
(the reference would stack-overflow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clickhouse_etl_spark.util import materialize


def hierarchical_rollup(
    evaluations: DataFrame,
    scores: DataFrame,
    id_col: str = "evaluationId",
    parent_col: str = "parentId",
    score_col: str = "score",
    child_type_filter: str | None = None,
    type_col: str = "type",
    max_depth: int = 8,
) -> DataFrame:
    """Return one row per evaluation node: (id_col, rolled ``value``).

    ``child_type_filter``: if set, internal nodes average only children of
    that exact type (the reference's 'Subject' quirk). Children of other
    types are invisible to the parent — but a node whose children are all
    filtered out still counts as internal and yields NULL (reference
    :74-76 returns None for empty child_scores).
    """
    nodes = evaluations.select(id_col, parent_col, type_col).cache()

    # Leaf averages: one pass over the fact table, null-as-zero semantics.
    leaf_vals = scores.groupBy(id_col).agg(
        F.avg(F.coalesce(F.col(score_col).cast("double"), F.lit(0.0))).alias("value")
    )

    # parent→has-children map (exclude 'na' roots per reference :59).
    child_edges = nodes.filter(F.col(parent_col) != "na")
    parents_with_children = (
        child_edges.select(F.col(parent_col).alias(id_col)).distinct()
    )

    # Depth-0: childless nodes take their leaf average (NULL if unscored).
    resolved = (
        nodes.join(parents_with_children, on=id_col, how="left_anti")
        .join(leaf_vals, on=id_col, how="left")
        .select(id_col, "value")
    )

    eligible_children = (
        child_edges.filter(F.col(type_col) == child_type_filter)
        if child_type_filter is not None
        else child_edges
    )

    # Parents with children but none eligible → NULL value. Loop-
    # invariant (eligibility never changes), and disjoint from the
    # childless depth-0 set — resolve them ONCE up front instead of
    # re-planning the anti-joins on every iteration.
    starved_parents = parents_with_children.join(
        eligible_children.select(F.col(parent_col).alias(id_col)).distinct(),
        on=id_col,
        how="left_anti",
    ).withColumn("value", F.lit(None).cast("double"))
    resolved = resolved.unionByName(starved_parents)

    for _ in range(max_depth):
        # A parent is computable only when EVERY eligible child is already
        # in `resolved` (a resolved child may still carry a NULL value —
        # an unscored leaf — so resolution is tracked by membership, not
        # by value). avg() then ignores NULL child values: a NULL child
        # simply doesn't contribute to its parent's mean.
        resolved_marked = resolved.select(
            F.col(id_col),
            F.col("value").alias("__child_value"),
            F.lit(True).alias("__is_resolved"),
        )
        child_vals = eligible_children.join(resolved_marked, on=id_col, how="left")

        candidate_parents = (
            child_vals.groupBy(F.col(parent_col).alias(id_col))
            .agg(
                F.avg("__child_value").alias("value"),
                F.sum(
                    F.when(F.col("__is_resolved"), F.lit(0)).otherwise(F.lit(1))
                ).alias("__missing"),
            )
            .filter(F.col("__missing") == 0)
            .drop("__missing")
            .join(resolved.select(id_col), on=id_col, how="left_anti")
        )
        # Materialize the level ONCE (isEmpty below would otherwise
        # recompute it, and the union would recompute it again), with
        # cut_lineage: the fixed-point loop's plans would stack up each
        # iteration under a lazy persist.
        new_rows = materialize(candidate_parents, cut_lineage=True)
        if new_rows.isEmpty():
            # No progress: either everything resolved, or a parentId
            # CYCLE whose members can never resolve (they stay absent —
            # the documented cycle-termination contract).
            break
        resolved = materialize(
            resolved.unionByName(new_rows), cut_lineage=True
        )
    else:
        # Loop exhausted WITH progress still pending: a legitimate tree
        # deeper than max_depth. Silently returning a truncated result
        # would read as "unscored" downstream — refuse instead (cycles
        # never reach here; they stop via the no-progress break).
        unresolved = nodes.join(
            resolved.select(id_col), on=id_col, how="left_anti"
        )
        if not unresolved.isEmpty():
            nodes.unpersist()
            raise RuntimeError(
                f"hierarchy deeper than max_depth={max_depth}: unresolved "
                "nodes remain — raise max_depth (the cap exists to bound "
                "cycle-free recursion, not to truncate valid trees)"
            )

    nodes.unpersist()
    return resolved


def hierarchical_rollup_by_level(
    evaluations: DataFrame,
    scores: DataFrame,
    level_types: list[str],
    id_col: str = "evaluationId",
    parent_col: str = "parentId",
    score_col: str = "score",
    type_col: str = "type",
) -> DataFrame:
    """Rollup fast path for a KNOWN level ordering (bottom-up types).

    When the hierarchy's shape is rigid — the reference's tree always is:
    custom → subject → month → semester (type field, SURVEY.md §1.1) —
    the generic fixed-point loop's per-level isEmpty() actions and
    checkpoints are pure overhead. This variant builds ONE lazy plan:
    leaf averages once over the fact, then one join+agg per declared
    level. Same semantics as :func:`hierarchical_rollup` on such trees
    (asserted in tests): null-as-zero leaf averages, NULL for unscored
    leaves, parents average non-null child values, childless mid-level
    nodes yield NULL.
    """
    leaf_type = level_types[0]
    leaf_vals = scores.groupBy(id_col).agg(
        F.avg(F.coalesce(F.col(score_col).cast("double"), F.lit(0.0))).alias("value")
    )
    prev = (
        evaluations.filter(F.col(type_col) == leaf_type)
        .select(id_col)
        .join(leaf_vals, on=id_col, how="left")
    )
    levels = [prev]
    prev_type = leaf_type
    for t in level_types[1:]:
        child_edges = evaluations.filter(F.col(type_col) == prev_type).select(
            F.col(parent_col).alias("__p"), F.col(id_col)
        )
        child_vals = (
            child_edges.join(prev, on=id_col)
            .groupBy("__p")
            .agg(F.avg("value").alias("value"))
            .withColumnRenamed("__p", id_col)
        )
        level_rows = (
            evaluations.filter(F.col(type_col) == t)
            .select(id_col)
            .join(child_vals, on=id_col, how="left")
        )
        levels.append(level_rows)
        prev, prev_type = level_rows, t
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
