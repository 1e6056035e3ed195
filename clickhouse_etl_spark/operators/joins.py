"""Join templates (SURVEY.md §2.4 J1-J10).

Every reference join is a Python dict hash join (build side = lookup dict).
The Spark re-expression makes the build/probe decision explicit where it
matters at scale: dimension sides are broadcast (no shuffle of the fact),
key-list extraction becomes a left-semi join (no IN-string assembly), and
the evaluation-hierarchy walk is a chain of self-joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """J1/J5 — fact ⨝ small dimension as a broadcast hash join.

    reference: build dict apps/airflow/dags/student_scores_subject/
    etl_student_scores_subject_month_to_clickhouse.py:121,143; probe :361.
    The dict-lookup is exactly a broadcast hash join: dim ships to every
    task, the fact never shuffles.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join_pushdown(
    source: DataFrame,
    keys: DataFrame,
    on: str | Sequence[str],
    broadcast: bool = True,
) -> DataFrame:
    """S5/J9 — fetch only rows whose key appears in an extracted key set.

    reference: IN-list construction …:466-511 (builds ``IN ('…','…')`` SQL
    from score keys). Spark shape: ``left_semi`` with the (small) key set
    broadcast — same pushdown effect without string assembly, and it still
    works when the key set is too large for an IN-list.

    ``broadcast=True`` is right for the reference's shape (a bounded
    extracted key list). Pass ``False`` when the key set DERIVES FROM A
    FACT (it grows with the data and a forced broadcast eventually OOMs
    the driver): AQE then still broadcasts while it fits under the
    threshold and shuffle-joins beyond.
    """
    keys = F.broadcast(keys) if broadcast else keys
    return source.join(keys, on=on, how="left_semi")


def anti_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    broadcast: bool = True,
) -> DataFrame:
    """Negative membership — reference ``if key in processed: continue``.

    reference: …etl_student_scores_subject_month_to_clickhouse.py:273-276

    Same ``broadcast`` contract as :func:`semi_join_pushdown`: keep the
    hint for bounded dimension key sets, pass ``False`` for fact-derived
    right sides and let AQE choose at runtime.
    """
    right = F.broadcast(right) if broadcast else right
    return left.join(right, on=on, how="left_anti")


def hierarchy_parent_join(
    child: DataFrame,
    parent: DataFrame,
    child_parent_col: str = "parentId",
    parent_id_col: str = "evaluationId",
    parent_prefix: str = "parent_",
    how: str = "left",
) -> DataFrame:
    """J2-J4 — one hop up the evaluation tree (child.parentId = parent.id).

    reference: custom→subject …:154-158; subject→month :356-358;
    month→semester apps/airflow/dags/student_transcript/
    etl_student_transcript_to_clickhouse.py:344-366.

    The parent side is the (small) evaluation dimension → broadcast.
    Parent columns come back prefixed so repeated hops don't collide.
    """
    renamed = parent.select(
        *[F.col(c).alias(f"{parent_prefix}{c}") for c in parent.columns]
    )
    cond = F.col(child_parent_col) == F.col(f"{parent_prefix}{parent_id_col}")
    return child.join(F.broadcast(renamed), on=cond, how=how)


def candidate_expansion(
    subjects: DataFrame,
    students: DataFrame,
    student_key: str = "studentId",
    broadcast_side: str = "students",
) -> DataFrame:
    """J10 — subject-evals × distinct students candidate grid.

    reference: …etl_student_transcript_to_clickhouse.py:276-304 iterates
    the cross product then skips pairs without scores. Spark shape:
    crossJoin with one side broadcast, then the caller left-joins scores
    and filters. We replicate the result set, not the loop.

    ``broadcast_side`` picks which side ships to every task:
    - ``'students'`` (default): matches the reference's loop — right for
      a bounded student set.
    - ``'subjects'``: the SCALE form — at millions of students the
      distinct-student side no longer fits in a broadcast, so broadcast
      the (bounded) subject-evaluation dimension instead and keep the
      student side distributed; the grid still never shuffles twice.
    - ``'none'``: no hint, AQE/planner chooses (cartesian shuffle).
    """
    if broadcast_side not in ("students", "subjects", "none"):
        raise ValueError(f"broadcast_side must be students|subjects|none, got {broadcast_side!r}")
    distinct_students = students.select(student_key).distinct()
    if broadcast_side == "students":
        return subjects.crossJoin(F.broadcast(distinct_students))
    if broadcast_side == "subjects":
        return distinct_students.crossJoin(F.broadcast(subjects)).select(
            *subjects.columns, student_key
        )
    return subjects.crossJoin(distinct_students)
