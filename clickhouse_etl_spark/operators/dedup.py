"""Dedup operators (SURVEY.md §2.3 P3, §2.4 J7, §2.6 W1).

At 100 TB the ranking-window dedup shuffles once on the key — exactly the
minimum required — and AQE splits skewed keys. No collect, no driver state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_row_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str = "updatedAt",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """P3/W1 — keep the max-``order_col`` row per key.

    reference: apps/airflow/dags/student/etl_students_to_clickhouse.py:38-45
    (Postgres ``SELECT DISTINCT ON ("uniqueKey") … ORDER BY "uniqueKey",
    "updatedAt" DESC``). Spark shape: ranking window + rn=1 filter — a
    single shuffle on the dedup key.

    ``tiebreak`` columns break exact ``order_col`` ties deterministically
    (Postgres DISTINCT ON leaves them unspecified; we pin them down so the
    operator is reproducible).
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def choose_dedup_strategy(
    df: DataFrame,
    keys: Sequence[str],
    ratio_threshold: float = 32.0,
    hot_min: int = 10_000,
    log_fn=None,
) -> str:
    """The measured W1 plan decision, returned AS DATA: run
    :func:`operators.skew.skew_report` on ``keys`` and return ``'agg'``
    when a hot key is found (``max_count >= hot_min`` AND ``max/mean >=
    ratio_threshold``), else ``'window'``. Callers that need to record
    the decision (data cards, pipeline reports) consume the return
    value — the ``log_fn`` line is for humans only.

    Cost: one count-aggregate on ``keys`` plus a bounded driver
    reduction (skew_report's contract) — the price of not discovering
    the hot key at hour three of the shuffle.
    """
    from clickhouse_etl_spark.operators.skew import skew_report

    report = skew_report(df, keys)
    strategy = (
        "agg"
        if report.max_count >= hot_min and report.ratio >= ratio_threshold
        else "window"
    )
    if log_fn is not None:
        log_fn(
            f"choose_dedup_strategy: max_count={report.max_count} "
            f"ratio={report.ratio} -> {strategy}"
        )
    return strategy


def latest_row_per_key_adaptive(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str = "updatedAt",
    tiebreak: Sequence[str] = (),
    ratio_threshold: float = 32.0,
    hot_min: int = 10_000,
    log_fn=None,
) -> DataFrame:
    """W1 with a MEASURED plan choice (:func:`choose_dedup_strategy`):

    - Balanced keys → the ranking-window form
      (:func:`latest_row_per_key`): one shuffle, minimal plan. A window
      partition cannot be split, so a hot key serializes into ONE task
      — fine until it isn't.
    - Measured hot key → the max_by aggregation form
      (:func:`latest_row_per_key_agg`): partial aggregation reduces
      every input partition's slice of the hot key to one candidate row
      BEFORE the shuffle, so the hot key's work spreads across however
      many tasks scanned it (the same two-phase shape AQE cannot give a
      window).

    Both forms return identical rows (pinned in tests/test_scale_ops.py);
    the choice is purely physical. NULL ``order_col`` values behave the
    same on both paths: the agg form's ordering key is a struct (never
    NULL as a whole, and struct comparison sorts NULL fields lowest),
    which matches the window's ``DESC`` NULLS-LAST ordering — with the
    usual caveat that ties beyond ``(order_col, *tiebreak)`` are
    arbitrary on either path, so pass enough tiebreak columns to make
    the order total per key.
    """
    strategy = choose_dedup_strategy(
        df, keys, ratio_threshold, hot_min, log_fn=log_fn
    )
    if strategy == "window":
        return latest_row_per_key(df, keys, order_col, tiebreak)
    return latest_row_per_key_agg(df, keys, order_col, tiebreak)


def latest_row_per_key_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str = "updatedAt",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """The skew-robust W1 physical form: whole-row ``max_by``
    aggregation instead of a ranking window. Partial aggregation folds
    each scan partition's slice of every key to one candidate row
    before the shuffle, so a hot key costs its scan parallelism, not
    one window task. Same rows as :func:`latest_row_per_key` whenever
    ``(order_col, *tiebreak)`` is total per key and non-null; prefer
    the window form when keys are balanced (smaller plan, no struct
    assembly)."""
    keys = list(keys)
    payload = [c for c in df.columns if c not in keys]
    order = F.struct(F.col(order_col), *[F.col(c) for c in tiebreak])
    row = F.struct(*[F.col(c) for c in payload])
    out = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(row, order).alias("__r")
    )
    return out.select(
        *[
            F.col(c) if c in keys else F.col("__r")[c].alias(c)
            for c in df.columns
        ]
    )


def last_write_wins(
    df: DataFrame, key: str, order_col: str | None = None
) -> DataFrame:
    """J7 — one row per key, keeping the *last seen* (reference dict
    comprehension keeps the last subject per structureRecordId).

    reference: apps/airflow/dags/student_scores_subject/
    etl_student_scores_subject_month_to_clickhouse.py:149.

    The reference's "last" is source iteration order — an accident. We make
    the policy explicit: order by ``order_col`` (default: the natural
    ``updatedAt`` if present) and keep the max. Deliberate, documented
    deviation: deterministic instead of arbitrary.
    """
    if order_col is None:
        if "updatedAt" not in df.columns:
            raise ValueError(
                "last_write_wins needs an explicit order_col when the "
                "frame has no 'updatedAt' column — guessing one (e.g. "
                "the last column) would make an arbitrary payload decide "
                "which rows survive dedup"
            )
        order_col = "updatedAt"
    return latest_row_per_key(df, [key], order_col)


def representative_latest(
    df: DataFrame,
    keys: Sequence[str],
    payload_cols: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """W2 — per-key payload values taken from the max-``order_col`` row.

    reference: apps/airflow/dags/student_transcript/
    etl_student_transcript_to_clickhouse.py:296-301,330-332 keeps the score
    with the latest ``markedAt`` as the representative scorer. ``max_by``
    is the single-agg form — one shuffle, no window, no self-join.

    ``max_by`` on a tied order value picks an arbitrary row, so pass
    ``tiebreak`` columns (folded into a struct order) whenever
    ``order_col`` is not a total order per key — same determinism policy
    as :func:`latest_row_per_key`.
    """
    order = (
        F.struct(F.col(order_col), *[F.col(c) for c in tiebreak])
        if tiebreak
        else F.col(order_col)
    )
    return df.groupBy(*keys).agg(
        *[F.max_by(c, order).alias(c) for c in payload_cols],
        F.max(order_col).alias(order_col),
    )


def scrub_invalid_keys(
    df: DataFrame,
    cols: Sequence[str],
    invalid: Sequence[str] = ("undefined", ""),
) -> DataFrame:
    """P4 — drop rows whose key columns are NULL or sentinel-invalid.

    reference: apps/airflow/dags/student_transcript/
    etl_student_transcript_to_clickhouse.py:124 filters the literal string
    ``"undefined"`` out of structure ids before the lookup extraction (a
    JS-null artifact of the upstream service). Named policy instead of an
    inline filter so every pipeline treats bad keys identically.
    """
    cond = F.lit(True)
    for c in cols:
        col = F.col(c)
        # compare on the string form: a numeric key against a string
        # sentinel would coerce the sentinel to NULL and x IN (NULL)
        # is NULL — silently dropping every valid row.
        cond = cond & col.isNotNull() & ~col.cast("string").isin(*invalid)
    return df.filter(cond)


def exact_distinct(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """A9 — distinct key sets (reference ``set(...)`` comprehensions).

    reference: …etl_student_scores_subject_month_to_clickhouse.py:467-468
    """
    return (df.select(*cols) if cols else df).distinct()


def limit_by(
    df: DataFrame,
    keys: Sequence[str],
    n: int,
    order_col: str,
    descending: bool = True,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """ClickHouse ``LIMIT n BY keys`` — the first ``n`` rows per key in
    ``order_col`` order (:func:`latest_row_per_key` is the n=1 case).
    Same single ranking-window shuffle; ``tiebreak`` pins exact-tie
    order so the cut is reproducible across partitionings."""
    if n <= 0:
        raise ValueError("n must be positive")
    cols = [F.col(order_col)] + [F.col(c) for c in tiebreak]
    order = [c.desc() for c in cols] if descending else [c.asc() for c in cols]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
