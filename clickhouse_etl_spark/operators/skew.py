"""Skew-handling join/aggregate shapes for hot keys.

At 100 TB a handful of hot keys (one big school, one viral document) can
put an entire shuffle partition on one executor. AQE's skew-join split
(spark.sql.adaptive.skewJoin) handles most cases at runtime; these named
operators are the explicit fallback for sources AQE can't split (e.g. a
skewed key feeding an aggregation whose partials are already huge, or a
non-AQE environment) — the classic salting construction:

- salted aggregate: two-phase — first group on (key, salt) so the hot
  key's rows spread over ``salt_buckets`` reducers, then combine the
  partials per key. Valid for any algebraic aggregate (sum/count/min/max —
  avg as sum+count).
- salted join: replicate the SMALL side ``salt_buckets`` times (one copy
  per salt) and salt the big side deterministically, so the hot key's
  probe rows spread across buckets while every probe row still finds its
  build row.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _salt_col(cols: Sequence[str], buckets: int) -> F.Column:
    """Deterministic per-row salt (hash of the whole row's stable cols) —
    keeps runs reproducible, unlike rand()."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    salt_from: Sequence[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe sum/count/avg per key.

    ``salt_from``: columns whose hash spreads the hot key's rows (must be
    finer-grained than ``keys`` — e.g. the event id). Returns one row per
    key with sum_value / n_rows / avg_value.
    """
    salted = df.withColumn("__salt", _salt_col(salt_from, salt_buckets))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value).alias("__psum"), F.count(F.lit(1)).alias("__pcnt")
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("__psum").alias("sum_value"),
            F.sum("__pcnt").alias("n_rows"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n_rows"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_from: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Every big-side row gets one deterministic salt; the small side is
    exploded ``salt_buckets``× so each (key, salt) bucket has its build
    row. Output equals ``big.join(small, on, how)`` — asserted in tests —
    but the hot key's probe work spreads over ``salt_buckets`` tasks.

    Only ``how`` in {'inner', 'left'} is supported: for right/full/semi/
    anti variants the replicated small side would emit each unmatched
    small row once per salt bucket (or wrongly suppress anti matches), so
    those are rejected rather than silently wrong.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "small side is replicated per salt bucket, so right/full/semi/"
            "anti joins would duplicate or drop unmatched small-side rows"
        )
    keys = list(on)
    big_s = big.withColumn("__salt", _salt_col(salt_from, salt_buckets))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = big_s.join(small_s, on=keys + ["__salt"], how=how)
    return out.drop("__salt")


def cap_bucket_membership(
    df: DataFrame,
    bucket_cols: Sequence[str],
    order_col: str,
    max_bucket_size: int,
    log_fn: Callable[[str], None] | None = None,
    order: str = "lowest",
) -> DataFrame:
    """Bound every bucket to ``max_bucket_size`` members — the guard that
    keeps LSH-style bucket SELF-JOINS from going quadratic on a
    degenerate key.

    A flood of identical/empty documents lands in ONE (band, hash)
    bucket; its self-join is |bucket|² pairs regardless of how good the
    hash family is. Capping membership bounds any bucket's pair count at
    cap², making total cost ∝ corpus + cap²·(oversized buckets) instead
    of unbounded. The honest recall contract: a member dropped from a
    bucket loses its pairings IN THAT BUCKET — a flood far larger than
    the cap can never be fully paired (that is the point; exact dedup
    upstream is the companion that collapses identical floods first).

    ``order`` picks WHICH members survive:

    - ``"lowest"`` (default): the cap-lowest ``order_col`` values —
      deterministic and predictable, but for multi-bucket LSH every
      bucket of a flood keeps the SAME members, so coverage stops at
      one cap's worth of docs.
    - ``"hashed"``: deterministic per-bucket order
      ``xxhash64(bucket_cols…, order_col)`` — each band/table keeps a
      DIFFERENT survivor subset, so an OR-amplified scheme pairs up to
      bands×cap flood members and downstream cluster transitivity links
      their groups. Use for banded near-dup paths.

    Shape: ONE row_number window hash-partitioned by the bucket key —
    fully parallel (this is a per-bucket window, never a global sort),
    one exchange of the same magnitude the downstream self-join pays
    anyway. A flood bucket sorts its members in one task (n log n),
    which is precisely the trade: linear-ish sort instead of the n²
    pair join those members would otherwise generate.

    ``log_fn``: when provided, the oversized buckets are counted EAGERLY
    (one job over ``df`` — callers materialize it first) and a summary
    line ``capped N buckets, dropped M memberships`` is passed to it;
    when None the cap still applies, lazily, with no extra job.
    """
    if max_bucket_size < 1:
        raise ValueError(f"max_bucket_size must be >= 1, got {max_bucket_size}")
    if order not in ("lowest", "hashed"):
        raise ValueError(f"order must be 'lowest' or 'hashed', got {order!r}")
    bcols = list(bucket_cols)
    if log_fn is not None:
        stats = (
            df.groupBy(*bcols)
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") > max_bucket_size)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("__bsz") - max_bucket_size).alias("dropped"),
            )
            .collect()[0]
        )
        log_fn(
            f"cap_bucket_membership: capped {stats['n'] or 0} buckets over "
            f"{max_bucket_size}, dropped {stats['dropped'] or 0} memberships"
        )
    if order == "hashed":
        sort_cols = [
            F.xxhash64(*[F.col(c) for c in bcols], F.col(order_col)),
            F.col(order_col),  # total order even under hash collisions
        ]
    else:
        sort_cols = [F.col(order_col)]
    w = Window.partitionBy(*bcols).orderBy(*sort_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_bucket_size)
        .drop("__rn")
    )


@dataclass
class SkewReport:
    """Output of :func:`skew_report` — read ``ratio`` first: it is
    max-key-count over mean-key-count, i.e. how many times larger the
    hottest reducer partition would be than the average one if this key
    set fed a shuffle. ~1 = uniform; tens-to-thousands = salt the
    aggregate / split the join before it ships."""

    n_rows: int
    n_keys: int
    max_count: int
    mean_count: float
    ratio: float
    #: (key tuple, count) for the ``top`` hottest keys, descending
    top_keys: list[tuple[tuple, int]]


def skew_report(
    df: DataFrame, keys: Sequence[str], top: int = 10
) -> SkewReport:
    """Measure key skew BEFORE choosing a shuffle strategy — the
    diagnostic companion to :func:`salted_sum_count` / :func:`salted_join`
    / AQE's runtime skew split (which only sees the skew after the
    shuffle is already planned).

    Cost: one count-aggregate shuffle on ``keys`` + a bounded driver
    reduction (a 4-value summary row and ``top`` key rows — never the
    key set itself), so it is safe to run on the full production input.
    """
    from clickhouse_etl_spark.util import materialize

    keys = list(keys)
    # two actions below (summary + top-k) — snapshot the counts so the
    # input scan + aggregate shuffle runs once, as the cost note claims
    counts = materialize(
        df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    )
    summary = counts.agg(
        F.sum("__n").alias("rows"),
        F.count(F.lit(1)).alias("nkeys"),
        F.max("__n").alias("mx"),
        F.avg("__n").alias("mean"),
    ).collect()[0]
    hot = (
        counts.orderBy(F.desc("__n"), *[F.asc(k) for k in keys])
        .limit(top)
        .collect()
    )
    n_rows = int(summary["rows"] or 0)
    n_keys = int(summary["nkeys"] or 0)
    mx = int(summary["mx"] or 0)
    mean = float(summary["mean"] or 0.0)
    counts.unpersist()
    return SkewReport(
        n_rows=n_rows,
        n_keys=n_keys,
        max_count=mx,
        mean_count=round(mean, 3),
        ratio=round(mx / mean, 3) if mean else 0.0,
        top_keys=[(tuple(r[k] for k in keys), r["__n"]) for r in hot],
    )
