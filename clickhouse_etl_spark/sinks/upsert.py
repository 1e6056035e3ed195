"""Incremental merge (upsert) + SCD2 history — the scale path past
full refreshes.

The reference reloads every table daily: each DAG re-extracts the whole
Postgres/Mongo source and rewrites the ClickHouse table through a staging
swap (apps/airflow/dags/student/etl_students_to_clickhouse.py:94-113 —
one INSERT of the full collection; staging swap …student_scores_subject/
etl_student_scores_subject_month_to_clickhouse.py:590). That is O(table)
work per day regardless of how little changed. At 100 TB the engine needs
the incremental forms instead:

- ``merge_upsert`` — ClickHouse's ReplacingMergeTree semantics (its
  MergeTree DDLs: apps/clickhouse/migrations/…create_subject_table.sql:27)
  executed eagerly: delta rows replace same-key current rows, last write
  wins inside the delta. ONE shuffle on the merge key (union + ranking
  window), no broadcast of anything that grows with the table — the same
  plan shape at 60 k rows and at 100 TB, where both sides hash-partition
  on the key and AQE splits skew.
- ``summing_merge`` — SummingMergeTree / AggregatingMergeTree
  semantics: an aggregate SNAPSHOT maintained by folding each delta's
  pre-aggregated states in (sum/min/max; avg = sum+count at read).
  O(delta + touched keys), never O(table).
- ``collapsing_merge`` — (Versioned)CollapsingMergeTree's ±1 sign
  collapse in one key-shuffled aggregation; cancels annihilate
  inserts, net ≤ 0 deletes the key, the latest surviving state wins.
- ``scd2_history`` / ``scd2_apply`` — type-2 slowly-changing dimension:
  every key keeps a timeline of attribute versions with
  ``valid_from``/``valid_to``/``is_current``. History build is one
  window over the change log (lag to drop no-op updates, lead to close
  intervals); incremental apply merges a new change batch into an
  existing history with the same single-shuffle shape.

Partition/pruning note for real deployments: write the merged output
partitioned by a stable high-level key (the reference partitions by
``schoolId``) so the NEXT merge's scan of "current" prunes to partitions
the delta actually touches — ``merge_upsert`` accepts a pre-pruned
``current`` for exactly that reason.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce
from operator import and_

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_etl_spark.operators.dedup import (
    latest_row_per_key,
    latest_row_per_key_adaptive,
    latest_row_per_key_agg,
)

#: Epoch far in the future — SCD2's "open interval" sentinel. A literal
#: (not NULL) so range predicates (`valid_from <= ts < valid_to`) need no
#: null branch and pushdown stays simple.
OPEN_END = "9999-12-31 23:59:59"


def merge_upsert(
    current: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    order_col: str,
    dedup_strategy: str = "window",
) -> DataFrame:
    """Merge ``delta`` into ``current``: the newest row per key wins.

    Rows are ranked by (``order_col``, source) — a delta row beats a
    current row at the same ``order_col`` value (it is the newer write).
    Equivalent to ReplacingMergeTree's merge-time collapse with
    ``order_col`` as the version column, but deterministic and immediate
    instead of "eventually, in the background".

    Plan: union (no shuffle) → ONE shuffle on ``keys``. Never
    broadcasts; both inputs only need the same schema.

    ``dedup_strategy`` picks the physical form of that shuffle (the r11
    hot-key adversarial fixture, BENCH_SCALE.md round 11):

    - ``'window'`` (default) — ranking window + rn=1. A window
      partition cannot split, so one hot key serializes into one task;
      measured at gen30 lineitem (18 M rows, 20% on ONE key) the
      straggler stays bounded (1.83 s vs 1.01 s agg) because the sort
      is narrow, but the bound is the hot key's row count — at 100 TB
      a 20%-hot key is a single-task disaster.
    - ``'agg'`` — whole-row ``max_by`` aggregation: partial aggregation
      folds every scan partition's slice of the hot key BEFORE the
      shuffle, so skew costs scan parallelism, not one task (and it
      halves shuffle bytes; measured faster on balanced keys too at
      narrow payloads). Same rows whenever (order_col, source) is
      total per key — pinned in tests/test_upsert.py.
    - ``'auto'`` — the measured decision: pay one count-aggregate
      (``choose_dedup_strategy``) to pick the form, the same machinery
      W1's ``latest_row_per_key_adaptive`` uses. Worth it for
      maintenance merges on sources with unknown key distributions.
    """
    tagged_cur = current.withColumn("__src", F.lit(0))
    tagged_del = delta.withColumn("__src", F.lit(1))
    merged = tagged_cur.unionByName(tagged_del)
    form = {
        "window": latest_row_per_key,
        "agg": latest_row_per_key_agg,
        "auto": latest_row_per_key_adaptive,
    }.get(dedup_strategy)
    if form is None:
        raise ValueError(
            f"dedup_strategy must be 'window', 'agg' or 'auto', "
            f"got {dedup_strategy!r}"
        )
    return form(merged, keys, order_col, tiebreak=["__src"]).drop("__src")


def merge_upsert_with_deletes(
    current: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    order_col: str,
    deleted_col: str = "is_deleted",
    dedup_strategy: str = "window",
) -> DataFrame:
    """CDC-complete merge: ``delta`` rows flagged ``deleted_col`` remove
    the key from the output (after winning the version race) — the
    ReplacingMergeTree(ver, is_deleted) form. Same single-shuffle plan;
    the tombstone filter runs after the window picks the newest row.
    """
    if deleted_col not in delta.columns:
        raise ValueError(f"delta must carry {deleted_col!r} for CDC merges")
    cur = current
    if deleted_col not in cur.columns:
        cur = cur.withColumn(deleted_col, F.lit(False))
    merged = merge_upsert(cur, delta, keys, order_col,
                          dedup_strategy=dedup_strategy)
    return merged.filter(
        ~F.coalesce(F.col(deleted_col).cast("boolean"), F.lit(False))
    ).drop(deleted_col)


def histogram_state_agg(
    src: str, lo: float, hi: float, nbins: int
) -> F.Column:
    """Mergeable fixed-bin histogram state: an ``array<long>`` of
    ``nbins + 2`` counts (index 0 = underflow ``< lo``, 1..nbins the
    equi-width bins over ``[lo, hi)``, last = overflow ``>= hi``).
    Element-wise sum is its exactly-associative merge, so incremental
    == full holds bit-for-bit — the fixed-bound quantile analog of the
    HLL distinct state (ClickHouse ``quantileState``/``quantileMerge``,
    with the honest caveat that bounds are declared up front and the
    quantile error is one bin width). NULLs contribute nothing."""
    if not nbins >= 1:
        raise ValueError(f"nbins must be >= 1, got {nbins}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    width = (hi - lo) / nbins
    idx = F.expr(
        f"CASE WHEN ({src}) IS NULL THEN NULL"
        f" WHEN ({src}) < CAST({lo!r} AS DOUBLE) THEN 0"
        f" WHEN ({src}) >= CAST({hi!r} AS DOUBLE) THEN {nbins + 1}"
        f" ELSE CAST(floor((({src}) - CAST({lo!r} AS DOUBLE))"
        f" / CAST({width!r} AS DOUBLE)) AS INT) + 1 END"
    )
    return F.array(
        *[
            F.sum(F.when(idx == i, F.lit(1)).otherwise(F.lit(0))).cast("long")
            for i in range(nbins + 2)
        ]
    )


def histogram_quantile(
    state, q: float, lo: float, hi: float, nbins: int
) -> F.Column:
    """Read a quantile estimate out of a :func:`histogram_state_agg`
    state column (name or Column): linear interpolation inside the bin
    holding rank ``q * total``; the under/overflow bins clamp to
    ``lo``/``hi``. NULL/empty states read as NULL. Error bound: one
    bin width for in-range data."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    col = F.col(state) if isinstance(state, str) else state
    width = (hi - lo) / nbins
    zero = F.lit(0).cast("long")
    total = F.aggregate(col, zero, lambda a, x: a + x).cast("double")
    rank = F.greatest(F.lit(1.0), F.lit(q) * total)
    # cumulative counts per bin (B ~ tens: the O(B²) slice-sums stay
    # trivial codegen); first bin whose cumulative count reaches rank
    flags = F.transform(
        F.sequence(F.lit(1), F.lit(nbins + 2)),
        lambda k: F.aggregate(F.slice(col, F.lit(1), k), zero, lambda a, x: a + x)
        .cast("double")
        >= rank,
    )
    bin_ = F.array_position(flags, F.lit(True))
    before = F.aggregate(
        F.slice(col, F.lit(1), (bin_ - 1).cast("int")), zero, lambda a, x: a + x
    ).cast("double")
    cnt = F.element_at(col, bin_.cast("int")).cast("double")
    est = (
        F.when(bin_ == 1, F.lit(float(lo)))
        .when(bin_ == nbins + 2, F.lit(float(hi)))
        .otherwise(
            F.lit(float(lo))
            + F.lit(float(width))
            * ((bin_ - 2).cast("double") + (rank - before) / cnt)
        )
    )
    return F.when(col.isNull() | (total == 0), F.lit(None)).otherwise(est)


def moment_state_agg(src: str) -> F.Column:
    """Mergeable second-moment state: ``struct<n: long, mean: double,
    m2: double>`` — count, mean, and centered sum of squares
    (``sum((x - mean)^2)``) of the source expression's non-NULL values.

    The CENTERED form, not the naive ``(n, sum, sum_sq)``: for values
    of large magnitude relative to their spread (epoch seconds: mean
    ~1.7e9, spread ~30) ``sum_sq - sum^2/n`` cancels catastrophically —
    measured: raw result -38923 where the true value is 3e7 — and a
    zero-clamp would then read variance 0.0 with total confidence.
    ``mean``/``m2`` come from Spark's built-in central-moment
    aggregates (``avg``, ``var_pop * n``), and merges use Chan's
    parallel update, which is equally associative and stable.
    NULLs contribute nothing; a key with no values carries ``n = 0``
    and reads as NULL."""
    v = F.expr(src).cast("double")
    return F.struct(
        F.count(v).alias("n"),
        F.avg(v).alias("mean"),
        (F.var_pop(v) * F.count(v)).alias("m2"),
    )


def _moment_merge(a: F.Column, b: F.Column) -> F.Column:
    """Chan's parallel combine of two (n, mean, m2) states."""
    na, nb = a["n"].cast("double"), b["n"].cast("double")
    n = na + nb
    delta = b["mean"] - a["mean"]
    return F.struct(
        (a["n"] + b["n"]).alias("n"),
        (a["mean"] + delta * nb / n).alias("mean"),
        (a["m2"] + b["m2"] + delta * delta * na * nb / n).alias("m2"),
    )


def moment_avg(state) -> F.Column:
    """Read the mean out of a :func:`moment_state_agg` state column
    (name or Column). Empty state (``n = 0``) reads as NULL."""
    col = F.col(state) if isinstance(state, str) else state
    return F.when(col["n"] > 0, col["mean"])


def moment_var(state, sample: bool = True) -> F.Column:
    """Read the variance (sample by default, population with
    ``sample=False``) out of a moment state. m2 is structurally
    non-negative (a clamp catches float dust only); ``n`` below the
    denominator's minimum reads as NULL."""
    col = F.col(state) if isinstance(state, str) else state
    n = col["n"].cast("double")
    m2 = F.greatest(col["m2"], F.lit(0.0))
    denom = n - 1 if sample else n
    floor_n = 2 if sample else 1
    return F.when(col["n"] >= floor_n, m2 / denom)


def moment_stddev(state, sample: bool = True) -> F.Column:
    """Read the standard deviation out of a moment state."""
    return F.sqrt(moment_var(state, sample=sample))


def summing_merge(
    current: DataFrame | None,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    hll_cols: Mapping[str, str] | None = None,
    hist_cols: Mapping[str, tuple] | None = None,
    moment_cols: Mapping[str, str] | None = None,
) -> DataFrame:
    """Incremental aggregate-snapshot maintenance — ClickHouse's
    SummingMergeTree / AggregatingMergeTree semantics (sum/min/max are
    the mergeable state family; avg = maintain a sum AND a count column
    and divide at read time) executed eagerly instead of "eventually,
    at background merge".

    ``delta`` is RAW rows; it is pre-aggregated per key first (the
    map-side partial collapses it before any shuffle), then merged into
    the ``current`` state snapshot: sums add, mins/maxes fold, keys new
    to either side pass through (full-outer). ``current=None`` means
    first load — the delta aggregate IS the snapshot, so bootstrap and
    steady state share one code path.

    Plan: one aggregation shuffle on ``keys`` for the delta + one
    full-outer merge join on the same keys — both sides hash-partition,
    nothing broadcast, O(delta + touched-keys) instead of the
    reference's daily O(table) recompute. Invariant (pinned in tests):
    ``summing_merge(summing_merge(None, d1), d2) ==
    summing_merge(None, d1 ∪ d2)``.

    NULL measures contribute nothing (SUM/MIN/MAX null semantics); a
    key whose every value is NULL keeps a NULL state.

    ``hll_cols`` maps ``state_col -> source_col``: the delta's source
    values fold into a DataSketches HLL sketch per key
    (``hll_sketch_agg``), snapshots carry the BINARY sketch state, and
    merges union the registers (``hll_union``) — ClickHouse's
    ``uniqState``/``uniqMerge`` pair, giving incrementally-maintained
    approximate distinct counts (register-max union is exactly
    associative, so incremental == full holds bit-for-bit). Read the
    estimate with ``F.hll_sketch_estimate(state_col)``.

    ``hist_cols`` maps ``state_col -> (source_expr, lo, hi, nbins)``:
    the delta's values fold into a fixed-bin histogram state
    (:func:`histogram_state_agg`), merges sum the bins element-wise
    (exactly associative, like the HLL register union), and
    :func:`histogram_quantile` reads any quantile out of the state —
    ClickHouse's ``quantileState``/``quantileMerge`` with declared
    bounds and a one-bin-width error contract.

    ``moment_cols`` maps ``state_col -> source_expr``: the delta's
    values fold into a CENTERED ``struct<n:long, mean:double,
    m2:double>`` state (:func:`moment_state_agg` — NOT raw
    ``(n, sum, sum_sq)``, whose ``sum_sq - sum²/n`` read-out
    catastrophically cancels; see that function's docstring for the
    measured case), merges combine states with Chan's parallel
    update, and
    :func:`moment_avg` / :func:`moment_var` / :func:`moment_stddev`
    read the statistics out — ClickHouse's ``avgState``/``varState``
    family, so incremental snapshots carry means and variances without
    a full recompute.
    """
    keys = list(keys)
    hll_cols = dict(hll_cols or {})
    hist_cols = dict(hist_cols or {})
    moment_cols = dict(moment_cols or {})
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
        # src is a column name or SQL expression (hll_sketch_agg only
        # accepts int/long/string/binary — cast in the expression, e.g.
        # "CAST(v AS STRING)", for other types).
        + [F.hll_sketch_agg(F.expr(src)).alias(st) for st, src in hll_cols.items()]
        + [
            histogram_state_agg(src, lo, hi, nbins).alias(st)
            for st, (src, lo, hi, nbins) in hist_cols.items()
        ]
        + [moment_state_agg(src).alias(st) for st, src in moment_cols.items()]
    )
    if not aggs:
        raise ValueError(
            "at least one of sum/min/max/hll/hist/moment cols is required"
        )
    d = delta.groupBy(*keys).agg(*aggs)
    if current is None:
        return d
    state_cols = [
        *sum_cols, *min_cols, *max_cols, *hll_cols, *hist_cols, *moment_cols
    ]
    missing = [c for c in state_cols if c not in current.columns]
    if missing:
        raise ValueError(f"current snapshot lacks state columns {missing}")
    cur = current.select(
        *keys, *[F.col(c).alias(f"__cur_{c}") for c in state_cols]
    ).alias("__cur")
    dd = d.select(
        *keys, *[F.col(c).alias(f"__new_{c}") for c in state_cols]
    ).alias("__new")

    def fold(c: str, how: str) -> F.Column:
        a, b = F.col(f"__cur_{c}"), F.col(f"__new_{c}")
        if how == "sum":
            # NULL + x must be x, but NULL + NULL must stay NULL.
            combined = F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
            return F.when(
                a.isNull() & b.isNull(), F.lit(None)
            ).otherwise(combined).alias(c)
        if how == "hll":
            # union only when both sides exist; hll_union(NULL, x) is
            # not the identity, so coalesce handles one-sided keys.
            return F.when(
                a.isNotNull() & b.isNotNull(), F.hll_union(a, b)
            ).otherwise(F.coalesce(a, b)).alias(c)
        if how == "hist":
            # element-wise bin sum when both sides exist; a bin-count
            # mismatch (hist spec drifted between runs) must fail
            # loudly — zip_with would silently NULL-pad the bins
            ok = F.assert_true(
                F.size(a) == F.size(b),
                F.lit(
                    f"histogram state {c!r}: bin-count mismatch between "
                    "snapshot and delta (hist_cols spec changed?)"
                ),
            )
            return F.when(
                a.isNotNull() & b.isNotNull(),
                F.when(ok.isNull(), F.zip_with(a, b, lambda x, y: x + y)),
            ).otherwise(F.coalesce(a, b)).alias(c)
        if how == "moment":
            # Chan's combine when both sides carry data; an n=0 or
            # absent side passes the other through unchanged (the Chan
            # update divides by n_a + n_b and mixes a NULL mean in)
            both = a.isNotNull() & b.isNotNull()
            return (
                F.when(both & (a["n"] > 0) & (b["n"] > 0), _moment_merge(a, b))
                .when(both & (a["n"] > 0), a)
                .when(both, b)
                .otherwise(F.coalesce(a, b))
                .alias(c)
            )
        return (F.least(a, b) if how == "min" else F.greatest(a, b)).alias(c)

    folded = (
        [fold(c, "sum") for c in sum_cols]
        + [fold(c, "min") for c in min_cols]
        + [fold(c, "max") for c in max_cols]
        + [fold(c, "hll") for c in hll_cols]
        + [fold(c, "hist") for c in hist_cols]
        + [fold(c, "moment") for c in moment_cols]
    )
    # Null-safe key equality: a NULL-keyed state row must merge with a
    # NULL-keyed delta row (plain `on=keys` never matches NULLs, so the
    # snapshot would accumulate duplicate NULL-key rows and break the
    # incremental == full invariant). EqualNullSafe is still a valid
    # equi-join key, so this stays a hash-partitioned merge join.
    # Alias-qualified refs (not cur[k]) — both sides can share lineage
    # when merges chain, which trips the ambiguous-self-join analyzer.
    cond = reduce(
        and_,
        [F.col(f"__cur.{k}").eqNullSafe(F.col(f"__new.{k}")) for k in keys],
    )
    key_out = [
        F.coalesce(F.col(f"__cur.{k}"), F.col(f"__new.{k}")).alias(k)
        for k in keys
    ]
    return cur.join(dd, cond, "full").select(*key_out, *folded)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table: one row
    per key whose payload changed, with ``change ∈ {'insert',
    'delete', 'update'}`` — the row-granular complement to
    ``operators.quality.compare_profiles``'s statistical drift report
    (that one says "this column moved"; this one says "these keys
    did"). Key-wise: both sides must be unique per key (merged
    snapshots are; pre-collapse raw change logs are not — run them
    through ``merge_upsert`` first).

    Output: ``(*keys, change, <new payload columns>)`` — deletes carry
    the OLD payload (there is no new one). Payload comparison is
    null-safe struct equality over the shared non-key columns.

    Plan: one full-outer join on the keys; both sides hash-partition,
    nothing broadcast — the same merge-shaped shuffle every other
    incremental op here uses.
    """
    keys = list(keys)
    payload_cols = [c for c in new.columns if c not in keys]
    shared = [c for c in payload_cols if c in old.columns]
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__old_{c}") for c in shared],
    ).alias("__o")
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__new_{c}") for c in payload_cols],
    ).alias("__n")
    # Same null-safe key treatment as summing_merge: a NULL key present
    # in both snapshots is the SAME key, not an insert+delete pair.
    # (Alias-qualified refs: old and new often share lineage.)
    j = o.join(
        n,
        reduce(
            and_,
            [F.col(f"__o.{k}").eqNullSafe(F.col(f"__n.{k}")) for k in keys],
        ),
        "full",
    )
    same = F.lit(True)
    for c in shared:
        same = same & F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    out_payload = [
        F.when(F.col("__in_new").isNull(), F.col(f"__old_{c}"))
        .otherwise(F.col(f"__new_{c}"))
        .alias(c)
        if c in shared
        else F.col(f"__new_{c}").alias(c)
        for c in payload_cols
    ]
    key_out = [
        F.coalesce(F.col(f"__o.{k}"), F.col(f"__n.{k}")).alias(k)
        for k in keys
    ]
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_out, "change", *out_payload)
    )


def snapshot_cdc(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    deleted_col: str = "is_deleted",
) -> DataFrame:
    """The diff as a CDC batch consumable by
    :func:`merge_upsert_with_deletes`: inserts/updates carry the new
    payload, deletes become tombstones. Round-trip invariant (pinned in
    tests): applying this batch to ``old`` reproduces ``new`` exactly —
    which is how a pipeline retrofits incremental maintenance onto a
    source that only exposes periodic full snapshots (the reference's
    daily re-extracts are exactly that shape)."""
    d = snapshot_diff(old, new, keys)
    return d.select(
        *keys,
        *[c for c in d.columns if c not in (*keys, "change")],
        (F.col("change") == "delete").alias(deleted_col),
    )


def collapsing_merge(
    rows: DataFrame,
    keys: Sequence[str],
    sign_col: str = "sign",
    order_col: str | None = None,
) -> DataFrame:
    """CollapsingMergeTree's sign collapse, executed eagerly: state rows
    arrive as ``sign=+1`` (insert/new state) and ``sign=-1`` (cancel of
    the previously inserted state); per key, cancels annihilate inserts
    and the surviving latest state row remains — no survivors (net ≤ 0)
    means the key is deleted.

    ``order_col`` pins WHICH ``+1`` row is "latest" (the
    VersionedCollapsingMergeTree form — deterministic under any arrival
    order). Without it, ties fall to the highest-sort row of the whole
    remaining payload, matching ClickHouse's plain Collapsing engine
    only up to its own arrival-order caveat — pass ``order_col`` in
    anything that replays or arrives out of order.

    One aggregation shuffle on ``keys`` (map-side partial folds the
    ±1 counts early); completes the MergeTree-family set next to
    ``merge_upsert`` (Replacing) and ``summing_merge`` (Summing).
    """
    # Sign validation rides INSIDE the single pass (raise_error folded
    # into the expression) — a separate pre-scan job just to validate
    # would double the read at 100 TB.
    sign = F.when(
        F.col(sign_col).isin(1, -1), F.col(sign_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{sign_col} must be +1 or -1, got: "),
                F.col(sign_col).cast("string"),
            )
        ).cast("int")
    )
    payload_cols = [c for c in rows.columns if c not in keys and c != sign_col]
    if order_col is not None:
        order = F.struct(
            F.col(order_col),
            *[F.col(c) for c in payload_cols if c != order_col],
        )
    else:
        order = F.struct(*[F.col(c) for c in payload_cols])
    payload = F.struct(*[F.col(c) for c in payload_cols])
    agg = rows.groupBy(*keys).agg(
        F.sum(sign).alias("__net"),
        F.max_by(payload, F.when(sign == 1, order)).alias("__last"),
    )
    return agg.filter(F.col("__net") > 0).select(
        *keys, *[F.col("__last").getField(c).alias(c) for c in payload_cols]
    )


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Build a full SCD2 history from a change log.

    One row per (key, version): ``valid_from`` = the change's timestamp,
    ``valid_to`` = the next change's timestamp (:data:`OPEN_END` for the
    current version), ``is_current`` flag. Consecutive changes with
    identical ``attr_cols`` collapse into one interval (no-op updates —
    the common CDC noise — don't create versions).

    Plan: two windows over the SAME (keys × ts) sort — Catalyst runs them
    in one shuffle+sort, so the whole build is a single pass.
    """
    order_w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(ts_col).asc()
    )
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    # Drop rows whose attributes equal the previous version's (same key,
    # ts order): eqNullSafe via struct comparison keeps null attrs sane.
    deduped = (
        changes.withColumn("__prev", F.lag(attrs).over(order_w))
        .filter(F.col("__prev").isNull() | ~attrs.eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )
    next_ts = F.lead(F.col(ts_col)).over(order_w)
    return (
        deduped.withColumn("valid_from", F.col(ts_col))
        .withColumn(
            "valid_to",
            F.coalesce(next_ts, F.lit(OPEN_END).cast("timestamp")),
        )
        .withColumn(
            "is_current", F.col("valid_to") == F.lit(OPEN_END).cast("timestamp")
        )
    )


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Merge a new change batch into an existing SCD2 ``history``.

    Semantically: rebuild each affected key's timeline from (its existing
    versions' ``valid_from`` rows + the new changes) and splice untouched
    keys through unchanged. Only keys present in ``changes`` are
    re-windowed, so the shuffle is sized by the DELTA, not the table:
    untouched history passes through with a semi-join-pruned scan —
    at 100 TB a daily batch touching 0.1% of keys re-sorts 0.1% of rows.

    ``history`` must be a prior :func:`scd2_history`/``scd2_apply``
    output (carries ``valid_from``/``valid_to``/``is_current``).
    """
    key_cols = list(keys)
    affected = changes.select(*key_cols).distinct()
    # Existing versions of affected keys, reduced back to change-log form.
    touched_log = (
        history.join(affected, on=key_cols, how="left_semi")
        .select(*key_cols, F.col("valid_from").alias(ts_col), *attr_cols)
    )
    new_log = changes.select(*key_cols, ts_col, *attr_cols)
    rebuilt = scd2_history(
        touched_log.unionByName(new_log), key_cols, ts_col, attr_cols
    )
    untouched = history.join(affected, on=key_cols, how="left_anti")
    # Output the canonical SCD2 schema (keys + ts + attrs + validity).
    # A history carrying extra change-log columns (CDC op, metadata)
    # cannot rebuild them for re-windowed keys, so they are dropped for
    # BOTH sides rather than resolving to an AnalysisException.
    return untouched.select(*rebuilt.columns).unionByName(rebuilt)


def snapshot_at(
    history: DataFrame, ts: str, ts_col: str = "valid_from"
) -> DataFrame:
    """Point-in-time read over an SCD2 history: the version of every key
    valid at ``ts`` (``valid_from <= ts < valid_to``). A plain filter —
    partition/file pruning applies when the history is stored sorted or
    partitioned on the interval columns."""
    t = F.lit(ts).cast("timestamp")
    return history.filter((F.col("valid_from") <= t) & (t < F.col("valid_to")))


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    fact_ts_col: str,
    how: str = "left",
) -> DataFrame:
    """Temporal dimension lookup: join every fact row to the SCD2
    version valid AT THE FACT'S OWN TIMESTAMP (``valid_from <= ts <
    valid_to``) — the join every type-2 dimension exists to serve, and
    the per-row generalization of :func:`snapshot_at`'s single global
    timestamp.

    Each fact matches AT MOST one version (scd2 intervals partition the
    key's timeline); facts earlier than the key's first version — or
    with no key at all — keep NULL dimension columns under ``'left'``
    or drop under ``'inner'``.

    Plan shape: an EQUI join on the keys with the interval test as a
    join-level range predicate — the shuffle keys on the dimension key
    (same co-partitioning as any fact⨝dim join), and the range check
    runs inside the join, never as a post-join explode: a key's
    versions are few, so the per-key fan-in stays bounded by history
    depth, not by table size.
    """
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    key_cols = list(keys)
    # History columns that collide with fact columns (the change-log
    # ts, or an attribute sharing a fact metric's name) would make the
    # joined frame ambiguous. Dropping them would silently lose the
    # dimension attribute the caller asked for — RENAME to ``dim_<c>``
    # instead, so both survive unambiguously.
    bad = {"valid_from", "valid_to"} & set(facts.columns)
    if bad:
        raise ValueError(
            f"facts must not carry the validity columns {sorted(bad)}"
        )
    for c in history.columns:
        if c in facts.columns and c not in key_cols:
            history = history.withColumnRenamed(c, f"dim_{c}")
    # frame-qualified references: keys exist on both sides
    ts = facts[fact_ts_col].cast("timestamp")
    cond = (
        ts.isNotNull()
        & (history["valid_from"] <= ts)
        & (ts < history["valid_to"])
    )
    for k in key_cols:
        cond = cond & (facts[k] == history[k])
    joined = facts.join(history, on=cond, how=how)
    # drop the dimension side's duplicate key columns
    return joined.drop(*[history[k] for k in key_cols])
