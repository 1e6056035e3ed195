"""Data-quality gate: single-pass column profiling + declarative
expectations.

The reference validates almost nothing on the way into ClickHouse — the
closest it gets is regex-checking UUIDs (K3,
apps/airflow/dags/student_scores_subject/
etl_student_scores_subject_month_to_clickhouse.py:64-67) and defaulting
bad floats; a malformed extract loads anyway and is discovered by
readers. This module is the missing pre-publish gate, shaped for scale:

- ``profile_columns`` — one job computes every requested column's
  count/null/distinct/min/max/mean/stddev as a SINGLE wide aggregate
  (no per-column scans: profiling 40 columns of a 100 TB table costs
  one pass, not 40). Distinct counts use HLL (``approx_count_distinct``)
  — exact distincts per column would be one shuffle EACH.
- ``check_expectations`` — declarative rules (not_null, unique,
  accepted_values, in_range, matches, custom SQL predicate) evaluated
  as violation COUNTS in one aggregate pass (plus one groupBy per
  ``unique`` rule — key uniqueness is irreducibly a shuffle). Returns a
  tidy report DataFrame; ``enforce_expectations`` raises with the
  failing rules when any violation count is nonzero — the
  staging→publish caller's circuit breaker (compose with
  ``sinks.staging.publish_snapshot``: profile → enforce → publish).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None
) -> DataFrame:
    """Per-column stats in ONE aggregate pass: n_rows, n_null, null_frac,
    approx_distinct, min/max (as strings — type-uniform across columns),
    and mean/stddev for numeric columns (NULL otherwise).

    Output: one row per column — (column, n_rows, n_null, null_frac,
    approx_distinct, min_value, max_value, mean, stddev).
    """
    cols = list(cols or df.columns)
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"__dist_{c}"))
        # min/max on the NATIVE type (string-casting first would compare
        # numerics lexicographically), stringified after aggregation so
        # the report schema is type-uniform across columns.
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
        if c in numeric:
            aggs.append(F.avg(F.col(c)).alias(f"__mean_{c}"))
            aggs.append(F.stddev(F.col(c)).alias(f"__std_{c}"))
    wide = df.agg(*aggs)
    # Pivot the single wide row to one row per column — a stack() over
    # literal column references, still one job.
    # Column names are interpolated into SQL text: escape quote chars in
    # the string literal and backticks in identifiers (a name like
    # "student's_score" is legal in Spark and must not break the parse).
    def lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    def ident(s: str) -> str:
        return "`" + s.replace("`", "``") + "`"

    parts = []
    for c in cols:
        mean = ident(f"__mean_{c}") if c in numeric else "CAST(NULL AS DOUBLE)"
        std = ident(f"__std_{c}") if c in numeric else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"{lit(c)}, {ident(f'__null_{c}')}, {ident(f'__dist_{c}')}, "
            f"{ident(f'__min_{c}')}, {ident(f'__max_{c}')}, {mean}, {std}"
        )
    stacked = wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(column, n_null, approx_distinct, min_value, max_value, mean, stddev)",
    )
    return stacked.select(
        "column",
        "n_rows",
        "n_null",
        (F.col("n_null") / F.col("n_rows")).alias("null_frac"),
        "approx_distinct",
        "min_value",
        "max_value",
        "mean",
        "stddev",
    )


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {not_null, unique, accepted_values,
    in_range, matches, predicate}; ``params`` carries the kind-specific
    arguments. Build via the constructors below."""

    name: str
    kind: str
    column: str | None = None
    params: Mapping = field(default_factory=dict)


def not_null(column: str) -> Rule:
    return Rule(f"not_null({column})", "not_null", column)


def unique(*columns: str) -> Rule:
    return Rule(f"unique({', '.join(columns)})", "unique", None, {"columns": columns})


def accepted_values(column: str, values: Sequence) -> Rule:
    return Rule(
        f"accepted_values({column})", "accepted_values", column, {"values": tuple(values)}
    )


def in_range(column: str, lo, hi) -> Rule:
    return Rule(f"in_range({column})", "in_range", column, {"lo": lo, "hi": hi})


def matches(column: str, pattern: str) -> Rule:
    """Full-match regex (RE2-subset recommended — see text.analysis)."""
    return Rule(f"matches({column})", "matches", column, {"pattern": pattern})


def predicate(name: str, sql_condition: str) -> Rule:
    """Arbitrary row-level SQL condition that must hold for every row."""
    return Rule(name, "predicate", None, {"condition": sql_condition})


def _violation_condition(rule: Rule) -> Column:
    c = F.col(rule.column) if rule.column else None
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "accepted_values":
        # NULL passes (compose with not_null to also forbid NULL): isin
        # returns NULL for NULL input, which coalesces to "no violation".
        return ~F.coalesce(
            c.isin(list(rule.params["values"])), F.lit(False)
        ) & c.isNotNull()
    if rule.kind == "in_range":
        lo, hi = rule.params["lo"], rule.params["hi"]
        return c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi))
    if rule.kind == "matches":
        return c.isNotNull() & ~c.rlike(f"^(?:{rule.params['pattern']})$")
    if rule.kind == "predicate":
        return ~F.coalesce(F.expr(rule.params["condition"]), F.lit(False))
    raise ValueError(f"unknown rule kind {rule.kind!r}")


def check_expectations(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate every rule; return (rule, kind, n_violations, passed).

    ALL rules share ONE aggregate pass: row-level rules as conditional
    sums, each ``unique`` rule as count(*) - count(DISTINCT key struct)
    (duplicate keys = rows beyond the first per key, NULL keys grouped
    like a groupBy would).
    """
    row_rules = [r for r in rules if r.kind != "unique"]
    uniq_rules = [r for r in rules if r.kind == "unique"]

    spark = df.sparkSession
    results: list[tuple[str, str, int]] = []
    # ONE aggregate pass for everything: each unique rule folds as
    # count(*) - count(DISTINCT struct(cols)) — equal to the old
    # per-rule groupBy sum(count-1) job, including NULL keys (struct
    # equality treats NULL fields the way a groupBy key does), so k
    # unique rules no longer cost k extra scans of the table.
    aggs = [
        F.sum(_violation_condition(r).cast("long")).alias(f"__v{i}")
        for i, r in enumerate(row_rules)
    ]
    aggs += [
        (
            F.count(F.lit(1))
            - F.count_distinct(
                F.struct(*[F.col(c) for c in r.params["columns"]])
            )
        ).alias(f"__u{i}")
        for i, r in enumerate(uniq_rules)
    ]
    if aggs:
        row = df.agg(*aggs).collect()[0]
        results += [
            (r.name, r.kind, int(row[f"__v{i}"] or 0))
            for i, r in enumerate(row_rules)
        ]
        results += [
            (r.name, r.kind, int(row[f"__u{i}"] or 0))
            for i, r in enumerate(uniq_rules)
        ]

    out = spark.createDataFrame(
        results, "rule string, kind string, n_violations long"
    )
    return out.withColumn("passed", F.col("n_violations") == 0)


class ExpectationError(RuntimeError):
    """Raised by :func:`enforce_expectations`; carries the report rows."""

    def __init__(self, failures: list):
        self.failures = failures
        detail = "; ".join(f"{r['rule']}: {r['n_violations']}" for r in failures)
        super().__init__(f"expectations failed — {detail}")


def enforce_expectations(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Run :func:`check_expectations`; raise :class:`ExpectationError`
    listing every failed rule if any violation exists, else return the
    report. The publish-gate form: call between transform and
    ``publish_snapshot``."""
    report = check_expectations(df, rules)
    failures = [r.asDict() for r in report.filter(~F.col("passed")).collect()]
    if failures:
        raise ExpectationError(failures)
    return report


def compare_profiles(
    baseline: DataFrame,
    candidate: DataFrame,
    null_frac_jump: float = 0.05,
    distinct_ratio_band: tuple[float, float] = (0.5, 2.0),
    mean_shift_stddevs: float = 3.0,
) -> DataFrame:
    """Data-drift report between two :func:`profile_columns` outputs —
    the monitoring step a scheduled pipeline runs BEFORE publishing a
    refreshed snapshot (the reference republishes daily with no
    comparison against yesterday at all).

    One row per column present in either profile, with per-signal drift
    flags and one rolled-up ``drifted``:

    - ``null_drift`` — null fraction moved more than ``null_frac_jump``
      (absolute).
    - ``distinct_drift`` — approx-distinct ratio left
      ``distinct_ratio_band`` (a collapsed or exploded domain).
    - ``mean_drift`` — numeric mean moved more than
      ``mean_shift_stddevs`` baseline standard deviations (NULL-safe:
      non-numeric columns and zero-stddev baselines never flag here).
    - ``schema_drift`` — the column exists on only one side.

    Both profiles are tiny (one row per column), so this is a driver-
    friendly broadcast join whatever the source table's size was.
    """
    b = baseline.select(
        "column",
        F.col("n_rows").alias("b_n_rows"),
        F.col("null_frac").alias("b_null_frac"),
        F.col("approx_distinct").alias("b_distinct"),
        F.col("mean").alias("b_mean"),
        F.col("stddev").alias("b_stddev"),
    )
    c = candidate.select(
        "column",
        F.col("n_rows").alias("c_n_rows"),
        F.col("null_frac").alias("c_null_frac"),
        F.col("approx_distinct").alias("c_distinct"),
        F.col("mean").alias("c_mean"),
    )
    j = b.join(c, on="column", how="full")
    # Presence is keyed on n_rows (count(1) — never NULL for a profiled
    # column, even over an EMPTY table, where null_frac is 0/0 = NULL);
    # keying presence on a nullable stat would report an empty snapshot
    # as whole-schema drift instead of the actual regression.
    in_both = F.col("b_n_rows").isNotNull() & F.col("c_n_rows").isNotNull()
    null_drift = in_both & (
        F.abs(F.col("c_null_frac") - F.col("b_null_frac")) > null_frac_jump
    )
    ratio = F.col("c_distinct") / F.nullif(F.col("b_distinct"), F.lit(0))
    lo, hi = distinct_ratio_band
    distinct_drift = in_both & ratio.isNotNull() & (
        (ratio < lo) | (ratio > hi)
    )
    mean_drift = (
        in_both
        & F.col("b_mean").isNotNull()
        & F.col("c_mean").isNotNull()
        & (F.col("b_stddev") > 0)
        & (
            F.abs(F.col("c_mean") - F.col("b_mean"))
            > mean_shift_stddevs * F.col("b_stddev")
        )
    )
    schema_drift = ~in_both
    return j.select(
        "column",
        "b_null_frac",
        "c_null_frac",
        F.round(ratio, 6).alias("distinct_ratio"),
        "b_mean",
        "c_mean",
        F.coalesce(null_drift, F.lit(False)).alias("null_drift"),
        F.coalesce(distinct_drift, F.lit(False)).alias("distinct_drift"),
        F.coalesce(mean_drift, F.lit(False)).alias("mean_drift"),
        schema_drift.alias("schema_drift"),
        (
            F.coalesce(null_drift, F.lit(False))
            | F.coalesce(distinct_drift, F.lit(False))
            | F.coalesce(mean_drift, F.lit(False))
            | schema_drift
        ).alias("drifted"),
    )
