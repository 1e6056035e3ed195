"""Aggregation layer (SURVEY.md §2.5 A1-A9).

The two averaging semantics are named, separate operators — the reference
silently mixes them (null-dropped in the monthly fact, null-as-zero in the
transcript) and that difference changes denominators.

All are plain ``groupBy().agg`` → Spark plans partial (map-side) + final
aggregation automatically; no driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_etl_spark.functions.scalars import weighted_coe


def avg_null_dropped(
    df: DataFrame, keys: Sequence[str], value: str, alias: str = "avg_score"
) -> DataFrame:
    """A1 — mean over non-null values only (SQL AVG semantics).

    reference: apps/airflow/dags/student_scores_subject/
    etl_student_scores_subject_month_to_clickhouse.py:160-204,243-247
    """
    return df.groupBy(*keys).agg(F.avg(value).alias(alias))


def avg_null_as_zero(
    df: DataFrame, keys: Sequence[str], value: str, alias: str = "avg_score"
) -> DataFrame:
    """A2 — nulls count as zero *in the denominator too*.

    reference: apps/airflow/dags/student_transcript/
    etl_student_transcript_to_clickhouse.py:240-245,287-290 maps None→0
    before averaging — a different denominator than A1.
    """
    return df.groupBy(*keys).agg(
        F.avg(F.coalesce(F.col(value), F.lit(0.0))).alias(alias)
    )


def weighted_average(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    weight: str,
    alias: str = "weighted_avg",
) -> DataFrame:
    """A3 — Σ(value×coe)/Σ(coe) with coe≤0 (or NULL) defaulting to 1.

    NULL values are excluded from BOTH sums: SUM skips the NULL
    numerator term automatically, and counting the row's weight in the
    denominator anyway would silently deflate the average (the
    reference iterates scored evaluations only, so an unscored row
    contributes neither — …:284-302).
    """
    w = weighted_coe(F.col(weight))
    w_eff = F.when(F.col(value).isNotNull(), w)
    return df.groupBy(*keys).agg(
        (F.sum(F.col(value) * w) / F.sum(w_eff)).alias(alias)
    )


def avg_of_avgs(
    df: DataFrame,
    inner_keys: Sequence[str],
    outer_keys: Sequence[str],
    value: str,
    alias: str = "avg_of_avgs",
) -> DataFrame:
    """A4 — two-level average (per-custom percentage → subject mean).

    reference: apps/airflow/dags/student_transcript/
    etl_student_transcript_to_clickhouse.py:255-265
    """
    inner = df.groupBy(*inner_keys).agg(F.avg(value).alias("__inner_avg"))
    return inner.groupBy(*outer_keys).agg(F.avg("__inner_avg").alias(alias))


def credit_totals(
    df: DataFrame,
    keys: Sequence[str],
    credit: str = "credit",
    gpa: str = "gpa",
) -> DataFrame:
    """A6 — totalCredits=Σcredit, totalGPA=Σ(credit×gpa)/Σcredit, count.

    reference: …etl_student_transcript_to_clickhouse.py:409-412,440-442
    """
    return df.groupBy(*keys).agg(
        F.sum(credit).alias("totalCredits"),
        (F.sum(F.col(credit) * F.col(gpa)) / F.sum(credit)).alias("totalGPA"),
        F.count(F.lit(1)).alias("subjectCount"),
    )


def nested_details(
    df: DataFrame,
    keys: Sequence[str],
    detail_cols: Sequence[str],
    alias: str = "details",
    sort_within: bool = True,
) -> DataFrame:
    """A7 — collect per-group detail structs into an array column.

    reference: …etl_student_transcript_to_clickhouse.py:368-394,399-452
    (the 18-field ``subjectDetails`` tuple array).

    ``collect_list`` ordering is shuffle-dependent; ``sort_within`` makes
    the array deterministic (sorted by struct field order), which the
    reference's dict-iteration order never guaranteed.
    """
    arr = F.collect_list(F.struct(*[F.col(c) for c in detail_cols]))
    if sort_within:
        arr = F.sort_array(arr)
    return df.groupBy(*keys).agg(arr.alias(alias))


def json_details(
    df: DataFrame,
    keys: Sequence[str],
    detail_cols: Sequence[str],
    alias: str = "customEvaluations",
    count_alias: str = "customEvaluationCount",
) -> DataFrame:
    """A8 — collect per-group records and serialize to a JSON array string.

    reference: …etl_student_scores_subject_month_to_clickhouse.py:216-231,
    373-374,426-427 (``customEvaluations`` JSON column + count).
    """
    arr = F.sort_array(F.collect_list(F.struct(*[F.col(c) for c in detail_cols])))
    return df.groupBy(*keys).agg(
        F.to_json(arr).alias(alias),
        F.size(arr).alias(count_alias),
    )


def sum_map(
    df: DataFrame,
    keys: Sequence[str],
    map_keys_col: str,
    map_values_col: str,
    keys_out: str = "keys",
    values_out: str = "values",
    drop_zero: bool = True,
) -> DataFrame:
    """ClickHouse ``sumMap(keyArr, valueArr)``: per group, sum the
    value array element-wise BY KEY across rows, returning two parallel
    arrays — the distinct keys in ascending order and each key's total.
    The workhorse for keyed-counter rollups (status->count,
    error_code->count) where the key space varies per row.

    ``drop_zero=True`` (default) removes keys whose total is exactly
    zero — mirroring SummingMergeTree's map-column compaction, where a
    +n/-n pair cancels out of the merged state entirely. Pass ``False``
    to keep them.

    Semantics: a row whose arrays are NULL contributes nothing; a
    length mismatch between the two arrays fails loudly
    (``assert_true`` — zip would silently NULL-pad); NULL VALUES are
    ignored by the sum (a key seen only with NULL values totals NULL,
    which ``drop_zero`` also removes — it carries no information);
    NULL KEYS are a key like any other and sort FIRST —
    ``array_sort``'s struct ordering puts a NULL field before every
    non-NULL value (``keys=[NULL, 'a', 'b']``; note ClickHouse
    ``sumMap`` output places them oppositely, so diff accordingly). A group with no
    surviving keys (only NULL-array rows, or every total dropped by
    ``drop_zero``) does not appear in the output at all — left-join
    the result back to the group list if empty-map groups must persist.

    Shape: explode the zipped entries, then two aggregations —
    per-(group, key) sums (map-side partial aggregation does the heavy
    combine before any shuffle) and a per-group sorted re-assembly over
    the already-compacted distinct keys. Both shuffles are on hash
    keys; nothing is collected.
    """
    per_key = _map_entries_per_key(
        df, keys, map_keys_col, map_values_col, F.sum, "sum_map"
    )
    if drop_zero:
        per_key = per_key.filter(F.col("__s").isNotNull() & (F.col("__s") != 0))
    return _reassemble_map(per_key, keys, keys_out, values_out)


def min_map(
    df: DataFrame,
    keys: Sequence[str],
    map_keys_col: str,
    map_values_col: str,
    keys_out: str = "keys",
    values_out: str = "values",
) -> DataFrame:
    """ClickHouse ``minMap(keyArr, valueArr)``: per group, the MINIMUM
    value seen for each key across rows — same parallel-array shape and
    plan as :func:`sum_map` (explode → per-(group, key) min with
    map-side partials → sorted re-assembly). No zero-compaction: unlike
    a summed counter, a zero minimum is information.
    """
    per_key = _map_entries_per_key(
        df, keys, map_keys_col, map_values_col, F.min, "min_map"
    )
    return _reassemble_map(per_key, keys, keys_out, values_out)


def max_map(
    df: DataFrame,
    keys: Sequence[str],
    map_keys_col: str,
    map_values_col: str,
    keys_out: str = "keys",
    values_out: str = "values",
) -> DataFrame:
    """ClickHouse ``maxMap(keyArr, valueArr)``: per-key MAXIMUM —
    see :func:`min_map`."""
    per_key = _map_entries_per_key(
        df, keys, map_keys_col, map_values_col, F.max, "max_map"
    )
    return _reassemble_map(per_key, keys, keys_out, values_out)


def _map_entries_per_key(
    df: DataFrame,
    keys: Sequence[str],
    map_keys_col: str,
    map_values_col: str,
    agg_fn,
    op_name: str,
) -> DataFrame:
    """Shared first stage of the *Map aggregates: length-checked zip,
    explode, and the per-(group, key) fold as ``__s``."""
    nk, nv = F.size(F.col(map_keys_col)), F.size(F.col(map_values_col))
    both_null = F.col(map_keys_col).isNull() & F.col(map_values_col).isNull()
    ok = F.assert_true(
        both_null | (nk == nv),
        F.lit(
            f"{op_name}: {map_keys_col!r} and {map_values_col!r} lengths "
            "differ on some row (zip would silently NULL-pad)"
        ),
    )
    entry = F.explode(
        F.when(
            ok.isNull(),
            F.zip_with(
                F.col(map_keys_col),
                F.col(map_values_col),
                lambda k, v: F.struct(k.alias("k"), v.alias("v")),
            ),
        )
    ).alias("__e")
    return (
        df.select(*keys, entry)
        .groupBy(*keys, F.col("__e.k").alias("__k"))
        .agg(agg_fn(F.col("__e.v")).alias("__s"))
    )


def _reassemble_map(
    per_key: DataFrame, keys: Sequence[str], keys_out: str, values_out: str
) -> DataFrame:
    """Shared last stage: per-group key-sorted parallel arrays."""
    kv = F.array_sort(
        F.collect_list(F.struct(F.col("__k").alias("k"), F.col("__s").alias("v")))
    )
    return (
        per_key.groupBy(*keys)
        .agg(kv.alias("__kv"))
        .select(
            *keys,
            F.transform("__kv", lambda e: e["k"]).alias(keys_out),
            F.transform("__kv", lambda e: e["v"]).alias(values_out),
        )
    )
