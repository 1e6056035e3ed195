"""Fuzzy (bounded-edit-distance) matching — entity resolution at scale.

Deduplicating customer/supplier/name tables ("Jon Smith" vs "John
Smith") needs pairs within Levenshtein distance k. The naive form is an
n² cross join; the scalable form here is q-gram candidate filtering with
an exact verify — the same candidates-then-verify shape as the MinHash
tier, with a PROVABLE completeness bound instead of a probabilistic one:

    One edit (insert/delete/substitute) destroys at most q of a
    string's overlapping q-grams. A string of length L has L - q + 1
    grams, so two strings within distance k share at least
    max(La, Lb) - q + 1 - k*q grams. That is >= 1 whenever
    max(La, Lb) >= q * (k + 1) — LONG strings within distance k are
    guaranteed to collide on at least one exact q-gram.

So the plan splits by length:

- LONG strings (len >= q*(k+1)): explode distinct q-grams, self-join on
  the gram (one shuffle; cost ∝ gram collisions, never n²), length
  prefilter |La - Lb| <= k, then exact ``levenshtein(a, b) <= k``.
- SHORT strings (len <= q*(k+1) + k - 1): too few grams for the
  guarantee — they pair inside a single bounded bucket (a length-k
  neighborhood of the q-gram floor; at web scale this bucket is the
  distinct short strings, a set bounded by the alphabet, not the
  corpus). Strings long enough to pair with a long string are in BOTH
  paths; pairs dedupe at the end.

Spark's built-in ``levenshtein`` does the verify JVM-side; DuckDB's
``levenshtein`` lets the whole operator be value-hash checked against a
brute-force n² oracle (tests/test_fuzzy.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    max_distance: int = 1,
    id_col: str = "doc_id",
    q: int = 3,
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``col`` values are within
    Levenshtein distance ``max_distance``.

    Output: ``(id_a, id_b, <col>_a, <col>_b, distance)``. Identical
    values also pair (distance 0) — filter ``distance > 0`` for
    near-miss-only matching.
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    k = max_distance
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(col).alias("__s"),
        F.length(col).alias("__len"),
    ).filter(F.col("__s").isNotNull())

    long_floor = q * (k + 1)  # completeness bound: see module doc
    short_ceil = long_floor + k - 1 if k > 0 else long_floor - 1

    # LONG path: distinct q-grams -> gram self-join.
    longs = base.filter(F.col("__len") >= long_floor)
    grams = longs.select(
        "__id",
        "__s",
        "__len",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(__len - {q} + 1, 1)),"
                    f" i -> substring(__s, i, {q}))"
                )
            )
        ).alias("__g"),
    )
    g2 = grams.select(
        F.col("__id").alias("__id_b"),
        F.col("__s").alias("__s_b"),
        F.col("__len").alias("__len_b"),
        F.col("__g"),
    )
    long_cand = (
        grams.join(g2, on="__g")
        .filter(
            (F.col("__id") < F.col("__id_b"))
            & (F.abs(F.col("__len") - F.col("__len_b")) <= k)
        )
        .select("__id", "__s", "__id_b", "__s_b")
        .distinct()
    )

    # SHORT path: too few grams for the bound — pair at the VALUE level
    # (the distinct short strings, a set bounded by alphabet^length, not
    # by corpus rows), verify levenshtein there, then join the surviving
    # value pairs back to ids. A million rows of "Jo" cost ONE distinct
    # value in the cross join, not 10^12 crossed rows. Includes the
    # boundary band [long_floor, short_ceil] so short-vs-long pairs
    # (length gap <= k) are covered by one path or the other.
    shorts = base.filter(F.col("__len") <= short_ceil)
    vals = shorts.select("__s", "__len").distinct()
    v2 = vals.select(
        F.col("__s").alias("__s_b"), F.col("__len").alias("__len_b")
    )
    val_pairs = (
        vals.crossJoin(v2)
        .filter(
            (F.col("__s") <= F.col("__s_b"))
            & (F.abs(F.col("__len") - F.col("__len_b")) <= k)
            & (F.levenshtein("__s", "__s_b") <= k)
        )
        .select("__s", "__s_b")
    )
    ids_a = shorts.select(F.col("__id").alias("__ia"), F.col("__s").alias("__va"))
    ids_b = shorts.select(F.col("__id").alias("__ib"), F.col("__s").alias("__vb"))
    a_first = F.col("__ia") < F.col("__ib")
    short_cand = (
        val_pairs.join(ids_a, val_pairs["__s"] == ids_a["__va"])
        .join(ids_b, val_pairs["__s_b"] == ids_b["__vb"])
        .filter(F.col("__ia") != F.col("__ib"))
        .select(
            F.when(a_first, F.col("__ia")).otherwise(F.col("__ib")).alias("__id"),
            F.when(a_first, F.col("__va")).otherwise(F.col("__vb")).alias("__s"),
            F.when(a_first, F.col("__ib")).otherwise(F.col("__ia")).alias("__id_b"),
            F.when(a_first, F.col("__vb")).otherwise(F.col("__va")).alias("__s_b"),
        )
    )

    cand = long_cand.unionByName(short_cand).distinct()
    return (
        cand.withColumn("distance", F.levenshtein("__s", "__s_b"))
        .filter(F.col("distance") <= k)
        .select(
            F.col("__id").alias("id_a"),
            F.col("__id_b").alias("id_b"),
            F.col("__s").alias(f"{col}_a"),
            F.col("__s_b").alias(f"{col}_b"),
            "distance",
        )
    )
