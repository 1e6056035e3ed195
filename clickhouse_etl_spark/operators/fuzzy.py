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

    # SHORT path: bounded bucket, pairwise inside it. Includes the
    # boundary band [long_floor, short_ceil] so short-vs-long pairs
    # (length gap <= k) are covered by one path or the other.
    shorts = base.filter(F.col("__len") <= short_ceil)
    s2 = shorts.select(
        F.col("__id").alias("__id_b"),
        F.col("__s").alias("__s_b"),
        F.col("__len").alias("__len_b"),
    )
    short_cand = (
        shorts.crossJoin(s2)
        .filter(
            (F.col("__id") < F.col("__id_b"))
            & (F.abs(F.col("__len") - F.col("__len_b")) <= k)
        )
        .select("__id", "__s", "__id_b", "__s_b")
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
