"""Deterministic sampling / split assignment for training-data pipelines.

RNG-free by design: every decision is a pure function of the row's key,
so runs are reproducible across retries, cluster sizes, and partitioning
changes (a rand()-based sample changes membership whenever Spark
re-executes a task — poison for dataset lineage). The hash-bucket
primitive is the same one `ext_deterministic_sample` exposes as a query;
these operators build the two shapes every corpus pipeline needs:

- named train/val/test SPLITS with exact weight fractions, and
- per-stratum sampling rates (rebalancing a skewed corpus).

Buckets come from a pluggable expression. The default —
``xxhash64(salt, keys…)`` — mixes well for any key type; pass
``bucket_expr`` for an arithmetic form (e.g. Knuth multiplicative on an
int key) when an external system must reproduce the decision in SQL.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _default_bucket(key_cols: Sequence[str], salt: str) -> Column:
    return F.pmod(F.xxhash64(F.lit(salt), *[F.col(c) for c in key_cols]), F.lit(_BUCKETS))


def assign_splits(
    df: DataFrame,
    key_cols: Sequence[str],
    weights: Mapping[str, float] | None = None,
    salt: str = "split",
    bucket_expr: Column | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Attach a named split per row, keyed deterministically.

    ``weights`` (must sum to 1.0 ± 1e-9) map split names to fractions in
    declaration order; the row's bucket (0..1e6) falls into exactly one
    cumulative range, so splits are disjoint and exhaustive. The same
    key always lands in the same split — documents never leak between
    train and eval across reruns, and salting gives independent
    re-partitions (different ``salt`` → statistically independent
    assignment).
    """
    weights = dict(weights or {"train": 0.9, "val": 0.05, "test": 0.05})
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = bucket_expr if bucket_expr is not None else _default_bucket(key_cols, salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(round(cum * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_deterministic_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_cols: Sequence[str],
    default_fraction: float = 0.0,
    salt: str = "sample",
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    The corpus-rebalancing shape (downsample the over-represented
    language/domain/source): each stratum gets its own keep-rate;
    membership is a pure function of the key, so the SAME rows survive
    every run. ``fractions`` maps stratum values (as strings) to rates;
    unlisted strata use ``default_fraction``. Implemented as a broadcast
    join of the tiny rate map + one bucket comparison — no shuffle of
    the corpus, filter stays next to the scan.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    spark = df.sparkSession
    rates = spark.createDataFrame(
        [(str(k), float(v)) for k, v in fractions.items()],
        [strata_col, "__rate"],
    )
    bucket = bucket_expr if bucket_expr is not None else _default_bucket(key_cols, salt)
    joined = df.join(
        F.broadcast(rates),
        on=df[strata_col].cast("string") == rates[strata_col],
        how="left",
    ).drop(rates[strata_col])
    return (
        joined.withColumn("__rate", F.coalesce("__rate", F.lit(default_fraction)))
        # round() before the cast: Spark's cast TRUNCATES (0.3 * 1e6 =
        # 299999.99999999994 -> 299999, one bucket short), while the
        # sibling operators round driver-side and DuckDB's CAST rounds —
        # rounding keeps all thresholds bit-identical across the three.
        .filter(bucket < F.round(F.col("__rate") * _BUCKETS).cast("long"))
        .drop("__rate")
    )


def mix_corpora(
    sources: Mapping[str, DataFrame],
    weights: Mapping[str, float],
    key_cols: Sequence[str],
    total: int | None = None,
    max_epochs: int = 1,
    salt: str = "mix",
    source_col: str = "source_name",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic weighted mixture over named corpora — the
    pretraining data-mixing step.

    Each source contributes ``weights[name]`` of the output. With
    ``total=None`` the mixture is as large as the weights allow without
    repeating data: ``T = min(n_s * max_epochs / w_s)``. A source whose
    demand exceeds its size repeats whole epochs (tagged in
    ``epoch_col``) up to ``max_epochs`` — the standard epoch-capped
    upsampling of small high-quality corpora — and raises if the demand
    cannot be met, rather than silently drifting off the target mix.

    Row selection is the same RNG-free hash-bucket primitive as
    :func:`assign_splits`, so the mixture is reproducible bit-for-bit
    across retries and repartitioning; fractional-epoch membership is
    binomial around the target (exact in expectation — exact-count
    selection would need a global sort, which does not scale).

    One ``count()`` job per source is the only driver-side work; the
    mixture itself is per-source filters + an epoch explode + unionByName
    (schemas must match across sources; ``source_col``/``epoch_col`` are
    appended). Weights must sum to 1.
    """
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"mixture weights must sum to 1.0, got {sum(weights.values())}")
    if set(weights) != set(sources):
        raise ValueError("weights and sources must have identical keys")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    sizes = {name: df.count() for name, df in sources.items()}
    if any(n == 0 for n in sizes.values()):
        empty = [k for k, n in sizes.items() if n == 0]
        raise ValueError(f"empty source(s): {empty}")
    if total is None:
        total = int(min(sizes[s] * max_epochs / weights[s] for s in sources))
    parts = []
    for name, df in sources.items():
        need = weights[name] * total
        n = sizes[name]
        if need > n * max_epochs + 1e-9:
            raise ValueError(
                f"source {name!r} needs {need:.0f} rows but has {n} x "
                f"{max_epochs} epochs; raise max_epochs or lower its weight"
            )
        full, frac = int(need // n), (need % n) / n
        bucket = _default_bucket(key_cols, f"{salt}:{name}")
        # epochs per row: `full` whole passes + one more for rows whose
        # bucket clears the fractional-epoch threshold.
        epochs = F.lit(full) + F.when(
            bucket < int(round(frac * _BUCKETS)), F.lit(1)
        ).otherwise(F.lit(0))
        parts.append(
            df.withColumn("__epochs", epochs)
            .filter(F.col("__epochs") > 0)
            .withColumn(epoch_col, F.explode(F.sequence(F.lit(1), F.col("__epochs"))))
            .drop("__epochs")
            .withColumn(source_col, F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
