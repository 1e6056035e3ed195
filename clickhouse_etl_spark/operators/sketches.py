"""Sketch-backed heavy hitters (approximate candidate generation, exact
verification).

Spark has no built-in frequent-items aggregate with a usable guarantee
(`approx_count_distinct` counts cardinality, not mass), and a full
``groupBy(col).count()`` at 100 TB shuffles one record per DISTINCT
value — ruinous on high-cardinality columns where only the head matters.
The classic fix (Misra-Gries / space-saving) fits Spark's execution
model as a two-phase plan:

1. **Candidate phase** — one narrow ``mapInPandas`` pass: each partition
   counts locally (Arrow-batched, bounded memory) and emits only values
   whose partition count exceeds ``n_partition / m`` (m = k·margin).
   Averaging argument: a value with GLOBAL count > n/m must beat that
   threshold in at least one partition, so the union of partition
   summaries is a guaranteed superset of every such value — and fewer
   than m values can exceed the threshold per partition, so each summary
   is tiny.
2. **Verify phase** — exact counts for the candidates only: broadcast
   semi-join (the corpus never shuffles) + one aggregation over the
   filtered rows, then top-k with a deterministic tiebreak.

Counts in the output are EXACT. The top-k itself is exact whenever every
true top-k value has count > n/m — i.e. whenever the head is actually
heavy; raise ``margin`` to push the bound down. NULLs are ignored (no
reference semantics attach frequency to NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def frequent_items(
    df: DataFrame,
    col: str,
    k: int = 10,
    margin: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Top-k most frequent values of ``col`` with exact counts.

    Output: ``(col, n)`` ordered by ``n`` desc with a value-asc
    tiebreak (plans as TakeOrderedAndProject — no global sort).

    ``weight_col`` generalizes to ClickHouse ``topKWeighted``: rank by
    SUM(weight) per value instead of row count (``n`` becomes the exact
    weight sum, long if the weight column is integral). The averaging
    argument carries over verbatim with mass in place of count — a
    value whose GLOBAL weight exceeds total/m must exceed
    partition_weight/m in at least one partition — so the candidate
    superset guarantee is unchanged. Rows with a NULL weight carry no
    mass (dropped, matching SUM semantics); negative weights break the
    averaging argument and are the caller's contract to exclude.
    """
    if k <= 0 or margin <= 0:
        raise ValueError("k and margin must be positive")
    m = k * margin
    out_schema = StructType([df.schema[col]])

    def summarize(batches):
        from collections import Counter

        import pandas as pd

        counts: Counter = Counter()
        n = 0
        for pdf in batches:
            if weight_col is None:
                vals = pdf[col].dropna()
                n += len(vals)
                counts.update(vals.tolist())
            else:
                pair = pdf[[col, weight_col]].dropna()
                n += pair[weight_col].sum()
                for v, w in zip(pair[col], pair[weight_col]):
                    counts[v] += w
        if not counts:
            return
        threshold = n / m
        keep = [v for v, c in counts.most_common(m) if c > threshold]
        if not keep:  # flat partition: fall back to its local top-m
            keep = [v for v, _ in counts.most_common(m)]
        yield pd.DataFrame({col: keep})

    narrow = [col] if weight_col is None else [col, weight_col]
    candidates = (
        df.select(*narrow).mapInPandas(summarize, schema=out_schema).distinct()
    )
    mass = (
        F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    ).alias("n")
    exact = (
        df.join(F.broadcast(candidates), on=col, how="left_semi")
        .groupBy(col)
        .agg(mass)
    )
    return exact.orderBy(F.col("n").desc(), F.col(col).asc()).limit(k)
