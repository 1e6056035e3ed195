"""Distributed prefix sums — global running totals without a global window.

A naive ``sum() OVER (ORDER BY k)`` is a SINGLE-partition window: the
whole corpus funnels through one task, which is exactly the shape that
dies first at 100 TB. The classic two-level construction here keeps
every stage parallel:

1. range-repartition on the order key (partition i's keys all sort
   before partition i+1's),
2. per-partition partial sums — ONE row per partition — collected to
   the driver and turned into cumulative partition offsets,
3. a within-partition window adds the local running sum to the
   broadcast offset.

The only driver-side state is #partitions rows (the same footprint as
``sinks/compaction``'s per-partition summaries), and no task ever sees
more than its own partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_etl_spark.util import materialize


def running_total(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_total",
    partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value_col`` in ``order_col`` order.

    Each row's ``out_col`` is the sum of every strictly-earlier row's
    value (first row gets 0) — the running-offset shape packing and
    shard planning need. ``order_col`` should be unique: equal keys get
    a valid but arbitrary relative order (range partitioning may split
    ties across partitions).

    The ranged frame is snapshotted with a lineage cut: the partition
    offsets are collected from one evaluation, and a recomputation that
    re-sampled range boundaries differently would silently shift rows
    between partitions out from under those offsets.
    """
    spark = df.sparkSession
    n = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = materialize(
        df.repartitionByRange(n, F.col(order_col)).withColumn(
            "__pid", F.spark_partition_id()
        ),
        cut_lineage=True,
    )
    partials = ranged.groupBy("__pid").agg(F.sum(value_col).alias("__psum"))
    # The offset column reuses the SUM's own Spark type (long for ints,
    # double for floats, decimal(p+10, s) for decimals) so every numeric
    # value column works without lossy coercion.
    psum_type = partials.schema["__psum"].dataType
    parts = partials.collect()
    if not parts:
        return df.withColumn(out_col, F.lit(0).cast(psum_type))
    import decimal as _dec

    acc: int | float | _dec.Decimal = 0
    offsets = []
    for r in sorted(parts, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], acc))
        acc += r["__psum"] or 0
    from pyspark.sql import types as T

    def _coerce(v):
        if isinstance(psum_type, T.DecimalType):
            return _dec.Decimal(v) if not isinstance(v, _dec.Decimal) else v
        if isinstance(psum_type, (T.DoubleType, T.FloatType)):
            return float(v)
        return int(v)

    offsets = [(pid, _coerce(off)) for pid, off in offsets]
    off_df = spark.createDataFrame(
        offsets,
        T.StructType(
            [
                T.StructField("__pid", T.IntegerType()),
                T.StructField("__poff", psum_type),
            ]
        ),
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    zero = F.lit(0).cast(psum_type)
    return (
        ranged.join(F.broadcast(off_df), on="__pid")
        .withColumn(
            out_col,
            F.col("__poff") + F.coalesce(F.sum(value_col).over(w), zero),
        )
        .drop("__pid", "__poff")
    )
