"""Z-order layout — value oracle, clustering quality, write round-trip."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.sinks.zorder import (
    _bucket_index,
    write_zordered,
    zorder_value,
)
from tools.oracle_check import canon_rows

SF_DIR = "/root/testdata/sf0.001"

BITS = 4
# Explicit deterministic cut points (15 per column for 16 buckets).
CUTS_CUST = [float(c) for c in range(100, 1600, 100)]
CUTS_PRICE = [float(p) for p in range(20000, 320000, 20000)]


def test_zorder_value_oracle(spark):
    """Bucket fold + Morton unroll mirrored bit-for-bit in DuckDB."""
    orders = load_table(spark, SF_DIR, "orders")
    out = zorder_value(
        orders,
        ["o_custkey", "o_totalprice"],
        bits=BITS,
        boundaries={"o_custkey": CUTS_CUST, "o_totalprice": CUTS_PRICE},
    ).select("o_orderkey", "__zorder")

    def bucket_sql(col, cuts):
        return "(" + " + ".join(
            f"CASE WHEN {col} > {c} THEN 1 ELSE 0 END" for c in cuts
        ) + ")"

    ba = bucket_sql("o_custkey", CUTS_CUST)
    bb = bucket_sql("o_totalprice", CUTS_PRICE)
    morton = " | ".join(
        f"((({idx} >> {j}) & 1) << {j * 2 + c})"
        for j in range(BITS)
        for c, idx in enumerate((ba, bb))
    )
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
        )
        cur = con.execute(
            f"SELECT o_orderkey, ({morton}) AS __zorder FROM orders"
        )
        dcols, drows = [d[0] for d in cur.description], cur.fetchall()
    finally:
        con.close()
    sc, sr = canon_rows(out.columns, [tuple(r) for r in out.collect()])
    dc, dr = canon_rows(dcols, drows)
    assert sc == dc and len(sr) == len(dr)
    assert sr == dr


def _mean_partition_area(df, n_parts, order_col):
    """Average per-partition bucket-rectangle area over both dims
    (smaller = better multi-dim clustering)."""
    laid = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    stats = laid.groupBy("__pid").agg(
        (F.max("__ba") - F.min("__ba") + 1).alias("ra"),
        (F.max("__bb") - F.min("__bb") + 1).alias("rb"),
    )
    return stats.agg(F.avg(F.col("ra") * F.col("rb"))).first()[0]


def test_zorder_beats_lexicographic_clustering(spark):
    """Files from the z-layout cover much smaller rectangles of the
    2-D bucket space than a single-column sort -> min/max stats prune
    on BOTH dimensions."""
    orders = load_table(spark, SF_DIR, "orders")
    bounds = {"o_custkey": CUTS_CUST, "o_totalprice": CUTS_PRICE}
    base = (
        zorder_value(orders, ["o_custkey", "o_totalprice"], bits=BITS,
                     boundaries=bounds)
        .withColumn("__ba", _bucket_index("o_custkey", CUTS_CUST))
        .withColumn("__bb", _bucket_index("o_totalprice", CUTS_PRICE))
    )
    z_area = _mean_partition_area(base, 16, "__zorder")
    sort_area = _mean_partition_area(base, 16, "o_custkey")
    # Lexicographic: each file spans ~1 bucket of custkey but ALL 16 of
    # price (area ~16). Z-order: balanced rectangles (~4x4 worst case).
    assert z_area < sort_area * 0.75, (z_area, sort_area)


def test_write_zordered_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_z")
    write_zordered(orders, path, ["o_custkey", "o_totalprice"], n_files=8,
                   bits=BITS)
    back = spark.read.parquet(path)
    assert back.columns == orders.columns
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_orderkey"), F.sum("o_totalprice")).first()
    b = back.agg(F.sum("o_orderkey"), F.sum("o_totalprice")).first()
    assert a[0] == b[0]
    assert abs(a[1] - b[1]) < 1e-6 * abs(a[1])  # double sum is order-dependent
    import glob

    assert len(glob.glob(f"{path}/part-*.parquet")) == 8


def test_too_many_boundaries_rejected(spark):
    """Cut lists past 2**bits - 1 would silently fold high buckets onto
    low ones in the Morton code — refused instead."""
    import pytest

    orders = load_table(spark, SF_DIR, "orders")
    with pytest.raises(ValueError, match="cut points"):
        zorder_value(
            orders,
            ["o_custkey", "o_totalprice"],
            bits=BITS,
            boundaries={"o_custkey": [float(i) for i in range(30)],
                        "o_totalprice": CUTS_PRICE},
        )


def test_zorder_plan_no_python(spark):
    orders = load_table(spark, SF_DIR, "orders")
    plan = (
        zorder_value(orders, ["o_custkey", "o_totalprice"], bits=BITS,
                     boundaries={"o_custkey": CUTS_CUST,
                                 "o_totalprice": CUTS_PRICE})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
