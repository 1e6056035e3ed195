"""min/max map aggregates and the correlation matrix vs DuckDB oracles
and numpy references.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table  # noqa: E402
from tools.oracle_check import assert_matches_oracle  # noqa: E402

SF = "/root/testdata/sf0.001"


def _kv_df(spark):
    rows = [
        (1, ["a", "b"], [3.0, 1.0]),
        (1, ["b", "c"], [5.0, -2.0]),
        (1, ["a"], [7.0]),
        (1, None, None),          # contributes nothing
        (2, ["z"], [0.0]),
    ]
    return spark.createDataFrame(
        rows, "g int, ks array<string>, vs array<double>"
    )


def test_min_max_map_micro(spark):
    from clickhouse_etl_spark.operators.aggregates import max_map, min_map

    df = _kv_df(spark)
    mn = {r["g"]: (r["keys"], r["values"])
          for r in min_map(df, ["g"], "ks", "vs").collect()}
    mx = {r["g"]: (r["keys"], r["values"])
          for r in max_map(df, ["g"], "ks", "vs").collect()}
    assert mn[1] == (["a", "b", "c"], [3.0, 1.0, -2.0])
    assert mx[1] == (["a", "b", "c"], [7.0, 5.0, -2.0])
    # zero minimum survives (no sumMap-style compaction)
    assert mn[2] == (["z"], [0.0])


def test_min_map_length_mismatch_raises(spark):
    from clickhouse_etl_spark.operators.aggregates import min_map

    df = spark.createDataFrame(
        [(1, ["a", "b"], [1.0])], "g int, ks array<string>, vs array<double>"
    )
    with pytest.raises(Exception, match="lengths"):
        min_map(df, ["g"], "ks", "vs").collect()


_MINMAP_ORACLE = """
WITH entries AS (
  SELECT o_orderpriority AS g, o_orderstatus AS k, o_totalprice AS v
  FROM orders
), per_key AS (
  SELECT g, k, MIN(v) AS mn FROM entries GROUP BY g, k
)
SELECT g,
       list(k ORDER BY k) AS keys,
       list(ROUND(mn, 4) ORDER BY k) AS values
FROM per_key GROUP BY g
"""


def test_min_map_matches_duckdb(spark):
    """Single-entry maps (one key/value per row) make the parquet
    tables usable as *Map inputs without synthesizing arrays in SQL."""
    from clickhouse_etl_spark.operators.aggregates import min_map

    o = load_table(spark, SF, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.array("o_orderstatus").alias("ks"),
        F.array("o_totalprice").alias("vs"),
    )
    out = min_map(o, ["g"], "ks", "vs")
    out = out.select(
        "g", "keys", F.transform("values", lambda v: F.round(v, 4)).alias("values")
    )
    assert_matches_oracle(out, _MINMAP_ORACLE, SF)


def test_corr_matrix_matches_numpy(spark):
    from clickhouse_etl_spark.operators.stats import corr_matrix

    rng = np.random.RandomState(4)
    a = rng.uniform(0, 1, 60)
    b = 2 * a + rng.normal(0, 0.1, 60)
    c = rng.uniform(-1, 1, 60)
    rows = [(1, float(x), float(y), float(z)) for x, y, z in zip(a, b, c)]
    df = spark.createDataFrame(rows, "g int, a double, b double, c double")
    got = corr_matrix(df, ["g"], ["a", "b", "c"]).collect()[0]["matrix"]
    want = np.corrcoef(np.vstack([a, b, c]))
    for i in range(3):
        for j in range(3):
            assert got[i][j] == pytest.approx(want[i, j], abs=1e-12)
    with pytest.raises(ValueError):
        corr_matrix(df, ["g"], ["a"])


def test_corr_matrix_constant_column_null(spark):
    from clickhouse_etl_spark.operators.stats import corr_matrix

    rows = [(1, float(i), 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "g int, a double, k double")
    m = corr_matrix(df, ["g"], ["a", "k"]).collect()[0]["matrix"]
    assert m[0][0] == pytest.approx(1.0)
    assert m[0][1] is None and m[1][1] is None  # no variance -> NULL


_CORRM_ORACLE = """
SELECT l_returnflag AS g,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS c01,
       ROUND(CORR(l_quantity, l_discount), 6) AS c02,
       ROUND(CORR(l_extendedprice, l_discount), 6) AS c12
FROM lineitem GROUP BY g
"""


def test_corr_matrix_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stats import corr_matrix

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        "l_quantity", "l_extendedprice", "l_discount",
    )
    out = corr_matrix(li, ["g"], ["l_quantity", "l_extendedprice", "l_discount"])
    out = out.select(
        "g",
        F.round(F.col("matrix")[0][1], 6).alias("c01"),
        F.round(F.col("matrix")[0][2], 6).alias("c02"),
        F.round(F.col("matrix")[1][2], 6).alias("c12"),
    )
    assert_matches_oracle(out, _CORRM_ORACLE, SF)


_COVARM_ORACLE = """
SELECT l_returnflag AS g,
       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS c01,
       ROUND(COVAR_POP(l_quantity, l_extendedprice), 4) AS p01,
       ROUND(VAR_SAMP(l_quantity), 6) AS v00
FROM lineitem GROUP BY g
"""


def test_covar_matrix_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stats import covar_matrix

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("g"), "l_quantity", "l_extendedprice"
    )
    samp = covar_matrix(li, ["g"], ["l_quantity", "l_extendedprice"])
    pop = covar_matrix(li, ["g"], ["l_quantity", "l_extendedprice"],
                       sample=False)
    out = samp.alias("s").join(pop.alias("p"), on="g").select(
        "g",
        F.round(F.col("s.matrix")[0][1], 4).alias("c01"),
        F.round(F.col("p.matrix")[0][1], 4).alias("p01"),
        # diagonal of the sample covariance matrix IS the variance
        F.round(F.col("s.matrix")[0][0], 6).alias("v00"),
    )
    assert_matches_oracle(out, _COVARM_ORACLE, SF)


def test_cramers_v_bias_corrected(spark):
    from clickhouse_etl_spark.operators.stats import cramers_v

    # small sample, many categories: correction must pull V down,
    # and independent-ish data can hit the max(0, .) floor -> 0
    rows = [(1, str(i % 5), str((i * 7) % 4)) for i in range(40)]
    df = spark.createDataFrame(rows, "g int, a string, b string")
    plain = cramers_v(df, ["g"], "a", "b").collect()[0]["cramers_v"]
    corr = cramers_v(df, ["g"], "a", "b",
                     bias_corrected=True).collect()[0]["cramers_v"]
    assert corr is not None and corr <= plain

    # perfect association stays (near) 1 under the correction
    perf = [(1, x, x) for x in ["p", "q", "r"] * 30]
    dfp = spark.createDataFrame(perf, "g int, a string, b string")
    got = cramers_v(dfp, ["g"], "a", "b",
                    bias_corrected=True).collect()[0]["cramers_v"]
    assert got == pytest.approx(1.0, abs=0.02)


# --- quantilesExactWeighted (multi-q) ----------------------------------------

_QSEW_ORACLE = """
WITH cells AS (
  SELECT l_returnflag AS g, l_extendedprice AS v, SUM(l_quantity) AS w
  FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_quantity > 0
  GROUP BY g, v
), ranked AS (
  SELECT g, v,
         SUM(w) OVER (PARTITION BY g ORDER BY v) AS cum,
         SUM(w) OVER (PARTITION BY g) AS tot
  FROM cells
)
SELECT g,
       MIN(CASE WHEN cum >= 0.25 * tot THEN v END) AS q25,
       MIN(CASE WHEN cum >= 0.5 * tot THEN v END) AS q50,
       MIN(CASE WHEN cum >= 0.95 * tot THEN v END) AS q95
FROM ranked GROUP BY g
"""


def test_quantiles_exact_weighted_multi_q(spark):
    from clickhouse_etl_spark.operators.stats import (
        quantile_exact_weighted,
        quantiles_exact_weighted,
    )

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("g"), "l_extendedprice", "l_quantity"
    )
    out = quantiles_exact_weighted(
        li, ["g"], "l_extendedprice", "l_quantity", [0.25, 0.5, 0.95]
    )
    flat = out.select(
        "g",
        F.col("quantiles")[0].alias("q25"),
        F.col("quantiles")[1].alias("q50"),
        F.col("quantiles")[2].alias("q95"),
    )
    assert_matches_oracle(flat, _QSEW_ORACLE, SF)
    # consistency with the single-q operator
    single = {r["g"]: r["quantile"] for r in quantile_exact_weighted(
        li, ["g"], "l_extendedprice", "l_quantity", 0.5).collect()}
    for r in out.collect():
        assert r["quantiles"][1] == single[r["g"]]
    with pytest.raises(ValueError):
        quantiles_exact_weighted(li, ["g"], "l_extendedprice", "l_quantity", [])


# --- sparkbar ----------------------------------------------------------------

def test_sparkbar_shape_and_scaling(spark):
    from clickhouse_etl_spark.operators.grouped import sparkbar

    # 4 buckets over [0, 4): counts 8, 4, 0, 1 -> full, half-ish, gap, low
    rows = ([(1, 0.5)] * 8 + [(1, 1.5)] * 4 + [(1, 3.5)] * 1)
    df = spark.createDataFrame(rows, "g int, v double")
    got = sparkbar(df, "v", buckets=4, group_cols=["g"],
                   lo=0.0, hi=4.0).collect()[0]["sparkbar"]
    assert len(got) == 4
    assert got[0] == "█"          # max bucket -> full block
    assert got[2] == " "          # empty bucket -> space
    assert got[1] == "▄"          # ceil(8*4/8) = 4th glyph
    assert got[3] == "▁"          # ceil(8*1/8) = 1st glyph


def test_sparkbar_groups_independent(spark):
    from clickhouse_etl_spark.operators.grouped import sparkbar

    rows = [(g, float(v)) for g in (1, 2) for v in range(10)]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {r["g"]: r["sparkbar"]
           for r in sparkbar(df, "v", buckets=5, group_cols=["g"],
                             lo=0.0, hi=10.0).collect()}
    # uniform distribution -> all full blocks, identical per group
    assert got[1] == got[2] == "█████"


def test_sparkbar_auto_bounds_are_per_group(spark):
    """Each group bins over its OWN min/max: a group living at
    [1000, 1010] must show its shape, not one spike in a global
    [0, 1010] range."""
    from clickhouse_etl_spark.operators.grouped import sparkbar

    rows = ([(1, float(v)) for v in range(11)]
            + [(2, 1000.0 + float(v)) for v in range(11)])
    df = spark.createDataFrame(rows, "g int, v double")
    got = {r["g"]: r["sparkbar"]
           for r in sparkbar(df, "v", buckets=5, group_cols=["g"]).collect()}
    # both uniform over their own ranges -> no empty buckets anywhere
    assert " " not in got[1] and " " not in got[2]
    assert len(got[1]) == len(got[2]) == 5
    with pytest.raises(ValueError):
        sparkbar(df, "v", buckets=0, group_cols=["g"])
    with pytest.raises(ValueError):
        sparkbar(df, "v", buckets=5, group_cols=["g"], lo=0.0)
