"""Statistical aggregate operators (operators/stats.py) vs DuckDB
oracles on the driver's own parquet tables, plus micro semantics pins.

Same rigor as the driver gate: every oracle goes through
tools.oracle_check.assert_matches_oracle (column names -> row count ->
order-insensitive canonicalized values).
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table  # noqa: E402
from tools.oracle_check import assert_matches_oracle  # noqa: E402

SF = "/root/testdata/sf0.001"


# --- simpleLinearRegression -------------------------------------------------

_REGR_ORACLE = """
SELECT l_orderkey % 8 AS g,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
FROM lineitem GROUP BY g
"""


def test_simple_linear_regression_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stats import simple_linear_regression

    li = load_table(spark, SF, "lineitem").select(
        (F.col("l_orderkey") % 8).alias("g"), "l_quantity", "l_extendedprice"
    )
    out = simple_linear_regression(li, ["g"], "l_quantity", "l_extendedprice")
    out = out.select(
        "g",
        F.round("slope", 4).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
    )
    assert_matches_oracle(out, _REGR_ORACLE, SF)


def test_simple_linear_regression_degenerate_and_nulls(spark):
    from clickhouse_etl_spark.operators.stats import simple_linear_regression

    rows = [
        # g=1: exact line y = 2x + 3 (NULL pair rows ignored)
        (1, 0.0, 3.0), (1, 1.0, 5.0), (1, 2.0, 7.0),
        (1, None, 99.0), (1, 4.0, None),
        # g=2: single distinct x -> no line fits -> NULLs
        (2, 5.0, 1.0), (2, 5.0, 9.0),
    ]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    got = {r["g"]: (r["slope"], r["intercept"])
           for r in simple_linear_regression(df, ["g"], "x", "y").collect()}
    assert got[1] == (pytest.approx(2.0), pytest.approx(3.0))
    assert got[2] == (None, None)


# --- boundingRatio ----------------------------------------------------------

# event_id is unique -> the min/max x endpoints are tie-free, so the
# arg_min/arg_max choice is deterministic on both engines.
_BRATIO_ORACLE = """
SELECT user_id % 10 AS g,
       ROUND((arg_max(value, event_id) - arg_min(value, event_id))
             / (MAX(event_id) - MIN(event_id)), 6) AS bounding_ratio
FROM events GROUP BY g
"""


def test_bounding_ratio_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stats import bounding_ratio

    ev = load_table(spark, SF, "events").select(
        (F.col("user_id") % 10).alias("g"), "event_id", "value"
    )
    out = bounding_ratio(ev, ["g"], "event_id", "value")
    out = out.select("g", F.round("bounding_ratio", 6).alias("bounding_ratio"))
    assert_matches_oracle(out, _BRATIO_ORACLE, SF)


def test_bounding_ratio_zero_extent_and_null_x(spark):
    from clickhouse_etl_spark.operators.stats import bounding_ratio

    rows = [
        # g=1: chord (0,10) -> (10,30): slope 2
        (1, 0.0, 10.0), (1, 4.0, -5.0), (1, 10.0, 30.0),
        (1, None, 1e9),            # NULL x ignored entirely
        # g=2: single point -> zero extent -> NULL
        (2, 3.0, 7.0),
        # g=3: all x equal -> NULL
        (3, 1.0, 1.0), (3, 1.0, 2.0),
    ]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    got = {r["g"]: r["bounding_ratio"]
           for r in bounding_ratio(df, ["g"], "x", "y").collect()}
    assert got[1] == pytest.approx(2.0)
    assert got[2] is None and got[3] is None


# --- entropy ------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH cells AS (
  SELECT l_returnflag AS g, l_linestatus AS v, COUNT(*) AS c
  FROM lineitem GROUP BY g, v
)
SELECT g,
       ROUND(LOG2(SUM(c)) - SUM(c * LOG2(c)) / SUM(c), 6) AS entropy
FROM cells GROUP BY g
"""


def test_entropy_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stats import entropy

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("g"), "l_linestatus"
    )
    out = entropy(li, ["g"], "l_linestatus")
    out = out.select("g", F.round("entropy", 6).alias("entropy"))
    assert_matches_oracle(out, _ENTROPY_ORACLE, SF)


def test_entropy_micro(spark):
    from clickhouse_etl_spark.operators.stats import entropy

    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "b"),   # uniform over 2 -> 1 bit
            (2, "x"), (2, "x"), (2, "x"),             # constant -> 0 bits
            (3, "a"), (3, None)]                      # NULL is a category
    df = spark.createDataFrame(rows, "g int, v string")
    got = {r["g"]: r["entropy"] for r in entropy(df, ["g"], "v").collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0)
    assert got[3] == pytest.approx(1.0)


# --- uniqUpTo -----------------------------------------------------------

_UNIQ_UP_TO_ORACLE = """
SELECT o_orderpriority AS g,
       LEAST(COUNT(DISTINCT o_custkey), 51) AS uniq_up_to
FROM orders GROUP BY g
"""


def test_uniq_up_to_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stats import uniq_up_to

    o = load_table(spark, SF, "orders").select(
        F.col("o_orderpriority").alias("g"), "o_custkey"
    )
    out = uniq_up_to(o, ["g"], "o_custkey", 50)
    assert_matches_oracle(out, _UNIQ_UP_TO_ORACLE, SF)


def test_uniq_up_to_saturates(spark):
    from clickhouse_etl_spark.operators.stats import uniq_up_to

    rows = [(1, i) for i in range(10)] + [(2, 1), (2, 1), (2, 2)]
    df = spark.createDataFrame(rows, "g int, v int")
    got = {r["g"]: r["uniq_up_to"]
           for r in uniq_up_to(df, ["g"], "v", 3).collect()}
    assert got[1] == 4       # >3 distinct -> N+1
    assert got[2] == 2       # exact below the cap
    with pytest.raises(ValueError):
        uniq_up_to(df, ["g"], "v", 0)


# --- cramersV -----------------------------------------------------------

_CRAMERS_ORACLE = """
WITH src AS (
  SELECT o_orderpriority AS g, o_orderstatus AS a,
         CAST(o_custkey % 4 AS VARCHAR) AS b
  FROM orders WHERE o_orderstatus IS NOT NULL
), cells AS (
  SELECT g, a, b, COUNT(*) AS c FROM src GROUP BY g, a, b
), marg AS (
  SELECT g, a, b, c,
         SUM(c) OVER (PARTITION BY g, a) AS ra,
         SUM(c) OVER (PARTITION BY g, b) AS cb,
         SUM(c) OVER (PARTITION BY g) AS n
  FROM cells
)
SELECT g,
       ROUND(SQRT((SUM((c - ra*cb/n)*(c - ra*cb/n)/(ra*cb/n))
                   + (ANY_VALUE(n) - SUM(ra*cb/n)))
                  / ANY_VALUE(n)
                  / (LEAST(COUNT(DISTINCT a), COUNT(DISTINCT b)) - 1)), 6)
         AS cramers_v
FROM marg GROUP BY g
"""


def test_cramers_v_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stats import cramers_v

    o = load_table(spark, SF, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderstatus").alias("a"),
        (F.col("o_custkey") % 4).cast("string").alias("b"),
    )
    out = cramers_v(o, ["g"], "a", "b")
    out = out.select("g", F.round("cramers_v", 6).alias("cramers_v"))
    assert_matches_oracle(out, _CRAMERS_ORACLE, SF)


def test_cramers_v_extremes(spark):
    from clickhouse_etl_spark.operators.stats import cramers_v

    # g=1: b == a -> perfect association -> V = 1
    # g=2: b independent of a (balanced 2x2) -> V = 0
    # g=3: constant a -> dof 0 -> NULL
    rows = (
        [(1, x, x) for x in ["p", "q", "p", "q", "r", "r"]]
        + [(2, a, b) for a in ["x", "y"] for b in ["u", "v"]] * 2
        + [(3, "k", b) for b in ["u", "v", "u"]]
    )
    df = spark.createDataFrame(rows, "g int, a string, b string")
    got = {r["g"]: r["cramers_v"]
           for r in cramers_v(df, ["g"], "a", "b").collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0, abs=1e-12)
    assert got[3] is None


# --- contingency coefficient ----------------------------------------------

_CONTINGENCY_ORACLE = """
WITH src AS (
  SELECT o_orderpriority AS g, o_orderstatus AS a,
         CAST(o_custkey % 4 AS VARCHAR) AS b
  FROM orders WHERE o_orderstatus IS NOT NULL
), cells AS (
  SELECT g, a, b, COUNT(*) AS c FROM src GROUP BY g, a, b
), marg AS (
  SELECT g, a, b, c,
         SUM(c) OVER (PARTITION BY g, a) AS ra,
         SUM(c) OVER (PARTITION BY g, b) AS cb,
         SUM(c) OVER (PARTITION BY g) AS n
  FROM cells
), chi AS (
  SELECT g,
         SUM((c - ra*cb/n)*(c - ra*cb/n)/(ra*cb/n))
           + (ANY_VALUE(n) - SUM(ra*cb/n)) AS chi2,
         ANY_VALUE(n) AS n
  FROM marg GROUP BY g
)
SELECT g, ROUND(SQRT(chi2 / (chi2 + n)), 6) AS contingency FROM chi
"""


def test_contingency_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stats import contingency

    o = load_table(spark, SF, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderstatus").alias("a"),
        (F.col("o_custkey") % 4).cast("string").alias("b"),
    )
    out = contingency(o, ["g"], "a", "b")
    out = out.select("g", F.round("contingency", 6).alias("contingency"))
    assert_matches_oracle(out, _CONTINGENCY_ORACLE, SF)


# --- theilsU ---------------------------------------------------------------

_THEILS_ORACLE = """
WITH src AS (
  SELECT o_orderpriority AS g, o_orderstatus AS a,
         CAST(o_custkey % 4 AS VARCHAR) AS b
  FROM orders WHERE o_orderstatus IS NOT NULL
), cells AS (
  SELECT g, a, b, COUNT(*) AS c FROM src GROUP BY g, a, b
), marg AS (
  SELECT g, c,
         SUM(c) OVER (PARTITION BY g, a) AS ra,
         SUM(c) OVER (PARTITION BY g, b) AS cb,
         SUM(c) OVER (PARTITION BY g) AS n
  FROM cells
)
SELECT g,
       ROUND(((LN(ANY_VALUE(n)) - SUM(c * LN(ra)) / ANY_VALUE(n))
              - (SUM(c * LN(cb)) - SUM(c * LN(c))) / ANY_VALUE(n))
             / (LN(ANY_VALUE(n)) - SUM(c * LN(ra)) / ANY_VALUE(n)), 6)
         AS theils_u
FROM marg GROUP BY g
"""


def test_theils_u_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stats import theils_u

    o = load_table(spark, SF, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderstatus").alias("a"),
        (F.col("o_custkey") % 4).cast("string").alias("b"),
    )
    out = theils_u(o, ["g"], "a", "b")
    out = out.select("g", F.round("theils_u", 6).alias("theils_u"))
    assert_matches_oracle(out, _THEILS_ORACLE, SF)


def test_theils_u_extremes_and_asymmetry(spark):
    from clickhouse_etl_spark.operators.stats import theils_u

    # g=1: a is a function of b (but not vice versa):
    #   b in {u,v,w,x}; a = "p" for {u,v}, "q" for {w,x}
    #   -> U(a|b) = 1, U(b|a) < 1
    rows_1 = [(1, "p", "u"), (1, "p", "v"), (1, "q", "w"), (1, "q", "x")]
    # g=2: independent balanced 2x2 -> U = 0
    rows_2 = [(2, a, b) for a in ["x", "y"] for b in ["u", "v"]] * 2
    # g=3: constant a -> H(a)=0 -> NULL
    rows_3 = [(3, "k", "u"), (3, "k", "v")]
    df = spark.createDataFrame(rows_1 + rows_2 + rows_3, "g int, a string, b string")
    got = {r["g"]: r["theils_u"]
           for r in theils_u(df, ["g"], "a", "b").collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0, abs=1e-12)
    assert got[3] is None
    rev = {r["g"]: r["theils_u"]
           for r in theils_u(df, ["g"], "b", "a").collect()}
    assert rev[1] == pytest.approx(0.5)  # H(b)=2 bits, I(a;b)=1 bit


def test_contingency_perfect_association_2x2(spark):
    from clickhouse_etl_spark.operators.stats import contingency

    # perfect 2x2 association: chi2 = n -> coefficient sqrt(1/2)
    rows = [(1, x, x) for x in ["p", "q"] * 3]
    df = spark.createDataFrame(rows, "g int, a string, b string")
    got = contingency(df, ["g"], "a", "b").collect()[0]
    assert got["contingency"] == pytest.approx(math.sqrt(0.5))


# --- skew/kurt moment suite ---------------------------------------------

_MOMENTS_ORACLE = """
SELECT l_returnflag AS g,
       ROUND(skewness(l_quantity), 6) AS skew_samp,
       ROUND(kurtosis(l_quantity), 6) AS kurt_samp
FROM lineitem GROUP BY g
"""


def test_moments_suite_sample_variants_match_duckdb(spark):
    """DuckDB's skewness/kurtosis ARE the sample-corrected variants —
    a true cross-engine check of the bias-correction identities."""
    from clickhouse_etl_spark.operators.stats import moments_suite

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("g"), "l_quantity"
    )
    out = moments_suite(li, ["g"], "l_quantity").select(
        "g",
        F.round("skew_samp", 6).alias("skew_samp"),
        F.round("kurt_samp", 6).alias("kurt_samp"),
    )
    assert_matches_oracle(out, _MOMENTS_ORACLE, SF)


def test_moments_suite_small_group_nulls(spark):
    from clickhouse_etl_spark.operators.stats import moments_suite

    rows = ([(1, float(v)) for v in [1, 2, 4]]      # n=3: skew ok, kurt NULL
            + [(2, 1.0), (2, 2.0)])                 # n=2: both NULL
    df = spark.createDataFrame(rows, "g int, v double")
    got = {r["g"]: r for r in moments_suite(df, ["g"], "v").collect()}
    assert got[1]["skew_samp"] is not None
    assert got[1]["kurt_samp"] is None
    assert got[2]["skew_samp"] is None and got[2]["kurt_samp"] is None


# --- groupArraySample ------------------------------------------------------

def test_group_array_sample_deterministic_uniform(spark):
    from clickhouse_etl_spark.operators.stats import group_array_sample

    rows = ([(1, i, float(v)) for i, v in enumerate(range(100))]
            + [(2, 200, 5.0), (2, 201, None)])
    df = spark.createDataFrame(rows, "g int, id int, v double")
    a = {r["g"]: sorted(r["sample"])
         for r in group_array_sample(df, ["g"], "v", 10, "id",
                                     seed=7).collect()}
    b = {r["g"]: sorted(r["sample"])
         for r in group_array_sample(
             df.repartition(13), ["g"], "v", 10, "id", seed=7).collect()}
    assert a == b                        # partitioning-independent
    assert len(a[1]) == 10
    assert set(a[1]) <= {float(v) for v in range(100)}
    assert a[2] == [5.0]                 # NULL excluded, short group intact
    c = {r["g"]: sorted(r["sample"])
         for r in group_array_sample(df, ["g"], "v", 10, "id",
                                     seed=8).collect()}
    assert c[1] != a[1]                  # seed changes the sample
    with pytest.raises(ValueError):
        group_array_sample(df, ["g"], "v", 0, "id")


def test_group_array_sample_duplicates_sampled_by_row(spark):
    """Low-cardinality values must still sample by ROW: with 99 copies
    of 1.0 and one 2.0, a 10-sample should usually include duplicates
    of 1.0 but must NOT be systematically 10 copies of whichever value
    hashes lowest (the value-hash bug this API shape prevents)."""
    from clickhouse_etl_spark.operators.stats import group_array_sample

    rows = ([(1, i, 1.0) for i in range(99)] + [(1, 99, 2.0)]
            + [(2, i, float(i % 3)) for i in range(300)])
    df = spark.createDataFrame(rows, "g int, id int, v double")
    got = {r["g"]: r["sample"]
           for r in group_array_sample(df, ["g"], "v", 10, "id",
                                       seed=1).collect()}
    assert len(got[1]) == 10
    # group 2 has only 3 distinct values but 300 rows: a row-uniform
    # 10-sample virtually always carries at least 2 distinct values,
    # and deterministically does for this seed
    assert len(set(got[2])) >= 2


# --- exponentialTimeDecayedSum / Avg -------------------------------------

def _brute_decayed(rows, tau):
    """Reference O(n^2) decayed sums per (g, t) row."""
    out = []
    for g, t, v in rows:
        s = sum(vi * math.exp(-(t - ti) / tau)
                for gi, ti, vi in rows if gi == g and ti <= t)
        w = sum(math.exp(-(t - ti) / tau)
                for gi, ti, vi in rows if gi == g and ti <= t)
        out.append((g, t, v, s, s / w))
    return out


def test_exponential_time_decayed_sum_and_avg(spark):
    from clickhouse_etl_spark.operators.stats import (
        exponential_time_decayed_avg,
        exponential_time_decayed_sum,
    )

    rows = [(1, 0.0, 10.0), (1, 5.0, 20.0), (1, 5.0, 1.0), (1, 30.0, 4.0),
            (2, 100.0, 7.0), (2, 160.0, 3.0)]
    df = spark.createDataFrame(rows, "g int, t double, v double")
    tau = 10.0
    want = {(g, t, v): (s, a) for g, t, v, s, a in _brute_decayed(rows, tau)}

    got_sum = exponential_time_decayed_sum(df, ["g"], "t", "v", tau).collect()
    assert len(got_sum) == len(rows)
    for r in got_sum:
        assert r["decayed_sum"] == pytest.approx(
            want[(r["g"], r["t"], r["v"])][0], rel=1e-9)

    got_avg = exponential_time_decayed_avg(df, ["g"], "t", "v", tau).collect()
    for r in got_avg:
        assert r["decayed_avg"] == pytest.approx(
            want[(r["g"], r["t"], r["v"])][1], rel=1e-9)

    with pytest.raises(ValueError):
        exponential_time_decayed_sum(df, ["g"], "t", "v", 0.0)


def test_exponential_time_decayed_sum_null_rows_dropped(spark):
    from clickhouse_etl_spark.operators.stats import exponential_time_decayed_sum

    rows = [(1, 0.0, 5.0), (1, None, 9.0), (1, 1.0, None), (1, 2.0, 3.0)]
    df = spark.createDataFrame(rows, "g int, t double, v double")
    got = exponential_time_decayed_sum(df, ["g"], "t", "v", 1.0).collect()
    assert len(got) == 2
    by_t = {r["t"]: r["decayed_sum"] for r in got}
    assert by_t[0.0] == pytest.approx(5.0)
    assert by_t[2.0] == pytest.approx(3.0 + 5.0 * math.exp(-2.0))


def test_exponential_moving_average_halflife_semantics(spark):
    """A point exactly one halflife older carries exactly half the
    weight; checked against the brute 2^(-dt/h) definition."""
    from clickhouse_etl_spark.operators.stats import exponential_moving_average

    h = 10.0
    rows = [(1, 0.0, 4.0), (1, 10.0, 1.0)]
    df = spark.createDataFrame(rows, "g int, t double, v double")
    got = {r["t"]: r["ema"]
           for r in exponential_moving_average(df, ["g"], "t", "v", h).collect()}
    # at t=10: weights 0.5 (for the t=0 point) and 1.0 -> (4*0.5 + 1)/1.5
    assert got[10.0] == pytest.approx((4.0 * 0.5 + 1.0) / 1.5, rel=1e-12)
    assert got[0.0] == pytest.approx(4.0)
    with pytest.raises(ValueError):
        exponential_moving_average(df, ["g"], "t", "v", 0.0)


# --- quantileExactWeighted ------------------------------------------------

_QEW_ORACLE = """
WITH cells AS (
  SELECT l_returnflag AS g, l_extendedprice AS v, SUM(l_quantity) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity > 0
  GROUP BY g, v
), ranked AS (
  SELECT g, v,
         SUM(w) OVER (PARTITION BY g ORDER BY v) AS cum,
         SUM(w) OVER (PARTITION BY g) AS tot
  FROM cells
)
SELECT g, MIN(v) AS quantile
FROM ranked WHERE cum >= 0.5 * tot GROUP BY g
"""


def test_quantile_exact_weighted_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stats import quantile_exact_weighted

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("g"), "l_extendedprice", "l_quantity"
    )
    out = quantile_exact_weighted(
        li, ["g"], "l_extendedprice", "l_quantity", 0.5
    )
    assert_matches_oracle(out, _QEW_ORACLE, SF)


def test_quantile_exact_weighted_micro(spark):
    from clickhouse_etl_spark.operators.stats import quantile_exact_weighted

    # weights count repetitions: expanded multiset for g=1 is
    # [1,1,1,2,3,3] -> median (type-1, q=0.5 -> 3rd of 6) = 1
    rows = [(1, 1.0, 3), (1, 2.0, 1), (1, 3.0, 2),
            # zero/NULL weights ignored; g=2 is just [5]
            (2, 4.0, 0), (2, 5.0, 1), (2, 6.0, None)]
    df = spark.createDataFrame(rows, "g int, v double, w int")
    got = {r["g"]: r["quantile"]
           for r in quantile_exact_weighted(df, ["g"], "v", "w", 0.5).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(5.0)
    # q=1 -> max of the positive-weight values
    got1 = {r["g"]: r["quantile"]
            for r in quantile_exact_weighted(df, ["g"], "v", "w", 1.0).collect()}
    assert got1[1] == pytest.approx(3.0)
    with pytest.raises(ValueError):
        quantile_exact_weighted(df, ["g"], "v", "w", 1.5)
