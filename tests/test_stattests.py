"""Hypothesis-test operators (operators/stattests.py): p-value numerics
pinned to textbook critical values, statistics pinned to brute-force
pure-Python references, and DuckDB value-hash oracles for the
SQL-expressible parts (U statistic, rank correlation).
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


# --- p-value numerics ------------------------------------------------------

def test_betainc_closed_form():
    from clickhouse_etl_spark.operators.stattests import _betainc

    # Beta(2,3) CDF has the closed form 6x^2 - 8x^3 + 3x^4
    for x in [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]:
        want = 6 * x**2 - 8 * x**3 + 3 * x**4
        assert _betainc(2.0, 3.0, x) == pytest.approx(want, abs=1e-12)
    # symmetry I_x(a,b) = 1 - I_{1-x}(b,a)
    assert _betainc(3.7, 1.2, 0.3) == pytest.approx(
        1.0 - _betainc(1.2, 3.7, 0.7), abs=1e-12)


def test_tail_functions_hit_textbook_critical_values():
    from clickhouse_etl_spark.operators.stattests import (
        _kolmogorov_sf, _norm_two_sided_p, _t_two_sided_p)

    # t_{0.025, 10} = 2.228139 -> two-sided p = 0.05
    assert _t_two_sided_p(2.228139, 10.0) == pytest.approx(0.05, abs=2e-4)
    # dof -> inf converges to the normal tail
    assert _t_two_sided_p(1.959964, 1e7) == pytest.approx(0.05, abs=1e-4)
    # z_{0.025} = 1.959964
    assert _norm_two_sided_p(1.959964) == pytest.approx(0.05, abs=1e-6)
    # Kolmogorov two-sided critical value at alpha = 0.05 is 1.358
    assert _kolmogorov_sf(1.358) == pytest.approx(0.05, abs=1e-3)
    assert _kolmogorov_sf(0.0) == 1.0
    # small-lam branch: K CDF at 0.5 is 0.0361 (table) -> tail 0.9639
    assert _kolmogorov_sf(0.5) == pytest.approx(0.9639, abs=1e-3)
    assert _kolmogorov_sf(0.02) == pytest.approx(1.0, abs=1e-12)
    # the two expansions agree AT the same point (1.0 < 1.18 uses the
    # theta form; the alternating series is computed here directly)
    alt = sum(2.0 * (-1.0) ** (k - 1) * math.exp(-2.0 * k * k)
              for k in range(1, 30))
    assert _kolmogorov_sf(1.0) == pytest.approx(alt, abs=1e-7)


# --- Student / Welch t-tests ------------------------------------------------

_SAMPLE_A = [27.5, 21.0, 19.0, 23.6, 17.0, 17.9, 16.9, 20.1, 21.9, 22.6]
_SAMPLE_B = [27.1, 22.0, 20.8, 23.4, 23.4, 23.5, 25.8, 22.0, 24.8, 20.2]


def _brute_t(a, b, pooled):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    if pooled:
        dof = na + nb - 2
        sp2 = ((na - 1) * va + (nb - 1) * vb) / dof
        t = (ma - mb) / math.sqrt(sp2 * (1 / na + 1 / nb))
    else:
        se = va / na + vb / nb
        t = (ma - mb) / math.sqrt(se)
        dof = se * se / (va**2 / (na**2 * (na - 1)) + vb**2 / (nb**2 * (nb - 1)))
    return t, dof


@pytest.mark.parametrize("pooled", [True, False])
def test_t_tests_match_brute_force(spark, pooled):
    from clickhouse_etl_spark.operators.stattests import (
        _t_two_sided_p, student_t_test, welch_t_test)

    rows = ([(1, 0, x) for x in _SAMPLE_A] + [(1, 1, x) for x in _SAMPLE_B]
            # g=2: one sample missing -> NULLs
            + [(2, 0, x) for x in _SAMPLE_A])
    df = spark.createDataFrame(rows, "g int, ix int, v double")
    fn = student_t_test if pooled else welch_t_test
    got = {r["g"]: r for r in fn(df, ["g"], "v", "ix").collect()}

    t_want, dof_want = _brute_t(_SAMPLE_A, _SAMPLE_B, pooled)
    assert got[1]["t_stat"] == pytest.approx(t_want, rel=1e-12)
    assert got[1]["dof"] == pytest.approx(dof_want, rel=1e-12)
    assert got[1]["p_value"] == pytest.approx(
        _t_two_sided_p(t_want, dof_want), rel=1e-9)
    assert got[2]["t_stat"] is None and got[2]["p_value"] is None


def test_t_test_null_and_bad_index_rows_ignored(spark):
    from clickhouse_etl_spark.operators.stattests import student_t_test

    rows = ([(1, 0, x) for x in _SAMPLE_A] + [(1, 1, x) for x in _SAMPLE_B]
            + [(1, None, 99.0), (1, 2, 99.0), (1, 0, None)])
    df = spark.createDataFrame(rows, "g int, ix int, v double")
    t_want, _ = _brute_t(_SAMPLE_A, _SAMPLE_B, True)
    got = student_t_test(df, ["g"], "v", "ix").collect()[0]
    assert got["t_stat"] == pytest.approx(t_want, rel=1e-12)


def test_t_critical_matches_tables():
    from clickhouse_etl_spark.operators.stattests import _t_critical

    # t_{0.025, 10} = 2.228139; t_{0.025, inf} -> z = 1.959964
    assert _t_critical(10.0, 0.95) == pytest.approx(2.228139, abs=1e-5)
    assert _t_critical(1e7, 0.95) == pytest.approx(1.959964, abs=1e-4)
    assert _t_critical(5.0, 0.99) == pytest.approx(4.032143, abs=1e-5)


def test_t_test_confidence_interval(spark):
    from clickhouse_etl_spark.operators.stattests import (
        _t_critical, student_t_test, welch_t_test)

    rows = [(1, 0, x) for x in _SAMPLE_A] + [(1, 1, x) for x in _SAMPLE_B]
    df = spark.createDataFrame(rows, "g int, ix int, v double")
    for fn, pooled in [(student_t_test, True), (welch_t_test, False)]:
        got = fn(df, ["g"], "v", "ix", confidence=0.95).collect()[0]
        t_want, dof = _brute_t(_SAMPLE_A, _SAMPLE_B, pooled)
        na, nb = len(_SAMPLE_A), len(_SAMPLE_B)
        ma = sum(_SAMPLE_A) / na
        mb = sum(_SAMPLE_B) / nb
        se = (ma - mb) / t_want
        tc = _t_critical(dof, 0.95)
        assert got["ci_low"] == pytest.approx((ma - mb) - tc * se, rel=1e-9)
        assert got["ci_high"] == pytest.approx((ma - mb) + tc * se, rel=1e-9)
        # the 95% CI excludes 0 exactly when p < 0.05
        excludes = got["ci_low"] > 0 or got["ci_high"] < 0
        assert excludes == (got["p_value"] < 0.05)


# --- meanZTest ---------------------------------------------------------------

def test_mean_z_test(spark):
    from clickhouse_etl_spark.operators.stattests import (
        _norm_two_sided_p, mean_z_test)

    rows = [(1, 0, x) for x in _SAMPLE_A] + [(1, 1, x) for x in _SAMPLE_B]
    df = spark.createDataFrame(rows, "g int, ix int, v double")
    va, vb = 9.0, 4.0
    got = mean_z_test(df, ["g"], "v", "ix", va, vb).collect()[0]
    ma = sum(_SAMPLE_A) / len(_SAMPLE_A)
    mb = sum(_SAMPLE_B) / len(_SAMPLE_B)
    z = (ma - mb) / math.sqrt(va / len(_SAMPLE_A) + vb / len(_SAMPLE_B))
    assert got["z_stat"] == pytest.approx(z, rel=1e-12)
    assert got["p_value"] == pytest.approx(_norm_two_sided_p(z), rel=1e-9)
    with pytest.raises(ValueError):
        mean_z_test(df, ["g"], "v", "ix", 0.0, 1.0)

    # CI: diff +- 1.959964 * se at 95%
    ci = mean_z_test(df, ["g"], "v", "ix", va, vb,
                     confidence=0.95).collect()[0]
    se = math.sqrt(va / len(_SAMPLE_A) + vb / len(_SAMPLE_B))
    assert ci["ci_low"] == pytest.approx(ma - mb - 1.959964 * se, abs=1e-5)
    assert ci["ci_high"] == pytest.approx(ma - mb + 1.959964 * se, abs=1e-5)
    with pytest.raises(ValueError):
        mean_z_test(df, ["g"], "v", "ix", va, vb, confidence=1.5)


# --- proportionsZTest ---------------------------------------------------------

def test_proportions_z_test(spark):
    from clickhouse_etl_spark.operators.stattests import (
        _norm_two_sided_p, proportions_z_test)

    # sample 0: 40/100 convert; sample 1: 25/100
    rows = ([(1, 0, 1)] * 40 + [(1, 0, 0)] * 60
            + [(1, 1, 1)] * 25 + [(1, 1, 0)] * 75)
    df = spark.createDataFrame(rows, "g int, ix int, s int")
    got = proportions_z_test(df, ["g"], "s", "ix",
                             confidence=0.95).collect()[0]
    p0, p1, n = 0.40, 0.25, 100
    pp = (40 + 25) / 200
    z = (p0 - p1) / math.sqrt(pp * (1 - pp) * (2 / n))
    assert got["p0"] == pytest.approx(p0)
    assert got["p1"] == pytest.approx(p1)
    assert got["z_stat"] == pytest.approx(z, rel=1e-12)
    assert got["p_value"] == pytest.approx(_norm_two_sided_p(z), rel=1e-9)
    se = math.sqrt(p0 * (1 - p0) / n + p1 * (1 - p1) / n)
    assert got["ci_low"] == pytest.approx(0.15 - 1.959964 * se, abs=1e-5)
    assert got["ci_high"] == pytest.approx(0.15 + 1.959964 * se, abs=1e-5)

    # unpooled variant uses the per-sample variances in z
    up = proportions_z_test(df, ["g"], "s", "ix", pooled=False).collect()[0]
    assert up["z_stat"] == pytest.approx((p0 - p1) / se, rel=1e-12)
    with pytest.raises(ValueError):
        proportions_z_test(df, ["g"], "s", "ix", confidence=2.0)


def test_proportions_z_test_degenerate(spark):
    from clickhouse_etl_spark.operators.stattests import proportions_z_test

    # all-converted in both samples -> pooled variance 0 -> NULL z
    rows = [(1, 0, 1)] * 5 + [(1, 1, 1)] * 5
    df = spark.createDataFrame(rows, "g int, ix int, s int")
    got = proportions_z_test(df, ["g"], "s", "ix").collect()[0]
    assert got["z_stat"] is None and got["p_value"] is None
    assert got["p0"] == 1.0 and got["p1"] == 1.0


# --- sample-size calculators -----------------------------------------------

def test_min_sample_sizes_match_textbook():
    from clickhouse_etl_spark.operators.stattests import (
        min_sample_size_continuous, min_sample_size_conversion)

    # baseline 10%, +2pp uplift, 80% power, 5% alpha — pinned TIGHT to
    # the documented formula (a looser pin would also pass Evan
    # Miller's split-sqrt variant, ~3841, the exact drift to police):
    # (1.959964 + 0.841621)^2 * (0.09 + 0.1056) / 0.0004 = 3838.07
    n = min_sample_size_conversion(0.10, 0.02)
    assert n == pytest.approx(3838.07, rel=1e-4)
    # continuous: sigma=1, mde=0.1 -> 2 * 2.801585^2 * 100 = 1569.78
    n2 = min_sample_size_continuous(1.0, 0.1)
    assert n2 == pytest.approx(1569.78, rel=1e-4)
    # detecting a larger effect needs fewer samples
    assert min_sample_size_continuous(1.0, 0.2) < n2
    with pytest.raises(ValueError):
        min_sample_size_conversion(0.99, 0.02)
    with pytest.raises(ValueError):
        min_sample_size_continuous(0.0, 0.1)


# --- one-way ANOVA -------------------------------------------------------------

def _brute_anova(groups):
    """Textbook one-way ANOVA from raw per-category samples."""
    k = len(groups)
    n = sum(len(g) for g in groups)
    grand = sum(sum(g) for g in groups) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups)
    ssw = sum(sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups)
    return (ssb / (k - 1)) / (ssw / (n - k)), k - 1, n - k


def test_one_way_anova_matches_brute_force(spark):
    from clickhouse_etl_spark.operators.stattests import _f_sf, one_way_anova

    groups = {
        "a": [6.0, 8.0, 4.0, 5.0, 3.0, 4.0],
        "b": [8.0, 12.0, 9.0, 11.0, 6.0, 8.0],
        "c": [13.0, 9.0, 11.0, 8.0, 7.0, 12.0],
    }
    rows = ([(1, lab, x) for lab, g in groups.items() for x in g]
            # g=2: single category -> NULL
            + [(2, "only", x) for x in [1.0, 2.0, 3.0]])
    df = spark.createDataFrame(rows, "g int, lab string, v double")
    got = {r["g"]: r for r in one_way_anova(df, ["g"], "v", "lab").collect()}
    f_want, d1, d2 = _brute_anova(list(groups.values()))
    assert got[1]["f_stat"] == pytest.approx(f_want, rel=1e-12)
    assert (got[1]["d1"], got[1]["d2"]) == (float(d1), float(d2))
    assert got[1]["p_value"] == pytest.approx(_f_sf(f_want, d1, d2), rel=1e-9)
    assert got[2]["f_stat"] is None and got[2]["p_value"] is None


def test_f_tail_textbook_critical_value():
    from clickhouse_etl_spark.operators.stattests import _f_sf

    # F_{0.05}(2, 12) = 3.885 (standard table) -> tail = 0.05
    assert _f_sf(3.885, 2, 12) == pytest.approx(0.05, abs=5e-4)
    # F tail at 0 is 1; consistency with the t-test: F(1, d) = T(d)^2
    assert _f_sf(0.0, 3, 7) == pytest.approx(1.0)
    from clickhouse_etl_spark.operators.stattests import _t_two_sided_p
    assert _f_sf(2.5**2, 1.0, 9.0) == pytest.approx(
        _t_two_sided_p(2.5, 9.0), rel=1e-12)


_ANOVA_ORACLE = """
WITH per_cat AS (
  SELECT l_returnflag AS g, l_linestatus AS lab,
         COUNT(l_quantity) AS ng, AVG(l_quantity) AS mg,
         VAR_SAMP(l_quantity) AS vg
  FROM lineitem WHERE l_quantity IS NOT NULL AND l_linestatus IS NOT NULL
  GROUP BY g, lab
)
SELECT g,
       ROUND(((SUM(ng*mg*mg) - SUM(ng)*POW(SUM(ng*mg)/SUM(ng), 2))
              / (COUNT(*) - 1))
             / (SUM(CASE WHEN ng > 1 THEN (ng-1)*vg ELSE 0 END)
                / (SUM(ng) - COUNT(*))), 6) AS f_stat
FROM per_cat GROUP BY g HAVING COUNT(*) >= 2
"""


def test_one_way_anova_equal_means_p_is_one(spark):
    """All category means identical (non-representable 0.1 values):
    float cancellation must not push ssb negative -> p NaN; the clamp
    yields F ~ 0 and p ~ 1."""
    from clickhouse_etl_spark.operators.stattests import one_way_anova

    sample = [0.1, 0.2, 0.3, 0.1, 0.2, 0.3, 0.7]
    rows = [(1, lab, v) for lab in ["a", "b", "c"] for v in sample]
    df = spark.createDataFrame(rows, "g int, lab string, v double")
    got = one_way_anova(df, ["g"], "v", "lab").collect()[0]
    assert got["f_stat"] == pytest.approx(0.0, abs=1e-9)
    assert got["p_value"] == pytest.approx(1.0, abs=1e-9)


def test_one_way_anova_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stattests import one_way_anova

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("g"), "l_quantity", "l_linestatus"
    )
    out = one_way_anova(li, ["g"], "l_quantity", "l_linestatus")
    out = out.select("g", F.round("f_stat", 6).alias("f_stat"))
    assert_matches_oracle(out, _ANOVA_ORACLE, SF)


# --- Mann-Whitney U ----------------------------------------------------------

def _brute_u(a, b):
    """Exact pair-count U for sample a (ties count 1/2)."""
    return sum(1.0 if x > y else 0.5 if x == y else 0.0 for x in a for y in b)


def test_mann_whitney_matches_pair_count(spark):
    from clickhouse_etl_spark.operators.stattests import mann_whitney_u_test

    a = [1.0, 2.0, 2.0, 5.0, 7.0, 7.0, 9.0]
    b = [2.0, 3.0, 3.0, 6.0, 7.0, 10.0]
    rows = [(1, 0, x) for x in a] + [(1, 1, x) for x in b]
    df = spark.createDataFrame(rows, "g int, ix int, v double")
    got = mann_whitney_u_test(df, ["g"], "v", "ix").collect()[0]
    assert got["u_stat"] == pytest.approx(_brute_u(a, b))
    assert 0.0 <= got["p_value"] <= 1.0

    # z sign: u0 below its mean -> negative z
    mean_u = len(a) * len(b) / 2.0
    assert (got["z_stat"] < 0) == (_brute_u(a, b) < mean_u)


_MWU_ORACLE = """
WITH src AS (
  SELECT event_type AS g, value AS v, user_id % 2 AS ix
  FROM events WHERE value IS NOT NULL
), cells AS (
  SELECT g, v,
         SUM(CASE WHEN ix = 0 THEN 1 ELSE 0 END) AS c0,
         SUM(CASE WHEN ix = 1 THEN 1 ELSE 0 END) AS c1
  FROM src GROUP BY g, v
), ranked AS (
  SELECT g, c0, c1, c0 + c1 AS c,
         SUM(c0 + c1) OVER (PARTITION BY g ORDER BY v) AS cum
  FROM cells
)
SELECT g,
       ROUND(SUM(c0 * (cum - c + (c + 1) / 2.0))
             - SUM(c0) * (SUM(c0) + 1) / 2.0, 4) AS u_stat
FROM ranked GROUP BY g
"""


def test_mann_whitney_u_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stattests import mann_whitney_u_test

    ev = load_table(spark, SF, "events").select(
        F.col("event_type").alias("g"),
        "value",
        (F.col("user_id") % 2).alias("ix"),
    )
    out = mann_whitney_u_test(ev, ["g"], "value", "ix")
    out = out.select("g", F.round("u_stat", 4).alias("u_stat"))
    assert_matches_oracle(out, _MWU_ORACLE, SF)


# --- Kolmogorov-Smirnov -------------------------------------------------------

def _brute_ks(a, b):
    xs = sorted(set(a) | set(b))
    return max(
        abs(sum(1 for x in a if x <= t) / len(a)
            - sum(1 for y in b if y <= t) / len(b))
        for t in xs
    )


def test_ks_matches_brute_ecdf(spark):
    from clickhouse_etl_spark.operators.stattests import (
        _kolmogorov_sf, kolmogorov_smirnov_test)

    a = [0.1, 0.5, 0.5, 1.2, 3.0, 3.3, 4.4, 5.0]
    b = [0.4, 0.9, 2.2, 2.2, 3.1, 6.0]
    rows = [(1, 0, x) for x in a] + [(1, 1, x) for x in b]
    df = spark.createDataFrame(rows, "g int, ix int, v double")
    got = kolmogorov_smirnov_test(df, ["g"], "v", "ix").collect()[0]
    d = _brute_ks(a, b)
    assert got["d_stat"] == pytest.approx(d, rel=1e-12)
    lam = math.sqrt(len(a) * len(b) / (len(a) + len(b))) * d
    assert got["p_value"] == pytest.approx(_kolmogorov_sf(lam), rel=1e-9)


def test_ks_identical_samples_gives_p_one_when_interleaved(spark):
    from clickhouse_etl_spark.operators.stattests import kolmogorov_smirnov_test

    # identical value multisets -> ECDFs coincide at every jump -> D = 0
    a = [1.0, 2.0, 3.0, 4.0]
    rows = [(1, 0, x) for x in a] + [(1, 1, x) for x in a]
    df = spark.createDataFrame(rows, "g int, ix int, v double")
    got = kolmogorov_smirnov_test(df, ["g"], "v", "ix").collect()[0]
    assert got["d_stat"] == pytest.approx(0.0)
    assert got["p_value"] == pytest.approx(1.0)


# --- Spearman rank correlation ------------------------------------------------

def _brute_spearman(pairs):
    def midranks(vals):
        s = sorted(vals)
        return {  # midrank per value
            v: (s.index(v) + 1 + len(s) - 1 - s[::-1].index(v) + 1) / 2.0
            for v in set(vals)
        }
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    rx_map, ry_map = midranks(xs), midranks(ys)
    rx = [rx_map[x] for x in xs]
    ry = [ry_map[y] for y in ys]
    n = len(pairs)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    return cov / math.sqrt(vx * vy)


def test_spearman_matches_brute_midranks(spark):
    from clickhouse_etl_spark.operators.stattests import spearman_rank_corr

    pairs = [(1.0, 2.0), (2.0, 1.0), (2.0, 4.0), (3.0, 3.0),
             (5.0, 8.0), (5.0, 8.0), (7.0, 6.0)]
    rows = [(1, x, y) for x, y in pairs] + [(2, 1.0, 5.0), (2, 1.0, 9.0)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    got = {r["g"]: r["rank_corr"]
           for r in spearman_rank_corr(df, ["g"], "x", "y").collect()}
    assert got[1] == pytest.approx(_brute_spearman(pairs), rel=1e-12)
    assert got[2] is None  # constant x -> undefined


_SPEARMAN_ORACLE = """
WITH src AS (
  SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y
  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
), ranked AS (
  SELECT g,
         RANK() OVER (PARTITION BY g ORDER BY x)
           + (COUNT(*) OVER (PARTITION BY g, x) - 1) / 2.0 AS rx,
         RANK() OVER (PARTITION BY g ORDER BY y)
           + (COUNT(*) OVER (PARTITION BY g, y) - 1) / 2.0 AS ry
  FROM src
)
SELECT g, ROUND(CORR(rx, ry), 6) AS rank_corr
FROM ranked GROUP BY g
"""


def test_spearman_matches_duckdb(spark):
    from clickhouse_etl_spark.operators.stattests import spearman_rank_corr

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("g"), "l_quantity", "l_extendedprice"
    )
    out = spearman_rank_corr(li, ["g"], "l_quantity", "l_extendedprice")
    out = out.select("g", F.round("rank_corr", 6).alias("rank_corr"))
    assert_matches_oracle(out, _SPEARMAN_ORACLE, SF)


def test_rank_corr_null_key_group_kept(spark):
    """r7 self-review: the cell rebuild's midrank joins must be
    null-safe — a NULL group key is a legitimate group (groupBy
    semantics) and must appear in the output, as it did in the old
    window form."""
    from clickhouse_etl_spark.operators.stattests import spearman_rank_corr

    rows = [(None, 1.0, 2.0), (None, 2.0, 4.0), (None, 3.0, 5.0),
            ("a", 1.0, 3.0), ("a", 2.0, 1.0), ("a", 3.0, 2.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r.rank_corr for r in
           spearman_rank_corr(df, ["g"], "x", "y").collect()}
    assert set(got) == {None, "a"}
    assert got[None] == pytest.approx(1.0)
    assert got["a"] == pytest.approx(-0.5)
