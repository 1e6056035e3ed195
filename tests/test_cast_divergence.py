"""Pin the q1 10x-oracle footnote as an executable expectation.

Through round 9 the 10x value-hash sweep was 49/50: `q1_pricing_summary`'s
`sum_charge` differed from DuckDB by one double ulp at gen10. Root
cause (documented there, demonstrated here on a crafted fixture): the
two engines implement double -> DECIMAL(18,6) casts differently.
Round 10 CLOSED the gap by VARCHAR-mediating both cast boundaries on
the DuckDB side (see the q1 oracle comment in queries/relational.py and
test_varchar_mediated_casts_close_the_divergence below); the direct-cast
divergence tests stay as the semantics record.

- Spark routes through exact decimal arithmetic: the double's SHORTEST
  DECIMAL REPRESENTATION (``BigDecimal.valueOf`` = ``Double.toString``)
  is rounded HALF_UP to 6 fractional digits
  (sql/catalyst Cast -> Decimal.changePrecision, RoundingMode.HALF_UP).
- DuckDB rounds in DOUBLE arithmetic (scale the value by 10^6, round,
  reinterpret), so a value whose shortest repr ends in '...5' at the
  7th fractional digit can scale to ...4.99999 in binary and round DOWN
  where Spark rounds UP.

Neither is wrong — they are different deterministic resolutions of a
value that binary floating point cannot place exactly on the .5
boundary. The three fixture doubles below are crafted to land in that
window (shortest repr has exactly 7 fractional digits ending in 5);
the control rows show the engines agreeing everywhere else. This is
the micro-scale witness for why a double-summed decimal column can
hash-mismatch across engines at large SFs while every driver gate SF
(sf0.001/0.01/0.1) matches 50/50.
"""

from __future__ import annotations

import decimal
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Shortest-repr doubles with 7 fractional digits ending in 5, where the
# binary double sits just BELOW the decimal .5 boundary: found by
# probing (d * 1e6 rounds down in double arithmetic; the decimal digits
# round up under HALF_UP).
DIVERGENT = [41583.8093845, 35623.9745085, 84925.4339585]
# Exactly-representable boundary + a plain value: both engines agree.
CONTROL = [1.5, 12345.678901]


def _half_up(d: float) -> decimal.Decimal:
    """Spark's cast semantics, stated independently of Spark: shortest
    decimal repr of the double, HALF_UP to 6 fractional digits."""
    return decimal.Decimal(repr(d)).quantize(
        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
    )


def test_spark_double_to_decimal_is_shortest_repr_half_up(spark):
    df = spark.createDataFrame(
        [(d,) for d in DIVERGENT + CONTROL], "d double"
    )
    got = [
        r.c
        for r in df.selectExpr("CAST(d AS DECIMAL(18,6)) AS c")
        .orderBy("d")
        .collect()
    ]
    want = [_half_up(d) for d in sorted(DIVERGENT + CONTROL)]
    assert got == want


def test_duckdb_double_to_decimal_rounds_in_double_arithmetic():
    con = duckdb.connect()
    try:
        for d in DIVERGENT + CONTROL:
            got = con.execute(
                "SELECT CAST(? AS DECIMAL(18,6))", [d]
            ).fetchone()[0]
            # DuckDB's result is the double-arithmetic rounding...
            want = decimal.Decimal(round(d * 1e6)) / decimal.Decimal(10**6)
            assert got == want, (d, got, want)
    finally:
        con.close()


def test_engines_diverge_by_exactly_one_micro_unit(spark):
    """The pinned expectation: on the crafted rows Spark lands one
    micro-unit ABOVE DuckDB; on the controls they agree. (If either
    engine changes its cast implementation, this test — not a bench
    footnote — is what breaks.)"""
    df = spark.createDataFrame([(d,) for d in DIVERGENT + CONTROL], "d double")
    spark_vals = {
        float(r.d): r.c
        for r in df.selectExpr("d", "CAST(d AS DECIMAL(18,6)) AS c").collect()
    }
    con = duckdb.connect()
    try:
        for d in DIVERGENT:
            duck = con.execute(
                "SELECT CAST(? AS DECIMAL(18,6))", [d]
            ).fetchone()[0]
            assert spark_vals[d] - duck == decimal.Decimal("0.000001"), d
        for d in CONTROL:
            duck = con.execute(
                "SELECT CAST(? AS DECIMAL(18,6))", [d]
            ).fetchone()[0]
            assert spark_vals[d] == duck, d
    finally:
        con.close()


def test_varchar_mediated_casts_close_the_divergence(spark):
    """Round-10 resolution: routing the DuckDB side through VARCHAR at
    BOTH boundaries reproduces Spark's cast semantics exactly, which is
    how the registered oracles now achieve 50/50 at gen10 (previously a
    standing 49/50 with this file as the adjudication witness).

    - double -> VARCHAR prints the shortest repr; VARCHAR -> DECIMAL
      parses half-up == Spark's BigDecimal.valueOf + HALF_UP.
    - DECIMAL -> VARCHAR prints the exact digits; VARCHAR -> DOUBLE is
      a correctly-rounded parse == Spark's BigDecimal.doubleValue
      (DuckDB's DIRECT decimal->double divides in double arithmetic —
      two roundings — observed one ulp off on a gen10 group sum).
    """
    df = spark.createDataFrame([(d,) for d in DIVERGENT + CONTROL], "d double")
    spark_dec = {
        float(r.d): r.c
        for r in df.selectExpr("d", "CAST(d AS DECIMAL(18,6)) AS c").collect()
    }
    spark_dbl = {
        float(r.d): r.c
        for r in df.selectExpr(
            "d", "CAST(CAST(d AS DECIMAL(18,6)) AS DOUBLE) AS c"
        ).collect()
    }
    con = duckdb.connect()
    try:
        for d in DIVERGENT + CONTROL:
            med_dec = con.execute(
                "SELECT CAST(CAST(? AS VARCHAR) AS DECIMAL(18,6))", [d]
            ).fetchone()[0]
            assert med_dec == spark_dec[d], (d, med_dec, spark_dec[d])
            med_dbl = con.execute(
                "SELECT CAST(CAST(CAST(CAST(? AS VARCHAR) AS DECIMAL(18,6))"
                " AS VARCHAR) AS DOUBLE)",
                [d],
            ).fetchone()[0]
            assert med_dbl == spark_dbl[d], (d, med_dbl, spark_dbl[d])
    finally:
        con.close()
