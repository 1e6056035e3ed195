"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive canonicalized values. Run before every
commit that touches the query inventory:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from clickhouse_etl_spark.catalog import TEST_TABLES


def canon_value(v):
    """Canonicalize a scalar for cross-engine comparison."""
    import datetime as dt
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".") or "0"
    if isinstance(v, decimal.Decimal):
        return canon_value(float(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def canon_rows(columns, rows):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(columns)], out


def fetch_oracle(con, oracle_sql: str):
    """Run an oracle SQL on an open DuckDB connection; (cols, rows)."""
    cur = con.execute(oracle_sql)
    return [d[0] for d in cur.description], cur.fetchall()


def open_oracle_views(sf_dir: str):
    """DuckDB connection with every test table registered as a view —
    the exact view setup the driver's gate uses."""
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_canonical(scols, srows, dcols, drows) -> str | None:
    """THE comparison (column names → row count → order-insensitive
    canonicalized values). Returns None on match, else a message —
    shared by the CLI gate below and assert_matches_oracle so the two
    tiers can never drift."""
    sc, sr = canon_rows(scols, [tuple(r) for r in srows])
    dc, dr = canon_rows(dcols, drows)
    if sc != dc:
        return f"columns differ spark={sc} duckdb={dc}"
    if len(sr) != len(dr):
        return f"rowcount spark={len(sr)} duckdb={len(dr)}"
    if sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        detail = "".join(
            f"\n      spark : {a}\n      duckdb: {b}" for a, b in diffs
        )
        return f"values differ; first diffs:{detail}"
    return None


def assert_matches_oracle(sdf, oracle_sql: str, sf_dir: str) -> None:
    """Pytest-tier twin of the driver gate for ONE query: run
    ``oracle_sql`` on DuckDB views over ``sf_dir``'s parquet tables and
    assert the shared :func:`compare_canonical` passes."""
    con = open_oracle_views(sf_dir)
    try:
        dcols, drows = fetch_oracle(con, oracle_sql)
    finally:
        con.close()
    msg = compare_canonical(sdf.columns, sdf.collect(), dcols, drows)
    assert msg is None, msg


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # Deliberately a VANILLA session (not get_spark()) — the driver harness
    # supplies its own SparkSession, so every query must be self-sufficient
    # (catalog.ensure_runtime_confs applies the semantics-bearing confs at
    # runtime). Round-1 failure mode: session-build-time conf dependence.
    builder = (
        SparkSession.builder.master("local[8]")
        .appName("oracle_check")
        .config("spark.sql.shuffle.partitions", "8")
    )
    # Scale sweeps (e.g. the gen10 dataset) need more than the vanilla
    # 1g driver heap; the DRIVER-mirroring default stays untouched.
    mem = os.environ.get("SPARK_GRAFT_ORACLE_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = open_oracle_views(sf_dir)

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            dcols, drows = fetch_oracle(con, oracles[name])
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        msg = compare_canonical(scols, srows, dcols, drows)
        if msg is not None:
            failures.append(name)
            print(f"FAIL  {name}: {msg}")
            continue
        print(f"OK    {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
