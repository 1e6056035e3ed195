"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``clickhouse_etl_spark.queries`` — one
registered entry per implemented operator from SURVEY.md §2 plus the
north-star extensions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_etl_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402
from clickhouse_etl_spark.queries.relational import flagship_wide_fact  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The §3.3 lifecycle shape (SURVEY.md): multi-way dim joins over the
    fact, grade banding, grouped revenue — the engine's denormalized
    wide-fact pipeline on the test star schema.
    """
    return flagship_wide_fact(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — ALL 50 queries carry
    one: the approximate ops (MinHash/SimHash/LSH-ANN/IVF) manufacture
    their randomness (poly hash family, sha256-literal hyperplanes,
    affine centroid permutation) so even candidate generation mirrors
    into SQL."""
    return dict(ORACLE_SQL)
