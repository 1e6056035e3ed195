"""S6 — federated database catalog (the ClickHouse PostgreSQL() analog).

reference: apps/clickhouse/migrations/
2025_03_05_15_48_create_materialized_academic_postgres_table.sql:1-3 and
…15_49…survey…sql:1-3 expose live Postgres schemas as ClickHouse databases
(``ENGINE = PostgreSQL('postgres:5432', 'dwd-academic', …)``).

Spark equivalent: a JDBCTableCatalog registered under a catalog name, so
remote tables are queryable as ``<name>.<schema>.<table>`` in Spark SQL
with predicate/projection pushdown — no per-table reader plumbing.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

JDBC_CATALOG_IMPL = (
    "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog"
)


def register_jdbc_catalog(
    spark: SparkSession,
    name: str,
    url: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    pushdown: bool = True,
) -> None:
    """Register ``name`` as a live JDBC catalog on the running session.

    After this, ``spark.sql(f"SELECT … FROM {name}.public.student")``
    reads through with filter/column pushdown (``pushDownPredicate`` /
    aggregate pushdown are on by default in the JDBC V2 source).
    Catalog confs are runtime-settable — no session rebuild needed.
    """
    base = f"spark.sql.catalog.{name}"
    spark.conf.set(base, JDBC_CATALOG_IMPL)
    spark.conf.set(f"{base}.url", url)
    if user is not None:
        spark.conf.set(f"{base}.user", user)
    if password is not None:
        spark.conf.set(f"{base}.password", password)
    if driver is not None:
        spark.conf.set(f"{base}.driver", driver)
    spark.conf.set(f"{base}.pushDownPredicate", str(pushdown).lower())
