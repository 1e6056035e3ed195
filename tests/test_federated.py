"""S6 — JDBC table catalog registration (no live DB in the sandbox, so
this asserts the runtime-settable catalog wiring, not a remote read)."""

from __future__ import annotations

from clickhouse_etl_spark.sources.federated import (
    JDBC_CATALOG_IMPL,
    register_jdbc_catalog,
)


def test_register_jdbc_catalog_sets_runtime_confs(spark):
    register_jdbc_catalog(
        spark,
        "academic",
        url="jdbc:postgresql://postgres:5432/dwd-academic",
        user="etl",
        driver="org.postgresql.Driver",
    )
    conf = spark.conf
    assert conf.get("spark.sql.catalog.academic") == JDBC_CATALOG_IMPL
    assert conf.get("spark.sql.catalog.academic.url").endswith("dwd-academic")
    assert conf.get("spark.sql.catalog.academic.user") == "etl"
    assert conf.get("spark.sql.catalog.academic.pushDownPredicate") == "true"
