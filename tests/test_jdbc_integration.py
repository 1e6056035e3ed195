"""Live JDBC execution against embedded Derby (the one real database on
the sandbox JVM — pyspark ships derby*.jar for the Hive metastore).

Every other JDBC test exercises option plumbing against landing zones;
this one round-trips rows through an ACTUAL JDBC driver so the URL /
dbtable / partition-option wiring, the dialect type mapping, and the
V1 JDBC pushdown all execute for real. The reference's S1/S2 scans
(…etl_students_to_clickhouse.py:48-51) run through Postgres the same
way — swap the URL and driver, nothing else changes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_spark.sources.readers import read_jdbc_table

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "jdbcdb"
    url = f"jdbc:derby:{db};create=true"
    seed = spark.range(0, 100).select(
        F.col("id").cast("long").alias("student_id"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
        (F.col("id") % 5).cast("int").alias("school"),
    )
    (
        seed.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "students")
        .option("driver", DRIVER)
        # Derby's default StringType mapping is CLOB, which its SQL layer
        # refuses to compare/filter — pin VARCHAR like a real schema.
        .option("createTableColumnTypes", "name VARCHAR(64)")
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_roundtrip_and_pushdown(spark, derby_url):
    """S1: the filtered scan returns exactly the matching rows AND the
    predicate reaches the JDBC source (PushedFilters in the scan node),
    so the database — not Spark — does the filtering."""
    df = read_jdbc_table(
        spark,
        derby_url,
        "students",
        predicates=["school = 2"],
        properties={"driver": DRIVER},
    )
    rows = df.select("student_id", "name", "school").collect()
    assert len(rows) == 20
    assert all(r.school == 2 for r in rows)
    assert all(r.name == f"name-{r.student_id}" for r in rows)

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "school" in plan.split("PushedFilters", 1)[1]


def test_jdbc_parallel_partitioned_scan(spark, derby_url):
    """S2: partitionColumn options produce N parallel cursors (one task
    per bound-range) and the union still reads every row exactly once."""
    df = read_jdbc_table(
        spark,
        derby_url,
        "students",
        partition_options={
            "partitionColumn": "student_id",
            "lowerBound": "0",
            "upperBound": "100",
            "numPartitions": "4",
        },
        properties={"driver": DRIVER},
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    assert sorted(r.student_id for r in df.select("student_id").collect()) == list(
        range(100)
    )


def test_jdbc_column_pruning(spark, derby_url):
    """Projection reaches the JDBC SELECT list: a 1-column read's scan
    schema contains only that column (the generated SQL asks Derby for
    it alone, not SELECT *)."""
    df = read_jdbc_table(
        spark, derby_url, "students", properties={"driver": DRIVER}
    ).select("school")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "JDBCRelation" in l)
    assert "school" in scan_line.lower()
    assert "name" not in scan_line.lower().replace("jdbcrelation", "")
    assert df.count() == 100


@pytest.fixture(scope="module")
def derby_versions_url(spark, tmp_path_factory):
    """A change-log shaped table: 3 versions per student, latest wins."""
    db = tmp_path_factory.mktemp("derby_v") / "jdbcdb"
    url = f"jdbc:derby:{db};create=true"
    seed = spark.range(0, 150).select(
        (F.col("id") % 50).cast("long").alias("student_id"),
        F.col("id").cast("long").alias("version"),
        F.concat(F.lit("v"), F.col("id")).alias("name"),
    )
    (
        seed.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "student_log")
        .option("driver", DRIVER)
        .option("createTableColumnTypes", "name VARCHAR(64)")
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_dedup_latest_pushed_into_source(spark, derby_versions_url):
    """W1 at the source (the reference's DISTINCT ON extraction,
    …etl_students_to_clickhouse.py:38-45): the database dedups BEFORE
    the wire — the scan's relation IS the dedup subquery, no Spark-side
    window/aggregate appears in the plan, and the deduped row count
    arrives pre-shrunk (50 rows for 150 stored versions)."""
    df = read_jdbc_table(
        spark,
        derby_versions_url,
        "student_log",
        properties={"driver": DRIVER},
        dedup_latest=(["student_id"], "version"),
        dedup_style="group_max",  # Derby has no PARTITION BY windows
    )
    rows = df.collect()
    assert len(rows) == 50
    got = {r.student_id: (r.version, r.name) for r in rows}
    # latest version per key is id = key + 100 (third copy)
    assert got[0] == (100, "v100") and got[49] == (149, "v149")

    phys = df._jdf.queryExecution().executedPlan().toString()
    # dedup ran in the database: the JDBC relation is the subquery...
    assert "MAX" in phys and "GROUP BY" in phys
    # ...and Spark added no dedup machinery of its own
    assert "Window" not in phys and "HashAggregate" not in phys


def test_jdbc_dedup_row_number_template_shape():
    """The window-function spelling (Postgres/MySQL/ClickHouse targets)
    renders the exact DISTINCT ON-equivalent subquery; Derby can't run
    it, so the template itself is pinned."""
    from clickhouse_etl_spark.sources.readers import dedup_latest_subquery

    q = dedup_latest_subquery("students", ["school", "sid"], "updated_at")
    assert q == (
        '(SELECT * FROM (SELECT t.*, ROW_NUMBER() OVER ('
        'PARTITION BY "school", "sid" ORDER BY "updated_at" DESC) AS etl_rn '
        "FROM students t) etl_ranked WHERE etl_rn = 1) etl_dedup"
    )
    with pytest.raises(ValueError):
        dedup_latest_subquery("students", [], "updated_at")
    with pytest.raises(ValueError):
        dedup_latest_subquery("students", ["sid"], "ts", style="nope")


def test_jdbc_dedup_filters_before_dedup(spark, derby_versions_url):
    """source_where + dedup_latest = the reference's DISTINCT ON … WHERE
    order: each key's latest row AMONG the matching rows. Keys whose
    overall-latest version fails the filter must fall back to their
    latest matching version, not vanish."""
    df = read_jdbc_table(
        spark,
        derby_versions_url,
        "student_log",
        source_where=['"version" < 100'],  # excludes every key's 3rd copy
        properties={"driver": DRIVER},
        dedup_latest=(["student_id"], "version"),
        dedup_style="group_max",
    )
    rows = df.collect()
    assert len(rows) == 50  # every key still present
    got = {r.student_id: r.version for r in rows}
    # latest version UNDER the filter is the second copy (id = key + 50)
    assert got[0] == 50 and got[49] == 99


def test_jdbc_predicates_stay_post_dedup(spark, derby_versions_url):
    """predicates keep ONE meaning (Spark post-read filters) even with
    dedup_latest: dedup first, then filter — so keys whose latest
    version fails the filter VANISH (contrast with source_where above,
    which filters before the dedup). The combination also emits the
    transition UserWarning pointing callers at source_where (r6
    ADVICE: the pre-r6 semantics changed under them silently)."""
    with pytest.warns(UserWarning, match="AFTER dedup_latest"):
        df = read_jdbc_table(
            spark,
            derby_versions_url,
            "student_log",
            predicates=["version < 125"],  # Spark-SQL syntax, post-dedup
            properties={"driver": DRIVER},
            dedup_latest=(["student_id"], "version"),
            dedup_style="group_max",
        )
    got = {r.student_id: r.version for r in df.collect()}
    # latest version per key is key + 100; only keys 0..24 survive < 125
    assert len(got) == 25
    assert got[0] == 100 and got[24] == 124 and 25 not in got

    # predicates_post_dedup=True is the audited-caller acknowledgment
    # (r7 ADVICE: steady-state pipelines shouldn't warn on every read):
    # identical result, NO warning.
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        df2 = read_jdbc_table(
            spark,
            derby_versions_url,
            "student_log",
            predicates=["version < 125"],
            properties={"driver": DRIVER},
            dedup_latest=(["student_id"], "version"),
            dedup_style="group_max",
            predicates_post_dedup=True,
        )
        got2 = {r.student_id: r.version for r in df2.collect()}
    assert got2 == got


def test_jdbc_source_where_without_dedup(spark, derby_versions_url):
    """source_where alone wraps the table in a filtered subquery that
    the DATABASE executes (source dialect, pre-wire)."""
    df = read_jdbc_table(
        spark,
        derby_versions_url,
        "student_log",
        source_where=['"version" >= 100'],
        properties={"driver": DRIVER},
    )
    assert df.count() == 50
    assert df.agg(F.min("version")).first()[0] == 100
