"""clickhouse_etl_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference ETL system (``RothaSAMON/clickhouse_etl``: Airflow DAGs →
Python transforms → ClickHouse MergeTree), re-expressed Spark-first:

- sources:   incremental high-watermark extraction, dedup-at-ingest readers
- functions: the scalar function surface (grade banding, timestamp zoo,
             gender normalization, materialized-path ops, JSON, defaults)
- operators: dedup, join templates, the aggregation layer (both averaging
             semantics, weighted averages, nested collect_list(struct)),
             bounded hierarchical rollup
- pipelines: the reference's three query lifecycles as engine pipelines
- streaming: Structured Streaming tier (tumbling/sliding windows, watermark)
- text:      large-scale training-data operators (exact/MinHash/SimHash
             dedup, similarity search, language id, quality scoring)

Everything is declarative DataFrame / Spark SQL so Catalyst plans the
physical execution (pushdown, broadcast, AQE); Python UDFs only where the
built-in surface genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from clickhouse_etl_spark.session import get_spark  # noqa: F401
