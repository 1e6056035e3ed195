"""Source layer: scans, incremental high-watermark state, key-driven reads."""

from clickhouse_etl_spark.sources.readers import (  # noqa: F401
    read_parquet_table,
    read_jdbc_table,
    incremental_read,
)
from clickhouse_etl_spark.sources.watermark import WatermarkLedger  # noqa: F401
