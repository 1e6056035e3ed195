"""Source layer: scans, incremental high-watermark state, key-driven reads."""

from clickhouse_etl_spark.sources.readers import (  # noqa: F401
    read_parquet_table,
    read_jdbc_table,
    incremental_read,
)
from clickhouse_etl_spark.sources.watermark import WatermarkLedger  # noqa: F401
from clickhouse_etl_spark.sources.documents import (  # noqa: F401
    mongo_projection_columns,
    normalize_object_id,
    read_document_collection,
)
from clickhouse_etl_spark.sources.federated import register_jdbc_catalog  # noqa: F401
from clickhouse_etl_spark.sources.quarantine import (  # noqa: F401
    read_csv_quarantined,
    read_jsonl_quarantined,
    write_quarantine,
)
