"""Sink layer: MergeTree-mapped partitioned writes + migration bootstrap."""

from clickhouse_etl_spark.sinks.writers import write_mergetree_mapped  # noqa: F401
from clickhouse_etl_spark.sinks.migrations import MigrationRunner  # noqa: F401
from clickhouse_etl_spark.sinks.bucketed import (  # noqa: F401
    colocated_join,
    write_bucketed_table,
)
from clickhouse_etl_spark.sinks.compaction import compact_dataset  # noqa: F401
from clickhouse_etl_spark.sinks.zorder import (  # noqa: F401
    write_zordered,
    zorder_value,
)
