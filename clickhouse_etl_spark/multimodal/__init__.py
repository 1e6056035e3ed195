"""Multimodal columns: binary payloads + typed metadata."""

from clickhouse_etl_spark.multimodal.binary_ops import (  # noqa: F401
    attach_binary_payload,
    extract_features,
    resize_images,
    sample_frames,
)
