"""Scalar function surface (SURVEY.md §2.9) as composable Column expressions."""

from clickhouse_etl_spark.functions.scalars import (  # noqa: F401
    coalesce_default,
    gender_normalize,
    is_uuid,
    json_object,
    nan_to_null,
    path_first_id,
    path_synthesize,
    percentage,
    safe_double,
    score_from_percentage,
    weighted_coe,
)
from clickhouse_etl_spark.functions.grading import (  # noqa: F401
    GRADE_BANDS,
    grade_band,
    grade_letter,
    grade_gpa,
    grade_meaning,
)
from clickhouse_etl_spark.functions.timestamps import (  # noqa: F401
    iso_or_legacy_timestamp,
    iso_timestamp,
    legacy_date_rescue,
    timestamp_to_iso_string,
)
from clickhouse_etl_spark.functions.sql_surface import (  # noqa: F401
    register_sql_functions,
)
