"""SQL surface for the engine's scalar zoo — `CREATE FUNCTION` forms.

The reference's consumers speak SQL (Metabase dashboards + ad-hoc
ClickHouse CLI, apps/clickhouse/readme.md:80-103); a user migrating a
dashboard query needs the engine's semantics callable FROM SQL, not
just from the DataFrame API. Spark's SQL-defined functions (the
``CREATE FUNCTION … RETURN <expr>`` form) are the right vehicle: the
body is a SQL expression Catalyst INLINES into the calling plan — same
codegen, same pushdown, zero UDF overhead — so the SQL surface and the
Column-function surface compile to the same physical expressions
(pinned in tests).

``register_sql_functions(spark)`` installs the session-scoped set:

- ``grade_band(pct)`` / ``grade_gpa(pct)`` / ``grade_meaning(pct)`` —
  the F2 ladder (closed lower bounds).
- ``pct_of(v, max)`` — F7 guarded percentage (max>0 else 0).
- ``score_of(pct, max)`` — F8 reconstruction.
- ``gender_normalize(g)`` — F1 normalization with raw passthrough.
- ``path_first_id(p)`` / ``path_make(id)`` — F9/F10 materialized path.
- ``is_uuid(s)`` — F13 validation regex.
- ``weighted_coe(c)`` — F16/A3 coefficient defaulting (NULL/≤0 → 1).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from clickhouse_etl_spark.functions.grading import (
    grade_band_sql,
    grade_gpa_sql,
    grade_meaning_sql,
)
from clickhouse_etl_spark.functions.scalars import UUID_RE

# name -> (params, return type, body). The grade_* bodies reuse the SAME
# SQL generators the DuckDB oracles use; the remaining bodies are
# hand-mirrored from the Column implementations in scalars.py /
# timestamps.py — for those, the value-sweep equality tests in
# tests/test_scalars.py are the drift guard (edit either surface and
# the sweep breaks).
_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "grade_band": ("pct DOUBLE", "STRING", grade_band_sql("pct")),
    "grade_gpa": ("pct DOUBLE", "DOUBLE", grade_gpa_sql("pct")),
    "grade_meaning": ("pct DOUBLE", "STRING", grade_meaning_sql("pct")),
    "pct_of": (
        "v DOUBLE, max_score DOUBLE",
        "DOUBLE",
        "CASE WHEN max_score > 0 THEN v / max_score * 100 ELSE 0.0 END",
    ),
    "score_of": (
        "pct DOUBLE, max_score DOUBLE",
        "DOUBLE",
        "pct * max_score / 100",
    ),
    "gender_normalize": (
        "g STRING",
        "STRING",
        "CASE WHEN lower(g) IN ('m', 'male') THEN 'male' "
        "WHEN lower(g) IN ('f', 'female') THEN 'female' ELSE g END",
    ),
    "path_first_id": ("p STRING", "STRING", "split(p, '#')[1]"),
    "path_make": ("id STRING", "STRING", "concat('#', id)"),
    "is_uuid": ("s STRING", "BOOLEAN", f"s RLIKE '{UUID_RE}'"),
    "weighted_coe": (
        "c DOUBLE",
        "DOUBLE",
        "CASE WHEN c IS NULL OR c <= 0 THEN 1.0 ELSE c END",
    ),
    # F3+F4 — the full timestamp zoo (ISO with 1-6 fraction digits,
    # with/without Z, space-separated, the legacy date literal; invalid
    # input → NULL). Mirrors functions/timestamps.py expression by
    # expression; the value-sweep test pins the two surfaces equal.
    "parse_ts": (
        "s STRING",
        "TIMESTAMP",
        """coalesce(
          to_timestamp(
            regexp_replace(
              regexp_replace(
                regexp_replace(s, '(\\\\.\\\\d{1,3})\\\\d*', '$1'),
                '\\\\.(\\\\d)(?=[^\\\\d]|$)', '.$100'),
              '\\\\.(\\\\d\\\\d)(?=[^\\\\d]|$)', '.$10'),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
          to_timestamp(s, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
          to_timestamp(
            regexp_replace(
              regexp_replace(
                regexp_replace(s, '(\\\\.\\\\d{1,3})\\\\d*', '$1'),
                '\\\\.(\\\\d)(?=[^\\\\d]|$)', '.$100'),
              '\\\\.(\\\\d\\\\d)(?=[^\\\\d]|$)', '.$10'),
            "yyyy-MM-dd'T'HH:mm:ss.SSS"),
          to_timestamp(s, "yyyy-MM-dd'T'HH:mm:ss"),
          to_timestamp(s, 'yyyy-MM-dd HH:mm:ss'),
          CASE WHEN regexp_extract(s, '\\\\((\\\\d{4}-\\\\d{2}-\\\\d{2})\\\\)', 1) <> ''
               THEN to_timestamp(
                 regexp_extract(s, '\\\\((\\\\d{4}-\\\\d{2}-\\\\d{2})\\\\)', 1),
                 'yyyy-MM-dd')
          END)""",
    ),
    # F5 — timestamp → ISO string for JSON boundaries.
    "iso_str": ("t TIMESTAMP", "STRING", 'date_format(t, "yyyy-MM-dd\'T\'HH:mm:ss")'),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Install the engine's scalar functions into the session's SQL
    namespace (temporary functions — session-scoped, no metastore
    writes). Idempotent. Returns the registered names."""
    for name, (params, rtype, body) in _FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {rtype} RETURN {body}"
        )
    return list(_FUNCTIONS)
