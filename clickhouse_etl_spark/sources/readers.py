"""Source readers (SURVEY.md §2.1 S1-S6).

The reference extracts with hand-built SQL strings pushed into Postgres and
Mongo ``find`` projections. Spark-first: declare the scan, let Catalyst
push predicates and prune columns (JDBC pushdown / parquet row-group
stats). ``.explain()`` on any filtered read here shows ``PushedFilters``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_etl_spark.sources.watermark import WatermarkLedger
from clickhouse_etl_spark.util import materialize


def read_parquet_table(
    spark: SparkSession,
    path: str,
    columns: Sequence[str] | None = None,
    predicate: Column | None = None,
) -> DataFrame:
    """Columnar scan with projection + predicate pushed to the format.

    Mirrors S1/S3's explicit column lists (reference:
    apps/airflow/dags/student/etl_students_to_clickhouse.py:38-42) — but
    here pruning is Catalyst's job; select/filter merely declare it.
    """
    df = spark.read.parquet(path)
    if predicate is not None:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def _conjoin_fragments(
    fragments: Sequence[str] | None, param: str
) -> str | None:
    """AND-join SQL fragments into one parenthesized conjunction; NULL
    for empty. Rejects a bare string — iterating it would interpolate
    one CHARACTER per predicate and surface only as an opaque database
    syntax error."""
    if fragments is None:
        return None
    if isinstance(fragments, str):
        raise TypeError(
            f"{param} must be a sequence of SQL fragments, not a string "
            f"— wrap it in a list: [{fragments!r}]"
        )
    frags = [f for f in fragments if f]
    if not frags:
        return None
    return " AND ".join(f"({p})" for p in frags)


def dedup_latest_subquery(
    table: str,
    keys: Sequence[str],
    order_col: str,
    style: str = "row_number",
    where: Sequence[str] | None = None,
) -> str:
    """W1-at-the-source: a ``dbtable`` subquery that keeps only the
    latest row per key INSIDE the database, so N source rows arrive as
    M ≤ N deduped rows instead of shipping N and deduping post-read.

    The reference pushes exactly this into Postgres as ``SELECT DISTINCT
    ON (id) … ORDER BY id, "updatedAt" DESC`` (reference:
    apps/airflow/dags/student/etl_students_to_clickhouse.py:38-45).
    Two portable spellings:

    - ``'row_number'`` — ranking window in a subquery; works on
      Postgres / MySQL 8 / ClickHouse / SQL Server. Ties on
      ``order_col`` break arbitrarily (same as DISTINCT ON).
    - ``'group_max'`` — greatest-n-per-group via a MAX() self-join; pure
      ANSI-92, runs on engines without window functions (Derby — which
      is what the integration tests prove it on). A key whose
      ``order_col`` is tied at the max returns BOTH rows, and NULL keys
      / NULL order values drop (inner-join semantics) — use
      ``row_number`` when the source supports it and those edges matter.

    Cost note for ``group_max`` + ``where``: the template inlines the
    filtered ``base`` subquery TWICE (the outer scan and the MAX()
    side), so a source engine without subquery CSE evaluates the filter
    twice — correct but up to 2× source-side work. ``row_number``
    references ``base`` once; prefer it whenever the engine has window
    functions.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("dedup needs at least one key column")
    where = _conjoin_fragments(where, "where")
    # Key/order identifiers are double-quoted (ANSI): Spark's own JDBC
    # writer creates case-sensitive lowercase columns, and the reference's
    # Postgres SQL quotes its identifiers the same way
    # (…etl_students_to_clickhouse.py:38-45). Our synthetic aliases
    # (etl_*) stay unquoted and deliberately do NOT start with '_' —
    # Derby rejects leading-underscore names.
    q = [f'"{k}"' for k in keys]
    oc = f'"{order_col}"'
    klist = ", ".join(q)
    # ``where`` predicates apply BEFORE the dedup — the reference's
    # DISTINCT ON … WHERE order: each key's latest row AMONG the
    # matching rows, not "latest overall, then filtered" (which would
    # silently drop a key whose overall-latest row fails the filter).
    base = table
    if where:
        base = f"(SELECT * FROM {table} WHERE {where})"
    if style == "row_number":
        return (
            f"(SELECT * FROM (SELECT t.*, ROW_NUMBER() OVER ("
            f"PARTITION BY {klist} ORDER BY {oc} DESC) AS etl_rn "
            f"FROM {base} t) etl_ranked WHERE etl_rn = 1) etl_dedup"
        )
    if style == "group_max":
        on = " AND ".join(f"t.{k} = m.{k}" for k in q)
        return (
            f"(SELECT t.* FROM {base} t JOIN (SELECT {klist}, "
            f"MAX({oc}) AS etl_mx FROM {base} m0 GROUP BY {klist}) m "
            f"ON {on} AND t.{oc} = m.etl_mx) etl_dedup"
        )
    raise ValueError(f"unknown dedup style {style!r}")


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: Sequence[str] | None = None,
    partition_options: dict[str, str] | None = None,
    properties: dict[str, str] | None = None,
    dedup_latest: tuple[Sequence[str], str] | None = None,
    dedup_style: str = "row_number",
    source_where: Sequence[str] | None = None,
    predicates_post_dedup: bool = False,
) -> DataFrame:
    """S1/S2/S6 — JDBC scan (Postgres in the reference).

    ``partition_options`` (partitionColumn/lowerBound/upperBound/
    numPartitions) parallelize the extract — the reference reads every
    table through a single cursor (single-stream; reference:
    …etl_students_to_clickhouse.py:48-51), which caps at one connection's
    throughput regardless of cluster size.

    ``dedup_latest=(keys, order_col)`` pushes latest-row-per-key dedup
    INTO the source as a query template (see
    :func:`dedup_latest_subquery`) — the reference's ``DISTINCT ON``
    extraction — so the wire carries the deduped row set. Post-read
    ``operators.dedup.latest_row_per_key`` stays the right call for
    non-JDBC sources or when the source engine can't afford the window.

    The two filter parameters have single, fixed meanings:

    - ``predicates`` — Spark-SQL strings applied POST-read with
      ``df.filter`` (Catalyst may still push simple comparisons down
      through the JDBC source). With ``dedup_latest`` they therefore
      filter AFTER the dedup: "each key's latest row, then filtered".
    - ``source_where`` — SOURCE-dialect SQL fragments interpolated into
      the pushed query and executed by the database. With
      ``dedup_latest`` they filter BEFORE the dedup (the reference's
      ``DISTINCT ON … WHERE`` order: each key's latest row AMONG the
      matching rows — reference:
      apps/airflow/dags/student/etl_students_to_clickhouse.py:38-45).

    (Until round 6, ``predicates`` silently switched to source-dialect
    pre-dedup filters whenever ``dedup_latest`` was set; the split
    keeps each parameter single-meaning.)

    ``predicates_post_dedup=True`` acknowledges the post-dedup
    semantics of the ``predicates``+``dedup_latest`` combination and
    silences the transition warning — for callers who have audited the
    round-6 semantics change and opted in (steady-state pipelines
    shouldn't log on every read, and warnings-as-errors suites
    shouldn't trip).
    """
    if isinstance(predicates, str):
        raise TypeError(
            "predicates must be a sequence of Spark-SQL filters, not a "
            f"string — wrap it in a list: [{predicates!r}]"
        )
    if predicates_post_dedup and (not predicates or dedup_latest is None):
        # The acknowledgment only means something on the combination it
        # acknowledges; a misplaced opt-in (wrong read, or the predicates
        # were later moved to source_where) should fail loudly rather
        # than silently ride along doing nothing (r8 ADVICE).
        raise ValueError(
            "predicates_post_dedup=True acknowledges the post-dedup "
            "semantics of predicates combined with dedup_latest, but "
            + (
                "no predicates were passed"
                if not predicates
                else "dedup_latest is None"
            )
            + " on this read — drop the flag, or move it to the read it "
            "was meant for."
        )
    if predicates and dedup_latest is not None and not predicates_post_dedup:
        # Transition warning (r6 ADVICE): before round 6 this combination
        # filtered BEFORE the dedup; it now filters AFTER it, so keys
        # whose latest row fails the predicate vanish instead of falling
        # back to their latest matching row. Make callers opt in loudly.
        import warnings

        warnings.warn(
            "read_jdbc_table: predicates now filter AFTER dedup_latest "
            "(post-dedup). For the pre-round-6 filter-then-dedup "
            "semantics pass source_where instead; pass predicates only "
            "if you want each key's LATEST row, then filtered. "
            "Acknowledge with predicates_post_dedup=True to silence.",
            UserWarning,
            stacklevel=2,
        )
    conj = _conjoin_fragments(source_where, "source_where")
    if conj and dedup_latest is None:
        table = f"(SELECT * FROM {table} WHERE {conj}) etl_src"
        # with dedup_latest, dedup_latest_subquery(where=...) places the
        # fragments inside the dedup subquery below (filter-then-dedup).
    if dedup_latest is not None:
        keys, order_col = dedup_latest
        table = dedup_latest_subquery(
            table, keys, order_col, dedup_style, where=source_where
        )
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (partition_options or {}).items():
        reader = reader.option(k, v)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    if dedup_latest is not None:
        # the row_number template's ranking column is transport detail
        df = df.drop(*[c for c in df.columns if c.lower() == "etl_rn"])
    for p in predicates or ():
        df = df.filter(p)
    return df


def incremental_read(
    df: DataFrame,
    ledger: WatermarkLedger,
    pipeline: str,
    ts_col: str = "updatedAt",
) -> DataFrame:
    """S7/P2 — rows newer than the pipeline's committed watermark.

    The predicate is a plain Column comparison so it pushes down to the
    source (JDBC WHERE / parquet row-group skip). Commit the new watermark
    with :func:`commit_watermark` *after* the batch lands.
    """
    wm = ledger.get(pipeline)
    filtered = df.filter(F.col(ts_col) > F.lit(wm).cast("timestamp"))
    # Snapshot the batch: it is consumed TWICE — the sink write and
    # commit_watermark's max() — and each action on an unsnapshotted
    # plan re-scans the LIVE source. A row arriving between the two
    # scans would then be covered by the committed watermark without
    # ever having been written, and lost forever. A lazy cache is NOT
    # enough: evicted/lost blocks silently recompute from the live
    # source, reopening the race — cut_lineage=True escalates to an
    # eager checkpoint so recovery replays the snapshot, not the source.
    return materialize(filtered, cut_lineage=True)


def commit_watermark(
    batch: DataFrame, ledger: WatermarkLedger, pipeline: str, ts_col: str = "updatedAt"
) -> str | None:
    """Commit max(ts_col) of the loaded batch (not wall-clock now()).

    Deliberate fix of the reference's extract/commit race
    (…etl_students_to_clickhouse.py:24-25 commits ``datetime.now()``).
    ``batch`` must be the (materialized) frame the sink actually wrote —
    :func:`incremental_read` returns it cached for exactly this reason;
    an uncached plan would re-scan the live source here and could
    commit past rows the write never saw.
    """
    row = batch.agg(F.max(ts_col).alias("wm")).collect()[0]
    if row["wm"] is None:
        return None
    wm = row["wm"].strftime("%Y-%m-%dT%H:%M:%S.%f")
    ledger.commit(pipeline, wm)
    return wm
