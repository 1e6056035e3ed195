"""Sequence packing and benchmark-contamination operators.

The two corpus-preparation steps that sit between a cleaned document set
and a training run:

- :func:`pack_contiguous` maps every document to its position in the
  concatenate-and-cut token stream (the standard pretraining packing:
  all documents are joined into one token stream and sliced into
  fixed-length training sequences).
- :func:`contamination_check` flags training documents that share word
  n-grams with an evaluation/benchmark set (train-test leakage scan);
  :func:`ngram_contamination` grades the same overlap as a per-document
  fraction and :func:`decontaminate` thresholds it.

Both are pure DataFrame plans — window + higher-order functions, no
Python in the row path — and both have exact DuckDB oracles
(tests/test_demoted_oracles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_etl_spark.text.dedup import _shingles


def pack_contiguous(
    df: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str | None = None,
) -> DataFrame:
    """Concatenate-and-cut sequence packing: each document's span in the
    packed token stream.

    Documents are laid out in deterministic ``id_col`` order (within
    ``shard_col`` when given); the stream is cut every ``seq_len``
    tokens. Output per document: ``n_tokens``, ``stream_offset`` (tokens
    before it), ``first_seq``/``last_seq`` (the training-sequence ids it
    lands in), ``n_seqs`` (how many sequences it spans — >1 means the
    document is split across examples).

    Scale: with ``shard_col`` the running offset is one cumulative-sum
    window PER SHARD — embarrassingly parallel, the 100 TB form (each
    shard packs its own stream, which is exactly how multi-file
    tokenized corpora are produced; :func:`plan_shards` produces the
    assignment). Without it the stream is global, computed with the
    two-level distributed prefix sum (``operators.prefix.running_total``)
    — parallel at every stage, no single-partition window anywhere.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    # NULL text must not poison the stream: size(split(NULL)) is -1
    # (legacy sizeOfNull), which would DECREMENT every later document's
    # offset. Null/empty documents contribute 0 tokens.
    n_tokens = F.when(
        F.col(text_col).isNull() | (F.col(text_col) == ""), F.lit(0)
    ).otherwise(F.size(F.split(F.col(text_col), " ")))
    counted = df.select(
        *( [F.col(shard_col)] if shard_col else [] ),
        F.col(id_col),
        n_tokens.alias("n_tokens"),
    )
    if shard_col:
        w = (
            Window.partitionBy(F.col(shard_col))
            .orderBy(F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        base = counted.withColumn(
            "stream_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
    else:
        from clickhouse_etl_spark.operators.prefix import running_total

        base = running_total(counted, id_col, "n_tokens", out_col="stream_offset")
    return base.select(
        *( [shard_col] if shard_col else [] ),
        id_col,
        "n_tokens",
        "stream_offset",
        F.floor(F.col("stream_offset") / seq_len).alias("first_seq"),
        F.floor(
            (F.col("stream_offset") + F.col("n_tokens") - 1) / seq_len
        ).alias("last_seq"),
        (
            F.floor((F.col("stream_offset") + F.col("n_tokens") - 1) / seq_len)
            - F.floor(F.col("stream_offset") / seq_len)
            + 1
        ).cast("int").alias("n_seqs"),
    )


def plan_shards(
    df: DataFrame,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Size-budgeted shard assignment: consecutive documents (in
    deterministic ``id_col`` order) fill each shard to ``tokens_per_shard``
    tokens before the next one starts.

    Output per document: ``n_tokens``, ``stream_offset`` (exclusive
    prefix sum), ``shard`` (= offset // budget). A document is assigned
    by its START offset, so a shard can overrun the budget by at most
    one document — the standard training-shard contract (webdataset/
    tokenized-corpus exports do the same). Feed the result to
    :func:`pack_contiguous` with ``shard_col='shard'`` for the fully
    parallel per-shard packing pass, or to a partitioned writer.

    Scale: one distributed prefix sum (two-level, no global window) +
    pure column arithmetic. Deterministic: same corpus → same shards,
    retry-stable.
    """
    if tokens_per_shard <= 0:
        raise ValueError(
            f"tokens_per_shard must be positive, got {tokens_per_shard}"
        )
    from clickhouse_etl_spark.operators.prefix import running_total

    n_tokens = F.when(
        F.col(text_col).isNull() | (F.col(text_col) == ""), F.lit(0)
    ).otherwise(F.size(F.split(F.col(text_col), " ")))
    counted = df.select(F.col(id_col), n_tokens.alias("n_tokens"))
    planned = running_total(counted, id_col, "n_tokens", out_col="stream_offset")
    return planned.select(
        id_col,
        "n_tokens",
        "stream_offset",
        F.floor(F.col("stream_offset") / tokens_per_shard).alias("shard"),
    )


def contamination_check(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train-test leakage scan: training documents sharing any word
    n-gram with a benchmark document.

    Shape: shingle both sides (JVM higher-order functions), inner-join
    on the n-gram, aggregate per training document — ``overlap_ngrams``
    (distinct shared n-grams) and ``bench_docs`` (distinct benchmark
    documents touched). Only contaminated documents are emitted; the
    caller anti-joins this against the corpus to decontaminate.

    Scale: the benchmark side is an EVAL SET — thousands of documents,
    not billions — so its distinct shingle table is broadcast and the
    100 TB training side never shuffles. (For benchmark sets too large
    to broadcast, drop the hint and AQE falls back to a shuffle join.)
    """
    t_grams = train.select(
        F.col(id_col), F.explode(F.array_distinct(_shingles(text_col, n))).alias("gram")
    )
    b_grams = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(F.array_distinct(_shingles(text_col, n))).alias("gram"),
    )
    joined = t_grams.join(F.broadcast(b_grams), on="gram", how="inner")
    return joined.groupBy(id_col).agg(
        F.countDistinct("gram").alias("overlap_ngrams"),
        F.countDistinct("bench_id").alias("bench_docs"),
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination FRACTION against the benchmark's
    n-gram set — the graded complement to :func:`contamination_check`'s
    binary flag (standard n-gram decontamination methodology: overlap
    measured per document, then thresholded).

    ``contamination_frac`` = (n-gram occurrences also present in the
    benchmark's distinct n-gram set) / (total n-gram occurrences).
    Occurrences keep multiplicity on the DOCUMENT side — a doc
    repeating a leaked answer ten times is 10× as contaminated — while
    the benchmark side is a set. Every document is emitted (zero rows
    are data here, not absence); docs whose text yields no n-grams
    report NULL.

    Scale: same broadcast shape as contamination_check — the corpus
    explodes narrowly inside its scan stage, the only shuffle is the
    per-doc count keyed by doc id. For benchmark sets beyond broadcast
    size the documented refinement is a bloom-filter pre-pass built
    over the benchmark grams, filtering occurrences before a shuffled
    join instead of shuffling the non-matching majority.

    Output: ``(id_col, n_ngrams, matched_ngrams, contamination_frac)``.
    """
    b_grams = benchmark.select(
        F.explode(F.array_distinct(_shingles(text_col, n))).alias("gram")
    ).distinct()
    occ = docs.select(
        F.col(id_col),
        F.explode_outer(_shingles(text_col, n)).alias("gram"),
    )
    marked = occ.join(
        F.broadcast(b_grams.select("gram", F.lit(1).alias("__hit"))),
        on="gram",
        how="left",
    )
    out = marked.groupBy(id_col).agg(
        F.count("gram").alias("n_ngrams"),
        F.count("__hit").alias("matched_ngrams"),
    )
    return out.select(
        id_col,
        "n_ngrams",
        "matched_ngrams",
        F.when(
            F.col("n_ngrams") > 0,
            F.round(F.col("matched_ngrams") / F.col("n_ngrams"), 6),
        ).alias("contamination_frac"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    max_frac: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop documents whose contamination fraction exceeds ``max_frac``
    (default: ANY overlap at the standard decontamination n=8 kills the
    doc). Returns the surviving input rows unchanged."""
    c = ngram_contamination(docs, benchmark, n, id_col, text_col)
    dirty = c.filter(F.col("contamination_frac") > max_frac).select(id_col)
    return docs.join(dirty, on=id_col, how="left_anti")


def write_shards(
    df: DataFrame,
    path: str,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> DataFrame:
    """The packing story end-to-end: plan token-budget shards, attach
    the text back, and land ONE parquet file per shard under
    ``path/shard=N/`` — the layout a training job consumes (each shard
    is an independent, budget-bounded read unit; hive partitioning
    makes per-shard reads a directory prune, not a scan).

    One-file-per-shard is achieved by repartitioning on the shard key
    before a partitionBy write: each shard's rows co-locate in exactly
    one task, so the writer emits exactly one file per shard dir (the
    small-files problem a naive partitionBy write creates — every task
    writing every shard — never happens). Rows inside a file are sorted
    by ``id_col``, preserving the stream order the offsets encode.

    Returns the shard plan (id, n_tokens, stream_offset, shard) for the
    caller's manifest.

    Scale: the plan is the distributed prefix sum (no global window);
    the write adds ONE hash shuffle on the shard key. Shard count is
    corpus_tokens / tokens_per_shard — size the budget so a shard fits
    a worker (the same rule any webdataset-style export follows).
    """
    from clickhouse_etl_spark.util import materialize

    # The plan is consumed twice (the write's join and the returned
    # manifest) — snapshot it so the manifest provably describes the
    # files actually written, even over nondeterministic upstreams.
    plan = materialize(
        plan_shards(df, tokens_per_shard, id_col=id_col, text_col=text_col),
        cut_lineage=True,
    )
    joined = df.join(plan, on=id_col, how="inner")
    (
        joined.repartition(F.col("shard"))
        # 'shard' leads: the partitionBy writer requires rows ordered by
        # the partition column and would otherwise insert its OWN sort
        # by shard alone, leaving the id order to sort-stability luck
        .sortWithinPartitions("shard", id_col)
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )
    return plan
