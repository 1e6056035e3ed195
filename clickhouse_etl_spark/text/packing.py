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
from pyspark.sql import types as T

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


def ngram_contamination_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    fpp: float = 0.001,
    expected_grams: int | None = None,
) -> DataFrame:
    """:func:`ngram_contamination` with the documented beyond-broadcast
    refinement: the benchmark's distinct n-grams fold into ONE Bloom
    bitset (built with plain Spark aggregations — ``k`` xxhash64 probe
    positions per gram, 64-bit words OR-combined with ``bit_or``; Spark
    exposes no SQL ``bloom_filter_agg``), which rides as a single-row
    broadcast array exactly like the PQ lookup tables. Each corpus
    occurrence tests its ``k`` probes with ``element_at`` + bit masks —
    pure JVM expressions, no shuffle of the non-matching majority, no
    Python.

    Guarantee direction: false POSITIVES only, so ``matched_ngrams`` /
    ``contamination_frac`` are UPPER BOUNDS on the exact values
    (superset-of-exact is test-pinned) — the safe direction for
    decontamination, which drops on match. Size with ``fpp`` (default
    0.1%) and ``expected_grams`` (defaults to one count() of the
    benchmark's distinct grams — an aggregate over the SMALL side).
    The dense bitset (m = -n·ln p/ln²2 bits ≈ 1.8 MB per million grams
    at the default fpp) is materialized once on the driver; a guard
    raises past 2³¹ bits (~256 MB) — at that point raise ``fpp`` or
    use the exact :func:`ngram_contamination`.

    Output schema matches :func:`ngram_contamination`:
    ``(id_col, n_ngrams, matched_ngrams, contamination_frac)``.
    """
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    if expected_grams is not None and expected_grams <= 0:
        # an explicit 0 is a caller bug (a miscomputed count), not an
        # empty benchmark — returning zero contamination would LEAK
        # every contaminated doc, the unsafe direction for this sketch
        raise ValueError("expected_grams must be positive (or None for auto)")
    spark = docs.sparkSession
    b_grams = benchmark.select(
        F.explode(F.array_distinct(_shingles(text_col, n))).alias("gram")
    ).distinct()
    if expected_grams is None:
        expected_grams = b_grams.count()
    occ = docs.select(
        F.col(id_col),
        F.explode_outer(_shingles(text_col, n)).alias("gram"),
    )
    if expected_grams <= 0:
        out = occ.groupBy(id_col).agg(F.count("gram").alias("n_ngrams"))
        return out.select(
            id_col,
            "n_ngrams",
            F.lit(0).cast("long").alias("matched_ngrams"),
            F.when(F.col("n_ngrams") > 0, F.lit(0.0)).alias(
                "contamination_frac"
            ),
        )
    m_bits, k = _bloom_geometry(int(expected_grams), fpp)

    def probe(col: str, i: int):
        return F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits))

    positions = b_grams.select(
        F.explode(F.array(*[probe("gram", i) for i in range(k)])).alias("pos")
    ).distinct()
    words = (
        positions.select(
            F.expr("CAST(pos / 64 AS BIGINT)").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    n_words = (m_bits + 63) // 64
    dense = [0] * n_words
    for r in words:
        dense[int(r["w"])] = int(r["bits"])
    bloom_row = spark.createDataFrame(
        [(dense,)], T.StructType([T.StructField("__bloom", T.ArrayType(T.LongType()))])
    )
    hit = F.lit(True)
    for i in range(k):
        p_sql = f"pmod(xxhash64(gram, {i}), {m_bits})"
        hit = hit & F.expr(
            f"(element_at(__bloom, CAST({p_sql} / 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({p_sql}, 64) AS INT)))"
            " <> CAST(0 AS BIGINT)"
        )
    marked = occ.crossJoin(F.broadcast(bloom_row)).withColumn(
        "__hit", F.when(F.col("gram").isNotNull() & hit, F.lit(1))
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


def _bloom_geometry(expected: int, fpp: float) -> tuple[int, int]:
    """Textbook sizing: m = -n·ln(p)/ln²2 bits, k = (m/n)·ln2 probes.
    Raises past 2³¹ bits — the driver materializes the dense bitset
    once, and a quarter-gigabyte sketch means the benchmark is no
    longer eval-set-sized (use the exact path or a larger fpp)."""
    import math

    m = max(64, int(-expected * math.log(fpp) / (math.log(2.0) ** 2)))
    if m > (1 << 31):
        raise ValueError(
            f"bloom bitset would need {m} bits (> 2^31) for "
            f"expected_grams={expected} at fpp={fpp}; raise fpp or use "
            "the exact ngram_contamination"
        )
    k = max(1, round(m / expected * math.log(2.0)))
    return m, k


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    max_frac: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    fpp: float = 1e-6,
) -> DataFrame:
    """:func:`decontaminate` on the Bloom pre-pass: drops every doc the
    SKETCH flags above ``max_frac``. False positives can only drop
    extra clean docs — never leak a contaminated one; the exact form
    remains the precision option. SIZE ``fpp`` FOR THE DOC LENGTH when
    ``max_frac=0``: any-overlap dropping compounds per-gram false
    positives, so a doc's false-drop probability is ~``n_grams·fpp``
    (a 1 000-gram doc at 1e-3 has a ~63% false-drop rate; the 1e-6
    DEFAULT here — deliberately lower than the frac function's — keeps
    it ~0.1%). A positive ``max_frac`` threshold is far
    less sensitive — FPs shift the fraction by ~``fpp``."""
    c = ngram_contamination_bloom(
        docs, benchmark, n, id_col, text_col, fpp
    )
    dirty = c.filter(F.col("contamination_frac") > max_frac).select(id_col)
    return docs.join(dirty, on=id_col, how="left_anti")
