"""Duplicated-span detection — substring-level exact dedup.

Document-level dedup (exact sha / MinHash / SimHash, ``text.dedup``)
misses the dominant duplication mode in web-scale corpora: long byte
ranges repeated across otherwise-distinct documents (boilerplate,
licenses, quoted passages). The remedy popularized for LLM training
data is substring dedup: find every span of >= k consecutive tokens
that occurs more than once in the corpus, and cut (or downweight) the
repeated occurrences.

A literal suffix-array build (the single-node reference algorithm) does
not distribute; the scalable equivalent implemented here is the
k-shingle inverted form:

1. one narrow pass emits every k-token shingle with its start position
   (JVM higher-order functions, no Python);
2. one aggregation finds shingles occurring >= 2 times corpus-wide;
3. occurrences of duplicated shingles join back (shuffle on the shingle
   key — AQE broadcasts while the duplicated set is small);
4. per document, overlapping duplicated shingles merge into maximal
   spans with a gaps-and-islands window — every span of >= k duplicated
   tokens surfaces exactly once, with its token range.

Any substring of length >= k repeated in the corpus is fully covered by
duplicated k-shingles, so the merged spans are exactly the maximal
repeated regions at k-token resolution — the same guarantee the
suffix-array form gives, in three shuffles.

Scale: the shingle join key defaults to the raw k-gram string (exact,
oracle-checkable). At 100 TB project ``key="hash"`` — xxhash64 collapses
the shuffle key to 8 bytes; a 64-bit collision can only ADD a false
duplicated shingle (never drop one), and the two variants are pinned
equal on the test corpus in tests/test_spans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _positioned_shingles(
    df: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, gram) for every k-token shingle; docs shorter than k
    tokens emit nothing (they cannot contain a k-token repeated span)."""
    from clickhouse_etl_spark.util import rebalance_for_compute

    # the token array is BOUND ONCE via the outer single-element
    # transform (see dedup._shingles_sql — an inline split inside the
    # per-shingle lambda re-evaluates per shingle, measured 7× slower
    # at the 10× scale factor); docs shorter than k emit NOTHING here
    # (a k-token repeat cannot fit), unlike the dedup-tier shingles.
    # rebalance: enumeration is CPU-heavy per row and the corpus scan
    # can arrive as a single byte-sized partition (no-op when wide)
    df = rebalance_for_compute(df)
    toks = F.split(F.col(text_col), " ")
    shingled = df.select(
        F.col(id_col),
        F.expr(
            f"transform(array(split({text_col}, ' ')), t -> "
            f"CASE WHEN size(t) >= {k} THEN "
            f"transform(sequence(0, size(t) - {k}),"
            f" i -> concat_ws(' ', slice(t, i + 1, {k})))"
            f" ELSE CAST(array() AS ARRAY<STRING>) END)[0]"
        ).alias("__grams"),
        F.size(toks).alias("n_tokens"),
    )
    return shingled.select(
        id_col,
        "n_tokens",
        F.posexplode("__grams").alias("pos", "gram"),
    )


def duplicated_spans(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "gram",
    mark: str = "all",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns one row per (document, span): ``(id_col, span_start,
    span_end, span_tokens)``. A span is a maximal merged run of
    duplicated k-token windows: every TOKEN in ``[span_start,
    span_end)`` belongs to at least one k-window that occurs >= 2 times
    in the corpus (within-document repeats count), and the spans'
    token coverage is exactly the union of all duplicated windows.
    (Adjacent duplicated windows merge too, so an interior k-window of
    a span need not itself be duplicated — the guarantee is per token,
    which is what cutting needs.) Documents with no duplicated span are
    absent — anti-join to get the clean set, or aggregate
    ``span_tokens`` against the document token count for a dup-fraction
    cut.

    ``mark`` picks the occurrence policy:

    - ``"all"`` (default): every occurrence of a duplicated shingle is
      marked — the detection/measurement view.
    - ``"non_first"``: the canonical first occurrence (lowest
      ``(id, pos)`` corpus-wide) of each duplicated shingle is spared —
      the substring-dedup CUT policy: removing the marked spans keeps
      exactly one copy of every repeated passage in the corpus.

    ``key="gram"`` (default) shuffles the raw k-gram string — exact and
    DuckDB-checkable. ``key="hash"`` shuffles ``xxhash64(gram)`` — the
    8-byte 100 TB form (collisions can only over-mark, never miss).
    """
    if key not in ("gram", "hash"):
        raise ValueError(f"key must be 'gram' or 'hash', got {key!r}")
    if mark not in ("all", "non_first"):
        raise ValueError(f"mark must be 'all' or 'non_first', got {mark!r}")
    from clickhouse_etl_spark.util import materialize

    grams = _positioned_shingles(df, k, id_col, text_col)
    if key == "hash":
        grams = grams.withColumn("gram", F.xxhash64("gram"))
    # The shingle enumeration (split + per-position slice/concat — the
    # operator's dominant CPU) feeds TWO consumers: the duplicated-set
    # aggregate and the occurrence join-back. Their subtrees differ
    # (partial agg vs raw stream), so exchange reuse never fires and the
    # enumeration ran twice per query (r13 measurement: ~2× the shingle
    # CPU at every SF). One persist marker computes it once; both
    # consumers read the cache. The aggregate's map-side combine is
    # unaffected (it runs over cached partitions), and the join-back
    # stays AQE-elective broadcast — the hot-gram safety reasoning below
    # is unchanged. At 100 TB the cache is the exploded gram stream
    # (MEMORY_AND_DISK, spills to local disk); that trades one disk
    # write for a second full tokenize+slice pass over the corpus, the
    # same trade the MinHash banding path already makes.
    grams = materialize(grams.select(id_col, "pos", "gram"))

    # Corpus-wide duplicated-shingle set: one partial-aggregated pass
    # (count + canonical first occurrence), then occurrences join back.
    # Deliberately NOT a gram-keyed window: a window needs every
    # occurrence of a gram in ONE task, and a hot boilerplate gram
    # (billions of occurrences at 100 TB) becomes a single-task
    # sort/spill stall. The aggregate collapses hot keys map-side, and
    # the join-back is AQE-elective — broadcast while the dup set is
    # small (the real-corpus case), skew-split SMJ otherwise. Costs a
    # second evaluation of the shingle expression (measured ~2.4× at
    # the dup-saturated 10× synthetic corpus, where nearly every gram
    # is duplicated and nothing can broadcast) — accepted: the window
    # form's hot-key stall is unbounded, the double scan is a constant.
    per_gram = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(F.struct(id_col, "pos")).alias("__first"),
    )
    dup = per_gram.filter(F.col("__n") >= 2)
    if mark == "non_first":
        # spare each duplicated shingle's canonical lowest-(id, pos)
        # occurrence; every other occurrence is a duplicate
        hits = (
            grams.join(dup.select("gram", "__first"), on="gram", how="inner")
            .filter(
                ~(
                    (F.col(id_col) == F.col(f"__first.{id_col}"))
                    & (F.col("pos") == F.col("__first.pos"))
                )
            )
            .select(id_col, "pos")
        )
    else:
        hits = grams.join(dup.select("gram"), on="gram", how="inner").select(
            id_col, "pos"
        )

    # Gaps-and-islands: a new span starts where pos clears every prior
    # shingle's end. Both windows and the final aggregate cluster on
    # id_col, so the whole merge is ONE shuffle.
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "__brk",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
    ).withColumn("__gid", F.sum("__brk").over(w))
    return (
        islands.groupBy(id_col, "__gid")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def cut_duplicated_spans(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "gram",
) -> DataFrame:
    """Substring-dedup surgery: remove every non-first duplicated span.

    Rewrites ``text_col`` with the tokens of ``mark="non_first"`` spans
    deleted. The keep-first guarantee is PER SHINGLE, applied per token:
    each duplicated k-shingle's canonical lowest-``(id, pos)`` occurrence
    is spared from ITS OWN span set, but a token of a spared shingle can
    still be cut when it also lies inside a marked non-first span of a
    *different* shingle (overlapping duplicated regions) — so a kept
    passage may be partially trimmed where distinct repeats overlap it.
    Adds ``removed_tokens`` with the per-document cut size. Documents
    without duplicated spans pass through untouched.

    The rewrite is JVM-side: the span list joins back per document
    (span counts per doc are small — they merge overlaps by
    construction) and an indexed higher-order filter drops covered
    token positions without exploding the corpus.
    """
    spans = duplicated_spans(
        df, k=k, id_col=id_col, text_col=text_col, key=key, mark="non_first"
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans"),
        F.sum("span_tokens").alias("__cut"),
    )
    toks = F.split(F.col(text_col), " ")
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("__spans"),
            lambda sp: (i >= sp["span_start"]) & (i < sp["span_end"]),
        ),
    )
    out_cols = [
        F.concat_ws(" ", kept).alias(text_col)
        if c == text_col
        else F.col(c)
        for c in df.columns
    ]
    return (
        df.join(per_doc, on=id_col, how="left")
        .withColumn("__spans", F.coalesce("__spans", F.array()))
        .select(
            *out_cols,
            F.coalesce("__cut", F.lit(0)).alias("removed_tokens"),
        )
    )


def span_dedup_stats(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "gram",
) -> DataFrame:
    """Per-document duplicated-token totals: ``(id, n_tokens, dup_tokens,
    dup_fraction, n_spans)`` for every document (clean docs included with
    zeros) — the cut-decision input for a ``dup_fraction <= x`` filter."""
    spans = duplicated_spans(df, k=k, id_col=id_col, text_col=text_col, key=key)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    base = df.select(
        id_col, F.size(F.split(F.col(text_col), " ")).alias("n_tokens")
    )
    return (
        base.join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        )
        .withColumn(
            "dup_fraction",
            F.when(
                F.col("n_tokens") > 0,
                F.col("dup_tokens") / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide EXACT paragraph dedup, keep-first — the Dolma-style
    middle ground between document dedup (too coarse for shared
    boilerplate) and k-token span dedup (finer, costlier): split each
    document on ``sep``, keep only the FIRST occurrence (lowest
    ``(id, position)``) of every exact paragraph string, reassemble.

    Scale shape (r8, digest-keyed): the keeper per paragraph comes
    from ONE hash aggregation GROUPED ON ``sha2(paragraph, 256)`` —
    the same never-shuffle-bodies-as-keys discipline as
    :func:`text.dedup.exact_dedup` — carrying the winning occurrence
    itself in the aggregate (``min(struct(id, pos, paragraph))``;
    (id, pos) is unique so the body never participates in the
    comparison). That makes the keeper rows the survivors directly:
    no join-back at all, and the only exchange that carries paragraph
    bodies is the partial-aggregated keeper shuffle (one body per
    distinct digest per map partition — a hot paragraph's million
    occurrences combine map-side) plus the unavoidable per-document
    reassembly shuffle, which keys on the document id. (Pre-r8 this
    grouped AND joined on the full paragraph string: every body
    crossed the wire twice, keyed by itself.) Map-side combinable;
    NEVER a count/rank window over the paragraph key, which would
    serialize a hot paragraph's occurrences into one task.
    Reassembly is a per-document sorted fold. Paragraphs shorter than
    ``min_chars`` (default 1 — i.e. empty strings from consecutive
    separators) pass through UNDEDUPED: they carry no content and
    deduping them corpus-wide would silently rewrite unrelated
    documents' spacing.

    Returns the input rows (full width) with ``text_col`` rewritten
    and ``n_paragraphs_dropped`` appended. Documents whose every
    paragraph drops keep their row with empty text. NULL-text rows
    pass through with 0 drops. ``sep`` is LITERAL on both sides: the
    split pattern is Pattern.quote-wrapped, because ``F.split`` takes
    a Java regex while the ``array_join`` reassembly is literal — an
    unquoted metacharacter separator (``'||'``, ``'. '``) would split
    per-character and reassemble garbage."""
    sep_pattern = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    paras = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), sep_pattern)).alias(
            "__pos", "__p"
        ),
    )
    dedupable = paras.filter(F.length("__p") >= min_chars)
    # keeper rows ARE the survivors: min(struct(id, pos, body)) under a
    # 256-bit digest key — (id, pos) is unique, so the body rides the
    # struct without ever ordering the comparison, and the exchange key
    # is 32 bytes regardless of paragraph length.
    kept_dedupable = (
        dedupable.groupBy(F.sha2(F.col("__p"), 256).alias("__h"))
        .agg(F.min(F.struct("__id", "__pos", "__p")).alias("__keep"))
        .select(
            F.col("__keep.__id").alias("__id"),
            F.col("__keep.__pos").alias("__pos"),
            F.col("__keep.__p").alias("__p"),
        )
    )
    survivors = kept_dedupable.unionByName(
        paras.filter(F.length("__p") < min_chars)
    )
    rebuilt = survivors.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__p"))),
                lambda s: s["__p"],
            ),
            sep,
        ).alias("__new_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    n_orig = F.size(
        F.split(F.coalesce(F.col(text_col), F.lit("")), sep_pattern)
    )
    out = (
        df.withColumn("__n_orig", F.when(F.col(text_col).isNotNull(), n_orig))
        .join(rebuilt, df[id_col] == rebuilt["__id"], "left")
        .withColumn(
            # __n_kept coalesces separately: a doc whose EVERY paragraph
            # dropped has no rebuilt row, and must report n_orig dropped,
            # not 0 (coalescing the whole difference would zero it)
            "n_paragraphs_dropped",
            F.coalesce(
                F.col("__n_orig") - F.coalesce(F.col("__n_kept"), F.lit(0)),
                F.lit(0),
            ).cast("int"),
        )
        .withColumn(
            text_col,
            F.when(
                F.col(text_col).isNotNull(),
                F.coalesce(F.col("__new_text"), F.lit("")),
            ),
        )
        .drop("__id", "__new_text", "__n_kept", "__n_orig")
    )
    return out
