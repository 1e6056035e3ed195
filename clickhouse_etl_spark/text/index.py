"""Inverted index and TF-IDF — the retrieval-side text primitives.

A training-data pipeline is also a retrieval pipeline (corpus search,
near-duplicate triage, contamination forensics all want term lookup).
Both operators here are single-groupBy plans over the posexploded token
stream — pure JVM expressions, partial-aggregated, no Python.

Scale notes:
- The token explode is narrow (1 -> n_tokens fan-out inside the scan
  stage); the only shuffle is the groupBy on the term (or (term, doc))
  key. Term frequency follows a Zipf law, so the hot-term skew is real
  at 100 TB — ``min_df``/stopword cuts happen AFTER partial aggregation
  (map-side combine already collapsed per-partition duplicates), and
  the posting LIST build caps at ``max_postings`` per term so one
  stop-word cannot OOM a reducer; the full df/tf counts stay exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — per-document term frequencies (one shuffle).

    The tokenize + explode is per-row-expensive; spread a byte-small
    scan first (no-op when the input already has >= parallelism splits
    — same policy as the MinHash/SimHash shingle paths)."""
    from clickhouse_etl_spark.util import rebalance_for_compute

    df = rebalance_for_compute(df)
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_postings: int | None = None,
) -> DataFrame:
    """Term -> postings: ``(term, doc_freq, total_tf, postings)``.

    ``postings`` is the deterministic ``"id:tf,id:tf,..."`` string
    ordered by document id — a flat, comparable serialization (swap in
    ``collect_list(struct(...))`` for a struct-typed posting list when a
    consumer wants one). ``min_df`` prunes rare terms; ``max_postings``
    truncates each term's LIST to the lowest-id entries (df/tf stay
    exact) so Zipf-head terms cannot blow up a single reducer.
    """
    td = _doc_terms(df, id_col, text_col)
    postings = F.array_sort(F.collect_list(F.struct(id_col, "tf")))
    if max_postings is not None:
        postings = F.slice(postings, 1, max_postings)
    out = td.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
        F.concat_ws(
            ",",
            F.transform(
                postings,
                lambda x: F.concat_ws(":", x[id_col].cast("string"), x["tf"].cast("string")),
            ),
        ).alias("postings"),
    )
    if min_df > 1:
        out = out.filter(F.col("doc_freq") >= min_df)
    return out


def bm25_topk(
    df: DataFrame,
    query_terms,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25 (Robertson/
    Sparck Jones probabilistic ranking — the standard keyword-retrieval
    scorer; tf_idf above is the embedding-era weighting, BM25 the
    ranked-search one).

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`` (the +1 form —
    never negative for terms in more than half the corpus).

    Plan shape: document LENGTHS and the global (N, avgdl) need the full
    corpus (one per-doc aggregate + one scalar aggregate), but term
    statistics are filtered to the QUERY terms before any join — the
    per-term df/tf join only ever carries |query| terms per doc, and the
    final ranking is a TakeOrdered top-k, not a global sort. Scores are
    rounded to 6 decimals and tie-broken by ascending id so the result
    set is deterministic across partitionings.

    Output: ``(id_col, score)``, k rows (fewer if fewer docs match).
    """
    from clickhouse_etl_spark.util import materialize

    if isinstance(query_terms, str):
        # iterating a bare string would score single CHARACTERS and
        # return plausible-looking but wrong rankings
        raise TypeError(
            "query_terms must be a sequence of terms, not a string — "
            "pass e.g. query.split()"
        )
    terms = [t for t in query_terms if t]
    if not terms:
        raise ValueError("query_terms must contain at least one non-empty term")
    # td feeds THREE branches (query-term rows, document lengths, and the
    # corpus scalars via doc_len) — without a materialize the tokenize +
    # explode + groupBy shuffle would run once per branch, because the
    # term filter pushed into one branch breaks exchange reuse.
    td = materialize(_doc_terms(df, id_col, text_col))
    # full-corpus statistics (lengths include non-query terms!).
    # doc_len is NOT materialized: its two consumers (the corpus-scalar
    # aggregate and the per-doc join) each recompute one cheap 1-stage
    # aggregate from the already-materialized td — r6 profiling
    # (min-of-5, sf0.1) measured the extra eager checkpoint at +0.25s
    # vs +~0.1s of recompute, and at 100 TB the tradeoff leans the same
    # way (a second pass over a compact cached (id, len) aggregate vs
    # checkpointing it to executor storage).
    doc_len = td.groupBy(id_col).agg(F.sum("tf").alias("__len"))
    corpus = doc_len.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__len").alias("__avgdl")
    )
    qt = td.filter(F.col("term").isin(terms))
    df_t = qt.groupBy("term").agg(F.countDistinct(F.col(id_col)).alias("__df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__len") / F.col("__avgdl")
    )
    scored = (
        qt.join(F.broadcast(df_t), on="term")
        .join(doc_len, on=id_col)
        .crossJoin(F.broadcast(corpus))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf * F.lit(k1 + 1.0) / norm), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(document, term) smoothed TF-IDF weights.

    ``weight = (tf / doc_len) * (ln((1 + N) / (1 + df)) + 1)`` — the
    smooth-idf form (never zero, defined for unseen terms). N and the
    per-term df are computed in the same plan; N is a 1-row aggregate
    broadcast into the join, df joins on the term key.
    """
    td = _doc_terms(df, id_col, text_col)
    doc_len = td.groupBy(id_col).agg(F.sum("tf").alias("__len"))
    doc_freq = td.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("__n")
    )
    return (
        td.join(doc_len, on=id_col)
        .join(doc_freq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            (
                (F.col("tf") / F.col("__len"))
                * (
                    F.log((F.lit(1) + F.col("__n")) / (F.lit(1) + F.col("__df")))
                    + F.lit(1.0)
                )
            ).alias("weight"),
        )
    )
