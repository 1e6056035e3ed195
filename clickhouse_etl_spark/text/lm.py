"""Language-model quality scoring — the CCNet-style perplexity filter.

Web-corpus curation's standard "does this read like real text" signal
(Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data", 2020) scores each document under a language model
trained on a trusted reference corpus and drops the high-perplexity
tail. The full KenLM apparatus is out of scope for this container; the
honest distributed core is the UNIGRAM model — exactly expressible in
SQL (so the whole path is oracle-checkable), trained and applied in two
aggregations:

- **train**: one pass over the reference corpus → P(w) with add-k
  smoothing over the observed vocabulary (+1 bucket for any unseen
  word, so OOV mass is never zero).
- **score**: explode the target docs, broadcast-join the vocabulary
  (Zipf makes it small relative to any corpus), per-doc mean log-prob.
  The only shuffle is the per-doc aggregation, keyed by doc id.

Scores are mean log-probabilities (higher = more reference-like);
``perplexity`` = exp(-score) when a consumer wants the classic form.
A real KenLM/transformer scorer plugs into ``text.scoring
.score_documents``'s injectable ``model_fn`` — this module is the
built-in, dependency-free baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_unigram_lm(
    reference: DataFrame,
    text_col: str = "text",
    add_k: float = 1.0,
) -> DataFrame:
    """Unigram probabilities from a reference corpus: ``(word,
    logprob)`` with add-k smoothing. The smoothing denominator reserves
    one bucket for unseen words; :func:`unigram_logprob_scores` uses
    that same bucket's logprob for OOV tokens, so train/score agree on
    total probability mass."""
    if add_k <= 0:
        raise ValueError("add_k must be positive")
    words = reference.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__total"), F.count(F.lit(1)).alias("__vocab")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "word",
            F.log(
                (F.col("n") + F.lit(add_k))
                / (F.col("__total") + F.lit(add_k) * (F.col("__vocab") + 1))
            ).alias("logprob"),
        )
    )


def unigram_logprob_scores(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
) -> DataFrame:
    """Per-document mean unigram log-prob under ``lm`` (output of
    :func:`train_unigram_lm` with the SAME ``add_k``).

    OOV words take the smoothed unseen-bucket probability ``k / D``,
    derived from the model itself (``min(logprob)`` belongs to the
    rarest seen word with count>=1, so the unseen bucket is that value
    minus ``log(1 + k) - log(k)``) — no side channel needed, and the
    SQL oracle derives it identically.

    Output: ``(id_col, n_words, oov_frac, logprob_per_word)`` — NULL
    score for wordless docs. Higher = more reference-like;
    ``exp(-logprob_per_word)`` is the per-word perplexity.
    """
    import math

    if add_k <= 0:
        raise ValueError("add_k must be positive")
    # Unseen-word bucket, derived from the model itself: every seen
    # word's logprob is log((n + k)/D) over one shared denominator D,
    # so min(logprob) = log((n_min + k)/D) and the unseen bucket
    # log(k/D) = min(logprob) + log(k) - log(n_min + k). n_min = 1 in
    # every natural corpus (hapax legomena exist), which makes the
    # derivation exact; a pathological reference whose rarest word
    # repeats only makes the OOV bucket conservative (still below
    # every seen word). One 1-row aggregate, broadcast.
    bucket = lm.agg(F.min("logprob").alias("__rare"))
    oov = F.col("__rare") + F.lit(math.log(add_k) - math.log(1.0 + add_k))
    occurrences = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).filter(F.col("word") != "")
    joined = (
        occurrences.join(F.broadcast(lm), on="word", how="left")
        .crossJoin(F.broadcast(bucket))
        .select(
            id_col,
            F.col("logprob").isNull().cast("int").alias("__oov"),
            F.coalesce(F.col("logprob"), oov).alias("__lp"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.avg("__oov"), 6).alias("oov_frac"),
        F.round(F.avg("__lp"), 6).alias("logprob_per_word"),
    )


def perplexity_filter(
    docs: DataFrame,
    reference: DataFrame,
    max_perplexity: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
) -> DataFrame:
    """Keep documents whose per-word perplexity under the reference
    unigram LM is at most ``max_perplexity`` (the CCNet head/middle
    cut). Wordless docs are dropped (nothing to judge)."""
    lm = train_unigram_lm(reference, text_col, add_k)
    scores = unigram_logprob_scores(docs, lm, text_col, id_col, add_k)
    import math

    keep = scores.filter(
        F.col("logprob_per_word") >= -math.log(max_perplexity)
    ).select(id_col)
    return docs.join(keep, on=id_col, how="left_semi")
