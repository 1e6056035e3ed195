"""Property-based invariants for the text tier (spans, BPE, mixing).

Same regime as test_properties.py: hypothesis generates tiny random
corpora, each property runs a handful of Spark jobs, and the invariant
is checked against an independent Python computation of the same
quantity (not a re-run of the Spark code).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clickhouse_etl_spark.text.bpe import train_bpe, word_counts
from clickhouse_etl_spark.text.spans import (
    cut_duplicated_spans,
    duplicated_spans,
)

_SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny alphabet + short docs force collisions (duplicated shingles /
# mergeable pairs appear often).
words = st.text(alphabet="abc", min_size=1, max_size=3)
docs = st.lists(
    st.lists(words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)

K = 2


def _ref_duplicated_positions(texts: list[str], k: int) -> dict[int, set[int]]:
    """Independent reference: duplicated k-shingle start positions."""
    from collections import Counter

    grams: Counter = Counter()
    per_doc: dict[int, list[tuple[int, str]]] = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        lst = []
        if len(toks) >= k:
            for p in range(len(toks) - k + 1):
                g = " ".join(toks[p : p + k])
                grams[g] += 1
                lst.append((p, g))
        per_doc[i] = lst
    return {
        i: {p for p, g in lst if grams[g] >= 2} for i, lst in per_doc.items()
    }


@_SLOW
@given(docs)
def test_spans_cover_exactly_duplicated_tokens(spark, texts):
    """Span TOKEN coverage == the union of duplicated k-windows (the
    per-token guarantee cutting relies on; an interior window of a
    merged span need not itself be duplicated — adjacent windows merge)."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    spans = duplicated_spans(df, k=K).collect()
    ref = _ref_duplicated_positions(texts, K)
    ref_tokens = {
        i: {t for p in ps for t in range(p, p + K)} for i, ps in ref.items()
    }
    got_tokens: dict[int, set[int]] = {i: set() for i in ref}
    for r in spans:
        assert r.span_tokens == r.span_end - r.span_start >= K
        got_tokens[r.doc_id].update(range(r.span_start, r.span_end))
    assert got_tokens == ref_tokens
    # Spans within a doc are disjoint AND separated by a gap (maximal
    # merge: touching runs would have been fused).
    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for sp in by_doc.values():
        sp.sort()
        assert all(e0 < b1 for (_, e0), (b1, _) in zip(sp, sp[1:]))


@_SLOW
@given(docs)
def test_cut_preserves_non_span_tokens(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    cut = {r.doc_id: r for r in cut_duplicated_spans(df, k=K).collect()}
    spans = duplicated_spans(df, k=K, mark="non_first").collect()
    drop: dict[int, set[int]] = {}
    for r in spans:
        drop.setdefault(r.doc_id, set()).update(range(r.span_start, r.span_end))
    for i, t in enumerate(texts):
        toks = t.split(" ")
        kept = [w for p, w in enumerate(toks) if p not in drop.get(i, set())]
        assert cut[i].text == " ".join(kept)
        assert cut[i].removed_tokens == len(drop.get(i, set()))


@_SLOW
@given(docs, st.integers(min_value=1, max_value=6))
def test_bpe_merges_shrink_and_round_trip(spark, texts, n_merges):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    vocab = word_counts(df)
    if vocab.count() == 0:  # all-empty corpus
        return
    merges, symtab = train_bpe(vocab, n_merges)
    rows = symtab.collect()
    for r in rows:
        # Lossless: symbols always concatenate back to the word.
        assert "".join(r.syms) == r.word
        # Monotone: never more symbols than characters.
        assert 1 <= len(r.syms) <= len(r.word)
    # Each applied merge had corpus support >= 2 (min_count default),
    # counting OVERLAPPING adjacent pairs — canonical BPE get_stats
    # semantics ('aaa' contributes (a,a) twice).
    wc = {r.word: r.n for r in vocab.collect()}
    if merges:
        a, b = merges[0]
        support = sum(
            n
            for w, n in wc.items()
            for p in range(len(w) - 1)
            if (w[p], w[p + 1]) == (a, b)
        )
        assert support >= 2


@_SLOW
@given(docs)
def test_repetition_top_gram_matches_counter(spark, texts):
    """The longest-run fold over the sorted 3-gram array equals an
    independent Counter-based most-common count, and the dup fraction
    equals 1 - distinct/total, for arbitrary small-alphabet docs."""
    from collections import Counter

    from clickhouse_etl_spark.text.analysis import repetition_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n = max(len(toks) - 3, 0) + 1
        grams = [" ".join(toks[p : p + 3]) for p in range(n)]
        c = Counter(grams)
        assert got[i].top_3gram_ratio == round(max(c.values()) / len(grams), 6)
        assert got[i].dup_3gram_ratio == round(1 - len(c) / len(grams), 6)


@_SLOW
@given(docs, docs)
def test_contamination_fraction_matches_reference(spark, train_texts, bench_texts):
    """ngram_contamination equals a pure-Python per-doc overlap count:
    multiplicity on the train side, set semantics on the benchmark."""
    from clickhouse_etl_spark.text.packing import ngram_contamination

    n = 2
    def grams_of(t):
        toks = t.split(" ")
        m = max(len(toks) - n, 0) + 1
        return [" ".join(toks[p : p + n]) for p in range(m)]

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_texts)], "doc_id long, text string"
    )
    bench_set = {g for t in bench_texts for g in grams_of(t)}
    got = {r.doc_id: r for r in ngram_contamination(train, bench, n=n).collect()}
    assert set(got) == set(range(len(train_texts)))
    for i, t in enumerate(train_texts):
        gs = grams_of(t)
        matched = sum(1 for g in gs if g in bench_set)
        assert got[i].n_ngrams == len(gs)
        assert got[i].matched_ngrams == matched
        assert got[i].contamination_frac == round(matched / len(gs), 6)
