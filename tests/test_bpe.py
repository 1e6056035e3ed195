"""Distributed BPE training/encoding pinned against a Python reference."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.text.bpe import (
    encode_words,
    tokenize_corpus,
    train_bpe,
    word_counts,
)

SF_DIR = "/root/testdata/sf0.001"
N_MERGES = 20


def _ref_train(wc: dict[str, int], n_merges: int, min_count: int = 2):
    """Reference BPE trainer: same tiebreak (count desc, then (a, b)
    lexicographic) and same greedy left-to-right merge application."""
    symtab = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in symtab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + wc[w]
        if not counts:
            break
        pair, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append(pair)
        a, b = pair
        for w, syms in symtab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symtab[w] = out
    return merges, symtab


def _corpus_wc(spark):
    docs = load_table(spark, SF_DIR, "documents")
    vocab = word_counts(docs)
    return docs, vocab, {r.word: r.n for r in vocab.collect()}


def test_train_matches_reference(spark):
    """Identical merge sequence AND identical final symbol table."""
    _, vocab, wc = _corpus_wc(spark)
    merges, symtab = train_bpe(vocab, N_MERGES)
    ref_merges, ref_symtab = _ref_train(wc, N_MERGES)
    assert merges == ref_merges
    got = {r.word: list(r.syms) for r in symtab.collect()}
    assert got == ref_symtab


def test_encode_reproduces_training_segmentation(spark):
    """Encoding a training word with the learned ranking yields exactly
    the segmentation training left it with."""
    _, vocab, _ = _corpus_wc(spark)
    merges, symtab = train_bpe(vocab, N_MERGES)
    trained = {r.word: list(r.syms) for r in symtab.collect()}
    encoded = {
        r.word: list(r.tokens)
        for r in encode_words(vocab.select("word"), merges).collect()
    }
    assert encoded == trained


def test_encode_lossless_and_oov(spark):
    """Tokens always concatenate back to the word — including words the
    trainer never saw (OOV falls back toward characters)."""
    _, vocab, _ = _corpus_wc(spark)
    merges, _ = train_bpe(vocab, N_MERGES)
    oov = spark.createDataFrame(
        [("zzgibberishqq",), ("the",), ("x",)], ["word"]
    )
    for r in encode_words(oov, merges).collect():
        assert "".join(r.tokens) == r.word
        assert all(len(t) >= 1 for t in r.tokens)


def test_tokenize_corpus_lossless(spark):
    """Per-document token streams concatenate back to the text with
    spaces removed — nothing dropped, nothing reordered."""
    docs, vocab, _ = _corpus_wc(spark)
    merges, _ = train_bpe(vocab, N_MERGES)
    toks = {r.doc_id: list(r.tokens) for r in tokenize_corpus(docs, merges).collect()}
    for row in docs.select("doc_id", "text").collect():
        assert "".join(toks[row.doc_id]) == row.text.replace(" ", "")


def test_min_count_stops_early(spark):
    """A huge min_count stops the loop immediately."""
    _, vocab, _ = _corpus_wc(spark)
    merges, symtab = train_bpe(vocab, N_MERGES, min_count=10**9)
    assert merges == []
    assert all(len(r.syms) == len(r.word) for r in symtab.collect())


def _ref_apply(symtab: dict, wc: dict, merges):
    """Apply a merge list sequentially with the reference scanner."""
    symtab = {w: list(s) for w, s in symtab.items()}
    for a, b in merges:
        for w, syms in symtab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symtab[w] = out
    return symtab


def test_sampled_vocabulary_training_matches_reference(spark):
    """The at-scale recipe caps the word table; equivalence with the
    Python reference holds bit-exactly ON THE SAMPLE (count desc, word
    asc is a total order, so the sample itself is deterministic)."""
    from clickhouse_etl_spark.text.bpe import sample_vocabulary

    _, vocab, wc = _corpus_wc(spark)
    top_n = 20
    top = sample_vocabulary(vocab, top_n)
    sampled_wc = {r.word: r.n for r in top.collect()}
    assert len(sampled_wc) == top_n
    # the sample is the vocabulary head: deterministic (count, word) cut
    expect = dict(sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n])
    assert sampled_wc == expect
    merges, symtab = train_bpe(top, N_MERGES)
    ref_merges, ref_symtab = _ref_train(sampled_wc, N_MERGES)
    assert merges == ref_merges
    assert {r.word: list(r.syms) for r in symtab.collect()} == ref_symtab


def test_batched_training_contract(spark):
    """Frequency-batched training: each round's batch is symbol-disjoint,
    applying the returned merge list SEQUENTIALLY with the reference
    scanner reproduces the final symbol table exactly (the disjointness
    equivalence), the first merge is the canonical argmax, and encoding
    with the batched ranking is lossless."""
    _, vocab, wc = _corpus_wc(spark)
    n = 3 * N_MERGES  # 3x the canonical test's merges, ~batch_size fewer rounds
    merges, symtab = train_bpe(vocab, n, batch_size=8)
    assert len(merges) == len(set(merges)) > 0
    # canonical first merge
    ref_merges, _ = _ref_train(wc, 1)
    assert merges[0] == ref_merges[0]
    # batch application == sequential application of the recorded order
    got = {r.word: list(r.syms) for r in symtab.collect()}
    init = {w: list(w) for w in wc}
    assert got == _ref_apply(init, wc, merges)
    # encoding with the batched ranking stays lossless
    for r in encode_words(vocab.select("word").limit(50), merges).collect():
        assert "".join(r.tokens) == r.word


def test_batched_rejects_bad_sizes(spark):
    import pytest

    from clickhouse_etl_spark.text.bpe import sample_vocabulary

    _, vocab, _ = _corpus_wc(spark)
    with pytest.raises(ValueError):
        train_bpe(vocab, 5, batch_size=0)
    with pytest.raises(ValueError):
        sample_vocabulary(vocab, 0)


def test_select_batch_blocks_merged_output_aliasing():
    """A batch pair whose merged output equals another pair's symbol
    would cascade in the single fold (folding 'ab','c' yields 'abc',
    which ('abc','d') would then consume — diverging from sequential
    application). The selection must skip such pairs."""
    from clickhouse_etl_spark.text.bpe import _select_batch

    ranked = [("abc", "d"), ("ab", "c"), ("x", "y")]
    assert _select_batch(ranked, 3) == [("abc", "d"), ("x", "y")]
    # reverse ranking: same protection in the other direction
    assert _select_batch([("ab", "c"), ("abc", "d"), ("x", "y")], 3) == [
        ("ab", "c"),
        ("x", "y"),
    ]
    # plain symbol sharing still conflicts
    assert _select_batch([("a", "b"), ("b", "c"), ("c", "d")], 3) == [("a", "b"), ("c", "d")]


def test_train_bpe_matches_duckdb_unrolled_merges(spark):
    """The tokenizer tier under the registry's DuckDB value-hash regime
    (r7 VERDICT ask #5): canonical sequential BPE training (8 merges,
    batch_size=1) against the unrolled-merge fence-wrap oracle.

    This construction PROVED the row SQL-expressible, and the round-9
    rotation promoted it to the driver registry (ns_train_bpe,
    queries/northstar.py) — the oracle now lives there
    (_bpe_oracle; the fence-wrap semantics argument is in its comment
    block) and this test pins the identical check at smoke SF so the
    tier stays covered even if a future rotation demotes the row."""
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.queries.northstar import _bpe_oracle, _BPE_MERGES
    from tools.oracle_check import assert_matches_oracle

    docs = load_table(spark, SF_DIR, "documents")
    vocab = word_counts(docs)
    merges, symtab = train_bpe(vocab, n_merges=_BPE_MERGES, batch_size=1)
    assert len(merges) == _BPE_MERGES  # corpus is repetitive enough
    # Space-join syms exactly like the registered projection: the oracle's
    # final SELECT serializes the array (driver-canon atomicity contract).
    proj = symtab.select("word", "n", F.concat_ws(" ", "syms").alias("syms"))
    assert_matches_oracle(proj, _bpe_oracle(), SF_DIR)


def test_bpe_oracle_early_stop_no_op_stages(spark, tmp_path):
    """r9 ADVICE: when the corpus yields fewer than _BPE_MERGES mergeable
    pairs, each exhausted oracle stage must be a NO-OP (COALESCE'd
    can't-match pattern), not a CROSS JOIN against an empty argmax that
    empties every later stage — and train_bpe's early stop must agree.

    A corpus of unique non-repetitive words ("abcd", "efgh", ...) has
    every adjacent pair count exactly 1, so zero merges fire: the
    oracle must return the FULL single-char symbol table, matching the
    engine's early-stopped output."""
    import duckdb

    from pyspark.sql import functions as F

    from clickhouse_etl_spark.queries.northstar import _bpe_oracle
    from tools.oracle_check import canon_rows

    words = ["abcd", "efgh", "ijkl", "mnop"]
    docs = spark.createDataFrame(
        [(" ".join(words),)], "text string"
    ).withColumn("doc_id", F.lit(1))
    p = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(p)

    vocab = word_counts(docs)
    merges, symtab = train_bpe(vocab, n_merges=8, batch_size=1)
    assert merges == []  # early stop: nothing repeats
    proj = symtab.select("word", "n", F.concat_ws(" ", "syms").alias("syms"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    cur = con.execute(_bpe_oracle())
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    con.close()

    assert len(drows) == len(words)  # NOT the r9 failure mode (0 rows)
    sc, sr = canon_rows(proj.columns, [tuple(r) for r in proj.collect()])
    dc, dr = canon_rows(dcols, drows)
    assert sc == dc and sr == dr
