"""Near-dup / ANN recall vs exact ground truth (VERDICT r1 item 7).

These pin the *approximation contracts*: SimHash banding must have
recall 1.0 within its guaranteed Hamming radius, MinHash-LSH recall is
measured against exact all-pairs Jaccard (target documented ≥ 0.9 at the
operating threshold), and the LSH ANN must retrieve planted
near-duplicate vectors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.text.dedup import (
    _shingles,
    minhash_near_duplicates,
    simhash_near_duplicates,
    simhash_signatures,
)
from clickhouse_etl_spark.text.similarity import (
    brute_force_cosine_topk,
    ivf_ann_topk,
    lsh_ann_topk,
)
from tests.conftest import SF_SMOKE, rows_set


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_simhash_recall_within_radius_is_total(spark, docs):
    """Pigeonhole contract: every pair at hamming ≤ bands-1 is found."""
    sigs = simhash_signatures(docs)
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= 3)
    )
    truth_pairs = rows_set(truth, "doc_a", "doc_b")
    got_pairs = rows_set(
        simhash_near_duplicates(docs, max_hamming=3, bands=4), "doc_a", "doc_b"
    )
    assert got_pairs == truth_pairs  # exact: banding is complete AND verified


def test_simhash_rejects_uncovered_radius(docs):
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_duplicates(docs, max_hamming=16, bands=4)


def test_minhash_recall_vs_exact_jaccard(spark, docs):
    threshold = 0.2
    sets = docs.select(
        "doc_id", F.array_distinct(_shingles("text", 3)).alias("s")
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "j",
            F.size(F.array_intersect("sa", "sb"))
            / F.size(F.array_union("sa", "sb")),
        )
        .filter(F.col("j") >= threshold)
    )
    truth_pairs = rows_set(truth, "doc_a", "doc_b")
    got_pairs = rows_set(
        minhash_near_duplicates(docs, jaccard_threshold=threshold),
        "doc_a",
        "doc_b",
    )
    # LSH candidates are verified with exact Jaccard → no false positives…
    assert got_pairs <= truth_pairs
    # …and banding recall at j≥0.2 with 16 hashes / 4 bands must hold the
    # documented floor.
    if truth_pairs:
        recall = len(got_pairs) / len(truth_pairs)
        assert recall >= 0.9, f"minhash recall {recall:.3f} < 0.9"


def test_ann_retrieves_planted_near_duplicates(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    # Plant a near-identical copy of each query (tiny deterministic
    # perturbation, cosine ≈ 0.9999) at vec_id + 100000.
    planted = queries.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x * (1.0 + 0.001 * sin(i)))"
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    out = lsh_ann_topk(corpus, queries, k=5)
    got = {(r["query_id"], r["vec_id"]) for r in out.collect()}
    for q in range(3):
        assert (q, q + 100000) in got, f"planted near-dup missed for query {q}"


def test_ivf_retrieves_planted_near_duplicates(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    planted = queries.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x * (1.0 + 0.001 * sin(i)))"
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    got = {
        (r["query_id"], r["vec_id"])
        for r in ivf_ann_topk(corpus, queries, k=5).collect()
    }
    # a near-identical vector maps to the query's own top cell → always
    # probed (nprobe ≥ 1), and it ranks #1 by cosine.
    for q in range(3):
        assert (q, q + 100000) in got, f"IVF missed planted near-dup for query {q}"


def test_chunking_reconstructs_document(spark):
    """Chunks with overlap must tile the document: dropping each chunk's
    overlap prefix (except chunk 0) and concatenating reconstructs the
    original token stream exactly."""
    from clickhouse_etl_spark.text.analysis import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))), (2, "short doc")],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, chunk_tokens=30, overlap_tokens=5)
    rows = sorted(
        ((r["doc_id"], r["chunk_no"], r["chunk_text"]) for r in out.collect())
    )
    by_doc = {}
    for doc_id, chunk_no, text in rows:
        toks = text.split(" ")
        if chunk_no > 0:
            toks = toks[5:]  # drop the overlap prefix
        by_doc.setdefault(doc_id, []).extend(toks)
    assert by_doc[1] == [f"w{i}" for i in range(100)]
    assert by_doc[2] == ["short", "doc"]
    # every chunk except possibly the last is exactly chunk_tokens long
    for doc_id, chunk_no, text in rows[:-1]:
        if doc_id == 1 and chunk_no < max(c for d, c, _ in rows if d == 1):
            assert len(text.split(" ")) == 30


def test_embedding_neardup_finds_planted_pair_no_false_positives(spark):
    from clickhouse_etl_spark.text.similarity import embedding_cosine_neardup

    emb = load_table(spark, SF_SMOKE, "embeddings")
    planted = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x * (1.0 + 0.001 * sin(i)))"
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    out = embedding_cosine_neardup(corpus, threshold=0.9)
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in out.collect()}
    for q in range(3):
        assert (q, q + 100000) in got, f"planted near-dup pair {q} missed"
    # exact verification → every reported cosine must really be ≥ 0.9
    assert all(c >= 0.9 for c in got.values())


def test_rolling_hash_matches_python_reference(spark, docs):
    from clickhouse_etl_spark.text.analysis import (
        ROLLING_BASE,
        document_rolling_fingerprint,
    )

    sample = docs.limit(5)
    got = {
        r["doc_id"]: r["rolling_fp"]
        for r in document_rolling_fingerprint(sample).collect()
    }
    mask = (1 << 64) - 1
    for r in sample.collect():
        h = 0
        for ch in r["text"]:
            h = (h * ROLLING_BASE + ord(ch)) & mask
        expect = h - (1 << 64) if h >= (1 << 63) else h  # signed int64
        assert got[r["doc_id"]] == expect


def test_ann_is_subset_of_bruteforce_universe(spark):
    """ANN results carry correct cosines: each (query, id, cosine) triple
    must agree with the exact computation from the brute-force path."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_cosine_topk(emb, queries, k=1000)
    exact_map = {
        (r["query_id"], r["vec_id"]): r["cosine"] for r in exact.collect()
    }
    for r in lsh_ann_topk(emb, queries, k=5).collect():
        key = (r["query_id"], r["vec_id"])
        assert key in exact_map
        assert r["cosine"] == pytest.approx(exact_map[key], abs=1e-6)


def test_simhash_pandas_twos_complement(spark):
    """The pandas SimHash must map bit-63-set signatures to the correct
    NEGATIVE int64 (subtracting 2^63 instead of 2^64 cleared bit 63 and
    corrupted Hamming distances) — pinned against a Python reference."""
    import hashlib

    from clickhouse_etl_spark.text.dedup import simhash_signatures

    def ref_sig(text):
        acc = [0] * 64
        for w in text.split():
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            for b in range(64):
                acc[b] += 1 if (h >> b) & 1 else -1
        sig = sum(1 << b for b in range(64) if acc[b] > 0)
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    # Enough distinct words that some signature sets bit 63.
    rows = [(i, f"w{i}a w{i}b w{i}c common tokens here") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.simhash
        for r in simhash_signatures(df, impl="pandas").collect()
    }
    expect = {i: ref_sig(t) for i, t in rows}
    assert got == expect
    assert any(v < 0 for v in expect.values()), "fixture must exercise bit 63"


def test_auto_planes_scaling():
    """Constant expected bucket occupancy: planes grow with log2(n), so
    2^planes tracks the corpus instead of filling linearly (the
    BENCH_SCALE-measured quadratic guard)."""
    from clickhouse_etl_spark.text.similarity import auto_planes

    assert auto_planes(0) == 4 and auto_planes(100) == 4
    assert auto_planes(2_000) == 7
    assert auto_planes(20_000) == 11  # 10x corpus -> ~log2(10) more planes
    assert auto_planes(2_000_000) == 17
    # occupancy stays in [target, 2*target) at every size
    for n in (10_000, 100_000, 1_000_000):
        occ = n / 2 ** auto_planes(n)
        assert 8 <= occ <= 16.0001


def test_embedding_neardup_auto_planes_runs(spark):
    """num_planes='auto' resolves from the corpus count and the pair set
    stays a subset of the exhaustive same-params run (LSH only ever
    DROPS candidates; the cosine verify admits no false positives)."""
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.text.similarity import (
        auto_planes,
        embedding_cosine_neardup,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    msgs = []
    got = embedding_cosine_neardup(
        emb, threshold=0.35, num_planes="auto", log_fn=msgs.append
    ).collect()
    n = emb.count()
    assert msgs and msgs[0] == f"auto_planes -> {auto_planes(n)}"
    explicit = embedding_cosine_neardup(
        emb, threshold=0.35, num_planes=auto_planes(n)
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {
        (r.id_a, r.id_b) for r in explicit
    }


def test_kernel_auto_row_count_floor(spark):
    """kernel='auto' is size-aware (r8): below _GEMM_FLOOR_ROWS corpus
    vectors the Arrow worker round-trip costs more than the JVM folds
    save, so small corpora keep the bit-deterministic expr chain and
    large ones get the BLAS kernel. Pinned via the log_fn dispatch
    message on both sides of the floor."""
    from pyspark.sql import functions as F

    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.text.similarity import (
        _GEMM_FLOOR_ROWS,
        embedding_cosine_neardup,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    small_msgs = []
    embedding_cosine_neardup(
        emb, threshold=0.35, num_planes=6, log_fn=small_msgs.append
    ).count()
    assert (
        f"kernel auto -> expr (<{_GEMM_FLOOR_ROWS} vectors)" in small_msgs
    )

    big = spark.range(_GEMM_FLOOR_ROWS).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "array(cast(id % 7 as double), cast(id % 11 as double),"
            " cast(id % 13 as double), 1.0d)"
        ).alias("embedding"),
    )
    big_msgs = []
    embedding_cosine_neardup(
        big, threshold=0.99999, num_planes=6, max_bucket_size=50,
        log_fn=big_msgs.append,
    ).count()
    assert (
        f"kernel auto -> gemm (>={_GEMM_FLOOR_ROWS} vectors)" in big_msgs
    )


def test_embedding_neardup_rejects_unknown_planes_string(spark):
    import pytest

    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.text.similarity import embedding_cosine_neardup

    emb = load_table(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError, match="num_planes"):
        embedding_cosine_neardup(emb, num_planes="Auto")


def test_lsh_ann_auto_planes(spark):
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.text.similarity import auto_planes, lsh_ann_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 2)
    got = lsh_ann_topk(emb, q, k=3, num_planes="auto").collect()
    want = lsh_ann_topk(emb, q, k=3, num_planes=auto_planes(emb.count())).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    import pytest

    with pytest.raises(ValueError, match="num_planes"):
        lsh_ann_topk(emb, q, num_planes="AUTO")
