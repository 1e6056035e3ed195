"""End-to-end training-corpus preparation (r7: + paragraph dedup,
Bloom decontamination, DSIR targeted selection) — the north-star tier as one
program over the driver's ``documents``/``embeddings`` tables.

Crawl layer (domain blocklist + canonical-URL dedup) → curate (dedup
chain + quality + PII + splits) → repetition and contamination screens
→ retrieval index + BM25 sanity probe → embedding near-dup pass →
token counting + concat-and-cut packing into one-file-per-shard
parquet. Every stage is an engine API; this file is the composed
recipe with a per-stage count report.

Run: ``python examples/training_corpus.py [sf_dir]``. Smoke-covered in
``tests/test_examples.py``.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str) -> dict:
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.text import curate_corpus
    from clickhouse_etl_spark.text.analysis import repetition_stats
    from clickhouse_etl_spark.text.index import bm25_topk
    from clickhouse_etl_spark.text.packing import pack_contiguous
    from clickhouse_etl_spark.text.similarity import embedding_cosine_neardup

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 0+1. Crawl layer + curation chain. The driver table carries no
    #    URL, so the example synthesizes one per document (re-fetch
    #    variants included) — real crawls arrive with this column.
    docs = docs.withColumn(
        "url",
        F.expr(
            "concat('https://', source, '.example.com/doc/', "
            "CAST(doc_id AS STRING), "
            "CASE WHEN doc_id % 9 = 0 THEN '?utm_source=crawl' ELSE '' END)"
        ),
    )
    cur = curate_corpus(
        docs,
        split_weights={"train": 0.95, "val": 0.05},
        url_col="url",
        domain_blocklist=["src0.example.com"],
    )
    # The curation chain's lineage is long (URL window + shingle joins +
    # span cuts); cut it here so every later stage and count starts from
    # a snapshot, not a recompile of the whole chain.
    from clickhouse_etl_spark.util import materialize

    corpus = materialize(cur.corpus, cut_lineage=True)

    # 2. Repetition screen (Gopher signals) — drop looped docs.
    loops = repetition_stats(corpus).filter(
        (F.col("dup_3gram_ratio") > 0.5) | (F.col("top_3gram_ratio") > 0.3)
    ).select("doc_id")
    corpus = corpus.join(loops, "doc_id", "left_anti")

    # 2b. Paragraph-level dedup (Dolma-style): shared boilerplate
    #     paragraphs keep one copy corpus-wide; docs survive rewritten.
    from clickhouse_etl_spark.text.spans import dedup_paragraphs

    corpus = dedup_paragraphs(corpus)

    # 3. Contamination screen against a held-out benchmark slice —
    #    the Bloom pre-pass form (the benchmark grams ride as one
    #    broadcast bitset; fpp sized for any-overlap dropping).
    from clickhouse_etl_spark.text.packing import decontaminate_bloom

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = decontaminate_bloom(corpus, bench, n=8, fpp=1e-6)

    # 3b. Language-model quality cut: drop the high-perplexity tail
    #     under a unigram LM trained on a trusted slice (CCNet-style).
    from clickhouse_etl_spark.text.lm import perplexity_filter

    trusted = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = perplexity_filter(corpus, trusted, max_perplexity=10_000.0)

    # 3c. DSIR targeted selection: keep the 300 docs most like the
    #     trusted slice (hashed-n-gram importance weights, Gumbel
    #     resample — deterministic under the seed).
    from clickhouse_etl_spark.text.dsir import dsir_select

    corpus = dsir_select(
        trusted, corpus, n=300, num_buckets=1024, seed=7
    ).drop("dsir_logweight")

    # 4. Retrieval sanity probe: the corpus must answer keyword queries.
    probe = bm25_topk(corpus, ["the", "data"], k=5)

    # 5. Embedding near-dup pass (LSH candidates, exact cosine verify).
    pairs = embedding_cosine_neardup(emb, threshold=0.95)

    # 5b. Semantic dedup (SemDeDup): k-means cells prune the pair
    #     search; one representative kept per in-cell duplicate group.
    from clickhouse_etl_spark.text.kmeans import train_kmeans
    from clickhouse_etl_spark.text.similarity import semantic_dedup

    cents, _ = train_kmeans(emb, 8, max_iters=3)
    # iterative min-label-propagation lineage: snapshot it once — the
    # ANN stage and the report counts would otherwise recompute the
    # transitive closure per action (same reason `corpus` is cut above)
    emb_kept = materialize(
        semantic_dedup(emb, cents, threshold=0.95), cut_lineage=True
    )

    # 5c. ANN serving index: PQ codebooks + IVFADC probe (the
    #     compressed-domain search the curated corpus ships with).
    from clickhouse_etl_spark.text.pq import ivf_pq_topk, train_pq

    books = train_pq(emb, m=8, ksub=16, max_iters=3)
    ann = ivf_pq_topk(
        emb_kept, emb_kept.limit(5), cents, books, k=5, nprobe=4
    )

    # 6. Pack the survivors into fixed-length training sequences, and
    #    land them as one parquet file per token-budget shard.
    packed = pack_contiguous(corpus, seq_len=512)
    import tempfile

    from clickhouse_etl_spark.text.packing import write_shards

    shard_dir = tempfile.mkdtemp(prefix="shards_")
    shard_plan = write_shards(corpus, shard_dir, tokens_per_shard=8192)

    report = dict(cur.report)
    report.update(
        {
            "post_screens": corpus.count(),
            "bm25_probe_rows": probe.count(),
            "neardup_pairs": pairs.count(),
            "semantic_kept": emb_kept.count(),
            "ann_probe_rows": ann.count(),
            "packed_docs": packed.count(),
            "n_shards": shard_plan.select("shard").distinct().count(),
            "train_frac": corpus.filter(F.col("split") == "train").count()
            / max(corpus.count(), 1),
        }
    )
    return report


if __name__ == "__main__":
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from clickhouse_etl_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    s = get_spark(master="local[8]")
    s.sparkContext.setLogLevel("ERROR")
    print(run(s, sf))
