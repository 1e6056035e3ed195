"""DuckDB-oracle checks for queries demoted from the driver registry.

The driver's correctness gate checks a bounded window of registered
queries (50 in round 2), so the registry is capped at 50 entries. The
operators below lost their registry slot to consolidation but keep the
SAME oracle rigor here: Spark result vs DuckDB SQL on the sf0.001
parquet, row-count + columns + order-insensitive canonicalized values —
the exact comparison tools/oracle_check.py and the driver run.

Covered: anti-join membership (anti_customers_without_orders), A6 credit
totals (a6_credit_totals), embedding L2-normalization
(ns_normalize_embeddings), sliding windows (stream_sliding_2h).
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from tools.oracle_check import assert_matches_oracle

SF_DIR = "/root/testdata/sf0.001"


def _assert_matches_oracle(sdf, oracle_sql):
    assert_matches_oracle(sdf, oracle_sql, SF_DIR)


def test_anti_customers_without_orders(spark):
    """Anti-join negative membership (reference 'if key in processed:
    continue'), checked standalone against NOT EXISTS."""
    from clickhouse_etl_spark.operators.joins import anti_join

    customer = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    keys = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    inactive = anti_join(customer, keys, on="c_custkey", broadcast=False)
    out = inactive.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_acctbal"),
    )
    _assert_matches_oracle(
        out,
        """
        SELECT c_mktsegment, count(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment
        """,
    )


def test_a6_credit_totals(spark):
    """A6 credit totals / weighted GPA via operators.credit_totals."""
    from clickhouse_etl_spark.operators.aggregates import credit_totals

    li = load_table(spark, SF_DIR, "lineitem")
    out = credit_totals(li, ["l_returnflag"], credit="l_quantity", gpa="l_discount")
    out = out.select(
        "l_returnflag",
        F.col("totalCredits").cast("double").alias("totalCredits"),
        F.round("totalGPA", 6).alias("weightedDiscount"),
        F.col("subjectCount").cast("long").alias("subjectCount"),
    )
    _assert_matches_oracle(
        out,
        """
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS totalCredits,
               ROUND(SUM(l_quantity * l_discount) / SUM(l_quantity), 6) AS weightedDiscount,
               count(*) AS subjectCount
        FROM lineitem GROUP BY l_returnflag
        """,
    )


def test_normalize_embeddings(spark):
    """Embedding L2-normalization: original norm reported, unit norm == 1."""
    from clickhouse_etl_spark.text.similarity import normalize_embeddings

    emb = load_table(spark, SF_DIR, "embeddings")
    out = normalize_embeddings(emb)
    unit_norm = (
        "round(sqrt(aggregate(transform(unit_vec, x -> x * x),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)), 6)"
    )
    out = out.select(
        "vec_id",
        F.round("l2_norm", 6).alias("l2_norm"),
        F.expr(unit_norm).alias("unit_norm"),
    )
    _assert_matches_oracle(
        out,
        """
        SELECT vec_id,
               ROUND(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                                        x -> x * x), 'sum')), 6) AS l2_norm,
               1.0 AS unit_norm
        FROM embeddings
        """,
    )


def test_neardup_clusters_known_graph(spark):
    """Triangle {1,2,3}, chain {10-11-12-13}, pair {20,21}: labels are the
    component minima; keep-list sizes match."""
    from clickhouse_etl_spark.text.dedup import dedup_keep_list, neardup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        ["doc_a", "doc_b"],
    )
    clusters = {
        r["doc_id"]: r["cluster_id"] for r in neardup_clusters(pairs).collect()
    }
    assert clusters == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10,
                        20: 20, 21: 20}
    keep = {
        r["cluster_id"]: (r["keep_id"], r["n_members"])
        for r in dedup_keep_list(neardup_clusters(pairs)).collect()
    }
    assert keep == {1: (1, 3), 10: (10, 4), 20: (20, 2)}


def test_neardup_clusters_kernels_agree(spark):
    """r13 kernel dispatch: the bounded driver union-find (small pair
    lists) and the distributed min-label propagation
    (driver_max_edges=0) must produce identical (doc_id, cluster_id)
    labels — pinned on a graph with a long chain (propagation needs
    multiple rounds), duplicate edges, and an isolated pair."""
    from clickhouse_etl_spark.text.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),  # 7-chain
         (2, 3), (1, 2),                                   # dup edges
         (40, 41), (50, 60), (60, 70), (50, 70)],
        ["doc_a", "doc_b"],
    )
    fast = sorted(map(tuple, neardup_clusters(pairs).collect()))
    dist = sorted(
        map(tuple, neardup_clusters(pairs, driver_max_edges=0).collect())
    )
    assert fast == dist
    assert fast == [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (6, 1),
                    (7, 1), (40, 40), (41, 40), (50, 50), (60, 50),
                    (70, 50)]


def test_neardup_clusters_matches_recursive_oracle(spark):
    """Connected components over the REAL MinHash pair list (poly family,
    sf0.001) must equal DuckDB's recursive-CTE transitive closure."""
    from clickhouse_etl_spark.queries.northstar import _minhash_oracle
    from clickhouse_etl_spark.text.dedup import (
        minhash_near_duplicates,
        neardup_clusters,
    )

    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_near_duplicates(
        docs, jaccard_threshold=0.2, hash_family="poly"
    )
    clusters = neardup_clusters(pairs)
    oracle = f"""
    WITH pairs AS ({_minhash_oracle()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT DISTINCT src, src AS dst FROM edges
      UNION
      SELECT r.src, e.dst
      FROM reach r JOIN edges e ON e.src = r.dst
    )
    SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    """
    _assert_matches_oracle(clusters, "WITH RECURSIVE " + oracle.strip().removeprefix("WITH "))


def test_assign_splits_oracle_and_invariants(spark):
    """Deterministic split assignment: disjoint+exhaustive, stable across
    runs, and (with the arithmetic bucket) DuckDB-reproducible."""
    from clickhouse_etl_spark.operators.sampling import assign_splits

    events = load_table(spark, SF_DIR, "events")
    bucket = F.pmod(F.col("event_id") * F.lit(2654435761), F.lit(1_000_000))
    out = assign_splits(
        events.select("event_id"),
        key_cols=["event_id"],
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
        bucket_expr=bucket,
    )
    _assert_matches_oracle(
        out,
        """
        SELECT event_id,
               CASE WHEN (event_id * 2654435761) % 1000000 < 800000 THEN 'train'
                    WHEN (event_id * 2654435761) % 1000000 < 900000 THEN 'val'
                    ELSE 'test' END AS split
        FROM events
        """,
    )
    # default xxhash64 bucket: same key -> same split on a rerun; weights
    # roughly honored
    a = assign_splits(events, ["event_id"]).groupBy("split").count().collect()
    b = assign_splits(events, ["event_id"]).groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    counts = {r["split"]: r["count"] for r in a}
    total = sum(counts.values())
    assert abs(counts["train"] / total - 0.9) < 0.05


def test_stratified_deterministic_sample(spark):
    """Per-stratum keep rates, deterministic membership, DuckDB twin."""
    from clickhouse_etl_spark.operators.sampling import (
        stratified_deterministic_sample,
    )

    events = load_table(spark, SF_DIR, "events").select("event_id", "event_type")
    bucket = F.pmod(F.col("event_id") * F.lit(2654435761), F.lit(1_000_000))
    out = stratified_deterministic_sample(
        events,
        strata_col="event_type",
        fractions={"click": 0.5, "view": 0.1},
        key_cols=["event_id"],
        bucket_expr=bucket,
    )
    _assert_matches_oracle(
        out,
        """
        SELECT event_id, event_type
        FROM events
        WHERE (event_id * 2654435761) % 1000000 <
              CAST(CASE event_type WHEN 'click' THEN 0.5
                   WHEN 'view' THEN 0.1 ELSE 0.0 END * 1000000 AS BIGINT)
        """,
    )


def test_top_k_vocab(spark):
    """Vocabulary builder: top-k word frequencies, deterministic
    tiebreak, checked against DuckDB."""
    from clickhouse_etl_spark.text.analysis import top_k_vocab

    docs = load_table(spark, SF_DIR, "documents")
    out = top_k_vocab(docs, k=50)
    _assert_matches_oracle(
        out,
        """
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
        ORDER BY n DESC, word ASC
        LIMIT 50
        """,
    )


def test_corpus_quality_filter(spark):
    """Keep/drop decisions + first-failing-rule reasons vs DuckDB."""
    from clickhouse_etl_spark.text.analysis import STOPWORDS, corpus_quality_filter

    docs = load_table(spark, SF_DIR, "documents")
    out = corpus_quality_filter(
        docs, min_tokens=40, max_stopword_ratio=0.25, max_punct_ratio=0.01
    )
    stop_sql = ", ".join(f"'{w}'" for w in STOPWORDS)
    punct = r"[!-/:-@\[-`{-~]"
    _assert_matches_oracle(
        out,
        f"""
        WITH s AS (
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_tokens,
                 ROUND(CAST(len(list_filter(string_split(text, ' '),
                                            x -> x IN ({stop_sql}))) AS DOUBLE)
                       / len(string_split(text, ' ')), 6) AS stopword_ratio,
                 ROUND(CAST(length(text) - length(regexp_replace(text, '{punct}', '', 'g')) AS DOUBLE)
                       / GREATEST(length(text), 1), 6) AS punct_ratio
          FROM documents
        )
        SELECT doc_id, n_tokens, stopword_ratio, punct_ratio,
               (reason IS NULL) AS keep, reason AS drop_reason
        FROM (
          SELECT *, CASE WHEN n_tokens < 40 THEN 'too_short'
                         WHEN stopword_ratio > 0.25 THEN 'stopword_heavy'
                         WHEN punct_ratio > 0.01 THEN 'punct_heavy' END AS reason
          FROM s
        )
        """,
    )
    # the thresholds actually fire on the fixture (not a vacuous filter)
    kept = out.filter("keep").count()
    assert 0 < kept < out.count()


def test_stream_sliding_2h(spark):
    """Sliding window batch form (2h / 1h slide: every event in 2 windows)."""
    from clickhouse_etl_spark.queries.streaming_batch import stream_sliding_2h

    out = stream_sliding_2h(spark, SF_DIR)
    _assert_matches_oracle(
        out,
        """
        SELECT window_start, count(*) AS n_events
        FROM (
          SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                         date_trunc('hour', ts)]) AS window_start
          FROM events
        )
        GROUP BY window_start
        """,
    )


# ---------------------------------------------------------------------------
# Round-3 training-pipeline additions: packing / contamination / PII /
# repetition — same DuckDB value-hash rigor as the registry.
# ---------------------------------------------------------------------------

_DUCK_GRAMS3 = (
    "list_distinct(list_transform("
    "range(0, greatest(len(string_split(text,' ')) - 3, 0) + 1), "
    "i -> array_to_string(list_slice(string_split(text,' '), i+1, i+3), ' ')))"
)


def test_pack_contiguous_global(spark):
    """Concat-and-cut packing, global stream: offsets/sequence spans match
    a DuckDB cumulative-sum window exactly."""
    from clickhouse_etl_spark.text.packing import pack_contiguous

    docs = load_table(spark, SF_DIR, "documents")
    out = pack_contiguous(docs, seq_len=256)
    _assert_matches_oracle(
        out,
        """
        WITH t AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
        ), o AS (
          SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS stream_offset
          FROM t
        )
        SELECT doc_id, n_tokens, stream_offset,
               CAST(FLOOR(stream_offset / 256.0) AS BIGINT) AS first_seq,
               CAST(FLOOR((stream_offset + n_tokens - 1) / 256.0) AS BIGINT)
                 AS last_seq,
               CAST(FLOOR((stream_offset + n_tokens - 1) / 256.0)
                    - FLOOR(stream_offset / 256.0) + 1 AS INT) AS n_seqs
        FROM o
        """,
    )


def test_pack_contiguous_sharded(spark):
    """The 100 TB form: per-shard streams (window partitioned by source)."""
    from clickhouse_etl_spark.text.packing import pack_contiguous

    docs = load_table(spark, SF_DIR, "documents")
    out = pack_contiguous(docs, seq_len=128, shard_col="source")
    _assert_matches_oracle(
        out,
        """
        WITH t AS (
          SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
          FROM documents
        ), o AS (
          SELECT source, doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS stream_offset
          FROM t
        )
        SELECT source, doc_id, n_tokens, stream_offset,
               CAST(FLOOR(stream_offset / 128.0) AS BIGINT) AS first_seq,
               CAST(FLOOR((stream_offset + n_tokens - 1) / 128.0) AS BIGINT)
                 AS last_seq,
               CAST(FLOOR((stream_offset + n_tokens - 1) / 128.0)
                    - FLOOR(stream_offset / 128.0) + 1 AS INT) AS n_seqs
        FROM o
        """,
    )


def test_contamination_check(spark):
    """Word-3-gram train/benchmark overlap counts vs a DuckDB unnest-join.
    Benchmark = every 37th document; counts are exact on both sides."""
    from clickhouse_etl_spark.text.packing import contamination_check

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    train = docs.filter(F.col("doc_id") % 37 != 0)
    out = contamination_check(train, bench, n=3)
    _assert_matches_oracle(
        out,
        f"""
        WITH sh AS (
          SELECT doc_id, {_DUCK_GRAMS3} AS grams FROM documents
        ),
        t AS (SELECT doc_id, unnest(grams) AS gram FROM sh
              WHERE doc_id % 37 <> 0),
        b AS (SELECT doc_id AS bench_id, unnest(grams) AS gram FROM sh
              WHERE doc_id % 37 = 0)
        SELECT t.doc_id,
               COUNT(DISTINCT t.gram) AS overlap_ngrams,
               COUNT(DISTINCT b.bench_id) AS bench_docs
        FROM t JOIN b USING (gram)
        GROUP BY t.doc_id
        """,
    )


def test_pii_scrub(spark):
    """Email/IP/phone redaction + counts, on documents salted with
    deterministic PII (the raw corpus has none), vs DuckDB RE2."""
    from clickhouse_etl_spark.text.analysis import pii_scrub

    salt = (
        "CASE WHEN doc_id % 3 = 0"
        " THEN ' contact bob@example.com or sue+x@sub.test.org'"
        " WHEN doc_id % 3 = 1"
        " THEN ' from 10.0.0.1 dial +1 555 123-4567 now'"
        " ELSE '' END"
    )
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "text", F.expr(f"concat(text, {salt})")
    )
    out = pii_scrub(docs)
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
    phone = r"\+?\d[\d()/ .-]{7,}\d"
    _assert_matches_oracle(
        out,
        f"""
        WITH salted AS (
          SELECT doc_id, text || {salt} AS text FROM documents
        ), s1 AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '{email}')) AS c1,
                 regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t1
          FROM salted
        ), s2 AS (
          SELECT doc_id, c1,
                 len(regexp_extract_all(t1, '{ip}')) AS c2,
                 regexp_replace(t1, '{ip}', '<IP>', 'g') AS t2
          FROM s1
        )
        SELECT doc_id,
               regexp_replace(t2, '{phone}', '<PHONE>', 'g') AS scrubbed_text,
               CAST(c1 + c2 + len(regexp_extract_all(t2, '{phone}')) AS INT)
                 AS n_redactions
        FROM s2
        """,
    )


def test_repetition_stats(spark):
    """Duplicate-token / duplicate-3-gram / top-3-gram fractions vs
    DuckDB list ops (the top-gram count cross-checked by an explicit
    unnest + groupBy max — the engine computes it as a longest-run fold
    over the sorted gram array instead)."""
    from clickhouse_etl_spark.text.analysis import repetition_stats

    docs = load_table(spark, SF_DIR, "documents")
    out = repetition_stats(docs)
    _assert_matches_oracle(
        out,
        f"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 {_DUCK_GRAMS3.replace("list_distinct(", "", 1)[:-1]} AS grams
          FROM documents
        ),
        top AS (
          SELECT doc_id, MAX(c) AS topc FROM (
            SELECT doc_id, g, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(grams) AS g FROM t)
            GROUP BY doc_id, g
          ) GROUP BY doc_id
        )
        SELECT t.doc_id, len(toks) AS n_tokens,
               ROUND(1 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
                 AS dup_token_ratio,
               ROUND(1 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
                 AS dup_3gram_ratio,
               ROUND(CAST(top.topc AS DOUBLE) / len(grams), 6)
                 AS top_3gram_ratio
        FROM t JOIN top ON t.doc_id = top.doc_id
        """,
    )


def test_ngram_contamination_fraction(spark):
    """Multiplicity-weighted contamination fraction vs a DuckDB
    unnest-join: benchmark = every 37th document, 3-grams. Every doc is
    emitted (zero matches included)."""
    from clickhouse_etl_spark.text.packing import ngram_contamination

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    train = docs.filter(F.col("doc_id") % 37 != 0)
    out = ngram_contamination(train, bench, n=3)
    _assert_matches_oracle(
        out,
        f"""
        WITH sh AS (
          SELECT doc_id,
                 {_DUCK_GRAMS3.replace("list_distinct(", "", 1)[:-1]} AS grams
          FROM documents
        ),
        occ AS (SELECT doc_id, unnest(grams) AS gram FROM sh
                WHERE doc_id % 37 <> 0),
        b AS (SELECT DISTINCT unnest(grams) AS gram FROM sh
              WHERE doc_id % 37 = 0)
        SELECT occ.doc_id,
               COUNT(*) AS n_ngrams,
               COUNT(b.gram) AS matched_ngrams,
               ROUND(CAST(COUNT(b.gram) AS DOUBLE) / COUNT(*), 6)
                 AS contamination_frac
        FROM occ LEFT JOIN b ON occ.gram = b.gram
        GROUP BY occ.doc_id
        """,
    )


def test_bm25_topk(spark):
    """BM25 ranked retrieval vs the formula spelled out in DuckDB SQL
    (same k1/b, same +1-smoothed idf, same rounding and id tiebreak)."""
    from clickhouse_etl_spark.text.index import bm25_topk

    docs = load_table(spark, SF_DIR, "documents")
    terms = ["the", "data", "pipeline"]
    out = bm25_topk(docs, terms, k=15, k1=1.2, b=0.75)
    term_list = ", ".join(f"'{t}'" for t in terms)
    _assert_matches_oracle(
        out,
        f"""
        WITH td AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
          ) WHERE term <> '' GROUP BY doc_id, term
        ),
        dl AS (SELECT doc_id, SUM(tf) AS len FROM td GROUP BY doc_id),
        corpus AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM dl),
        dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM td
                WHERE term IN ({term_list}) GROUP BY term)
        SELECT td.doc_id,
               ROUND(SUM(
                 ln(1 + (corpus.n - dft.df + 0.5) / (dft.df + 0.5))
                 * td.tf * 2.2
                 / (td.tf + 1.2 * (0.25 + 0.75 * dl.len / corpus.avgdl))
               ), 6) AS score
        FROM td
        JOIN dft ON td.term = dft.term
        JOIN dl ON td.doc_id = dl.doc_id
        CROSS JOIN corpus
        GROUP BY td.doc_id
        ORDER BY score DESC, td.doc_id ASC
        LIMIT 15
        """,
    )


def test_frequent_items_skewed(spark):
    """Two-phase heavy hitters vs a DuckDB exact top-k, on data where the
    head is provably heavy (hot-key count 2500 > n/m = 1250), so the
    sketch's superset guarantee makes the result exact."""
    from clickhouse_etl_spark.operators.sketches import frequent_items

    df = spark.range(50_000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN id % 20 ELSE id END AS v"
    )
    out = frequent_items(df, "v", k=10, margin=4)
    _assert_matches_oracle(
        out,
        """
        SELECT v, COUNT(*) AS n FROM (
          SELECT CASE WHEN i % 2 = 0 THEN i % 20 ELSE i END AS v
          FROM range(50000) t(i)
        ) GROUP BY v ORDER BY n DESC, v ASC LIMIT 10
        """,
    )


def test_frequent_items_equals_exact_vocab(spark):
    """Sketch path ≡ exact path on the real corpus: frequent_items over
    exploded words must equal top_k_vocab (full groupBy + TakeOrdered)."""
    from clickhouse_etl_spark.operators.sketches import frequent_items
    from clickhouse_etl_spark.text.analysis import top_k_vocab

    docs = load_table(spark, SF_DIR, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    sketched = frequent_items(words, "word", k=15, margin=4)
    exact = top_k_vocab(docs, k=15)
    got = [(r["word"], r["n"]) for r in sketched.collect()]
    want = [(r["word"], r["n"]) for r in exact.collect()]
    assert got == want


def test_pack_contiguous_null_text_contributes_zero(spark):
    """NULL/empty text must not decrement later documents' offsets."""
    from clickhouse_etl_spark.text.packing import pack_contiguous

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, ""), (4, "d e")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in pack_contiguous(df, seq_len=4).collect()}
    assert rows[2].n_tokens == 0 and rows[3].n_tokens == 0
    assert rows[4].stream_offset == 3  # only doc 1's tokens precede it


def test_shard_plan_oracle(spark):
    """Token-budget shard planning (distributed prefix sum) vs the SQL
    window oracle — the registry-cap demotion of ns_shard_plan."""
    from clickhouse_etl_spark.text.packing import plan_shards

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_shards(docs, tokens_per_shard=4096).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("stream_offset").cast("long").alias("stream_offset"),
        "shard",
    )
    _assert_matches_oracle(
        plan,
        """
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN text IS NULL OR text = '' THEN 0
                      ELSE len(string_split(text, ' ')) END AS n_tokens
          FROM documents
        ), o AS (
          SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS stream_offset
          FROM t
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(stream_offset AS BIGINT) AS stream_offset,
               CAST(FLOOR(stream_offset / 4096.0) AS BIGINT) AS shard
        FROM o
        """,
    )


def test_cluster_assign_oracle(spark):
    """k-means inference path (argmin L2 to the deterministic lowest-id
    centroids, lowest cluster wins ties) vs a cross-join argmin oracle —
    the registry-cap demotion of ns_cluster_assign."""
    from clickhouse_etl_spark.text.kmeans import assign_clusters

    emb = load_table(spark, SF_DIR, "embeddings")
    init = emb.orderBy("vec_id").limit(6).select("embedding").collect()
    centroids = [[float(x) for x in r.embedding] for r in init]
    out = assign_clusters(emb, centroids).select(
        "vec_id", "cluster", F.round("sq_dist", 6).alias("sq_dist")
    )
    _assert_matches_oracle(
        out,
        """
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cent AS (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
          FROM emb ORDER BY vec_id LIMIT 6
        ),
        d AS (
          SELECT e.vec_id, c.cluster,
                 list_sum(list_transform(range(1, len(e.v) + 1),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS sq
          FROM emb e CROSS JOIN cent c
        )
        SELECT vec_id, CAST(cluster AS INT) AS cluster,
               ROUND(sq, 6) AS sq_dist
        FROM (
          SELECT vec_id, cluster, sq,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY sq ASC, cluster ASC) AS rk
          FROM d
        ) WHERE rk = 1
        """,
    )


def test_interval_join_batch_oracle(spark):
    """The stream-stream interval join's BATCH semantics (same code path,
    watermark a no-op) vs a DuckDB theta join — view → purchase by the
    same user within 1 hour, inclusive bounds."""
    from clickhouse_etl_spark import streaming as st

    events = load_table(spark, SF_DIR, "events")
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    out = st.stream_interval_join(
        views, buys, "v_user", "p_user", "v_ts", "p_ts"
    )
    _assert_matches_oracle(
        out,
        """
        SELECT v.user_id AS v_user, v.ts AS v_ts, v.event_id AS view_id,
               p.user_id AS p_user, p.ts AS p_ts, p.event_id AS purchase_id
        FROM events v JOIN events p
          ON v.user_id = p.user_id
         AND p.ts >= v.ts
         AND p.ts <= v.ts + INTERVAL 1 HOUR
        WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        """,
    )


def test_top_k_per_group(spark):
    """Exact per-group topK (the ClickHouse topK analog) vs a DuckDB
    count + ROW_NUMBER window with the same (n desc, value asc) tiebreak."""
    from clickhouse_etl_spark.operators.grouped import top_k_per_group

    li = load_table(spark, SF_DIR, "lineitem")
    out = top_k_per_group(li, ["l_returnflag"], "l_quantity", k=3)
    _assert_matches_oracle(
        out,
        """
        SELECT l_returnflag, l_quantity, n, rank FROM (
          SELECT l_returnflag, l_quantity, COUNT(*) AS n,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                    ORDER BY COUNT(*) DESC, l_quantity ASC)
                   AS rank
          FROM lineitem WHERE l_quantity IS NOT NULL
          GROUP BY l_returnflag, l_quantity
        ) WHERE rank <= 3
        """,
    )


def test_histogram_fixed_grouped(spark):
    """Equal-width histogram (ClickHouse histogram analog), grouped by
    event_type with auto min/max bounds, vs DuckDB floor-binning. The
    per-row bin arithmetic is spelled out identically on both sides."""
    from clickhouse_etl_spark.operators.grouped import histogram_fixed

    ev = load_table(spark, SF_DIR, "events")
    out = histogram_fixed(ev, "value", bins=8, group_cols=["event_type"])
    _assert_matches_oracle(
        out,
        """
        WITH base AS (
          SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
          WHERE value IS NOT NULL AND NOT isnan(value)
        ),
        b AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM base),
        binned AS (
          SELECT event_type,
                 CAST(LEAST(GREATEST(
                   CASE WHEN (b.hi - b.lo) / 8 > 0
                        THEN FLOOR((v - b.lo) / ((b.hi - b.lo) / 8))
                        ELSE 0 END, 0), 7) AS INT) AS bin,
                 b.lo AS lo, (b.hi - b.lo) / 8 AS w
          FROM base CROSS JOIN b
        )
        SELECT event_type, bin,
               lo + bin * w AS bin_lo,
               lo + (bin + 1) * w AS bin_hi,
               COUNT(*) AS n
        FROM binned GROUP BY event_type, bin, lo, w
        """,
    )


def test_histogram_count_invariant(spark):
    """Clamping invariant: with ANY explicit bounds, every non-null
    non-NaN row lands in exactly one bin (edge bins absorb outliers)."""
    from clickhouse_etl_spark.operators.grouped import histogram_fixed

    ev = load_table(spark, SF_DIR, "events")
    total = ev.filter(
        F.col("value").isNotNull() & ~F.isnan(F.col("value"))
    ).count()
    out = histogram_fixed(ev, "value", bins=5, lo=0.0, hi=1.0)
    assert out.agg(F.sum("n")).collect()[0][0] == total
    assert out.filter((F.col("bin") < 0) | (F.col("bin") > 4)).count() == 0


def test_limit_by(spark):
    """ClickHouse LIMIT n BY key vs a DuckDB ROW_NUMBER cut with the same
    deterministic tiebreak."""
    from clickhouse_etl_spark.operators.dedup import limit_by

    ev = load_table(spark, SF_DIR, "events")
    out = limit_by(
        ev.select("user_id", "event_id", "value"),
        keys=["user_id"], n=2, order_col="value", tiebreak=["event_id"],
    )
    _assert_matches_oracle(
        out,
        """
        SELECT user_id, event_id, value FROM (
          SELECT user_id, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn <= 2
        """,
    )


def test_fill_time_gaps_oracle(spark):
    """WITH FILL densification (hourly buckets per event_type) vs DuckDB
    generate_series, all three fill policies value-checked."""
    from clickhouse_etl_spark.operators.events import fill_time_gaps

    ev = load_table(spark, SF_DIR, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        # keep a sparse series: only buckets with >= 3 events survive,
        # so the fill has real gaps to close
        .filter(F.col("n") >= 3)
    )
    base_sql = """
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS bucket,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 3
        ),
        bounds AS (
          SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
          FROM hourly GROUP BY 1
        ),
        grid AS (
          SELECT event_type,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
          FROM bounds
        )
        SELECT grid.event_type, grid.bucket, {val} AS n
        FROM grid LEFT JOIN hourly
          ON grid.event_type = hourly.event_type
         AND grid.bucket = hourly.bucket
    """
    _assert_matches_oracle(
        fill_time_gaps(hourly, "bucket", "1 hour", ["event_type"], ["n"]),
        base_sql.format(val="hourly.n"),
    )
    _assert_matches_oracle(
        fill_time_gaps(hourly, "bucket", "1 hour", ["event_type"], ["n"],
                       fill="zero"),
        base_sql.format(val="COALESCE(hourly.n, 0)"),
    )
    _assert_matches_oracle(
        fill_time_gaps(hourly, "bucket", "1 hour", ["event_type"], ["n"],
                       fill="locf"),
        base_sql.format(
            val="LAST_VALUE(hourly.n IGNORE NULLS) OVER ("
            "PARTITION BY grid.event_type ORDER BY grid.bucket "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ),
    )
    # linear interpolation: same grid, neighbors found by the same
    # ignore-nulls window pair, straight-line formula spelled out
    linear_sql = """
        WITH hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS bucket,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 3
        ),
        bounds AS (
          SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
          FROM hourly GROUP BY 1
        ),
        grid AS (
          SELECT event_type,
                 unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
          FROM bounds
        ),
        joined AS (
          SELECT grid.event_type AS event_type, grid.bucket AS bucket,
                 hourly.n AS n
          FROM grid LEFT JOIN hourly
            ON grid.event_type = hourly.event_type
           AND grid.bucket = hourly.bucket
        ),
        anno AS (
          SELECT event_type, bucket,
                 CAST(n AS DOUBLE) AS v,
                 epoch_us(bucket) AS t,
                 LAST_VALUE(CAST(n AS DOUBLE) IGNORE NULLS) OVER wprev AS pv,
                 LAST_VALUE(CASE WHEN n IS NOT NULL
                            THEN epoch_us(bucket) END IGNORE NULLS)
                   OVER wprev AS pt,
                 FIRST_VALUE(CAST(n AS DOUBLE) IGNORE NULLS) OVER wnext AS nv,
                 FIRST_VALUE(CASE WHEN n IS NOT NULL
                             THEN epoch_us(bucket) END IGNORE NULLS)
                   OVER wnext AS nt
          FROM joined
          WINDOW wprev AS (PARTITION BY event_type ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wnext AS (PARTITION BY event_type ORDER BY bucket
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, bucket,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN pv IS NOT NULL AND nv IS NOT NULL
                    THEN pv + (nv - pv) * (t - pt) / (nt - pt)
               END AS n
        FROM anno
    """
    _assert_matches_oracle(
        fill_time_gaps(hourly, "bucket", "1 hour", ["event_type"], ["n"],
                       fill="linear"),
        linear_sql,
    )


def test_unigram_lm_scores_oracle(spark):
    """CCNet-style unigram LM scoring vs the formula spelled out in
    DuckDB: train on even-id documents, score odd-id ones, add-1
    smoothing, OOV bucket derived from min(logprob) identically."""
    from clickhouse_etl_spark.text.lm import (
        train_unigram_lm,
        unigram_logprob_scores,
    )

    docs = load_table(spark, SF_DIR, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    target = docs.filter(F.col("doc_id") % 2 == 1)
    lm = train_unigram_lm(ref)
    out = unigram_logprob_scores(target, lm)
    _assert_matches_oracle(
        out,
        """
        WITH refw AS (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents
          WHERE doc_id % 2 = 0
        ),
        counts AS (
          SELECT word, COUNT(*) AS n FROM refw WHERE word <> '' GROUP BY word
        ),
        tot AS (SELECT SUM(n) AS total, COUNT(*) AS vocab FROM counts),
        lm AS (
          SELECT word, ln((n + 1.0) / (tot.total + 1.0 * (tot.vocab + 1)))
                   AS logprob
          FROM counts, tot
        ),
        bucket AS (SELECT MIN(logprob) + ln(1.0) - ln(2.0) AS oov FROM lm),
        occ AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id % 2 = 1
        )
        SELECT occ.doc_id,
               COUNT(*) AS n_words,
               ROUND(AVG(CASE WHEN lm.word IS NULL THEN 1 ELSE 0 END), 6)
                 AS oov_frac,
               ROUND(AVG(COALESCE(lm.logprob, bucket.oov)), 6)
                 AS logprob_per_word
        FROM occ LEFT JOIN lm ON occ.word = lm.word
        CROSS JOIN bucket
        WHERE occ.word <> ''
        GROUP BY occ.doc_id
        """,
    )


def test_perplexity_filter_separates_gibberish(spark):
    """Reference-like docs survive the cut; repeated-OOV gibberish does
    not; the filter returns original rows."""
    import math

    from clickhouse_etl_spark.text.lm import (
        perplexity_filter,
        train_unigram_lm,
        unigram_logprob_scores,
    )

    docs = load_table(spark, SF_DIR, "documents")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    gibberish = spark.createDataFrame(
        [(900001, "zzqx vvrk jjwp qqmz zzqx vvrk jjwp qqmz")],
        "doc_id long, text string",
    )
    sample = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    target = sample.unionByName(gibberish)
    lm = train_unigram_lm(ref)
    scored = {r.doc_id: r.logprob_per_word
              for r in unigram_logprob_scores(target, lm).collect()}
    # gibberish scores strictly below the natural-doc median
    nat = sorted(v for k, v in scored.items() if k != 900001)
    assert scored[900001] < nat[len(nat) // 2]
    # cut at the gibberish's perplexity: it must drop, most docs stay
    cut = math.exp(-scored[900001]) * 0.999
    kept = perplexity_filter(target, ref, max_perplexity=cut)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 900001 not in ids
    assert len(ids) > len(nat) // 2


def test_gopher_quality_stats_oracle(spark):
    """Word/line-level Gopher signals vs DuckDB list/regex ops, on docs
    salted with bullets, ellipses, and symbol runs so every signal has
    non-trivial values."""
    from clickhouse_etl_spark.text.analysis import gopher_quality_stats

    salt = (
        "CASE WHEN doc_id % 4 = 0 THEN text || chr(10) || '- bullet one'"
        " || chr(10) || '* bullet two' || chr(10) || 'trailing dots...'"
        " WHEN doc_id % 4 = 1 THEN text || ' ### 12 34'"
        " ELSE text END"
    )
    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "text", F.expr(salt)
    )
    out = gopher_quality_stats(docs)
    _assert_matches_oracle(
        out,
        f"""
        WITH salted AS (SELECT doc_id, {salt} AS text FROM documents),
        t AS (
          SELECT doc_id, text,
                 list_filter(string_split(text, ' '), w -> w <> '') AS w,
                 list_filter(string_split(text, chr(10)), l -> l <> '') AS l
          FROM salted
        )
        SELECT doc_id,
               len(w) AS n_words,
               CASE WHEN len(w) > 0 THEN ROUND(
                 CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
                 / len(w), 6) END AS mean_word_len,
               CASE WHEN len(w) > 0 THEN ROUND(
                 CAST(len(regexp_extract_all(text, '(#|\\.\\.\\.|…)')) AS DOUBLE)
                 / len(w), 6) END AS symbol_word_ratio,
               CASE WHEN len(w) > 0 THEN ROUND(
                 CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                      AS DOUBLE) / len(w), 6) END AS alpha_word_frac,
               CASE WHEN len(l) > 0 THEN ROUND(
                 CAST(len(list_filter(l, x ->
                   regexp_matches(x, '^\\s*([-*•‣▪]|\\d+[.)])\\s')))
                      AS DOUBLE) / len(l), 6) END AS bullet_line_frac,
               CASE WHEN len(l) > 0 THEN ROUND(
                 CAST(len(list_filter(l, x ->
                   regexp_matches(x, '(\\.\\.\\.|…)\\s*$')))
                      AS DOUBLE) / len(l), 6) END AS ellipsis_line_frac
        FROM t
        """,
    )


def test_histogram_fixed_rejects_inverted_bounds(spark):
    """Explicit lo >= hi would silently produce a negative width and
    route every row to bin 0 — must raise instead."""
    import pytest

    from clickhouse_etl_spark.operators.grouped import histogram_fixed

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    with pytest.raises(ValueError, match="lo must be < hi"):
        histogram_fixed(df, "v", bins=4, lo=10.0, hi=1.0)
    with pytest.raises(ValueError, match="lo must be < hi"):
        histogram_fixed(df, "v", bins=4, lo=5.0, hi=5.0)


# ---------------------------------------------------------------------------
# Round-5 registry rotation: the six near-twin relational rows that gave
# up their driver slots (to ext_bm25_topk / ext_summing_merge /
# ext_scd2_lookup / ext_fill_time_gaps / ns_cluster_assign /
# ns_gopher_quality) keep their exact former oracles here.
# ---------------------------------------------------------------------------

def test_j2_customers_per_region(spark):
    from clickhouse_etl_spark.queries.relational import j2_customers_per_region

    _assert_matches_oracle(
        j2_customers_per_region(spark, SF_DIR),
        """
        SELECT r.r_name AS region, count(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """,
    )


def test_a4_avg_of_avgs(spark):
    from clickhouse_etl_spark.queries.relational import a4_avg_of_avgs

    _assert_matches_oracle(
        a4_avg_of_avgs(spark, SF_DIR),
        """
        SELECT c_nationkey AS nationkey,
               ROUND(AVG(cust_avg), 6) AS avg_customer_order_value
        FROM (
          SELECT c.c_nationkey, AVG(o.o_totalprice) AS cust_avg
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY c.c_nationkey, o.o_custkey
        ) GROUP BY c_nationkey
        """,
    )


def test_w2_latest_marked(spark):
    """W2 value-hash oracle + the tiebreak-totality micro-pin: the
    representative's ordering key must be TOTAL (every tie broken), so
    repartitioning can never change the winner."""
    from clickhouse_etl_spark.queries.relational import w2_latest_marked

    _assert_matches_oracle(
        w2_latest_marked(spark, SF_DIR),
        """
        SELECT user_id, ARG_MAX(event_type, event_id) AS last_event_type,
               MAX(event_id) AS last_event_id
        FROM events GROUP BY user_id
        """,
    )
    # totality: the same query over a shuffled/differently-partitioned
    # input yields the identical representative set
    a = w2_latest_marked(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events").repartition(13, "event_type")
    from clickhouse_etl_spark.operators.dedup import representative_latest

    b = representative_latest(
        ev, ["user_id"], payload_cols=["event_type"], order_col="event_id"
    ).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("event_id").alias("last_event_id"),
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_o1_top_orders(spark):
    """O1 value-hash oracle + the TakeOrdered plan micro-pin: an ordered
    LIMIT must plan as TakeOrderedAndProject (per-partition top-k then a
    k-row driver merge), never a global sort."""
    from clickhouse_etl_spark.queries.relational import o1_top_orders

    df = o1_top_orders(spark, SF_DIR)
    _assert_matches_oracle(
        df,
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
        """,
    )
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    assert "Exchange rangepartitioning" not in phys


def test_set_union_anti_merge(spark):
    from clickhouse_etl_spark.queries.relational import set_union_anti_merge

    _assert_matches_oracle(
        set_union_anti_merge(spark, SF_DIR),
        """
        SELECT c_custkey, path FROM (
          SELECT c_custkey, 'direct' AS path FROM customer
          WHERE c_mktsegment = 'BUILDING'
          UNION ALL
          SELECT c_custkey, 'custom' AS path FROM customer
          WHERE c_acctbal > 5000 AND c_mktsegment <> 'BUILDING'
        )
        """,
    )


def test_j7_last_write_wins(spark):
    from clickhouse_etl_spark.queries.relational import j7_last_write_wins

    _assert_matches_oracle(
        j7_last_write_wins(spark, SF_DIR),
        """
        SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice
        FROM (
          SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderkey DESC) AS rn
          FROM orders
        ) WHERE rn = 1
        """,
    )


# ---------------------------------------------------------------------------
# Round-6 rotation demotions: six near-twin rows moved out of the driver
# window (for ext_window_funnel / ext_retention / ns_url_dedup /
# ns_shard_plan / ns_duplicated_spans / ns_frequent_terms) with their
# registry oracles preserved verbatim below.
# ---------------------------------------------------------------------------


def test_a3_weighted_avg(spark):
    from clickhouse_etl_spark.queries.relational import a3_weighted_avg

    _assert_matches_oracle(
        a3_weighted_avg(spark, SF_DIR),
        """
        SELECT l_returnflag,
               ROUND(SUM(l_extendedprice * w)
                     / SUM(CASE WHEN l_extendedprice IS NOT NULL THEN w END),
                     6) AS weighted_price
        FROM (
          SELECT l_returnflag, l_extendedprice,
                 CASE WHEN l_quantity IS NULL OR l_quantity <= 0 THEN 1.0
                      ELSE l_quantity END AS w
          FROM lineitem
        ) GROUP BY l_returnflag
        """,
    )


def test_j10_candidate_grid(spark):
    from clickhouse_etl_spark.queries.relational import j10_candidate_grid

    _assert_matches_oracle(
        j10_candidate_grid(spark, SF_DIR),
        """
        SELECT g.r_name AS region, g.o_orderstatus AS status,
               COALESCE(a.n_orders, 0) AS n_orders
        FROM (SELECT r_name, o_orderstatus
              FROM (SELECT DISTINCT r_name FROM region)
              CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)) g
        LEFT JOIN (
          SELECT r.r_name, o.o_orderstatus, count(*) AS n_orders
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          GROUP BY r.r_name, o.o_orderstatus
        ) a ON a.r_name = g.r_name AND a.o_orderstatus = g.o_orderstatus
        """,
    )


def test_ext_distinct_users_daily(spark):
    from clickhouse_etl_spark.queries.extensions import ext_distinct_users_daily

    _assert_matches_oracle(
        ext_distinct_users_daily(spark, SF_DIR),
        """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events
        GROUP BY 1
        """,
    )


def test_ext_deterministic_sample(spark):
    from clickhouse_etl_spark.queries.extensions import ext_deterministic_sample

    _assert_matches_oracle(
        ext_deterministic_sample(spark, SF_DIR),
        """
        SELECT event_id, user_id, event_type
        FROM events
        WHERE (event_id * 2654435761) % 100 < 10
        """,
    )


def test_ext_event_gaps(spark):
    from clickhouse_etl_spark.queries.extensions import ext_event_gaps

    _assert_matches_oracle(
        ext_event_gaps(spark, SF_DIR),
        """
        SELECT event_id, user_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us,
               LEAD(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
        """,
    )


def test_stream_tumbling_hourly(spark):
    from clickhouse_etl_spark.queries.streaming_batch import (
        stream_tumbling_hourly,
    )

    _assert_matches_oracle(
        stream_tumbling_hourly(spark, SF_DIR),
        """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        """,
    )


def test_line_repetition_stats(spark):
    """Gopher duplicate-line / duplicate-paragraph fractions vs a full
    DuckDB list-op mirror. The corpus has no newlines, so a newline-ful
    corpus is DERIVED identically in both engines (literal replaces of
    ' the ' -> blank line, ' a ' -> newline) to make the ratios
    non-trivial."""
    from clickhouse_etl_spark.text.analysis import line_repetition_stats

    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "text",
        F.expr("replace(replace(text, ' the ', '\n\n'), ' a ', '\n')"),
    )
    out = line_repetition_stats(docs)
    nl, nl2 = "chr(10)", "chr(10) || chr(10)"
    _assert_matches_oracle(
        out,
        f"""
        WITH derived AS (
          SELECT doc_id,
                 replace(replace(text, ' the ', {nl2}), ' a ', {nl}) AS t
          FROM documents
        ), arrs AS (
          SELECT doc_id,
                 list_filter(string_split(t, chr(10)),
                             x -> trim(x) <> '') AS lines,
                 list_filter(string_split_regex(t, '\n{{2,}}'),
                             x -> trim(x) <> '') AS paras
          FROM derived
        )
        SELECT doc_id,
               ROUND(CASE WHEN len(lines) > 0 THEN
                 1 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
                 ELSE 0 END, 6) AS dup_line_frac,
               ROUND(CASE WHEN list_sum(list_transform(lines, x -> length(x))) > 0 THEN
                 CAST(list_sum(list_transform(lines, x -> length(x)))
                      - list_sum(list_transform(list_distinct(lines), x -> length(x)))
                   AS DOUBLE)
                 / list_sum(list_transform(lines, x -> length(x)))
                 ELSE 0 END, 6) AS dup_line_char_frac,
               ROUND(CASE WHEN len(paras) > 0 THEN
                 1 - CAST(len(list_distinct(paras)) AS DOUBLE) / len(paras)
                 ELSE 0 END, 6) AS dup_para_frac,
               ROUND(CASE WHEN list_sum(list_transform(paras, x -> length(x))) > 0 THEN
                 CAST(list_sum(list_transform(paras, x -> length(x)))
                      - list_sum(list_transform(list_distinct(paras), x -> length(x)))
                   AS DOUBLE)
                 / list_sum(list_transform(paras, x -> length(x)))
                 ELSE 0 END, 6) AS dup_para_char_frac
        FROM arrs
        """,
    )


def test_line_repetition_stats_micro(spark):
    """Hand-computed fixture: 4 lines (one duplicated) in 2 paragraphs
    (duplicated), plus an empty doc reporting zeros."""
    from clickhouse_etl_spark.text.analysis import line_repetition_stats

    d1 = "aa bb\ncc\n\naa bb\ncc"  # paras: ["aa bb\ncc"] x2
    rows = [(1, d1), (2, ""), (3, "unique\nlines\nonly")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in line_repetition_stats(docs).collect()}
    # doc 1: lines [aa bb, cc, aa bb, cc] -> dup 2/4; chars 10-5 over 10
    assert got[1].dup_line_frac == 0.5
    assert got[1].dup_line_char_frac == 0.5
    # paragraphs: ["aa bb\ncc", "aa bb\ncc"] -> dup 1/2, chars 8/16
    assert got[1].dup_para_frac == 0.5
    assert got[1].dup_para_char_frac == 0.5
    assert got[2].dup_line_frac == 0.0 and got[2].dup_para_char_frac == 0.0
    assert got[3].dup_line_frac == 0.0 and got[3].dup_line_char_frac == 0.0


def test_frequent_items_weighted_topk(spark):
    """topKWeighted path: rank by SUM(weight) with the same superset
    guarantee (hot keys carry ~10k mass each vs total/m = 5k), DuckDB
    exact weighted top-k as oracle. Integer weights keep the sums
    order-independent."""
    from clickhouse_etl_spark.operators.sketches import frequent_items

    df = spark.range(50_000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN id % 20 ELSE id END AS v",
        "CAST(1 + id % 7 AS BIGINT) AS w",
    )
    out = frequent_items(df, "v", k=10, margin=4, weight_col="w")
    _assert_matches_oracle(
        out,
        """
        SELECT v, SUM(w) AS n FROM (
          SELECT CASE WHEN i % 2 = 0 THEN i % 20 ELSE i END AS v,
                 CAST(1 + i % 7 AS BIGINT) AS w
          FROM range(50000) t(i)
        ) GROUP BY v ORDER BY n DESC, v ASC LIMIT 10
        """,
    )


def test_frequent_items_weighted_null_weight_carries_no_mass(spark):
    from clickhouse_etl_spark.operators.sketches import frequent_items

    df = spark.createDataFrame(
        [("a", 5), ("b", None), ("b", 1), ("c", 2)], "v string, w long"
    )
    got = [
        (r["v"], r["n"])
        for r in frequent_items(df, "v", k=2, weight_col="w").collect()
    ]
    assert got == [("a", 5), ("c", 2)]  # b's NULL row adds nothing


# --- round-6 rotation, batch 2 -------------------------------------------


def test_a12_avg_null_semantics(spark):
    """A1+A2 averaging semantics side by side — identical oracle to the
    row's registry days."""
    from clickhouse_etl_spark.queries.relational import a12_avg_null_semantics

    _assert_matches_oracle(
        a12_avg_null_semantics(spark, SF_DIR),
        """
        SELECT event_type,
               ROUND(AVG(value), 6) AS avg_value,
               ROUND(AVG(COALESCE(value, 0)), 6) AS avg_value_z
        FROM events GROUP BY event_type
        """,
    )


def test_ns_dedup_exact(spark):
    """Exact hash-groupBy dedup — identical oracle to the row's
    registry days."""
    from clickhouse_etl_spark.queries.northstar import ns_dedup_exact

    _assert_matches_oracle(
        ns_dedup_exact(spark, SF_DIR),
        """
        SELECT MIN(doc_id) AS keep_id, count(*) AS dup_count
        FROM documents GROUP BY text
        """,
    )


def test_ns_multimodal_features(spark):
    """Arrow-UDF multimodal feature extraction with sha-derived stub
    features — identical oracle (rebuilt from the module's own
    _MM_FEATURES literal) to the row's registry days."""
    from clickhouse_etl_spark.queries import northstar

    _assert_matches_oracle(
        northstar.ns_multimodal_features(spark, SF_DIR),
        f"""
        SELECT doc_id, 'image' AS modality,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS content_sha,
               {northstar._MM_FEATURES}
        FROM documents
        """,
    )


def test_dedup_keep_best(spark):
    """Quality-chosen representatives: highest score wins, smaller-id
    tiebreak, unscored members lose to scored ones, all-unscored
    clusters survive via the id tiebreak."""
    from clickhouse_etl_spark.text.dedup import dedup_keep_best

    clusters = spark.createDataFrame(
        # cluster 1: clear winner (doc 3); cluster 10: tie on score ->
        # smaller id (10); cluster 20: only doc 21 scored; cluster 30:
        # nobody scored -> min id 30
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
         (20, 20), (21, 20), (30, 30), (31, 30)],
        ["doc_id", "cluster_id"],
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.95), (10, 0.5), (11, 0.5), (21, 0.1)],
        ["doc_id", "score"],
    )
    got = {r["cluster_id"]: (r["keep_id"], r["keep_score"], r["n_members"])
           for r in dedup_keep_best(clusters, scores).collect()}
    assert got[1] == (3, 0.95, 3)
    assert got[10] == (10, 0.5, 2)
    assert got[20] == (21, 0.1, 2)
    assert got[30] == (30, None, 2)


def test_dedup_keep_best_nan_dup_scores_and_string_ids(spark):
    """NaN scores must LOSE (Spark sorts NaN above +inf — a raw max_by
    would crown them); duplicate score rows collapse instead of
    inflating n_members; string ids tiebreak correctly (negating an id
    would NULL-cast a string and pick arbitrarily)."""
    from clickhouse_etl_spark.text.dedup import dedup_keep_best

    clusters = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("b1", "b1"), ("b2", "b1")],
        ["doc_id", "cluster_id"],
    )
    scores = spark.createDataFrame(
        # a2 has NaN (loses to a1's real score); b1/b2 tie at 0.5 with
        # b2 carrying a duplicate score row
        [("a1", 0.3), ("a2", float("nan")), ("b1", 0.5),
         ("b2", 0.5), ("b2", 0.5)],
        ["doc_id", "score"],
    )
    got = {r["cluster_id"]: (r["keep_id"], r["keep_score"], r["n_members"])
           for r in dedup_keep_best(clusters, scores).collect()}
    assert got["a1"] == ("a1", 0.3, 2)      # NaN never wins
    assert got["b1"] == ("b1", 0.5, 2)      # string-id tiebreak; no fan-out


def test_dedup_keep_best_oracle_on_real_clusters(spark):
    """On the REAL MinHash clusters (poly family), keeping the longest
    document per group — mirrored in DuckDB over the same recursive
    closure."""
    from clickhouse_etl_spark.queries.northstar import _minhash_oracle
    from clickhouse_etl_spark.text.dedup import (
        dedup_keep_best,
        minhash_near_duplicates,
        neardup_clusters,
    )

    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_near_duplicates(
        docs, jaccard_threshold=0.2, hash_family="poly"
    )
    clusters = neardup_clusters(pairs)
    out = dedup_keep_best(
        clusters, docs.select("doc_id", "n_chars"), score_col="n_chars"
    )
    oracle = f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT DISTINCT src, src AS dst FROM edges
      UNION
      SELECT r.src, e.dst
      FROM reach r JOIN edges e ON e.src = r.dst
    ),
    clusters AS (
      SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    ),
    scored AS (
      SELECT c.cluster_id, c.doc_id, CAST(d.n_chars AS DOUBLE) AS s,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY CAST(d.n_chars AS DOUBLE) DESC
                                         NULLS LAST,
                                         c.doc_id ASC) AS rn,
             MAX(CAST(d.n_chars AS DOUBLE))
               OVER (PARTITION BY c.cluster_id) AS mx,
             COUNT(*) OVER (PARTITION BY c.cluster_id) AS cnt
      FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT cluster_id, doc_id AS keep_id, mx AS keep_score,
           cnt AS n_members
    FROM scored WHERE rn = 1
    """
    _assert_matches_oracle(out, oracle)


def test_ns_cosine_topk(spark):
    """Brute-force cosine top-k — identical oracle to the row's registry
    days (demoted round 7: the brute twin of ns_ann_lsh/ns_ann_ivf)."""
    from clickhouse_etl_spark.queries.northstar import ns_cosine_topk

    _assert_matches_oracle(
        ns_cosine_topk(spark, SF_DIR),
        """
        SELECT query_id, vec_id, cosine, rank FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                 ROUND(list_cosine_similarity(
                     CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cosine,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                     CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                     c.vec_id ASC) AS rank
          FROM embeddings c
          CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
          WHERE q.vec_id <> c.vec_id
        ) WHERE rank <= 5
        """,
    )


def test_ns_outlier_mad(spark):
    """Grouped MAD outliers — identical oracle to the row's registry
    days (demoted round 7)."""
    from clickhouse_etl_spark.queries.northstar import ns_outlier_mad

    _assert_matches_oracle(
        ns_outlier_mad(spark, SF_DIR),
        """
        WITH med AS (
          SELECT user_id, quantile_cont(value, 0.5) AS m
          FROM events WHERE value IS NOT NULL GROUP BY user_id
        ),
        mad AS (
          SELECT e.user_id, quantile_cont(abs(e.value - med.m), 0.5) AS d
          FROM events e JOIN med ON e.user_id = med.user_id
          WHERE e.value IS NOT NULL GROUP BY e.user_id
        )
        SELECT e.user_id, e.value,
               ROUND(med.m, 6) AS group_median,
               ROUND(mad.d, 6) AS group_mad,
               (mad.d > 0 AND abs(e.value - med.m) > 3.0 * mad.d) AS is_outlier
        FROM events e
        JOIN med ON e.user_id = med.user_id
        JOIN mad ON e.user_id = mad.user_id
        WHERE e.value IS NOT NULL
        """,
    )


def test_ns_simhash_neardup(spark):
    """SimHash Hamming-banded near-dup pairs — identical oracle to the
    row's registry days (demoted round 8: the Hamming-space sibling of
    the still-registered ns_minhash_neardup; the pigeonhole recall
    contract stays pinned in tests/test_text_recall.py)."""
    from clickhouse_etl_spark.queries.northstar import (
        _simhash_oracle,
        ns_simhash_neardup,
    )

    _assert_matches_oracle(ns_simhash_neardup(spark, SF_DIR), _simhash_oracle())


def test_ns_ngram_jaccard(spark):
    """Adjacent-doc exact word-set Jaccard — identical oracle to the
    row's registry days (demoted round 8: it is the verification kernel
    inside ns_minhash_neardup / ns_curate_corpus)."""
    from clickhouse_etl_spark.queries.northstar import ns_ngram_jaccard

    _assert_matches_oracle(
        ns_ngram_jaccard(spark, SF_DIR),
        """
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               ROUND(CAST(len(list_intersect(list_distinct(string_split(a.text, ' ')),
                                             list_distinct(string_split(b.text, ' ')))) AS DOUBLE)
                     / len(list_distinct(list_concat(string_split(a.text, ' '),
                                                     string_split(b.text, ' ')))), 6) AS jaccard
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        """,
    )


def test_ext_percentiles(spark):
    """Median/p95 per priority — identical oracle to the row's registry
    days (demoted round 8: the quantile interpolation machinery stays
    driver-verified via ext_quantiles_weighted)."""
    from clickhouse_etl_spark.queries.extensions import ext_percentiles

    _assert_matches_oracle(
        ext_percentiles(spark, SF_DIR),
        """
        SELECT o_orderpriority,
               ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
        """,
    )


def test_ext_retention(spark):
    """ClickHouse retention() flags — identical oracle to the row's
    registry days (demoted round 8: rides the same conditional-
    aggregation event machinery as the still-registered
    ext_window_funnel)."""
    from clickhouse_etl_spark.queries.extensions import ext_retention

    _assert_matches_oracle(
        ext_retention(spark, SF_DIR),
        """
        SELECT user_id,
               max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r2,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r3
        FROM events GROUP BY user_id
        """,
    )

def test_ns_text_stats(spark):
    """Per-doc text metrics + lang-ID + regex token count — identical
    oracle to the row's registry days (demoted round 9, batch 5: the
    one-pass text-metrics family keeps ns_gopher_quality as its driver
    row, which computes the same stopword/punct/length columns plus
    the repetition rules)."""
    from clickhouse_etl_spark.queries.northstar import (
        _text_stats_oracle,
        ns_text_stats,
    )

    _assert_matches_oracle(ns_text_stats(spark, SF_DIR), _text_stats_oracle())


def test_a8_json_custom_evals(spark):
    """A8 JSON-array detail aggregation — identical oracle to the row's
    registry days (demoted round 9, batch 5: the per-order nested
    detail grouping keeps a7_nested_order_lines as its driver row; the
    JSON serialization stays composed-and-driver-checked inside
    pl_transcript_details)."""
    from clickhouse_etl_spark.queries.relational import a8_json_custom_evals

    _assert_matches_oracle(
        a8_json_custom_evals(spark, SF_DIR),
        """
        SELECT l_orderkey AS orderkey,
               to_json(list_sort(list(struct_pack(
                   l_linenumber := l_linenumber, l_returnflag := l_returnflag
               )))) AS customEvaluations,
               count(*) AS customEvaluationCount
        FROM lineitem GROUP BY l_orderkey
        """,
    )


def test_ext_summing_merge(spark):
    """SummingMergeTree fold — identical oracle to the row's registry
    days (demoted round 10, batch 6: the MergeTree merge family keeps
    ext_collapsing_merge as its driver row — the same keyed
    aggregation-shuffle fold with the harder signed semantics)."""
    from clickhouse_etl_spark.queries.extensions import ext_summing_merge

    _assert_matches_oracle(
        ext_summing_merge(spark, SF_DIR),
        """
        SELECT l_returnflag, ROUND(SUM(l_quantity), 3) AS total_qty,
               ROUND(MAX(l_extendedprice), 3) AS max_price
        FROM lineitem GROUP BY l_returnflag
        """,
    )


def test_ext_scd2_lookup(spark):
    """SCD2 history build + temporal lookup — identical oracle to the
    row's registry days (demoted round 10, batch 6: the round's
    ext_snapshot_diff promotion carries the sinks/upsert.py
    incremental-maintenance tier in the driver window; this composed
    scd2_history+scd2_lookup path keeps full rigor here)."""
    from clickhouse_etl_spark.queries.extensions import (
        _SCD2_LOOKUP_ORACLE,
        ext_scd2_lookup,
    )

    _assert_matches_oracle(ext_scd2_lookup(spark, SF_DIR), _SCD2_LOOKUP_ORACLE)


def test_ext_window_funnel(spark):
    """Relaxed windowFunnel — identical oracle to the row's registry
    days (demoted round 10, batch 6: the funnel family's driver row is
    now ext_funnel_strict_order, whose strictness is pinned as a
    restriction of this mode in tests/test_events.py)."""
    from clickhouse_etl_spark.queries.extensions import (
        _WINDOW_FUNNEL_ORACLE,
        ext_window_funnel,
    )

    _assert_matches_oracle(
        ext_window_funnel(spark, SF_DIR), _WINDOW_FUNNEL_ORACLE
    )


# --- round-11 rotation, batch 7 -------------------------------------------


def test_ext_funnel_strict_order(spark):
    """strict_order windowFunnel — identical oracle to the row's
    registry days (demoted round 11, batch 7: the funnel family's
    driver rows are now ext_window_funnel_dedup + ext_sequence_count,
    the two recursive-CTE-proven automata; strict_order is the
    family's pure-LEAD restriction). Semantics note (r10 ADVICE,
    closed): the level is the MAX over ALL step-1 anchors — ClickHouse
    parity, no longer the first-anchor approximation."""
    from clickhouse_etl_spark.queries.extensions import (
        _FUNNEL_STRICT_ORDER_ORACLE,
        ext_funnel_strict_order,
    )

    _assert_matches_oracle(
        ext_funnel_strict_order(spark, SF_DIR), _FUNNEL_STRICT_ORDER_ORACLE
    )


def test_ns_ann_lsh(spark):
    """Hyperplane-LSH ANN top-k — identical oracle to the row's
    registry days (demoted round 11, batch 7: ns_emb_neardup keeps the
    SAME shared sign-hash kernel under the driver gate; the ANN top-k
    shape stays registered via ns_ann_ivf + ns_pq_ivfadc)."""
    from clickhouse_etl_spark.queries.northstar import (
        _lsh_ann_oracle,
        ns_ann_lsh,
    )

    _assert_matches_oracle(ns_ann_lsh(spark, SF_DIR), _lsh_ann_oracle())


def test_ns_frequent_terms(spark):
    """Top-k frequent terms — identical oracle to the row's registry
    days (demoted round 11, batch 7: term-frequency machinery stays
    driver-gated through ext_bm25_topk's tf-idf over the same token
    stream)."""
    from clickhouse_etl_spark.queries.northstar import (
        _FREQUENT_TERMS_ORACLE,
        ns_frequent_terms,
    )

    _assert_matches_oracle(
        ns_frequent_terms(spark, SF_DIR), _FREQUENT_TERMS_ORACLE
    )


# --- round-12 rotation, batch 8 -------------------------------------------
# The two promotions (proven ahead in r11) keep their pytest pins here;
# their oracle builders stay co-located with the registered rows in
# queries/extensions.py and are IMPORTED, never copied.


def test_ext_quality_gate_rotation8_candidate(spark):
    """The expectation gate in driver-canon shape, full value-hash
    oracle — proven ahead in r11, REGISTERED in the round-12 rotation
    (batch 8). The battery mixes passing and failing rules so the
    comparison is non-vacuous on both sides."""
    from clickhouse_etl_spark.queries.extensions import (
        _QUALITY_GATE_ORACLE,
        ext_quality_gate,
    )

    out = ext_quality_gate(spark, SF_DIR)
    rows = {r.rule: (r.n_violations, r.passed) for r in out.collect()}
    assert rows["status_known"][0] > 0 and not rows["status_known"][1]
    assert rows["custkey_not_null"] == (0, True)
    _assert_matches_oracle(out, _QUALITY_GATE_ORACLE)


def test_ext_zorder_layout_rotation8_candidate(spark):
    """Z-order clustering values in driver-canon shape, full value-hash
    oracle (literal cuts -> pure arithmetic both sides) — proven ahead
    in r11, REGISTERED in the round-12 rotation (batch 8)."""
    from clickhouse_etl_spark.queries.extensions import (
        _zorder_oracle,
        ext_zorder_layout,
    )

    out = ext_zorder_layout(spark, SF_DIR)
    zs = [r.zval for r in out.limit(2000).collect()]
    assert len(set(zs)) > 16  # non-degenerate: many distinct cells hit
    _assert_matches_oracle(out, _zorder_oracle())


def test_ext_linreg_fit(spark):
    """Per-group moment-pass OLS vs the Cramer's-rule DuckDB oracle —
    identical oracle to the row's registry days (demoted round 12,
    batch 8: near-twin of the registered ext_logreg_fit, which keeps
    the regression family's per-group moment-aggregation physics — and
    its harder iterative IRLS path — under the driver gate)."""
    from clickhouse_etl_spark.queries.extensions import (
        _LINREG_FIT_ORACLE,
        ext_linreg_fit,
    )

    _assert_matches_oracle(ext_linreg_fit(spark, SF_DIR), _LINREG_FIT_ORACLE)


def test_ext_rank_corr(spark):
    """Spearman via midrank windows + JVM corr — identical oracle to
    the row's registry days (demoted round 12, batch 8: near-twin of
    the registered ext_cramers_v; both are operators/stattests.py
    two-column association measures, and the contingency form keeps
    the driver window)."""
    from clickhouse_etl_spark.queries.extensions import (
        _RANK_CORR_ORACLE,
        ext_rank_corr,
    )

    _assert_matches_oracle(ext_rank_corr(spark, SF_DIR), _RANK_CORR_ORACLE)


# --- rotation-9 candidates proven ahead (r12, the r10/r11 pattern) --------


def test_ext_snapshot_cdc_rotation9_candidate(spark):
    """snapshot_cdc round-trip in driver-canon shape — the value-hash
    oracle is the `new` snapshot itself, so a match proves the defining
    invariant old + snapshot_cdc(old, new) == new through TWO composed
    engine paths (diff manufacture + CDC merge apply). Rotation-9
    candidate; registry pinned at 50."""
    from clickhouse_etl_spark.queries.extensions import (
        _SNAPSHOT_CDC_ORACLE,
        ext_snapshot_cdc,
    )

    out = ext_snapshot_cdc(spark, SF_DIR)
    _assert_matches_oracle(out, _SNAPSHOT_CDC_ORACLE)


def test_ext_scd2_lookup_rotation9_candidate(spark):
    """ext_scd2_lookup (demoted r10, oracle re-pinned above in
    test_ext_scd2_lookup) is the second rotation-9 candidate: the
    temporal as-of join over a type-2 history. This pin adds the
    driver-canon contract the promotion needs: atomic output schema."""
    from clickhouse_etl_spark.queries.extensions import ext_scd2_lookup
    from tools.oracle_check import non_atomic_columns

    out = ext_scd2_lookup(spark, SF_DIR)
    assert non_atomic_columns(out.schema) == []


def test_ext_fuzzy_join_rotation_candidate(spark):
    """Two-table fuzzy join in driver-canon shape, full value-hash
    oracle (q-gram prefilter mirrored across both sides — a theorem at
    q=5/k=1 over 12-char names; prefilter == brute force pinned in
    tests/test_fuzzy.py). Rotation candidate proven ahead; registry
    pinned at 50."""
    from clickhouse_etl_spark.queries.extensions import (
        _FUZZY_JOIN_ORACLE,
        ext_fuzzy_join,
    )

    out = ext_fuzzy_join(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0
    assert any(r.distance == 1 for r in rows)  # planted typos matched
    assert any(r.distance == 0 for r in rows)  # verbatim copies matched
    _assert_matches_oracle(out, _FUZZY_JOIN_ORACLE)


def test_ext_sequence_next_node_rotation_candidate(spark):
    """sequenceNextNode in driver-canon shape (atomic (user_id,
    next_value) rows), LEAD-chain value-hash oracle — the last
    unregistered ClickHouse event-family op, proven ahead for a future
    rotation; registry pinned at 50. Micro-semantics (interrupts,
    first-match anchoring, NULL at stream end) are pinned separately in
    tests/test_events.py:610."""
    from clickhouse_etl_spark.queries.extensions import (
        _SEQUENCE_NEXT_NODE_ORACLE,
        ext_sequence_next_node,
    )
    from tools.oracle_check import non_atomic_columns

    out = ext_sequence_next_node(spark, SF_DIR)
    assert non_atomic_columns(out.schema) == []
    _assert_matches_oracle(out, _SEQUENCE_NEXT_NODE_ORACLE)
