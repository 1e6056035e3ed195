"""North-star queries: dedup / similarity / text analysis / multimodal.

Every query here carries a full DuckDB value-hash oracle — including
the approximate ops, whose randomness is manufactured: MinHash/SimHash
signatures use the wrapping-int64 'poly' hash family, the
hyperplane-LSH ops use sha256-derived literal plane arrays, and IVF's
centroid sample is an affine permutation of the ids, all of which the
oracle SQL reproduces bit-for-bit (candidate generation included).

Registry note: near-duplicate per-column variants are fused into their
parent query (lang-ID + regex-token-count into ns_text_stats, rolling
fingerprint into ns_fingerprint, resize + frame-sample into
ns_mm_pipeline) to keep the registry within the driver's 50-query
correctness window; the underlying operators stay separate library
functions. ns_normalize_embeddings moved to tests/test_demoted_oracles.py
for the same reason (it composes inside every similarity operator here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.multimodal import (
    attach_binary_payload,
    extract_features,
    resize_images,
    sample_frames,
)
from clickhouse_etl_spark.queries import register
from clickhouse_etl_spark.text.analysis import (
    STOPWORDS,
    document_fingerprint,
    text_stats,
)
from clickhouse_etl_spark.text.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from clickhouse_etl_spark.text.similarity import (
    brute_force_cosine_topk,
    embedding_cosine_neardup,
    ivf_ann_topk,
    lsh_ann_topk,
)


# ---------------------------------------------------------------------------
# Exact dedup — hash-groupBy on content digest
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-6 rotation,
# batch 2 (identical value-hash oracle there); exact hash-dedup stays
# driver-verified as the core of the still-registered ns_url_dedup.
def ns_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs)


# ---------------------------------------------------------------------------
# Text stats / quality scoring — fused with language-ID and regex token
# counting (one narrow pass; the separate language_guess /
# token_count_regex operators share the same column expressions).
# ---------------------------------------------------------------------------
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

_PUNCT_SQL = r"[!-/:-@\[-`{-~]"

def _text_stats_oracle() -> str:
    return f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS n_stopwords,
           length(text) - length(regexp_replace(text, '{_PUNCT_SQL}', '', 'g')) AS n_punct,
           ROUND(CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           ROUND(CAST(length(text) - length(regexp_replace(text, '{_PUNCT_SQL}', '', 'g')) AS DOUBLE)
                 / GREATEST(length(text), 1), 6) AS punct_ratio,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS avg_word_len,
           ROUND(LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100, 1.0)
                 * (1 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS DOUBLE)
                        / len(string_split(text, ' '))), 6) AS quality_score,
           CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
                WHEN list_contains(string_split(text, ' '), 'a') THEN 'en_weak'
                ELSE 'unknown' END AS lang_guess,
           len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS n_regex_tokens
    FROM documents
    """


# Demoted to tests/test_demoted_oracles.py in the round-9 rotation,
# batch 5 (identical value-hash oracle there, via _text_stats_oracle):
# the one-pass per-doc text-metrics family keeps ns_gopher_quality as
# its driver row — the Gopher gate computes the same stopword/punct/
# length columns PLUS the repetition rules, so this row was the
# registry's clearest remaining near-twin. The registry slot goes to
# the promoted ns_train_bpe tokenizer-training row below.
def ns_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text_stats(docs, include_lang=True, include_regex_tokens=True)


# ---------------------------------------------------------------------------
# Document fingerprints — md5 (content-address) + Rabin-Karp rolling hash
from clickhouse_etl_spark.text.dedup import poly_affine_constants  # noqa: E402

_M64 = "18446744073709551616::HUGEINT"

# Canonical SQL mirror of dedup._POLY_FOLD (base-31 wrapping fold) —
# defined ONCE; ns_fingerprint and the MinHash/SimHash oracles all use it.
_POLY_FOLD_SQL = (
    "list_reduce(list_prepend(0::HUGEINT,"
    " list_transform(string_split({s}, ''), c -> ascii(c)::HUGEINT)),"
    f" (acc, ch) -> (acc * 31 + ch) % {_M64})"
)

# (incrementally composable) in one pass. Oracle emulates Spark's wrapping
# int64 arithmetic with a HUGEINT fold mod 2^64.
# ---------------------------------------------------------------------------
@register(
    "ns_fingerprint",
    oracle=f"""
    SELECT doc_id, md5(lower(text)) AS fingerprint,
           CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                     THEN u - {_M64}
                     ELSE u END AS BIGINT) AS rolling_fp
    FROM (
      SELECT doc_id, text, {_POLY_FOLD_SQL.format(s="text")} AS u
      FROM documents
    )
    """,
)
def ns_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return document_fingerprint(docs, include_rolling=True)


# ---------------------------------------------------------------------------
# Document chunking — context-window preparation (1 doc → N overlapping
# token-window chunks). chunk=40 / overlap=8 at fixture doc lengths gives
# a real multi-chunk fan-out.
# ---------------------------------------------------------------------------
@register(
    "ns_chunk_documents",
    oracle="""
    SELECT d.doc_id, CAST(g.i AS INT) AS chunk_no,
           array_to_string(list_slice(string_split(d.text, ' '),
                                      g.i * 32 + 1, g.i * 32 + 40), ' ') AS chunk_text,
           len(list_slice(string_split(d.text, ' '),
                          g.i * 32 + 1, g.i * 32 + 40)) AS chunk_n_tokens
    FROM documents d,
         UNNEST(range(0, (GREATEST(len(string_split(d.text, ' ')) - 8, 1) + 31) // 32))
           AS g(i)
    """,
)
def ns_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.text.analysis import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=40, overlap_tokens=8)


# ns_shard_plan (token-budget shard planning over the distributed prefix
# sum) lives in tests/test_demoted_oracles.py — the registry is capped at
# 50 so every entry gets a driver CORRECTNESS row; the SQL-window oracle
# rigor is identical there.


# ---------------------------------------------------------------------------
# Per-user median/MAD outlier flags. The registered path is the JVM
# two-pass (two percentile aggregations + joins — pure codegen, no
# Python); operators.grouped.mad_outliers keeps the applyInPandas
# grouped-map seam for genuinely non-algebraic per-group logic, asserted
# equal to this in tests. DuckDB's quantile_cont uses the same linear
# interpolation as Spark's percentile / numpy's median.
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-7 rotation
# (identical value-hash oracle there); the registry slot goes to the
# r6 SemDeDup tier below.
def ns_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.grouped import mad_outliers_jvm

    events = load_table(spark, sf_dir, "events")
    out = mad_outliers_jvm(events.select("user_id", "value"), ["user_id"])
    return out.select(
        "user_id",
        "value",
        F.round("group_median", 6).alias("group_median"),
        F.round("group_mad", 6).alias("group_mad"),
        "is_outlier",
    )


# ---------------------------------------------------------------------------
# n-gram (word-set) Jaccard — the verification kernel, SQL-checked
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-8 rotation,
# batch 4 (identical value-hash oracle there): the exact word-set
# Jaccard is the verification kernel INSIDE the still-registered
# ns_minhash_neardup (and now ns_curate_corpus), so the standalone
# pairwise row was the registry's clearest near-twin.
def ns_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs)


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (exact; DuckDB list_cosine_similarity oracle)
# ---------------------------------------------------------------------------
# Demoted to tests/test_demoted_oracles.py in the round-7 rotation
# (identical value-hash oracle there): it is the brute twin of the
# still-registered ns_ann_lsh / ns_ann_ivf, and the compressed-domain
# IVFADC row below inherits the exact-L2 re-rank machinery.
def ns_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    return brute_force_cosine_topk(emb, queries, k=5)


# ---------------------------------------------------------------------------
# IVFADC (PQ + coarse cells + exact re-rank) — the r6 headline ANN tier
# promoted to a driver row (round-7 rotation). Fully deterministic:
# codebooks are the ksub lowest-id vectors' subvector slices
# (init_codebooks), coarse cells the NCELLS lowest-id vectors — so the
# WHOLE chain (encode, cell assign, nprobe probing, ADC shortlist,
# exact re-rank) mirrors into self-contained SQL, no literals.
# ---------------------------------------------------------------------------
_PQ_M, _PQ_KSUB, _PQ_DIMS = 4, 16, 64
_PQ_DSUB = _PQ_DIMS // _PQ_M
_PQ_CELLS, _PQ_NPROBE, _PQ_K, _PQ_SHORTLIST = 8, 3, 5, 25


def _ivfadc_oracle() -> str:
    m, ksub, dsub = _PQ_M, _PQ_KSUB, _PQ_DSUB
    sq = (
        f"list_sum(list_transform(range(1, {dsub} + 1), "
        f"i -> (e.v[s.sub * {dsub} + i] - c.v[s.sub * {dsub} + i])"
        f" * (e.v[s.sub * {dsub} + i] - c.v[s.sub * {dsub} + i])))"
    )
    cellsq = (
        "list_sum(list_transform(range(1, len(e.v) + 1), "
        "i -> (e.v[i] - g.gv[i]) * (e.v[i] - g.gv[i])))"
    )
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cw, v
      FROM emb ORDER BY vec_id LIMIT {ksub}
    ),
    coarse AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v AS gv
      FROM emb ORDER BY vec_id LIMIT {_PQ_CELLS}
    ),
    subs AS (SELECT unnest(range(0, {m})) AS sub),
    d AS (
      SELECT e.vec_id, s.sub, c.cw, {sq} AS sq
      FROM emb e CROSS JOIN subs s CROSS JOIN cent c
    ),
    best AS (
      SELECT vec_id, sub, cw,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                ORDER BY sq ASC, cw ASC) AS rk
      FROM d
    ),
    codes AS (
      SELECT vec_id, list(CAST(cw AS INT) ORDER BY sub) AS codes
      FROM best WHERE rk = 1 GROUP BY vec_id
    ),
    cellsd AS (
      SELECT e.vec_id, g.cell, {cellsq} AS sq FROM emb e CROSS JOIN coarse g
    ),
    cells AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sq ASC, cell ASC) AS rk
        FROM cellsd
      ) WHERE rk = 1
    ),
    q AS (
      SELECT vec_id AS query_id, v FROM emb WHERE vec_id % 100 = 0
    ),
    qcells AS (
      SELECT query_id, cell FROM (
        SELECT cd.vec_id AS query_id, cd.cell,
               ROW_NUMBER() OVER (PARTITION BY cd.vec_id
                                  ORDER BY cd.sq ASC, cd.cell ASC) AS rk
        FROM cellsd cd JOIN q ON q.query_id = cd.vec_id
      ) WHERE rk <= {_PQ_NPROBE}
    ),
    lutd AS (
      SELECT q.query_id, s.sub, c.cw,
             list_sum(list_transform(range(1, {dsub} + 1),
               i -> (q.v[s.sub * {dsub} + i] - c.v[s.sub * {dsub} + i])
                  * (q.v[s.sub * {dsub} + i] - c.v[s.sub * {dsub} + i])))
               AS pd
      FROM q CROSS JOIN subs s CROSS JOIN cent c
    ),
    lut AS (
      SELECT query_id, list(pd ORDER BY sub, cw) AS lut
      FROM lutd GROUP BY query_id
    ),
    shortl AS (
      SELECT query_id, vec_id FROM (
        SELECT l.query_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY l.query_id
                 ORDER BY list_sum(list_transform(range(0, {m}),
                   j -> l.lut[j * {ksub} + e.codes[j + 1] + 1])) ASC,
                 e.vec_id ASC) AS rk
        FROM codes e
        JOIN cells cl ON cl.vec_id = e.vec_id
        JOIN qcells qc ON qc.cell = cl.cell
        JOIN lut l ON l.query_id = qc.query_id
        WHERE l.query_id <> e.vec_id
      ) WHERE rk <= {_PQ_SHORTLIST}
    ),
    exact AS (
      SELECT sh.query_id, sh.vec_id,
             list_sum(list_transform(range(1, len(cv.v) + 1),
               i -> (cv.v[i] - qv.v[i]) * (cv.v[i] - qv.v[i]))) AS d2
      FROM shortl sh
      JOIN emb cv ON cv.vec_id = sh.vec_id
      JOIN q qv ON qv.query_id = sh.query_id
    )
    SELECT query_id, vec_id, ROUND(d2, 6) AS sq_dist, CAST(rk AS INT) AS rank
    FROM (
      SELECT query_id, vec_id, d2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d2 ASC, vec_id ASC) AS rk
      FROM exact
    ) WHERE rk <= {_PQ_K}
    """


@register("ns_pq_ivfadc", oracle=_ivfadc_oracle())
def ns_pq_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC over the embeddings table (text/pq.py): deterministic
    init codebooks + lowest-id coarse cells, ADC shortlist, exact
    re-rank — the compressed-domain ANN path a 100 TB corpus runs."""
    from clickhouse_etl_spark.text.pq import init_codebooks, ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    books = init_codebooks(emb, m=_PQ_M, ksub=_PQ_KSUB)
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(_PQ_CELLS).select("embedding").collect()
    ]
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_pq_topk(
        emb,
        queries,
        cents,
        books,
        k=_PQ_K,
        nprobe=_PQ_NPROBE,
        shortlist=_PQ_SHORTLIST,
    )


# ---------------------------------------------------------------------------
# SemDeDup (r6 headline, promoted round 7): k-means cells prune the
# pair search, exact in-cell cosine above threshold forms duplicate
# groups (min-label transitive closure), one representative (min id)
# kept per group. Deterministic lowest-id centroids make the whole
# chain — cells, pairs, closure, keep-set — a recursive-CTE SQL mirror.
#
# Scale discipline (measured, round 7): the cell count GROWS with the
# corpus — k = max(8, N // 500) bounds the expected cell population, so
# in-cell pair generation stays ~linear in N instead of N²/k; and the
# threshold sits ABOVE this corpus's random-cosine noise floor (pair
# tail: 14 pairs ≥ 0.45 at sf0.01 vs 271 ≥ 0.35 — the sub-noise
# threshold made the pair graph a giant component whose min-label
# closure needed tens of iterations: 36 s at gen3 before this fix).
# ---------------------------------------------------------------------------
_SEM_CELL_TARGET, _SEM_THRESH = 500, 0.45


def _sem_cell_prefix_sql() -> str:
    """The emb/cent/d/cells/nrm CTE prefix shared VERBATIM by
    :func:`_semantic_dedup_oracle` and :func:`_semantic_margin_sql`
    (r10 ADVICE: the margin probe previously duplicated this chain by
    copy, so a later edit to the oracle's cell logic would silently
    desync the probe and turn its float-order diagnosis misleading —
    one helper makes divergence impossible).

    The cell-assignment argmin in `d` KEEPS the lambda squared-distance
    fold: list_distance is sqrt-rounded and could flip a near-tie
    argmin vs the Spark side. `emb`/`cells`/`nrm` materialize (each is
    referenced 2-5x; DuckDB 1.0 inlines by default)."""
    return f"""emb AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (
      SELECT cluster, cv FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv,
               COUNT(*) OVER () AS n
        FROM emb
      ) WHERE cluster < GREATEST(8, n // {_SEM_CELL_TARGET})
    ),
    d AS (
      SELECT e.vec_id, c.cluster,
             list_sum(list_transform(range(1, len(e.v) + 1),
               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS sq
      FROM emb e CROSS JOIN cent c
    ),
    cells AS MATERIALIZED (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sq ASC, cluster ASC) AS rk
        FROM d
      ) WHERE rk = 1
    ),
    nrm AS MATERIALIZED (
      SELECT vec_id,
             sqrt(list_inner_product(v, v)) AS nv
      FROM emb
    )"""


#: The in-cell candidate-pair scoring FROM clause — the other fragment
#: both the dedup oracle and the margin probe must agree on bit-for-bit.
_SEM_PAIR_FROM = """
        FROM cells a JOIN cells b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN emb ea ON ea.vec_id = a.vec_id
        JOIN emb eb ON eb.vec_id = b.vec_id
        JOIN nrm na ON na.vec_id = a.vec_id
        JOIN nrm nb ON nb.vec_id = b.vec_id
"""


def _semantic_dedup_oracle() -> str:
    # r9 oracle-side restructure (semantics bit-identical): per-vector
    # norms fold ONCE in `nrm` (previously re-evaluated for both sides
    # of every candidate pair), the in-cell dot products use DuckDB's
    # NATIVE list_inner_product — verified bit-identical to the
    # sequential list_sum(list_transform(...)) fold on the gate vectors
    # (0/19,900 mismatches; both are in-order C summations) but not
    # interpreted per-element — and `pairs`
    # materializes so the recursive closure can't re-run the in-cell
    # pair chain per iteration — the same re-execution disease the
    # curate oracle had. `edges` stays PLAIN on purpose: materializing
    # it executes the whole upstream chain inside the (slow) CTE
    # materializer — measured 137 s vs 37 s with the materialization
    # one CTE earlier on the small pair list.
    # Measured at gen10: 257 s -> ~37 s.
    return f"""
    WITH RECURSIVE {_sem_cell_prefix_sql()},
    pairs AS MATERIALIZED (
      SELECT p.id_a, p.id_b FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_inner_product(ea.v, eb.v) / (na.nv * nb.nv) AS cos
        {_SEM_PAIR_FROM}
      ) p WHERE p.cos >= {_SEM_THRESH}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT DISTINCT src, src AS dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
    ),
    clusters AS (
      SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    )
    SELECT e.vec_id FROM emb e
    WHERE e.vec_id NOT IN (
      SELECT doc_id FROM clusters WHERE doc_id <> cluster_id
    )
    """


def _semantic_margin_sql(margin: float = 1e-9) -> str:
    """Near-threshold margin probe (r9 ADVICE): counts candidate pairs
    whose cosine sits within ``margin`` of ``_SEM_THRESH``. The oracle
    uses DuckDB's native list_inner_product while Spark sums in its own
    order — a pair that close to the threshold could flip sides on
    float summation order and surface as an opaque digest mismatch.
    The sweep (tools/oracle_sweep.py) and tests/test_similarity.py run
    this so a flip is DIAGNOSED (nonzero margin count) rather than
    debugged from a hash. Shares the cell-chain prefix and pair FROM
    clause with :func:`_semantic_dedup_oracle` through
    :func:`_sem_cell_prefix_sql` / ``_SEM_PAIR_FROM`` (r10 ADVICE:
    previously a by-copy duplicate that could silently desync)."""
    return f"""
    WITH {_sem_cell_prefix_sql()}
    SELECT COUNT(*) AS near_threshold_pairs FROM (
        SELECT list_inner_product(ea.v, eb.v) / (na.nv * nb.nv) AS cos
        {_SEM_PAIR_FROM}
    ) WHERE abs(cos - {_SEM_THRESH}) < {margin}
    """


@register("ns_semantic_dedup", oracle=_semantic_dedup_oracle())
def ns_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep-set over the embeddings table
    (text/similarity.py:semantic_dedup): cells prune, exact in-cell
    cosine pairs, min-label closure, min-id representative kept. Cell
    count scales with the corpus (k = max(8, N/500)) so per-cell
    population — and with it the in-cell pair work — stays bounded.

    Kernel adjudication (r7 self-review raised it): the row runs the
    default GEMM kernel — the honest scale path (join kernel: 83 s at
    gen10 vs 14 s) — against the sequential-fold DuckDB oracle. BLAS
    reassociation drifts cosines ~1e-15, so a pair within 1e-15 of the
    0.45 threshold could in principle flip; on the FIXED gate data +
    deterministic same-host BLAS this is a static property, verified
    green at sf0.001/0.01/0.1 and gen1/3/10, and the observed
    near-threshold pair density puts a flip at ~1e-7 even on fresh
    data. If a future testdata regeneration ever trips it, pass
    kernel='join' here — bit-identical to the oracle by construction
    (since round 8 the join kernel threads kernel='expr' into the cell
    assignment too, so the escape hatch covers the full chain even at
    k > 32 where assign_clusters' own 'auto' would pick its gemm
    argmin)."""
    from clickhouse_etl_spark.text.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    k = max(8, emb.count() // _SEM_CELL_TARGET)
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(k).select("embedding").collect()
    ]
    return semantic_dedup(emb, cents, threshold=_SEM_THRESH).select("vec_id")


# ---------------------------------------------------------------------------
# Multimodal pipeline — resize (1:1) + frame-sample (1:N fan-out) fused:
# each sampled frame row carries its doc's resized-image evidence. Binary
# payloads are projected as HEX STRINGS (driver canon can't hash
# bytearray cells); Spark hex() and DuckDB hex() both emit uppercase.
# Stub codecs derive bytes from sha256, exactly reproducible in SQL.
# ---------------------------------------------------------------------------
@register(
    "ns_mm_pipeline",
    oracle="""
    SELECT d.doc_id, g.i AS frame_no,
           upper(hex(encode(substr(d.text,
                         g.i * GREATEST(octet_length(encode(d.text)) // 32, 1) + 1,
                         GREATEST(octet_length(encode(d.text)) // 32, 1))))) AS frame_hex,
           32 AS n_frames_total,
           upper(repeat(sha256(d.text), 2)) AS resized_hex,
           8 AS width, 8 AS height, 64::BIGINT AS resized_n_bytes
    FROM documents d
    CROSS JOIN (SELECT unnest([0, 10, 20, 30]) AS i) g
    """,
)
def ns_mm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    images = attach_binary_payload(docs, source_col="text", modality="image")
    videos = attach_binary_payload(docs, source_col="text", modality="video")
    resized = resize_images(images, width=8, height=8).select(
        "doc_id",
        F.hex("payload").alias("resized_hex"),
        "width",
        "height",
        F.col("n_bytes").alias("resized_n_bytes"),
    )
    frames = sample_frames(videos, every_nth=10).select(
        "doc_id", "frame_no", F.hex("frame").alias("frame_hex"), "n_frames_total"
    )
    return frames.join(resized, on="doc_id").select(
        "doc_id", "frame_no", "frame_hex", "n_frames_total",
        "resized_hex", "width", "height", "resized_n_bytes",
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing — mapInPandas feature extraction with a full DuckDB
# oracle: the stub decoder derives features from the sha256 digest
# (little-endian uint32 chunks / 2^32), which SQL can reproduce by parsing
# the hex digest. The registered query flattens the feature vector to 8
# scalar columns so the driver's value-hash gets hashable cells; the typed
# array <double> stays on the operator for the real pipeline path.
# ---------------------------------------------------------------------------
def _le_u32_from_hex(h: str, i: int) -> str:
    """SQL: little-endian uint32 from hex digest chars for feature i."""
    b = 8 * i
    return (
        f"('0x' || substr({h}, {b + 7}, 2) || substr({h}, {b + 5}, 2)"
        f" || substr({h}, {b + 3}, 2) || substr({h}, {b + 1}, 2))::UBIGINT"
    )


_MM_FEATURES = ",\n           ".join(
    f"ROUND({_le_u32_from_hex('sha256(text)', i)} / 4294967296.0, 6) AS f{i}"
    for i in range(8)
)


# Demoted to tests/test_demoted_oracles.py in the round-6 rotation,
# batch 2 (identical value-hash oracle there, built from _MM_FEATURES);
# the same attach/extract Arrow-UDF path stays driver-verified inside
# the composed ns_mm_pipeline.
def ns_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(docs, source_col="text", modality="image")
    feats = extract_features(payloads)
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        "content_sha",
        *[F.round(F.col("features")[i], 6).alias(f"f{i}") for i in range(8)],
    )


# ---------------------------------------------------------------------------
# MinHash+LSH and SimHash near-dup — FULL value-hash oracles. The
# registered queries run the 'poly' universal-hash family (polynomial
# char-fold base + odd-multiplier affine permutations — plain wrapping
# int64 arithmetic), which DuckDB reproduces bit-for-bit with HUGEINT
# mod-2^64 folds: signatures, band buckets, candidate pairs, and the
# exact verify all hash-match. The xxhash64 default family (better bit
# mixing, the recommended 100 TB setting) keeps its recall contracts in
# tests/test_text_recall.py — the banding math is identical under both.
# ---------------------------------------------------------------------------

# (_M64/_POLY_FOLD_SQL moved above ns_fingerprint — single definition.)

_SIGNED_SQL = (
    "CASE WHEN {v} >= 9223372036854775808::HUGEINT"
    " THEN {v} - 18446744073709551616::HUGEINT ELSE {v} END"
)


def _minhash_pair_ctes(
    num_hashes=16, bands=4, k=3, threshold=0.2, src="documents"
) -> str:
    """The MinHash-LSH pair pipeline as a reusable CTE block ending in
    ``mh_pairs(doc_a, doc_b, jaccard)`` — shared by the standalone
    ns_minhash_neardup oracle and the ns_curate_corpus composition
    oracle (which runs it over the exact-deduped subset).

    Oracle-side performance shape (r9, semantics unchanged — the r8
    VERDICT's #1 ask; measured on gen10 = 50k docs / 2.6M shingles):
    the per-char HUGEINT fold AND the 16 affine permutations — the
    HUGEINT hot loops — run ONCE per DISTINCT shingle (``dsh``, ~9.6×
    fewer than total shingle occurrences), the per-doc signature
    minima are a vectorized plain-BIGINT GROUP BY over the unnested
    (doc, shingle) rows instead of 16 ``list_transform`` passes per
    doc, and ``sh``/``banded``/``mh_pairs`` are ``AS MATERIALIZED`` so
    DuckDB 1.0 (which inlines CTEs by default) can't re-execute the
    chain per reference — the curate oracle's recursive closure used
    to re-run the whole signature pipeline EVERY iteration (~21 min at
    gen10; the full pair block is now ~18 s). ``dsh``/``sigs`` are
    deliberately NOT materialized: DuckDB 1.0 materialization defeats
    dead-CTE elimination and measured ~5× slower on the mid-chain
    (127 s all-materialized vs 18 s this shape, identical results)."""
    rpb = num_hashes // bands
    h_exprs = []
    for i in range(num_hashes):
        a, b = poly_affine_constants(i)
        affine = f"((u * {a}::HUGEINT + {b}::HUGEINT) % {_M64})"
        h_exprs.append(
            f"CAST({_SIGNED_SQL.format(v=affine)} AS BIGINT) AS h{i}"
        )
    hcols = ", ".join(h_exprs)
    sig_list = (
        "[" + ", ".join(f"MIN(h{i})" for i in range(num_hashes)) + "]"
    )
    band_fold = (
        f"list_reduce(list_prepend(0::HUGEINT,"
        f" list_transform(list_slice(sig, g.j * {rpb} + 1, g.j * {rpb} + {rpb}),"
        f" v -> CASE WHEN v < 0 THEN v::HUGEINT + {_M64}"
        f" ELSE v::HUGEINT END)),"
        f" (acc, v) -> (acc * 31 + v) % {_M64})"
    )
    return f"""sh AS MATERIALIZED (
      SELECT doc_id,
        list_transform(range(0, greatest(len(string_split(text,' ')) - {k}, 0) + 1),
          i -> array_to_string(list_slice(string_split(text,' '), i+1, i+{k}), ' ')) AS sh
      FROM {src}
    ),
    dsh AS (
      SELECT s, {hcols}
      FROM (SELECT s, {_POLY_FOLD_SQL.format(s="s")} AS u
            FROM (SELECT DISTINCT unnest(sh) AS s FROM sh))
    ),
    sigs AS (
      SELECT e.doc_id, {sig_list} AS sig
      FROM (SELECT doc_id, unnest(sh) AS s FROM sh) e
      JOIN dsh USING (s)
      GROUP BY e.doc_id
    ),
    banded AS MATERIALIZED (
      SELECT doc_id, g.j AS band, {band_fold} AS band_hash
      FROM sigs CROSS JOIN (SELECT unnest(range(0, {bands})) AS j) g
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.band_hash = r.band_hash
       AND l.doc_id < r.doc_id
    ),
    mh_pairs AS MATERIALIZED (
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT p.doc_a, p.doc_b,
          ROUND(CAST(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh))) AS DOUBLE)
                / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
        FROM cand p
        JOIN sh sa ON sa.doc_id = p.doc_a
        JOIN sh sb ON sb.doc_id = p.doc_b
      ) WHERE jaccard >= {threshold}
    )"""


def _minhash_oracle(num_hashes=16, bands=4, k=3, threshold=0.2) -> str:
    ctes = _minhash_pair_ctes(num_hashes, bands, k, threshold)
    return f"""
    WITH {ctes}
    SELECT doc_a, doc_b, jaccard FROM mh_pairs
    """


def _simhash_oracle(max_hamming=3, bands=4) -> str:
    a0, b0 = poly_affine_constants(0)
    width = 64 // bands
    word_hash = (
        f"({_POLY_FOLD_SQL.format(s='w')} * {a0}::HUGEINT + {b0}::HUGEINT) % {_M64}"
    )
    return f"""
    WITH wh AS (
      SELECT doc_id,
        list_transform(string_split(text, ' '), w -> {word_hash}) AS hs
      FROM documents
    ),
    counts AS (
      SELECT doc_id,
        list_transform(range(0, 64), b ->
          list_sum(list_transform(hs, h ->
            CASE WHEN (h // CAST(power(2, b) AS HUGEINT)) % 2 = 1
                 THEN 1 ELSE -1 END))) AS cnt
      FROM wh
    ),
    sigs AS (
      SELECT doc_id,
        list_sum(list_transform(range(0, 64), b ->
          CASE WHEN cnt[b + 1] > 0 THEN CAST(power(2, b) AS HUGEINT)
               ELSE 0::HUGEINT END)) AS sig_u
      FROM counts
    ),
    sigs2 AS (
      SELECT doc_id, sig_u,
             CAST({_SIGNED_SQL.format(v="sig_u")} AS BIGINT) AS sig_s
      FROM sigs
    ),
    banded AS (
      SELECT doc_id, sig_s, g.j AS band,
        (sig_u // CAST(power(2, g.j * {width}) AS HUGEINT)) % {1 << width} AS band_key
      FROM sigs2 CROSS JOIN (SELECT unnest(range(0, {bands})) AS j) g
    )
    SELECT doc_a, doc_b, hamming FROM (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
        bit_count(xor(l.sig_s, r.sig_s)) AS hamming
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.band_key = r.band_key
       AND l.doc_id < r.doc_id
    ) WHERE hamming <= {max_hamming}
    """


@register("ns_minhash_neardup", oracle=_minhash_oracle())
def ns_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # max_bucket_size=None: the DuckDB oracle computes the EXACT uncapped
    # pair set, so the oracle-checked query must opt out of the flood
    # guard (which is a production default, not an oracle semantics).
    return minhash_near_duplicates(
        docs, jaccard_threshold=0.2, hash_family="poly", max_bucket_size=None
    )


# max_hamming=3 with 4 bands honors the pigeonhole completeness contract
# (recall = 1.0 within the radius) — the Manku-style web-dedup operating
# point; text/dedup.py rejects radii the banding can't guarantee. The
# pandas-UDF signature variant stays as the UDF-surface seam (impl=
# 'pandas', tested in tests/test_multimodal.py).
# Demoted to tests/test_demoted_oracles.py in the round-8 rotation,
# batch 4 (identical value-hash oracle there): the banded-signature
# near-dup family keeps ns_minhash_neardup as its driver row; SimHash
# is its Hamming-space sibling riding the same banding/verify machinery
# (the pigeonhole completeness contract stays pinned in
# tests/test_text_recall.py).
def ns_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_duplicates(
        docs, max_hamming=3, bands=4, hash_family="poly"
    )


# ===========================================================================
# Approximate ANN operators (no SQL oracle — rows-only driver check;
# recall contracts pinned in tests/test_text_recall.py). Registered last
# by design: a bounded check window drops these first.
# ===========================================================================


# ---------------------------------------------------------------------------
# Hyperplane-LSH oracles. The plane signs are sha256-derived LITERALS
# (text/similarity._plane_signs) — no randomness, no fitted state — so a
# DuckDB mirror embedding the SAME sign arrays reproduces the bucketing,
# the candidate sets, and hence the approximate results bit-for-bit:
# even the LSH *candidate generation* is value-hash-checked, exactly as
# was done for MinHash/SimHash via the 'poly' family.
# ---------------------------------------------------------------------------

def _duck_banded_sql(num_planes: int, num_tables: int, dims: int = 64) -> str:
    """UNION ALL of per-table bucket projections over emb(vec_id, v)."""
    from clickhouse_etl_spark.text.similarity import _plane_signs

    selects = []
    for t in range(num_tables):
        bits = []
        for p in range(num_planes):
            signs = ", ".join(
                f"{s}.0" for s in _plane_signs(t * num_planes + p, dims)
            )
            bits.append(
                f"(CASE WHEN list_dot_product(v, [{signs}]) >= 0"
                f" THEN 1 ELSE 0 END) * {1 << p}"
            )
        selects.append(
            f"SELECT vec_id, v, {t} AS tbl, {' + '.join(bits)} AS bucket FROM emb"
        )
    return " UNION ALL ".join(selects)


_DUCK_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def _lsh_ann_oracle(k=5, num_planes=6, num_tables=4) -> str:
    cos = _DUCK_COS.format(a="q.v", b="c.v")
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    banded AS ({_duck_banded_sql(num_planes, num_tables)}),
    cand AS (
      SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS vec_id
      FROM banded cb
      JOIN (SELECT * FROM banded WHERE vec_id < 3) qb
        ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
      WHERE qb.vec_id <> cb.vec_id
    ),
    scored AS (
      SELECT cand.query_id, cand.vec_id, {cos} AS cos_raw
      FROM cand
      JOIN emb q ON q.vec_id = cand.query_id
      JOIN emb c ON c.vec_id = cand.vec_id
    )
    SELECT query_id, vec_id, ROUND(cos_raw, 6) AS cosine, rank FROM (
      SELECT query_id, vec_id, cos_raw,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY cos_raw DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def _emb_neardup_oracle(threshold=0.35, num_planes=8, num_tables=6) -> str:
    cos = _DUCK_COS.format(a="a.v", b="b.v")
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    banded AS ({_duck_banded_sql(num_planes, num_tables)}),
    pairs AS (
      SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
      FROM banded l JOIN banded r
        ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.vec_id < r.vec_id
    )
    SELECT id_a, id_b, ROUND(cos_raw, 6) AS cosine FROM (
      SELECT id_a, id_b, {cos} AS cos_raw
      FROM pairs
      JOIN emb a ON a.vec_id = id_a
      JOIN emb b ON b.vec_id = id_b
    ) WHERE cos_raw >= {threshold}
    """


# Demoted in the round-11 rotation (identical oracle in
# tests/test_demoted_oracles.py): ns_emb_neardup exercises the SAME
# shared hyperplane hasher (the Arrow sign-matmul kernel and the
# bit-mirrored expr chain) under the driver gate, and the ANN top-k
# shape stays registered via ns_ann_ivf + ns_pq_ivfadc — this row was
# the family's redundant representative.
def ns_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kernel='auto' (r8, size-aware): below the 4096-vector floor —
    every oracle-gate SF — this resolves to the all-JVM expr chain the
    oracle mirrors BIT-for-bit, so the gate is deterministic by
    construction; at scale it resolves to the Arrow sign-matmul kernel
    (kernels pinned equal; ~1e-15 BLAS drift adjudication applies only
    there)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    # num_planes pinned (API default is 'auto'): the oracle's literal
    # plane arrays mirror exactly 6 planes at every scale factor
    return lsh_ann_topk(emb, queries, k=5, num_planes=6)


# Embedding-cosine near-dup PAIRS (dedup shape, not search shape). LSH
# candidates → exact cosine verify; candidate generation mirrored in the
# oracle via the literal plane arrays. Recall contract additionally
# pinned in tests/test_text_recall.py.
@register("ns_emb_neardup", oracle=_emb_neardup_oracle())
def ns_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kernel='auto' (r8, size-aware): gate SFs (≤ 2k vectors) ride the
    bit-mirrored expr chain — deterministic oracle by construction; at
    scale the GEMM kernel takes over (pinned equal, exponent 0.31)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # max_bucket_size=None: exact oracle mirroring (see ns_minhash_neardup);
    # num_planes pinned (API default is 'auto') — the oracle's literal
    # plane arrays mirror exactly 8 planes at every scale factor
    return embedding_cosine_neardup(
        emb, threshold=0.35, max_bucket_size=None, num_planes=8
    )


# ---------------------------------------------------------------------------
# IVF-cell ANN. The centroid sample is an affine-permutation order of the
# ids under the 'poly' family, so the ENTIRE chain — centroid pick, cell
# assignment (argmax cosine), nprobe probing, final top-k — mirrors into
# SQL: the last formerly rows-only query is now value-hash-checked.
# ---------------------------------------------------------------------------

def _ivf_oracle(k=5, num_centroids=16, nprobe=4) -> str:
    a, b = poly_affine_constants(0)
    h = f"((vec_id::HUGEINT * {a}::HUGEINT + {b}::HUGEINT) % {_M64})"
    signed_h = _SIGNED_SQL.format(v=h)
    cos_assign = _DUCK_COS.format(a="e.v", b="c.cv")
    cos_score = _DUCK_COS.format(a="q.qv", b="cl.v")
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS cent_id, v AS cv FROM emb
      ORDER BY {signed_h} LIMIT {num_centroids}
    ),
    cells AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT e.vec_id, e.v, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {cos_assign} DESC, c.cent_id ASC) AS rk
        FROM emb e CROSS JOIN cent c
      ) WHERE rk = 1
    ),
    qcells AS (
      SELECT query_id, qv, cent_id FROM (
        SELECT e.vec_id AS query_id, e.v AS qv, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {cos_assign} DESC, c.cent_id ASC) AS rk
        FROM emb e CROSS JOIN cent c WHERE e.vec_id < 3
      ) WHERE rk <= {nprobe}
    ),
    scored AS (
      SELECT q.query_id, cl.vec_id, {cos_score} AS cos_raw
      FROM cells cl JOIN qcells q USING (cent_id)
      WHERE q.query_id <> cl.vec_id
    )
    SELECT query_id, vec_id, ROUND(cos_raw, 6) AS cosine, rank FROM (
      SELECT query_id, vec_id, cos_raw,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY cos_raw DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@register("ns_ann_ivf", oracle=_ivf_oracle())
def ns_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    return ivf_ann_topk(emb, queries, k=5, hash_family="poly")


# ---------------------------------------------------------------------------
# Round-5 registry rotation (see queries/extensions.py): k-means
# inference and Gopher quality signals promoted from
# tests/test_demoted_oracles.py into the driver window.
# ---------------------------------------------------------------------------

_CLUSTER_K = 6

# k-means inference: argmin L2 to the deterministic lowest-id centroids,
# lowest cluster wins ties. The Lloyd trainer itself is iterative and is
# pinned against numpy in tests/test_kmeans.py.
@register(
    "ns_cluster_assign",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
      FROM emb ORDER BY vec_id LIMIT {_CLUSTER_K}
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
def ns_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.text.kmeans import assign_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    # bounded driver-side reduction: k centroid vectors, never the corpus
    init = emb.orderBy("vec_id").limit(_CLUSTER_K).select("embedding").collect()
    centroids = [[float(x) for x in r.embedding] for r in init]
    return assign_clusters(emb, centroids).select(
        "vec_id", "cluster", F.round("sq_dist", 6).alias("sq_dist")
    )


_GOPHER_SALT = (
    "CASE WHEN doc_id % 4 = 0 THEN text || chr(10) || '- bullet one'"
    " || chr(10) || '* bullet two' || chr(10) || 'trailing dots...'"
    " WHEN doc_id % 4 = 1 THEN text || ' ### 12 34'"
    " ELSE text END"
)


# Gopher word/line quality signals (text/analysis.py) over docs salted
# with bullets, ellipses, and symbol runs so every signal has
# non-trivial values. All JVM column expressions.
@register(
    "ns_gopher_quality",
    oracle=f"""
    WITH salted AS (SELECT doc_id, {_GOPHER_SALT} AS text FROM documents),
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
def ns_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.text.analysis import gopher_quality_stats

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.expr(_GOPHER_SALT)
    )
    return gopher_quality_stats(docs)


# ---------------------------------------------------------------------------
# Round-6 registry rotation (see queries/extensions.py): the crawl /
# corpus-packing / span-dedup / heavy-hitter tier promoted from
# pytest-only oracles into the driver window.
# ---------------------------------------------------------------------------

# Deterministic URL column over documents: scheme/host/path/query
# variants driven by doc_id so every canonicalization rule fires, plus
# non-URL rows (the same fixture tests/test_web.py pins).
_URL_EXPR = """
    CASE WHEN doc_id % 11 = 10 THEN 'not a url'
    ELSE concat(
      CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END,
      '://', CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
      'site', CAST(doc_id % 7 AS STRING), '.com',
      CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END,
      '/p/', CAST(doc_id % 13 AS STRING),
      CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
      CASE WHEN doc_id % 5 = 0 THEN '?utm_source=a&b=2&a=1' ELSE '' END,
      CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)
    END
"""

_URL_SQL = """
    SELECT doc_id,
      CASE WHEN doc_id % 11 = 10 THEN 'not a url'
      ELSE concat(
        CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END,
        '://', CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
        'site', CAST(doc_id % 7 AS VARCHAR), '.com',
        CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END,
        '/p/', CAST(doc_id % 13 AS VARCHAR),
        CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
        CASE WHEN doc_id % 5 = 0 THEN '?utm_source=a&b=2&a=1' ELSE '' END,
        CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)
      END AS url
    FROM documents
"""

# canonicalize_url spelled out in DuckDB — regexps identical, list ops
# mirror the array ops (the bit-mirror tests/test_web.py established).
_CANON_SQL = f"""
WITH urls AS ({_URL_SQL}),
parts AS (
  SELECT doc_id,
         lower(regexp_extract(regexp_replace(url, '#.*$', ''),
               '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
         regexp_replace(regexp_replace(url, '#.*$', ''),
               '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS after
  FROM urls
),
hp AS (
  SELECT *, regexp_replace(lower(regexp_extract(after, '^([^/?]*)', 1)),
                           '^[^@]*@', '') AS hostport
  FROM parts
),
pieces AS (
  SELECT doc_id, scheme,
         CASE WHEN scheme = 'http'
              THEN regexp_replace(hostport, ':80$', '')
              WHEN scheme = 'https'
              THEN regexp_replace(hostport, ':443$', '')
              ELSE hostport END AS host,
         regexp_replace(regexp_extract(after, '^[^/?]*([^?]*)', 1), '/+$', '') AS path0,
         regexp_extract(after, '\\?(.*)$', 1) AS query
  FROM hp
),
built AS (
  SELECT doc_id, scheme, host,
         CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
         list_aggregate(
           list_sort(list_filter(string_split(query, '&'),
             x -> x <> '' AND NOT regexp_matches(x,
               '^(utm_[^=&]*|fbclid|gclid|msclkid|mc_cid|mc_eid)(=.*)?$'))),
           'string_agg', '&') AS cq
  FROM pieces
)
SELECT doc_id,
       CASE WHEN scheme <> '' AND host <> ''
            THEN concat(scheme, '://', host, path,
                        CASE WHEN cq IS NULL OR cq = '' THEN ''
                             ELSE concat('?', cq) END)
       END AS canonical_url
FROM built
"""


# Crawl-level URL dedup (text/web.py): canonicalize, keep the latest row
# per canonical URL (W1 ranking-window semantics), pass unparseable URLs
# through. One hash shuffle on the canonical key.
@register(
    "ns_url_dedup",
    oracle=f"""
    WITH canon AS ({_CANON_SQL}),
    u AS ({_URL_SQL})
    SELECT doc_id, canonical_url FROM (
      SELECT u.doc_id, c.canonical_url,
             ROW_NUMBER() OVER (PARTITION BY c.canonical_url
                                ORDER BY u.doc_id DESC, u.url DESC) AS rn
      FROM u JOIN canon c USING (doc_id)
      WHERE c.canonical_url IS NOT NULL
    ) WHERE rn = 1
    UNION ALL
    SELECT doc_id, NULL FROM canon WHERE canonical_url IS NULL
    """,
)
def ns_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.text.web import url_dedup

    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select("doc_id", F.expr(_URL_EXPR).alias("url"))
    return url_dedup(urls, "url", order_col="doc_id").select(
        "doc_id", "canonical_url"
    )


# Token-budget shard planning (text/packing.py): distributed two-level
# prefix sum — no global window — then pure column arithmetic.
@register(
    "ns_shard_plan",
    oracle="""
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
def ns_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.text.packing import plan_shards

    docs = load_table(spark, sf_dir, "documents")
    return plan_shards(docs, tokens_per_shard=4096).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("stream_offset").cast("long").alias("stream_offset"),
        F.col("shard").cast("long").alias("shard"),
    )


# Maximal duplicated token spans (text/spans.py): corpus-wide duplicated
# k-shingle set → per-document gaps-and-islands merge, one shuffle on the
# gram key + one on the document key.
@register(
    "ns_duplicated_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+8-1], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 8 + 1, 0))) AS g(i)
    ),
    dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
    hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
    islands AS (
      SELECT doc_id, pos,
        CASE WHEN pos > coalesce(max(pos + 8) OVER (
          PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    grp AS (
      SELECT doc_id, pos, sum(brk) OVER (
        PARTITION BY doc_id ORDER BY pos) AS gid
      FROM islands
    )
    SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
           max(pos) + 8 - min(pos) AS span_tokens
    FROM grp GROUP BY doc_id, gid
    """,
)
def ns_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.text.spans import duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_spans(docs, k=8)


# Misra-Gries heavy hitters (operators/sketches.py): per-partition
# bounded summaries → broadcast-verified EXACT counts → top-k. Exact
# whenever the head is heavy (rank-15 word count is >= 2x the n/60
# candidate threshold on this corpus at sf0.001/0.01/0.1 — measured),
# which the averaging-argument superset guarantee then makes a hash-
# matchable result, not just an approximation.
# Demoted in the round-11 rotation (identical oracle in
# tests/test_demoted_oracles.py): term-frequency machinery stays under
# the driver gate through ext_bm25_topk (tf-idf over the same token
# stream) and the curation/text-stats rows — the bare top-k count was
# the text tier's most redundant row.
_FREQUENT_TERMS_ORACLE = """
    SELECT word, COUNT(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ) GROUP BY word ORDER BY n DESC, word ASC LIMIT 15
    """


def ns_frequent_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clickhouse_etl_spark.operators.sketches import frequent_items

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    return frequent_items(words, "word", k=15, margin=4)


# ---------------------------------------------------------------------------
# Round-8 rotation, batch 4: DSIR targeted selection (text/dsir.py) as a
# driver row. hash_family='poly' makes the WHOLE pipeline — hashed
# n-gram featurization, the two smoothed bucket models, per-doc log
# importance weights, and the Gumbel top-n draw — a bit-deterministic
# SQL mirror (the Gumbel noise derives from the wrapping-int64 affine
# permutation of the doc id, never rand()). The strict top-n boundary
# sits on unrounded keys (w + gumbel): a flip needs two keys within the
# ln() drift (~1e-15) of each other — the registry's standing
# measure-zero adjudication. Small bucket count (64) on purpose: the
# gate corpus must EXERCISE bucket collisions, not avoid them.
# ---------------------------------------------------------------------------
_DSIR_NB = 64
_DSIR_N = 100
_DSIR_SEED = 7


def _dsir_oracle() -> str:
    a, b = poly_affine_constants(0)
    u_bucket = f"(({_POLY_FOLD_SQL.format(s='g')}) * {a}::HUGEINT + {b}::HUGEINT) % {_M64}"
    s_bucket = _SIGNED_SQL.format(v=f"({u_bucket})")
    bucket = f"((({s_bucket}) % {_DSIR_NB}) + {_DSIR_NB}) % {_DSIR_NB}"
    ga, gb = poly_affine_constants(_DSIR_SEED)
    gu = f"((doc_id::HUGEINT * {ga}::HUGEINT + {gb}::HUGEINT) % {_M64})"
    gs = _SIGNED_SQL.format(v=gu)
    m = 1 << 52
    gumbel_u = f"(((({gs}) % {m}) + {m}) % {m} + 1)::DOUBLE / {float(m + 2)!r}"
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_concat(t, list_transform(range(1, len(t)),
               i -> t[i] || ' ' || t[i + 1])) AS gs
      FROM toks
    ),
    occ AS MATERIALIZED (
      SELECT doc_id, unnest(gs) AS g FROM grams
    ),
    dg AS MATERIALIZED (
      SELECT g, CAST({bucket} AS BIGINT) AS bucket
      FROM (SELECT DISTINCT g FROM occ)
    ),
    feats AS MATERIALIZED (
      SELECT o.doc_id, d.bucket FROM occ o JOIN dg d USING (g)
    ),
    tcnt AS (
      SELECT bucket, count(*) AS t_n FROM feats
      WHERE doc_id % 10 = 0 GROUP BY bucket
    ),
    rcnt AS (
      SELECT bucket, count(*) AS r_n FROM feats
      WHERE doc_id % 10 <> 0 GROUP BY bucket
    ),
    model AS MATERIALIZED (
      SELECT b.bucket,
             COALESCE(t.t_n, 0) AS t_n, COALESCE(r.r_n, 0) AS r_n
      FROM (SELECT unnest(range(0, {_DSIR_NB})) AS bucket) b
      LEFT JOIN tcnt t ON t.bucket = b.bucket
      LEFT JOIN rcnt r ON r.bucket = b.bucket
    ),
    ratios AS (
      SELECT bucket,
             ln(t_n + 1.0) - ln((SELECT SUM(t_n) FROM model) + {_DSIR_NB}.0)
             - ln(r_n + 1.0) + ln((SELECT SUM(r_n) FROM model) + {_DSIR_NB}.0)
               AS log_ratio
      FROM model
    ),
    scored AS (
      SELECT d.doc_id, COALESCE(s.w, 0.0) AS w
      FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
      LEFT JOIN (
        SELECT f.doc_id, SUM(r.log_ratio) AS w
        FROM feats f JOIN ratios r ON r.bucket = f.bucket
        WHERE f.doc_id % 10 <> 0 GROUP BY f.doc_id
      ) s ON s.doc_id = d.doc_id
    )
    SELECT doc_id, ROUND(w, 6) AS dsir_logweight
    FROM (
      SELECT doc_id, w,
             w + (-ln(-ln({gumbel_u}))) AS gkey
      FROM scored
    )
    ORDER BY gkey DESC, doc_id ASC LIMIT {_DSIR_N}
    """


@register("ns_dsir_select", oracle=_dsir_oracle())
def ns_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (text/dsir.py:dsir_select): fit
    target-vs-raw hashed-n-gram log-ratios (docs with id % 10 = 0 act
    as the target corpus), score the raw pool, keep the Gumbel-top-100
    draw. Log-ratio table is bounded by the bucket count (broadcast);
    the only corpus shuffles are the per-(doc, bucket) count and the
    per-doc score sum; top-n is a TakeOrdered."""
    from clickhouse_etl_spark.text.dsir import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 10 == 0)
    raw = docs.filter(F.col("doc_id") % 10 != 0)
    out = dsir_select(
        target, raw, n=_DSIR_N, num_buckets=_DSIR_NB,
        hash_family="poly", seed=_DSIR_SEED,
    )
    return out.select(
        "doc_id", F.round("dsir_logweight", 6).alias("dsir_logweight")
    )


# ---------------------------------------------------------------------------
# Round-8 rotation, batch 4: the END-TO-END curation pipeline
# (text/curation.py:curate_corpus) as a driver row. Every stage was
# already individually oracle-checked; this row pins the COMPOSITION —
# stage order, inter-stage plumbing, and the survivor set it produces:
# exact dedup → MinHash-LSH near-dup cluster removal (min-id keep) →
# duplicated-span cutting → heuristic quality filter on the CUT text →
# deterministic split assignment. hash_family='poly' threads the
# SQL-reproducible hash family through every stage (r8), so the whole
# chain mirrors into one DuckDB statement: keep-first GROUP BY, the
# shared MinHash CTE block, a recursive-CTE transitive closure, the
# span-island rebuild, the rounded-ratio quality gate, and the affine
# split bucket. The PII scrub runs inside the query but is projected
# out (it rewrites text without affecting survival; its regex chain is
# oracle-checked standalone in pytest). minhash_max_bucket_size=None:
# the oracle computes the exact uncapped pair set (the cap is a
# production default, not oracle semantics).
# ---------------------------------------------------------------------------
_CURATE_MINHASH_THRESH = 0.2


def _curate_oracle() -> str:
    mh = _minhash_pair_ctes(threshold=_CURATE_MINHASH_THRESH, src="c1")
    sa, sb = poly_affine_constants(1)
    u_split = f"((doc_id::HUGEINT * {sa}::HUGEINT + {sb}::HUGEINT) % {_M64})"
    s_split = _SIGNED_SQL.format(v=u_split)
    bucket = f"((({s_split}) % 1000000) + 1000000) % 1000000"
    punct = r"[!-/:-@\[-`{-~]"
    return f"""
    WITH RECURSIVE base AS MATERIALIZED (SELECT doc_id, text FROM documents),
    keep1 AS (SELECT MIN(doc_id) AS doc_id FROM base GROUP BY text),
    c1 AS MATERIALIZED (SELECT b.doc_id, b.text FROM base b
           JOIN keep1 k ON k.doc_id = b.doc_id),
    {mh},
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
      UNION
      SELECT doc_b, doc_a FROM mh_pairs
    ),
    reach AS (
      SELECT DISTINCT src, src AS dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
    ),
    clusters AS (
      SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
    ),
    c2 AS (
      SELECT * FROM c1 WHERE doc_id NOT IN (
        SELECT doc_id FROM clusters WHERE doc_id <> cluster_id
      )
    ),
    toks AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS t FROM c2),
    grams AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS gram
      FROM toks,
           UNNEST(generate_series(1, greatest(len(t) - 7, 0))) AS g(i)
    ),
    hits AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        FROM grams
      ) WHERE rn >= 2
    ),
    islands AS (
      SELECT doc_id, pos,
        CASE WHEN pos > coalesce(max(pos + 8) OVER (
          PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        THEN 1 ELSE 0 END AS brk
      FROM hits
    ),
    grp AS (
      SELECT doc_id, pos, sum(brk) OVER (
        PARTITION BY doc_id ORDER BY pos) AS gid
      FROM islands
    ),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
      FROM grp GROUP BY doc_id, gid
    ),
    posn AS (
      SELECT doc_id, i - 1 AS pos, t[i] AS tok
      FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
    ),
    kept AS (
      SELECT p.doc_id, p.pos, p.tok FROM posn p
      WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = p.doc_id AND p.pos >= s.s AND p.pos < s.e
      )
    ),
    cut AS (
      SELECT t.doc_id, COALESCE(k2.txt, '') AS text
      FROM toks t LEFT JOIN (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt
        FROM kept GROUP BY doc_id
      ) k2 ON k2.doc_id = t.doc_id
    ),
    qual AS (
      SELECT doc_id,
        len(string_split(text, ' ')) AS n_tok,
        ROUND(CAST(len(list_filter(string_split(text, ' '),
                x -> x IN ({_STOP_SQL}))) AS DOUBLE)
              / len(string_split(text, ' ')), 6) AS stop_ratio,
        ROUND(CAST(length(text) -
                length(regexp_replace(text, '{punct}', '', 'g')) AS DOUBLE)
              / GREATEST(length(text), 1), 6) AS punct_ratio
      FROM cut
    ),
    c3 AS (
      SELECT doc_id FROM qual
      WHERE NOT (n_tok < 5) AND NOT (stop_ratio > 0.6)
        AND NOT (punct_ratio > 0.2)
    )
    SELECT doc_id,
           CASE WHEN {bucket} < 900000 THEN 'train'
                WHEN {bucket} < 950000 THEN 'val'
                ELSE 'test' END AS split
    FROM c3
    """


@register("ns_curate_corpus", oracle=_curate_oracle())
def ns_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composition (text/curation.py): the survivor
    id set + deterministic split after exact dedup, near-dup cluster
    removal, span cutting, and the quality gate. with_report=False —
    the data card's per-stage counts are composition *accounting* (each
    is a separate action); the row pins the composed RESULT."""
    from clickhouse_etl_spark.text.curation import curate_corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    res = curate_corpus(
        docs,
        span_k=8,
        minhash_threshold=_CURATE_MINHASH_THRESH,
        min_tokens=5,
        hash_family="poly",
        minhash_max_bucket_size=None,
        with_report=False,
    )
    return res.corpus.select("doc_id", "split")


# ---------------------------------------------------------------------------
# Round-9 rotation, batch 5: canonical BPE training (text/bpe.py) as a
# driver row — the r8 VERDICT's named rotation-5 candidate ("train_bpe
# is now provably SQL-expressible"). The oracle UNROLLS each merge
# round in SQL (tests/test_bpe.py proved the construction at smoke SF):
# occurrence-weighted adjacent-pair counts, the count-desc /
# lexicographic argmax, and greedy left-to-right merge application via
# a fence-wrapped string replace — each symbol is wrapped
# \x01sym\x02, so plain replace() of \x01a\x02\x01b\x02 -> \x01ab\x02
# IS non-overlapping left-to-right BPE greedy semantics by construction
# (a just-merged symbol can't re-match, runs of a==b merge floor(L/2)
# times, and the fences make symbol boundaries exact — no prefix
# aliasing). Symbols come from space-split words, so the corpus can't
# contain the fence bytes. Each s{k} stage is AS MATERIALIZED: the
# symbol table is referenced twice per round (argmax + fold), so DuckDB
# 1.0's default inlining would re-derive stage k from scratch 2^(8-k)
# times.
# ---------------------------------------------------------------------------
_BPE_MERGES = 8


def _bpe_oracle(n_merges: int = _BPE_MERGES) -> str:
    def stage(k: int) -> str:
        wrap = "chr(1) || {s} || chr(2)"
        seq = (
            "array_to_string(list_transform(syms,"
            f" s -> {wrap.format(s='s')}), '')"
        )
        # s{k}_pat folds the (at most one) argmax row into a scalar
        # (pattern, replacement) pair. When NO pair has count >= 2 the
        # fold COALESCEs to chr(1)||chr(2) — a byte sequence that can
        # never occur in the fenced string (every chr(1) is followed by
        # a non-empty symbol, never directly by chr(2)) — so the stage
        # is a no-op instead of a CROSS JOIN against an empty relation
        # that would empty every later stage. This mirrors train_bpe's
        # early stop: it returns the symbol table as-is once the corpus
        # yields fewer than n_merges mergeable pairs.
        return f"""
    s{k}_best AS (
      SELECT a, b FROM (
        SELECT p.a, p.b, SUM(p.n) AS cnt FROM (
          SELECT n, syms[i] AS a, syms[i + 1] AS b
          FROM s{k}, UNNEST(generate_series(1, len(syms) - 1)) AS g(i)
        ) p GROUP BY p.a, p.b HAVING SUM(p.n) >= 2
      ) ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    ),
    s{k}_pat AS (
      SELECT
        COALESCE(MAX(chr(1) || a || chr(2) || chr(1) || b || chr(2)),
                 chr(1) || chr(2)) AS pat,
        COALESCE(MAX(chr(1) || a || b || chr(2)), chr(1) || chr(2)) AS rep
      FROM s{k}_best
    ),
    s{k + 1} AS MATERIALIZED (
      SELECT word, n,
        list_transform(
          list_filter(string_split(
            replace({seq}, b.pat, b.rep), chr(2)), x -> x <> ''),
          x -> x[2:]) AS syms
      FROM s{k} CROSS JOIN s{k}_pat b
    )"""

    stages = ",".join(stage(k) for k in range(n_merges))
    # Final SELECT serializes syms to a space-joined string: the
    # driver's pandas canonicalizer sorts columns and cannot hash list
    # values (the a7_nested_order_lines precedent,
    # queries/relational.py) — the typed array stays on the library
    # surface (text/bpe.py).
    return f"""
    WITH s0 AS MATERIALIZED (
      SELECT word, COUNT(*) AS n,
             list_filter(string_split(word, ''), x -> x <> '') AS syms
      FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    ),{stages}
    SELECT word, n, array_to_string(syms, ' ') AS syms FROM s{n_merges}
    """


@register("ns_train_bpe", oracle=_bpe_oracle())
def ns_train_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical sequential BPE training (text/bpe.py:train_bpe,
    batch_size=1): 8 merge rounds over the corpus word-count
    vocabulary, returning the final symbol table (word, n, syms). One
    vocab-scale pair-argmax job per round — the driver sees one (a, b)
    pair per merge, never data; the corpus-scale work is the single
    word_counts pass. The frequency-batched variant (batch_size>1, the
    100 TB training recipe) keeps its disjointness-equivalence and
    losslessness pins in tests/test_bpe.py.

    The registered projection space-joins the syms array so the
    driver's pandas canonicalizer (which sorts column values and cannot
    hash lists) can process it — the a7_nested_order_lines precedent;
    the typed-array surface stays on text/bpe.py."""
    from clickhouse_etl_spark.text.bpe import train_bpe, word_counts

    docs = load_table(spark, sf_dir, "documents")
    vocab = word_counts(docs)
    _merges, symtab = train_bpe(vocab, n_merges=_BPE_MERGES, batch_size=1)
    return symtab.select(
        "word", "n", F.concat_ws(" ", "syms").alias("syms")
    )
