"""Large-scale training-data operators: dedup, similarity, text analysis."""

from clickhouse_etl_spark.text.analysis import (  # noqa: F401
    corpus_quality_filter,
    document_fingerprint,
    document_rolling_fingerprint,
    gopher_quality_stats,
    language_guess,
    pii_scrub,
    repetition_stats,
    text_stats,
    token_count_regex,
    top_k_vocab,
)
from clickhouse_etl_spark.text.packing import (  # noqa: F401
    contamination_check,
    decontaminate,
    ngram_contamination,
    pack_contiguous,
)
from clickhouse_etl_spark.text.dedup import (  # noqa: F401
    dedup_keep_list,
    exact_dedup,
    minhash_near_duplicates,
    neardup_clusters,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
    simhash_signatures,
)
from clickhouse_etl_spark.text.similarity import (  # noqa: F401
    brute_force_cosine_topk,
    ivf_ann_topk,
    lsh_ann_topk,
)
from clickhouse_etl_spark.text.spans import (  # noqa: F401
    cut_duplicated_spans,
    duplicated_spans,
    span_dedup_stats,
)
from clickhouse_etl_spark.text.index import (  # noqa: F401
    bm25_topk,
    inverted_index,
    tf_idf,
)
from clickhouse_etl_spark.text.scoring import (  # noqa: F401
    filter_by_score,
    score_documents,
)
from clickhouse_etl_spark.text.bpe import (  # noqa: F401
    encode_words,
    tokenize_corpus,
    train_bpe,
    word_counts,
)
from clickhouse_etl_spark.text.curation import (  # noqa: F401
    CurationResult,
    curate_corpus,
)
from clickhouse_etl_spark.text.lm import (  # noqa: F401
    perplexity_filter,
    train_unigram_lm,
    unigram_logprob_scores,
)
