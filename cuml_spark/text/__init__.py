from cuml_spark.text.dedup import (
    fuzzy_cross_contamination,
    exact_dedup_groups,
    normalized_fingerprint,
    shingles,
    minhash_signatures,
    lsh_candidate_pairs,
    jaccard_similarity_pairs,
    simhash,
)
from cuml_spark.text.quality import quality_features, language_id, token_count
from cuml_spark.text.contamination import ngram_contamination
from cuml_spark.text.pii import scrub_pii
from cuml_spark.text.repetition import repetition_signals
from cuml_spark.text.c4 import c4_line_filter, span_dedup_stats
from cuml_spark.text.mixing import domain_rates, temperature_sample
from cuml_spark.text.lm import (BigramLM, bigram_lm_scores,
                                fit_bigram_lm, perplexity_buckets)
from cuml_spark.text.retrieval import (bm25_topk, chunk_documents,
                                       rrf_fuse, tfidf_keywords)
from cuml_spark.text.substring import exact_substring_dedup
from cuml_spark.text.ngrams import top_ngrams
from cuml_spark.text.packing import pack_documents
from cuml_spark.text.gopher import GOPHER_STOPWORDS, gopher_quality_flags
from cuml_spark.text.bpe import (BPEModel, bpe_tokenize, corpus_word_counts,
                                 train_bpe, train_bpe_from_counts)
from cuml_spark.text.dsir import (
    DSIRModel,
    dsir_log_ratios,
    dsir_select_gumbel,
    dsir_select_topk,
    dsir_unseen_log_ratio,
    fit_dsir,
    fit_dsir_subset,
    hashed_bucket_totals,
    hashed_bucket_totals_pair,
)
from cuml_spark.text.classifier import (
    QualityClassifier,
    fit_quality_classifier,
    hashed_token_counts,
    score_linear_bow,
    score_linear_bow_inline,
    token_bucket,
)

__all__ = [
    "exact_dedup_groups", "normalized_fingerprint", "shingles",
    "minhash_signatures", "lsh_candidate_pairs", "jaccard_similarity_pairs",
    "simhash", "quality_features", "language_id", "token_count",
    "ngram_contamination", "scrub_pii", "repetition_signals",
    "c4_line_filter", "span_dedup_stats", "domain_rates",
    "temperature_sample", "bigram_lm_scores", "fit_bigram_lm",
    "perplexity_buckets",
    "BigramLM", "bm25_topk", "rrf_fuse", "chunk_documents",
    "tfidf_keywords",
    "exact_substring_dedup", "top_ngrams", "hashed_token_counts",
    "score_linear_bow", "score_linear_bow_inline", "token_bucket",
    "fit_quality_classifier", "pack_documents",
    "gopher_quality_flags", "GOPHER_STOPWORDS", "fuzzy_cross_contamination",
    "BPEModel", "train_bpe", "train_bpe_from_counts", "bpe_tokenize",
    "corpus_word_counts",
    "QualityClassifier",
    "DSIRModel", "fit_dsir", "fit_dsir_subset", "dsir_log_ratios",
    "dsir_select_topk", "dsir_select_gumbel", "dsir_unseen_log_ratio",
    "hashed_bucket_totals", "hashed_bucket_totals_pair",
]
