from schemamap_spark.operators.curation import (
    corpus_report,
    curate_corpus,
    curation_report,
    hygiene_gate,
    quantile_quality_filter,
)
from schemamap_spark.operators.ngrams import corpus_ngram_stats, stop_grams
from schemamap_spark.operators.graph import connected_components, transitive_closure, transitive_closure_sql
from schemamap_spark.operators.dedup import (
    containment_pairs,
    contamination_report,
    decontaminate,
    exact_duplicates,
    incremental_exact_dedup,
    incremental_minhash_dedup,
    jaccard_similar_pairs,
    minhash_lsh_similar_pairs,
    shingles_for,
    simhash_near_pairs,
    winnow_fingerprints,
)
from schemamap_spark.operators.embeddings import (
    dequantize_embeddings,
    ivf_pq_topk,
    pq_encode,
    pq_topk,
    pq_train,
    quantize_embeddings,
)
from schemamap_spark.operators.similarity import (
    cosine_near_pairs,
    cosine_topk,
    ivf_topk,
    lsh_topk,
    topk_recall,
)
from schemamap_spark.operators.agg import bounded_collect_set, two_level_collect_set
from schemamap_spark.operators.packing import chunk_documents, pack_sequences, packing_stats
from schemamap_spark.operators.sampling import assign_splits, deterministic_sample, stratified_sample
from schemamap_spark.operators.skew import bucketed_join, salted_join, write_bucketed
from schemamap_spark.operators.temporal import asof_join, range_join
from schemamap_spark.operators.bpe import bpe_tokenize, bpe_train
from schemamap_spark.operators.dedup import drop_repeated_lines
from schemamap_spark.operators.dsir import (
    dsir_resample,
    dsir_select,
    dsir_weights,
    hashed_gram_features,
)
from schemamap_spark.operators.embeddings import (
    embedding_outliers,
    ivf_centroids,
    ivf_pq_encode,
    ivf_pq_search_encoded,
    truncate_embeddings,
)
from schemamap_spark.operators.profile import profile_table
from schemamap_spark.operators.retrieval import bm25_index, bm25_topk, rrf_fuse
from schemamap_spark.operators.ann_index import (
    ConcurrentWriteError,
    ann_index_append,
    ann_index_build,
    ann_index_compact,
    ann_index_drift,
    ann_index_gc,
    ann_index_search,
)
from schemamap_spark.operators.sketches import (
    append_sketches,
    column_sketches,
    incremental_ndv,
    ndv_estimates,
)
from schemamap_spark.operators.curation import (
    append_corpus_stats,
    corpus_stats_partials,
    corpus_stats_report,
)

__all__ = [
    "transitive_closure", "transitive_closure_sql", "connected_components",
    "exact_duplicates", "jaccard_similar_pairs", "minhash_lsh_similar_pairs",
    "simhash_near_pairs", "winnow_fingerprints", "containment_pairs",
    "contamination_report", "decontaminate",
    "incremental_exact_dedup", "incremental_minhash_dedup", "shingles_for",
    "curate_corpus", "curation_report", "hygiene_gate",
    "quantile_quality_filter", "corpus_ngram_stats", "stop_grams",
    "corpus_report",
    "cosine_topk", "cosine_near_pairs", "lsh_topk", "ivf_topk", "topk_recall",
    "quantize_embeddings", "dequantize_embeddings",
    "pq_train", "pq_encode", "pq_topk", "ivf_pq_topk",
    "assign_splits", "deterministic_sample", "stratified_sample",
    "pack_sequences", "packing_stats", "chunk_documents",
    "two_level_collect_set", "bounded_collect_set",
    "salted_join", "bucketed_join", "write_bucketed",
    "asof_join", "range_join",
    "dsir_select", "dsir_resample", "dsir_weights", "hashed_gram_features",
    "bpe_train", "bpe_tokenize", "drop_repeated_lines",
    "truncate_embeddings", "embedding_outliers",
    "column_sketches", "append_sketches", "ndv_estimates", "incremental_ndv",
    "corpus_stats_partials", "append_corpus_stats", "corpus_stats_report",
    "ivf_centroids", "ivf_pq_encode", "ivf_pq_search_encoded",
    "ann_index_build", "ann_index_append", "ann_index_search",
    "ann_index_compact", "ann_index_drift", "ann_index_gc",
    "ConcurrentWriteError",
    "profile_table",
    "bm25_index", "bm25_topk", "rrf_fuse",
]
