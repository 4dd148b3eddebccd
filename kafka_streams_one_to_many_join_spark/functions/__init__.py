"""Training-data pipeline operators: text analysis, deduplication,
similarity search, multimodal binary columns.

All hot paths are JVM-side Catalyst expressions (regexp_extract_all,
transform/filter/aggregate higher-order functions, md5/xxhash64) — Python
appears only in the explicitly-marked vectorized Pandas-UDF variants used
when numpy beats expression trees (dense linear algebra).
"""

from kafka_streams_one_to_many_join_spark.functions.dedup import (
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    exact_duplicates,
    minhash_band_index,
    minhash_coeffs,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
    minhash_signatures,
    near_dup_clusters,
    segment_dedup_incremental,
    segment_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
    with_bsig_hash,
)
from kafka_streams_one_to_many_join_spark.functions.multimodal import (
    asset_metadata,
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_frames_stub,
)
from kafka_streams_one_to_many_join_spark.functions.sampling import (
    deterministic_sample,
    train_val_split,
)
from kafka_streams_one_to_many_join_spark.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    brute_force_topk_pandas,
    cosine_expr,
    hyperplane_lsh_bucket,
    lsh_topk,
    seeded_centroids,
    seeded_planes,
)
from kafka_streams_one_to_many_join_spark.functions.text import (
    bpe_pair_counts,
    bpe_encode,
    bpe_train,
    doc_fingerprint,
    hashed_quality_score,
    language_id,
    script_profile,
    shingle_unit_for_script,
    text_stats,
    token_re,
    token_re_sql,
    tokens_expr,
)

__all__ = [
    "asset_metadata",
    "bpe_pair_counts",
    "bpe_encode",
    "bpe_train",
    "brute_force_topk",
    "brute_force_topk_pandas",
    "cosine_expr",
    "deterministic_sample",
    "doc_fingerprint",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_lsh",
    "exact_duplicates",
    "extract_audio_features",
    "extract_image_features",
    "resize_images",
    "hashed_quality_score",
    "hyperplane_lsh_bucket",
    "ivf_topk",
    "language_id",
    "lsh_topk",
    "minhash_band_index",
    "minhash_coeffs",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_incremental",
    "minhash_signatures",
    "near_dup_clusters",
    "segment_dedup_incremental",
    "segment_pairs",
    "ngram_jaccard_pairs",
    "sample_frames_stub",
    "seeded_centroids",
    "seeded_planes",
    "simhash_buckets",
    "with_bsig_hash",
    "script_profile",
    "shingle_unit_for_script",
    "text_stats",
    "token_re",
    "token_re_sql",
    "tokens_expr",
    "train_val_split",
]
