"""Training-data pipeline operators: text analysis, deduplication,
similarity search, multimodal binary columns.

All hot paths are JVM-side Catalyst expressions (regexp_extract_all,
transform/filter/aggregate higher-order functions, md5/xxhash64) — Python
appears only in the explicitly-marked vectorized Pandas-UDF variants used
when numpy beats expression trees (dense linear algebra).
"""

from kafka_streams_one_to_many_join_spark.functions.text import (
    doc_fingerprint,
    language_id,
    text_stats,
    tokens_expr,
)
from kafka_streams_one_to_many_join_spark.functions.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from kafka_streams_one_to_many_join_spark.functions.similarity import (
    brute_force_topk,
    cosine_expr,
)

__all__ = [
    "brute_force_topk",
    "cosine_expr",
    "doc_fingerprint",
    "exact_duplicates",
    "language_id",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_buckets",
    "text_stats",
    "tokens_expr",
]
