#!/usr/bin/env python
"""Measure wall-time growth of the heavy pipelines across scale factors.

Runs the bucketed/heavy queries against two (or more) data dirs produced by
`scripts/gen_scale.py` and prints a growth table — the measured backing for
SCALE.md's claim that the bucketed pipelines grow sub-quadratically while
the documented exact baselines grow quadratically.

Usage:
  python scripts/gen_scale.py --mult 1  --out /tmp/scale_sf01
  python scripts/gen_scale.py --mult 10 --out /tmp/scale_sf1
  python scripts/scale_check.py /tmp/scale_sf01 /tmp/scale_sf1

Both dirs come from the SAME seeded generator, so the sf1 point is a true
10x of the sf0.1 point (not a different distribution).  Each timing is the
median of $SPARK_GRAFT_REPEATS (default 3) noop-sink materializations.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from kafka_streams_one_to_many_join_spark.session import get_session

# (query, tables it reads) — only queries over the generated tables
SCALE_QUERIES = [
    ("join_trace", "events"),
    ("ngram_jaccard", "documents"),
    ("minhash_lsh", "documents"),
    ("simhash_near_dup", "documents"),
    ("winnowing", "documents"),
    ("embedding_near_dup_lsh", "embeddings"),
    ("ann_topk_lsh", "embeddings"),
    # documented exact baselines — expected to grow ~quadratically; kept in
    # the table as the contrast that motivates the LSH scale paths
    ("embedding_near_dup", "embeddings"),
    # round-4 additions
    ("bigram_pmi", "documents"),
    ("tfidf_top_terms", "documents"),
    ("doc_repetition", "documents"),
    ("posting_lists", "documents"),
    ("dedup_clusters", "documents"),
    ("hll_distinct", "events"),
    # round 13
    ("minhash_lsh_incremental", "documents"),
    ("minhash_lsh_unicode_codepoint_cap64", "documents"),
    ("rolling_avg_value", "events"),
    # round-6 additions
    ("sequence_pack", "documents"),
    ("quantile_sketch", "documents"),
    ("shingle_novelty", "documents"),
    ("vocab_growth", "documents"),
    ("shard_assignment", "documents"),
    ("cms_token_counts", "documents"),
    ("token_count_modes", "documents"),
    ("mixture_weights", "documents"),
    ("sequence_pack_text", "documents"),
    ("curation_funnel", "documents"),
    # round-7 additions
    ("token_chunks", "documents"),
    ("packing_efficiency", "documents"),
    ("doc_profile", "documents"),
    ("segment_dedup", "documents"),
    ("unigram_logprob", "documents"),
    ("embedding_normalize", "embeddings"),
    ("split_leakage", "documents"),
    ("bpe_merge_step", "documents"),
    ("quality_classifier", "documents"),
    ("source_overlap", "documents"),
    # round-8 additions (needs gen_scale's orders/customer twins)
    ("bloom_filter", "orders customer"),
    ("ann_topk_ivf", "embeddings"),
    # round-9 additions: engine-matched xxhash64 variants of the md5-hot
    # sketch paths (functions.hashing) — same pipelines, the portable
    # digest swapped for Spark's native hash; the md5 rows above stay the
    # oracle-parity default, these rows measure what the swap buys
    ("cms_token_counts_xxh", "documents"),
    ("minhash_lsh_xxh", "documents"),
    ("bloom_filter_xxh", "orders customer"),
    ("ngram_jaccard_xxh", "documents"),
    # late round 9: one Lloyd iteration — linear assignment projection
    # (single-evaluation argmax fold over the centroid dots) + a
    # cells x dim shuffle that is corpus-size-independent
    ("kmeans_step", "embeddings"),
]


def _variants() -> dict:
    """Non-roster measurement-only variants (kept out of queries() so the
    driver roster stays at 100 oracle-paired entries)."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        UNBOUNDED_SHINGLE_FREQ,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )
    from kafka_streams_one_to_many_join_spark.model import load_table

    def _simhash_cap(spark, d):
        return simhash_near_dup_pairs(
            load_table(spark, d, "documents"), max_bucket_size=256
        )

    return {
        "ngram_jaccard_xxh": lambda spark, d: ngram_jaccard_pairs(
            load_table(spark, d, "documents"), n=3, threshold=0.7,
            max_shingle_freq=UNBOUNDED_SHINGLE_FREQ, hash_mode="xxhash64",
        ),
        "cms_token_counts_xxh": lambda spark, d: entry_mod.q_cms_token_counts(
            spark, d, hash_mode="xxhash64"
        ),
        "minhash_lsh_xxh": lambda spark, d: minhash_lsh_pairs(
            load_table(spark, d, "documents"), num_hashes=16, bands=8,
            threshold=0.7, shingle_n=3, hash_mode="xxhash64",
        ),
        # round 10: the hot-bucket guard — the knob that kills the
        # quadratic candidate term the sf10→sf100 decade exposed
        # (candidates 97× on 10× docs; SCALE.md third decade)
        "minhash_lsh_cap64": lambda spark, d: minhash_lsh_pairs(
            load_table(spark, d, "documents"), num_hashes=16, bands=8,
            threshold=0.7, shingle_n=3, max_bucket_size=64,
        ),
        "simhash_near_dup_cap256": lambda spark, d: _simhash_cap(spark, d),
        "doc_profile_arrow_vote": lambda spark, d: entry_mod.q_doc_profile(
            spark, d, vote_mode="pandas"
        ),
        "bloom_filter_xxh": lambda spark, d: entry_mod.q_bloom_filter(
            spark, d, hash_mode="xxhash64"
        ),
        # round 13: the multilingual configuration (roster
        # minhash_lsh_incremental needs no variant — it is a queries()
        # entry; scripts/incremental_bench.py measures its persisted-
        # index form)
        # CAPPED: on the synthetic twins the ~30-word vocabulary makes
        # codepoint trigrams SATURATE (sf1: max bucket 30,089 members,
        # 1.38e9 uncapped candidates — the ngram saturated-vocab regime,
        # re-measured for the codepoint unit; SCALE.md round 13).  Real
        # multilingual corpora have orders more codepoint diversity; the
        # cap is the standing guard either way.
        "minhash_lsh_unicode_codepoint_cap64": lambda spark, d: minhash_lsh_pairs(
            load_table(spark, d, "documents"), num_hashes=16, bands=8,
            threshold=0.7, shingle_n=3,
            token_mode="unicode", shingle_unit="codepoint",
            max_bucket_size=64,
        ),
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/tmp/scale_sf01", "/tmp/scale_sf1"]
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    scale_queries = (
        [q for q in SCALE_QUERIES if q[0] in set(only.split(","))]
        if only
        else SCALE_QUERIES
    )
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session("scale", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = {**entry_mod.queries(), **_variants()}
    # roster consolidations retire names (embedding_near_dup_lsh → the
    # method-tagged embedding_near_dup composite in r14,
    # packing_efficiency → the face-tagged token_chunks composite in
    # r15); skip retired rows instead of KeyError-ing so the curated
    # measurement list survives rotations
    missing = [n for n, _ in scale_queries if n not in queries]
    if missing:
        print(f"  skipping retired queries: {missing}", file=sys.stderr)
        scale_queries = [q for q in scale_queries if q[0] in queries]

    results: dict[str, dict[str, float]] = {}
    for d in dirs:
        for name, _tables in scale_queries:
            samples = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                queries[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
            results.setdefault(name, {})[d] = round(statistics.median(samples), 2)
            print(f"  {name} @ {d}: {results[name][d]}s", file=sys.stderr)

    print(json.dumps({"repeats": repeats, "cpus": cpus, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
