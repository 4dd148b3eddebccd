#!/usr/bin/env python
"""Driver-memory measurement for bpe_train's pair-count state (r15,
VERDICT r14 item 5: put a byte number on the documented
"vocabulary-bounded" asymptotic).

Two measurements:

1. bytes/pair of the dict itself, via tracemalloc around constructing
   synthetic {(left, right): count} dicts at 1M and 10M entries with
   realistic symbol lengths — the constant the max_pair_state docstring
   cites, checked for flatness across a decade;
2. the REAL state trajectory: the r14 ladder corpus (zipf-ish
   md5-derived words), bpe_train with stats → max n_pair_state over the
   merge schedule plus the exact bytes of the final dict, with
   ru_maxrss as the process-level sanity bound.

Usage: python scripts/bpe_state_rss.py [num_merges] [ndocs]
"""

from __future__ import annotations

import resource
import sys
import tracemalloc

sys.path.insert(0, "/root/repo")


def synthetic_bytes_per_pair(n: int) -> float:
    """tracemalloc bytes of a realistic n-entry pair dict: two symbol
    strings of the lengths a merge schedule produces (1-8 chars),
    distinct per entry so nothing is shared."""
    tracemalloc.start()
    base = tracemalloc.get_traced_memory()[0]
    d = {}
    for i in range(n):
        left = format(i, "x")          # 1-7 hex chars, distinct
        right = format(i * 2 + 1, "x")
        d[(left, right)] = i
    used = tracemalloc.get_traced_memory()[0] - base
    tracemalloc.stop()
    del d
    return used / n


def main() -> None:
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    ndocs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    for n in (1_000_000, 10_000_000):
        bpp = synthetic_bytes_per_pair(n)
        print(f"synthetic dict {n:,} pairs: {bpp:.0f} bytes/pair "
              f"({n * bpp / 1e9:.2f} GB total)")

    from pyspark.sql import SparkSession, functions as F

    from bpe_ladder import rich_corpus
    from kafka_streams_one_to_many_join_spark.functions.text import bpe_train

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = rich_corpus(spark, ndocs)
    nvocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .select("w").distinct().count()
    )
    stats: list = []
    merged = bpe_train(docs, num_merges, stats=stats)
    n_merges = merged.count()
    peak_pairs = max(s[3] for s in stats)
    print(
        f"real train: {ndocs:,} docs / {nvocab:,} distinct words / "
        f"{n_merges} merges -> pair state seed={stats[0][3]:,}, "
        f"peak={peak_pairs:,} entries"
    )
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"driver ru_maxrss: {rss_gb:.2f} GB (whole process, high-water)")
    spark.stop()


if __name__ == "__main__":
    main()
