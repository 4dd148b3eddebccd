"""bpe_train merge-count ladder (r14, VERDICT r13 item 2).

Measures per-merge cost of the INCREMENTAL pair-count maintenance path
over a long merge schedule on a rich synthetic vocabulary, recording the
touched-word count per merge — the claim under test is that per-merge
cost drops as the touched-word fraction shrinks (Sennrich's fast-BPE
observation, now the engine's dataflow).

Corpus: 200k docs x 25 words drawn zipf-ish from an md5-derived pool
(deterministic, engine-generated — no files), giving ~100k+ distinct
words like round 13's rich-vocabulary control.  Run:

    python scripts/bpe_ladder.py [num_merges] [ndocs]
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")

from kafka_streams_one_to_many_join_spark.functions.text import bpe_train  # noqa: E402


def rich_corpus(spark, ndocs: int = 200_000, words_per_doc: int = 25):
    """Deterministic zipf-ish corpus: word k chosen as floor(u^3 * POOL)
    with u an md5-derived uniform — early ranks are hot (their merges
    touch many words), tail ranks are cold (their merges touch few)."""
    pool = 150_000
    u = (
        "(conv(substr(md5(cast(i * 25 + j as string)), 1, 6), 16, 10)"
        " / 16777216.0)"
    )
    word = (
        f"substr(md5(cast(cast(floor(pow({u}, 3.0) * {pool}) as int) as string)),"
        " 1, 6 + cast((i * 25 + j) % 5 as int))"
    )
    return (
        spark.range(ndocs)
        .withColumnRenamed("id", "i")
        .select(
            F.col("i").alias("doc_id"),
            F.expr(
                f"array_join(transform(sequence(1, {words_per_doc}), j -> {word}), ' ')"
            ).alias("text"),
        )
    )


def main():
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    ndocs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
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
    print(f"docs={ndocs} distinct_words={nvocab} merges={num_merges}")
    stats: list = []
    t0 = time.perf_counter()
    merged = bpe_train(docs, num_merges, stats=stats)
    n = merged.count()
    total = time.perf_counter() - t0
    print(f"learned {n} merges in {total:.1f} s ({total / max(n,1):.3f} s/merge)")
    # per-100-merge segments: wall and mean touched words
    for lo in range(0, len(stats), 100):
        seg = stats[lo:lo + 100]
        wall = sum(s[1] for s in seg)
        touched = sum(s[2] for s in seg) / len(seg)
        print(
            f"merges {lo + 1:4d}-{lo + len(seg):4d}: {wall:7.1f} s "
            f"({wall / len(seg):.3f} s/merge), mean touched words {touched:,.0f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
