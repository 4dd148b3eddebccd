#!/usr/bin/env python
"""Incremental segment-dedup shard-vs-full crossover (r14, VERDICT r13
item 7).

r13 recorded an honest non-win at twin scale for a 10% shard (the full
pipeline's cost is text scan + tokenize, and the synthetic twins'
text:index byte ratio is ~1).  This script measures the regime the
operator exists for — a SMALL nightly shard against a big frozen corpus
— at sf10 with 1% and 0.1% shards (plus the 10% control), persisted
(seg_h, occ) counts included, outputs checksum-asserted equal to the
full recompute on the shard + affected-doc rows.

Usage: python scripts/segment_crossover.py [--dir /tmp/scale_sf10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from kafka_streams_one_to_many_join_spark.functions.dedup import (  # noqa: E402
    segment_dedup_incremental,
    segment_pairs,
)
from kafka_streams_one_to_many_join_spark.model import materialize  # noqa: E402
from kafka_streams_one_to_many_join_spark.session import get_session  # noqa: E402


def _checksum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("s"),
        F.round(F.sum("dup_frac"), 3).alias("d"),
    ).collect()[0]
    return (row.n, int(row.s or 0), float(row.d or 0.0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_sf10")
    ap.add_argument("--mods", default="10,100,1000")
    args = ap.parse_args()
    spark = get_session("segxover", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.dir}/documents.parquet")
    n = docs.count()
    tag = os.path.basename(args.dir.rstrip("/"))

    # the full-recompute control once per corpus variant (frozen∪shard
    # is the whole corpus whichever mod splits it): timed as ONE pass to
    # the checksum aggregate — no checkpoint write in the timed window
    _checksum(entry_mod._segment_dedup(docs))  # session warm-up pass
    # untimed pinned copy for the per-row equality assertions below
    full = materialize(entry_mod._segment_dedup(docs))

    for mod in (int(m) for m in args.mods.split(",")):
        frozen = docs.filter(F.col("doc_id") % mod != 7)
        shard = docs.filter(F.col("doc_id") % mod == 7)
        n_shard = shard.count()
        # nightly layout: persisted segment index + (seg_h, occ) counts
        # (one-time per night, amortized across probes; measured anyway)
        t0 = time.perf_counter()
        idx_path = f"/tmp/seg_idx_{tag}_{mod}"
        segment_pairs(frozen).write.mode("overwrite").parquet(idx_path)
        idx = spark.read.parquet(idx_path)
        occ_path = f"{idx_path}_occ"
        idx.groupBy("seg_h").agg(F.count(F.lit(1)).alias("occ")).write.mode(
            "overwrite"
        ).parquet(occ_path)
        occ = spark.read.parquet(occ_path)
        t_index = time.perf_counter() - t0

        _checksum(segment_dedup_incremental(shard, idx, seg_counts=occ))  # warm
        # interleaved median-of-3: the host has minute-scale 2-4x CPU
        # bursts, so full/probe pairs are timed back-to-back (a burst
        # hits both sides of the ratio) and the medians reported
        fulls, probes = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            _checksum(entry_mod._segment_dedup(docs))
            fulls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            inc_sum = _checksum(
                segment_dedup_incremental(shard, idx, seg_counts=occ)
            )
            probes.append(time.perf_counter() - t0)
        t_full = sorted(fulls)[1]
        t_probe = sorted(probes)[1]
        # untimed re-run for the per-row equality assertion
        inc = materialize(segment_dedup_incremental(shard, idx, seg_counts=occ))

        # equality: every emitted row equals its full-recompute row
        full_match = _checksum(full.join(inc.select("doc_id"), "doc_id"))
        assert inc_sum == full_match, (mod, inc_sum, full_match)
        print(
            f"{tag} shard=1/{mod} ({n_shard}/{n} docs): "
            f"full={t_full:.2f}s index_build={t_index:.2f}s "
            f"probe={t_probe:.2f}s delta_vs_full={t_probe / t_full:.3f} "
            f"rows_emitted={inc_sum[0]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
