#!/usr/bin/env python
"""Segment-state maintenance + bucketed-counts probe measurements (r15,
VERDICT r14 item 1 done-criteria).

Part "maintain": segment_index_apply (retract + decrement + fresh rows
for a 1% corrected / 1% deleted nightly change set) written to parquet,
vs the full rebuild (re-segment the corrected corpus + recount) written
to parquet — interleaved median-of-3, outputs checksum-asserted equal.

Part "probe": segment_dedup_incremental against persisted (seg_h, occ)
counts written PLAIN vs via write_bucketed on seg_h (BUCKETED_READ_CONFS
+ SUBSET_KEY_JOIN_CONFS active), vs the full recompute — the SCALE.md
r14 floor was 0.52x at the sf10 1% shard; this measures whether the
bucketed layout moves it.

Usage:
  python scripts/segment_maintain_bench.py --dir /tmp/scale_sf10 --part maintain
  python scripts/segment_maintain_bench.py --dir /tmp/scale_sf10 --part probe
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
    segment_index_apply,
    segment_pairs,
)
from kafka_streams_one_to_many_join_spark.session import get_session  # noqa: E402
from kafka_streams_one_to_many_join_spark.sources.bucketed import (  # noqa: E402
    BUCKETED_READ_CONFS,
    SUBSET_KEY_JOIN_CONFS,
    write_bucketed,
)


def _counts_of(pairs):
    return pairs.groupBy("seg_h").agg(F.count(F.lit(1)).alias("occ"))


def _counts_checksum(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("occ").alias("s"),
        F.sum(F.col("seg_h") % 97).alias("h"),
    ).collect()[0]
    return (r.n, int(r.s or 0), int(r.h or 0))


def _probe_checksum(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("s"),
        F.round(F.sum("dup_frac"), 3).alias("d"),
    ).collect()[0]
    return (r.n, int(r.s or 0), float(r.d or 0.0))


def bench_maintain(spark, docs, tag):
    corrected = docs.filter(F.col("doc_id") % 100 == 6).withColumn(
        "text", F.concat(F.col("text"), F.lit(" corrected edition"))
    )
    deletes = docs.filter(F.col("doc_id") % 100 == 9).select("doc_id")
    corrected_corpus = docs.filter(F.col("doc_id") % 100 != 9).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 100 == 6,
            F.concat(F.col("text"), F.lit(" corrected edition")),
        ).otherwise(F.col("text")),
    )
    # persisted night-0 state (untimed)
    base = f"/tmp/seg_maint_{tag}"
    segment_pairs(docs).write.mode("overwrite").parquet(f"{base}_pairs")
    pairs = spark.read.parquet(f"{base}_pairs")
    _counts_of(pairs).write.mode("overwrite").parquet(f"{base}_occ")
    counts = spark.read.parquet(f"{base}_occ")

    def run_maintain(out_suffix):
        p2, c2 = segment_index_apply(
            pairs, counts, upserts=corrected, delete_ids=deletes
        )
        p2.write.mode("overwrite").parquet(f"{base}_pairs_{out_suffix}")
        c2.write.mode("overwrite").parquet(f"{base}_occ_{out_suffix}")

    def run_rebuild(out_suffix):
        p = segment_pairs(corrected_corpus)
        p.write.mode("overwrite").parquet(f"{base}_pairs_{out_suffix}")
        spark.read.parquet(f"{base}_pairs_{out_suffix}").groupBy("seg_h").agg(
            F.count(F.lit(1)).alias("occ")
        ).write.mode("overwrite").parquet(f"{base}_occ_{out_suffix}")

    run_maintain("warm")  # codegen warm-up
    run_rebuild("warm")
    m_times, r_times = [], []
    for i in range(3):
        t0 = time.perf_counter()
        run_rebuild(f"r{i}")
        r_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_maintain(f"m{i}")
        m_times.append(time.perf_counter() - t0)
    cm = _counts_checksum(spark.read.parquet(f"{base}_occ_m0"))
    cr = _counts_checksum(spark.read.parquet(f"{base}_occ_r0"))
    assert cm == cr, (cm, cr)
    t_m, t_r = sorted(m_times)[1], sorted(r_times)[1]
    print(
        f"{tag} maintain={t_m:.2f}s rebuild={t_r:.2f}s "
        f"ratio={t_m / t_r:.3f} counts_checksum={cm}"
    )


def bench_probe(spark, docs, tag, mods=(100, 1000)):
    for k, v in {**BUCKETED_READ_CONFS, **SUBSET_KEY_JOIN_CONFS}.items():
        spark.conf.set(k, v)
    full_warm = _probe_checksum(entry_mod._segment_dedup(docs))
    n = docs.count()
    for mod in mods:
        frozen = docs.filter(F.col("doc_id") % mod != 7)
        shard = docs.filter(F.col("doc_id") % mod == 7)
        n_shard = shard.count()
        base = f"/tmp/seg_probe_{tag}_{mod}"
        segment_pairs(frozen).write.mode("overwrite").parquet(f"{base}_idx")
        idx = spark.read.parquet(f"{base}_idx")
        _counts_of(idx).write.mode("overwrite").parquet(f"{base}_occ")
        occ_plain = spark.read.parquet(f"{base}_occ")
        write_bucketed(
            _counts_of(idx), f"seg_occ_b_{tag}_{mod}", 32, "seg_h",
            path=f"{base}_occ_b",
        )
        occ_bucketed = spark.table(f"seg_occ_b_{tag}_{mod}")
        # warm-ups
        _probe_checksum(segment_dedup_incremental(shard, idx, seg_counts=occ_plain))
        _probe_checksum(
            segment_dedup_incremental(shard, idx, seg_counts=occ_bucketed)
        )
        fulls, plains, buckets = [], [], []
        for _ in range(3):
            t0 = time.perf_counter()
            _probe_checksum(entry_mod._segment_dedup(docs))
            fulls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            cs_p = _probe_checksum(
                segment_dedup_incremental(shard, idx, seg_counts=occ_plain)
            )
            plains.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            cs_b = _probe_checksum(
                segment_dedup_incremental(shard, idx, seg_counts=occ_bucketed)
            )
            buckets.append(time.perf_counter() - t0)
            assert cs_p == cs_b, (cs_p, cs_b)
        t_f, t_p, t_b = (sorted(x)[1] for x in (fulls, plains, buckets))
        print(
            f"{tag} shard=1/{mod} ({n_shard}/{n} docs): full={t_f:.2f}s "
            f"probe_plain={t_p:.2f}s ({t_p / t_f:.3f}x) "
            f"probe_bucketed={t_b:.2f}s ({t_b / t_f:.3f}x)"
        )
    _ = full_warm


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_sf10")
    ap.add_argument("--part", default="maintain", choices=["maintain", "probe"])
    ap.add_argument("--mods", default="100,1000")
    args = ap.parse_args()
    spark = get_session("segmaint", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.dir}/documents.parquet").select(
        "doc_id", "text"
    )
    tag = os.path.basename(args.dir.rstrip("/"))
    if args.part == "maintain":
        bench_maintain(spark, docs, tag)
    else:
        bench_probe(spark, docs, tag, tuple(int(m) for m in args.mods.split(",")))
    spark.stop()


if __name__ == "__main__":
    main()
