#!/usr/bin/env python
"""Delta-vs-full cost of incremental MinHash dedup (r13, VERDICT r12
item 6) at the sf1/sf10 scale twins (/tmp/scale_sf1, /tmp/scale_sf10 —
scripts/gen_scale.py output).

Per scale: docs with doc_id % 10 = 7 play the nightly shard (10% of the
corpus), the rest the frozen corpus.  Measured walls:

- full:        minhash_lsh_pairs over the whole corpus (the cost the
               incremental path avoids paying per shard);
- index-build: minhash_band_index(frozen) written bucketed on bsig_h
               (ONE-TIME, amortized over every future shard);
- probe-bk:    minhash_lsh_pairs_incremental against the bucketed index
               (the recurring nightly cost; SUBSET_KEY_JOIN_CONFS makes
               the index read shuffle-free);
- probe-plain: same against a plain parquet index (what you pay without
               the bucketed layout).

Equality of the probe's pair set with the restricted full recompute is
asserted (count + checksum), not assumed.

Usage: python scripts/incremental_bench.py [--dirs /tmp/scale_sf1,/tmp/scale_sf10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_one_to_many_join_spark.functions.dedup import (  # noqa: E402
    minhash_band_index,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
    with_bsig_hash,
)
from kafka_streams_one_to_many_join_spark.session import get_session  # noqa: E402
from kafka_streams_one_to_many_join_spark.sources.bucketed import (  # noqa: E402
    BUCKETED_READ_CONFS,
    SUBSET_KEY_JOIN_CONFS,
    write_bucketed,
)


def _checksum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("doc_a") + F.col("doc_b")).alias("s"),
        F.round(F.sum("jaccard"), 3).alias("j"),
    ).collect()[0]
    return (row.n, int(row.s or 0), float(row.j or 0.0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default="/tmp/scale_sf1,/tmp/scale_sf10")
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()
    spark = get_session("incbench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in {**BUCKETED_READ_CONFS, **SUBSET_KEY_JOIN_CONFS}.items():
        spark.conf.set(k, v)
    for d in args.dirs.split(","):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        n = docs.count()
        frozen = docs.filter(F.col("doc_id") % 10 != 7)
        shard = docs.filter(F.col("doc_id") % 10 == 7)
        tag = os.path.basename(d.rstrip("/"))

        t0 = time.perf_counter()
        full = minhash_lsh_pairs(docs, threshold=args.threshold)
        full_restricted = _checksum(full.filter("doc_a % 10 = 7 OR doc_b % 10 = 7"))
        t_full = time.perf_counter() - t0

        t0 = time.perf_counter()
        idx = with_bsig_hash(minhash_band_index(frozen))
        tbl = f"mh_idx_{tag}"
        write_bucketed(idx, tbl, 32, "bsig_h", path=f"/tmp/{tbl}")
        t_index = time.perf_counter() - t0

        t0 = time.perf_counter()
        inc_bk = _checksum(
            minhash_lsh_pairs_incremental(
                shard, spark.table(tbl), threshold=args.threshold
            )
        )
        t_probe_bk = time.perf_counter() - t0

        idx.write.mode("overwrite").parquet(f"/tmp/{tbl}_plain")
        plain = spark.read.parquet(f"/tmp/{tbl}_plain")
        t0 = time.perf_counter()
        inc_plain = _checksum(
            minhash_lsh_pairs_incremental(shard, plain, threshold=args.threshold)
        )
        t_probe_plain = time.perf_counter() - t0

        assert inc_bk == full_restricted == inc_plain, (
            tag,
            inc_bk,
            full_restricted,
            inc_plain,
        )
        print(
            f"{tag}: docs={n} pairs_touching_shard={inc_bk[0]} "
            f"full={t_full:.2f}s index_build={t_index:.2f}s "
            f"probe_bucketed={t_probe_bk:.2f}s probe_plain={t_probe_plain:.2f}s "
            f"delta_vs_full={t_probe_bk / t_full:.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
