#!/usr/bin/env python
"""Measure the simhash cluster-vs-pairs crossover on a dense twin.

SCALE.md round 11 recorded 80.1 s (clusters) vs 14.3 s (pairs+CC) at 50k
dense docs and CLAIMED the cluster path wins at 500k+ by candidate
arithmetic (8.45e11 in-bucket candidates, r10 SCALE) — this script turns
that extrapolation into a measured row (r11 VERDICT item 4).  Each path
runs in its own process so the pairs path can be bounded by a shell
timeout and recorded as DNF without killing the cluster measurement:

    python scripts/simhash_crossover.py --dir /tmp/scale_sf10 --path clusters
    timeout 3600 python scripts/simhash_crossover.py --dir /tmp/scale_sf10 --path pairs

Prints ONE JSON line: {"path": ..., "docs": N, "rows": N, "sec": S}.
For `clusters` the rows are (doc_id, cluster_id) memberships; for
`pairs` the full verified pair relation is counted (a count() is the
CHEAPEST possible consumption — any real consumer pays at least this).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_one_to_many_join_spark.session import get_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_sf10")
    ap.add_argument("--path", choices=["clusters", "pairs"], required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--max-hamming", type=int, default=3)
    args = ap.parse_args()

    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        near_dup_clusters,
        simhash_near_dup_clusters,
        simhash_near_dup_pairs,
    )

    spark = get_session("simhash-crossover", shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.dir}/documents.parquet")
    n_docs = docs.count()

    t0 = time.perf_counter()
    if args.path == "clusters":
        out = simhash_near_dup_clusters(docs, max_hamming=args.max_hamming)
        rows = out.count()
    else:
        pairs = simhash_near_dup_pairs(docs, max_hamming=args.max_hamming)
        # pairs+CC is the competing recipe for CLUSTER semantics; counting
        # the membership output keeps the two paths' deliverables equal
        rows = near_dup_clusters(
            pairs.selectExpr("doc_a", "doc_b")
        ).count()
    sec = round(time.perf_counter() - t0, 1)
    print(
        json.dumps(
            {
                "path": args.path,
                "dir": args.dir,
                "docs": n_docs,
                "rows": rows,
                "sec": sec,
                "max_hamming": args.max_hamming,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
