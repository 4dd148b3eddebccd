#!/usr/bin/env python
"""Maintain-vs-rebuild and probe-vs-full cost of the persisted ANN index
(r16, VERDICT r15 item 1 — the vector leg of the maintenance trilogy)
at the sf1/sf10 embedding twins.

Night-2 change set (the ann_topk_maintained roster shape): vectors with
vec_id % 7 = 3 re-ingested with a corrected (reversed) embedding — moves
their LSH bucket — and vec_id % 11 = 5 deleted (the % 77 overlap ends
deleted, delete-wins).  Measured walls, interleaved median-of-3
(rebuilt per rep; the host has minute-scale bursts, see SCALE.md "Host
noise escalation"):

- rebuild:   ann_lsh_index(corrected corpus) written to parquet —
             re-signs EVERY vector against all 8 hyperplanes;
- maintain:  ann_index_apply(night-1 persisted index, upserts, deletes)
             written to parquet — broadcast retraction + signing only
             the ~14% upserted vectors;
- full:      lsh_topk(corrected corpus, 1% queries) — the in-flight
             operator, pays corpus signing inside the query;
- probe:     ann_topk_indexed(persisted maintained index, same queries)
             — reads the index as-is, no corpus signing.

Row-set equality of maintained vs rebuilt index is checksum-asserted,
and probe vs full must yield identical (query, vec, sim, rank) sets.

Usage: python scripts/ann_maintain_bench.py [--dirs /tmp/scale_sf1,/tmp/scale_sf10]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_one_to_many_join_spark.functions.similarity import (  # noqa: E402
    ann_index_apply,
    ann_ivf_index,
    ann_lsh_index,
    ann_topk_indexed,
    ivf_topk,
    lsh_topk,
    seeded_centroids,
    seeded_planes,
)
from kafka_streams_one_to_many_join_spark.session import get_session  # noqa: E402

PLANES = seeded_planes(8, 64, 7)


def _index_checksum(df):
    col = "bucket" if "bucket" in df.columns else "cell"
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vec_id") * (F.col(col) + 3)).alias("s"),
        F.round(F.sum("norm"), 3).alias("nm"),
    ).collect()[0]
    return (row.n, int(row.s or 0), float(row.nm or 0.0))


def _topk_checksum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("query_id") * F.col("rank") + F.col("vec_id")).alias("s"),
        F.round(F.sum("sim"), 3).alias("sm"),
    ).collect()[0]
    return (row.n, int(row.s or 0), float(row.sm or 0.0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default="/tmp/scale_sf1,/tmp/scale_sf10")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--method",
        choices=["lsh", "ivf"],
        default="lsh",
        help="ivf: nlist-centroid cell index — the regime where the "
        "persisted index pays (per-vector assignment is nlist x dim "
        "dots, re-paid by every rebuild/in-flight query, skipped by "
        "the indexed probe)",
    )
    ap.add_argument("--nlist", type=int, default=256)
    ap.add_argument("--nprobe", type=int, default=3)
    args = ap.parse_args()
    spark = get_session("annmaintbench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    cents = seeded_centroids(args.nlist, 64, 23) if args.method == "ivf" else None
    for d in args.dirs.split(","):
        tag = os.path.basename(d.rstrip("/"))
        emb = spark.read.parquet(f"{d}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n = emb.count()
        upserts = emb.filter(F.col("vec_id") % 7 == 3).withColumn(
            "embedding", F.reverse("embedding")
        )
        deletes = emb.filter(F.col("vec_id") % 11 == 5).select("vec_id")
        corrected = emb.filter(F.col("vec_id") % 11 != 5).withColumn(
            "embedding",
            F.when(F.col("vec_id") % 7 == 3, F.reverse("embedding")).otherwise(
                F.col("embedding")
            ),
        )
        if args.method == "lsh":
            build = lambda df: ann_lsh_index(df, PLANES)  # noqa: E731
        else:
            build = lambda df: ann_ivf_index(df, cents)  # noqa: E731
        # night-1 persisted index (not timed — the index-build cost is
        # the same expression work as one rebuild)
        n1 = f"/tmp/ann_idx_n1_{tag}"
        build(emb).write.mode("overwrite").parquet(n1)

        t_rebuild, t_maintain, t_full, t_probe = [], [], [], []
        rb, mt = f"/tmp/ann_idx_rb_{tag}", f"/tmp/ann_idx_mt_{tag}"
        queries = corrected.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        for _ in range(args.reps):
            t0 = time.perf_counter()
            build(corrected).write.mode("overwrite").parquet(rb)
            t_rebuild.append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            ann_index_apply(
                spark.read.parquet(n1), upserts=upserts, delete_ids=deletes
            ).write.mode("overwrite").parquet(mt)
            t_maintain.append(time.perf_counter() - t0)

            if args.method == "lsh":
                full_df = lsh_topk(
                    corrected.filter(F.size("embedding") == 64),
                    queries,
                    PLANES,
                    k=10,
                    probe_hamming=2,
                )
            else:
                full_df = ivf_topk(
                    corrected, queries, cents, nprobe=args.nprobe, k=10
                )
            t0 = time.perf_counter()
            cs_full = _topk_checksum(full_df)
            t_full.append(time.perf_counter() - t0)

            probe_df = ann_topk_indexed(
                spark.read.parquet(mt), queries, k=10,
                probe_hamming=2, nprobe=args.nprobe,
            )
            t0 = time.perf_counter()
            cs_probe = _topk_checksum(probe_df)
            t_probe.append(time.perf_counter() - t0)
            assert cs_full == cs_probe, (tag, cs_full, cs_probe)

        cs_rb = _index_checksum(spark.read.parquet(rb))
        cs_mt = _index_checksum(spark.read.parquet(mt))
        assert cs_rb == cs_mt, (tag, cs_rb, cs_mt)
        med = lambda xs: statistics.median(xs)  # noqa: E731
        method_tag = (
            "lsh8" if args.method == "lsh" else f"ivf{args.nlist}/np{args.nprobe}"
        )
        print(
            f"{tag} [{method_tag}]: vecs={n} index_rows={cs_mt[0]} "
            f"rebuild={med(t_rebuild):.2f}s maintain={med(t_maintain):.2f}s "
            f"maintain_vs_rebuild={med(t_maintain) / med(t_rebuild):.3f} | "
            f"full_topk={med(t_full):.2f}s probe={med(t_probe):.2f}s "
            f"probe_vs_full={med(t_probe) / med(t_full):.3f} "
            f"topk_rows={cs_probe[0]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
