#!/usr/bin/env python
"""Measure the ANN recall / scanned-fraction tradeoff curves.

Extends the in-engine ``ann_recall`` eval (one point per method) into a
parameter sweep: LSH multi-probe Hamming 0-3 and IVF nprobe 1-8, each
scored against the exact brute-force top-10 on the same query set (the
``vec_id % 100 == 0`` rows, the roster's query recipe).  Per setting it
reports:

- ``recall``   — mean recall@10 vs brute force over all queries;
- ``scanned``  — candidate fraction: bucket-join candidate pairs /
  (|queries| x (N-1)), the fraction of the corpus each query actually
  re-ranks (the cost knob the probe parameter buys recall with);
- ``sec``      — median-of-3 wall time of the full top-k pipeline.

"Raise recall by scanning more" then reads off one monotone curve per
method instead of the two single points r08 shipped
(lsh ph=2 -> 0.26, ivf nprobe=3 -> 0.44 at sf0.01).  Results are pinned
in SCALE.md; the nesting that makes the curves monotone is unit-tested
(probe_masks / ivf_probe_cells prefixes,
test_lsh_recall_monotone_in_probe_hamming).

Round 10 adds an ``ivf_trained`` curve per dir: the same nprobe ladder
with centroids trained by 5 Lloyd rounds (``train_centroids``, the
iterated kmeans_step) from the seeded init — on clustered corpora
(gen_scale.py --clustered-emb M) training moves the curve sharply up at
equal scan; on isotropic gaussians it barely matters (measured, SCALE.md
"Clustered-corpus ANN").

Usage:
  python scripts/ann_tradeoff.py [data_dir ...]
  # default: /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_one_to_many_join_spark.functions.similarity import (
    brute_force_topk,
    hyperplane_lsh_bucket,
    ivf_cell,
    ivf_probe_cells,
    ivf_topk,
    lsh_topk,
    probe_masks,
    seeded_centroids,
    seeded_planes,
    train_centroids,
)
from kafka_streams_one_to_many_join_spark.model import load_table
from kafka_streams_one_to_many_join_spark.session import get_session

N_PLANES, EMB_DIM, PLANES_SEED = 8, 64, 7
IVF_NLIST, IVF_SEED = 16, 23
K = 10
LSH_SWEEP = (0, 1, 2, 3)
IVF_SWEEP = (1, 2, 3, 4, 6, 8)
TRAIN_ITERS = 5  # Lloyd rounds for the trained-quantizer curve


def _recall(approx_rows, exact: dict[int, set[int]]) -> float:
    hits: dict[int, int] = {}
    for r in approx_rows:
        if r.vec_id in exact.get(r.query_id, ()):
            hits[r.query_id] = hits.get(r.query_id, 0) + 1
    return sum(hits.get(q, 0) / len(vs) for q, vs in exact.items()) / len(exact)


def _timed(df) -> float:
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def sweep(spark, d: str) -> dict:
    emb = load_table(spark, d, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = emb.count()
    n_q = queries.count()
    denom = n_q * (n - 1)
    planes = seeded_planes(N_PLANES, EMB_DIM, PLANES_SEED)
    cents = seeded_centroids(IVF_NLIST, EMB_DIM, IVF_SEED)

    exact: dict[int, set[int]] = {}
    for r in brute_force_topk(emb, queries, k=K).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    # candidate counts from ONE tagged join per method: each candidate
    # is tagged with the probe "depth" that produced it (mask Hamming
    # weight / probe rank), so every sweep point's count is a cumulative
    # read-off — the probe sets nest by construction.
    corpus_b = emb.select(
        "vec_id", hyperplane_lsh_bucket("embedding", planes).alias("_bucket")
    )
    masks = probe_masks(N_PLANES, max(LSH_SWEEP))
    mw_pairs = ", ".join(
        f"struct({m} as m, {bin(m).count('1')} as w)" for m in masks
    )
    probe_rows = (
        queries.select(
            "query_id",
            hyperplane_lsh_bucket("embedding", planes).alias("_b0"),
        )
        .select(
            "query_id", "_b0", F.explode(F.expr(f"array({mw_pairs})")).alias("mw")
        )
        .select(
            "query_id",
            F.expr("_b0 ^ mw.m").alias("_bucket"),
            F.col("mw.w").alias("weight"),
        )
    )
    lsh_cand_by_w = {
        int(r.weight): int(r.n)
        for r in corpus_b.join(probe_rows, "_bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("weight")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    def ivf_cand_counts(cs):
        corpus_cell = emb.select(
            "vec_id", ivf_cell("embedding", cs).alias("_cell")
        )
        qprobe = queries.select(
            "query_id",
            F.posexplode(
                ivf_probe_cells("embedding", cs, max(IVF_SWEEP))
            ).alias("probe_rank", "_cell"),
        )
        return {
            int(r.probe_rank): int(r.n)
            for r in corpus_cell.join(qprobe, "_cell")
            .filter(F.col("vec_id") != F.col("query_id"))
            .groupBy("probe_rank")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    ivf_cand_by_rank = ivf_cand_counts(cents)

    # trained coarse quantizer: same nlist, same probe machinery — only
    # the centroid literals move (5 Lloyd iterations of kmeans_step)
    t0 = time.perf_counter()
    cents_tr = train_centroids(emb, cents, iters=TRAIN_ITERS)
    train_sec = round(time.perf_counter() - t0, 3)
    ivf_tr_cand_by_rank = ivf_cand_counts(cents_tr)

    out = {
        "dir": d,
        "n_corpus": n,
        "n_queries": n_q,
        "ivf_train_sec": train_sec,
        "lsh": [],
        "ivf": [],
        "ivf_trained": [],
    }
    for ph in LSH_SWEEP:
        df = lsh_topk(emb, queries, planes, k=K, probe_hamming=ph)
        rec = _recall(df.collect(), exact)
        cand = sum(v for w, v in lsh_cand_by_w.items() if w <= ph)
        out["lsh"].append(
            {
                "probe_hamming": ph,
                "recall": round(rec, 4),
                "scanned": round(cand / denom, 4),
                "sec": _timed(df),
            }
        )
        print(f"  lsh ph={ph}: {out['lsh'][-1]}", file=sys.stderr)
    for tag, cs, cand_by_rank in (
        ("ivf", cents, ivf_cand_by_rank),
        ("ivf_trained", cents_tr, ivf_tr_cand_by_rank),
    ):
        for nprobe in IVF_SWEEP:
            df = ivf_topk(emb, queries, cs, nprobe=nprobe, k=K)
            rec = _recall(df.collect(), exact)
            cand = sum(v for r, v in cand_by_rank.items() if r < nprobe)
            out[tag].append(
                {
                    "nprobe": nprobe,
                    "recall": round(rec, 4),
                    "scanned": round(cand / denom, 4),
                    "sec": _timed(df),
                }
            )
            print(f"  {tag} nprobe={nprobe}: {out[tag][-1]}", file=sys.stderr)
    return out


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session("ann_tradeoff", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps([sweep(spark, d) for d in dirs]))
    spark.stop()


if __name__ == "__main__":
    main()
