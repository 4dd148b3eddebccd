#!/usr/bin/env python
"""Bucketed layout on the LLM corpus pipelines: which roster pipelines
does a doc_id-bucketed ``documents`` table actually de-shuffle?

bucket_bench.py measured the relational case (orders/customer joins and
aggs on the bucket key — break-even ≈ 15 same-key ops).  This script
answers VERDICT r10 item 4 for the corpus side, using the EXACT roster
plan bodies (the ``_tfidf_top_terms`` / ``_segment_dedup`` /
``_unigram_logprob`` helpers and ``minhash_lsh_pairs`` itself), bucketed
vs plain, at the seeded scale twins (gen_scale.py --mult 10/100).

The plan-level prediction this measures (Spark's
``HashPartitioning.satisfies(ClusteredDistribution)`` accepts a key
SUBSET — partitioning on doc_id co-locates any (doc_id, X) group):

- ``minhash_lsh``   — the DISTINCT (doc_id, shingle) and the per-doc
  signature aggregate are doc_id-prefixed: their exchanges (the two
  WIDEST in the pipeline — all shingles move) should disappear.  The
  (band, signature) bucket shuffle survives — it is keyed on derived
  values no storage layout can pre-partition.
- ``tfidf_top_terms`` — the (doc_id, w) tf aggregate loses its
  exchange (the full token-pair shuffle); the vocabulary window and the
  per-doc rank window still shuffle (w-keyed, then doc-keyed again
  after the w-partitioned window destroyed the layout).
- ``segment_dedup`` / ``unigram_logprob`` — EXPECTED FLAT: their first
  wide aggregates are keyed on derived values (seg_h / tok), not on
  doc_id, and their per-doc re-aggs consume inputs already
  re-partitioned by those keys.  A negative result here is the point:
  bucketing pays only where the FIRST wide operation is bucket-keyed.

Each variant also reports the exchange count of the physical plan so a
wall-clock delta can be attributed to a deleted shuffle rather than
noise, and all variants assert identical result hashes.

Usage: python scripts/bucket_llm_bench.py --dir /tmp/scale_sf1 [--cpus 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from kafka_streams_one_to_many_join_spark.functions.dedup import (
    minhash_lsh_pairs,
)
from kafka_streams_one_to_many_join_spark.plans import count_shuffles
from kafka_streams_one_to_many_join_spark.session import get_session
from kafka_streams_one_to_many_join_spark.sources.bucketed import (
    BUCKETED_READ_CONFS,
    write_bucketed,
)

PIPELINES = {
    "minhash_lsh": lambda docs: minhash_lsh_pairs(
        docs, num_hashes=16, bands=8, threshold=0.7, shingle_n=3
    ),
    "tfidf_top_terms": entry_mod._tfidf_top_terms,
    "segment_dedup": entry_mod._segment_dedup,
    "unigram_logprob": entry_mod._unigram_logprob,
}


def timed(fn, reps: int) -> float:
    samples = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        samples.append(time.monotonic() - t0)
    return round(statistics.median(samples), 3)


def host_spin(iters: int = 2_000_000) -> float:
    """The bench.py window-health probe: this host's hypervisor bursts
    stretch a fixed CPU loop 2-4x with zero guest-visible steal."""
    t0 = time.perf_counter()
    s = 0
    for i in range(iters):
        s += i * i
    return round(time.perf_counter() - t0, 3)


def result_hash(df) -> tuple:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        # decimal sum: a long sum of 64-bit hashes overflows under ANSI
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row.n, row.h)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_sf1")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="bucket_llm_")
    spark = get_session(
        "bucket-llm",
        shuffle_partitions=4 * args.cpus,
        extra_conf={"spark.sql.warehouse.dir": f"{work}/wh"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs_src = spark.read.parquet(f"{args.dir}/documents.parquet")
    n_docs = docs_src.count()  # warm page cache + codegen

    # the one-time layout costs (you store the corpus either way — only
    # the write DELTA counts against the per-query wins)
    t0 = time.monotonic()
    docs_src.write.mode("overwrite").option(
        "path", f"{work}/plain_docs"
    ).saveAsTable("docs_plain")
    write_plain = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    write_bucketed(
        docs_src, "docs_bk", args.buckets, "doc_id", path=f"{work}/bk_docs"
    )
    write_bucket = round(time.monotonic() - t0, 3)

    plain, bucketed = spark.table("docs_plain"), spark.table("docs_bk")

    def with_confs(confs: dict, fn):
        saved = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            return fn()
        finally:
            for k, v in saved.items():
                spark.conf.unset(k) if v is None else spark.conf.set(k, v)

    out: dict[str, dict] = {}
    for name, builder in PIPELINES.items():
        hp = result_hash(builder(plain))
        hb = with_confs(
            BUCKETED_READ_CONFS, lambda: result_hash(builder(bucketed))
        )
        assert hp == hb, f"{name}: bucketed layout changed the result {hp} vs {hb}"

        # BUILD FRESH per rep: several pipelines hold a lazy
        # localCheckpoint (reusing one DataFrame would bill its
        # tokenize+materialize stage to the first run only), and
        # re-executing any one DataFrame lets Spark SKIP completed
        # shuffle map stages — which flatters whichever variant has
        # more exchanges.
        def run(table, b=builder):
            b(table).write.format("noop").mode("overwrite").save()

        # three regimes: plain layout; bucketed layout FORCED on
        # (BUCKETED_READ_CONFS); bucketed layout under DEFAULT confs —
        # the planner auto-disables the bucketed scan when no operator
        # needs its distribution, so this row shows whether "store
        # bucketed, let Spark choose" is safe for this pipeline.
        #
        # Samples are INTERLEAVED plain/forced/auto per round with a
        # spin probe before each (the SCALE.md noise protocol): this
        # host's minute-scale bursts cover a whole sequential variant
        # window and produced a 75 s vs 27 s plain minhash across two
        # back-to-back runs of the sequential version of this script.
        variants = {
            "plain": (plain, {}),
            "bucketed_forced": (bucketed, dict(BUCKETED_READ_CONFS)),
            "bucketed_auto": (bucketed, {}),
        }
        samples: dict[str, list[float]] = {v: [] for v in variants}
        probes: dict[str, list[float]] = {v: [] for v in variants}
        for _ in range(args.reps):
            for vname, (table, confs) in variants.items():
                probes[vname].append(host_spin())
                t0 = time.monotonic()
                with_confs(confs, lambda t=table: run(t))
                samples[vname].append(time.monotonic() - t0)
        out[name] = {
            f"{v}_sec": round(statistics.median(samples[v]), 3) for v in variants
        }
        out[name]["spread"] = {
            v: round(max(samples[v]) / max(min(samples[v]), 1e-9), 2)
            for v in variants
        }
        out[name]["probe_max_over_min"] = round(
            max(p for ps in probes.values() for p in ps)
            / min(p for ps in probes.values() for p in ps),
            2,
        )
        out[name]["plain_shuffles"] = count_shuffles(builder(plain))
        out[name]["bucketed_forced_shuffles"] = with_confs(
            BUCKETED_READ_CONFS, lambda: count_shuffles(builder(bucketed))
        )
        out[name]["bucketed_auto_shuffles"] = count_shuffles(builder(bucketed))
        for variant in ("forced", "auto"):
            out[name][f"ratio_{variant}"] = (
                round(
                    out[name][f"bucketed_{variant}_sec"] / out[name]["plain_sec"], 3
                )
                if out[name]["plain_sec"] > 0
                else None
            )
        print(f"{name} done: {out[name]}", file=sys.stderr)

    res = {
        "dir": args.dir,
        "n_docs": n_docs,
        "buckets": args.buckets,
        "write_plain_sec": write_plain,
        "write_bucketed_sec": write_bucket,
        "pipelines": out,
    }
    print(json.dumps(res))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
