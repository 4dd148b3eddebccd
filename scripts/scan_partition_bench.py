#!/usr/bin/env python
"""Measure `spark.sql.files.maxPartitionBytes`: the knob that decides
how many tasks a file scan becomes, and the last of the task brief's
named sizing knobs without a measured row.

Workload: an expression-heavy single-pass projection + tiny aggregate
over the sf10 orders twin (one 388 MB parquet file, 32 row groups of
~12 MB — splits land on row-group boundaries, so the ladder can produce
1 to 32 scan partitions).  The agg output is 1 row, so wall time is the
scan stage: parallelism vs per-task overhead, nothing else.

Each ladder rung runs in its own session-conf setting (the conf is
read at planning time, no restart needed); result checksum asserted
identical across rungs.  AQE coalescing is left ON — it merges
post-shuffle partitions, not scan splits, so the ladder still controls
the scan.

Usage: python scripts/scan_partition_bench.py --dir /tmp/scale_sf10_oc
Prints one JSON line {rung: {"sec": s, "scan_partitions": n}}.

What the first run taught (and the docstring's original prediction got
WRONG): Spark's split size is
``min(maxPartitionBytes, max(openCostInBytes, totalSize/defaultParallelism))``
— the defaultParallelism term FLOORS the split at totalSize/cores, so
on local[32] every conf ≥ 12 MB already gives this 388 MB file 32 scan
partitions and the conf only binds BELOW that.  The regimes that
matter:

- big inputs (totalSize ≫ cores × conf — every 100 TB scan): the conf
  binds; the default 128 MB yields ~800k tasks for 100 TB on 4,000
  slots, the sane default;
- this ladder's lower rungs: oversplitting overhead, measurable once
  per-task fixed cost stops amortizing;
- SMALL single files (totalSize/cores < openCostInBytes): the floor is
  openCost (4 MB) and a sub-4 MB file is ONE task no matter what the
  conf says — the under-parallel trap before per-row-heavy work that
  `model.ensure_parallelism` fixes after the scan (the conf cannot).
  Reported as `small_file_partitions` on the sf0.1 documents table.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_one_to_many_join_spark.session import get_session  # noqa: E402

RUNGS = ["128m", "12m", "4m", "1m"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_sf10_oc")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_session("scan-bench", shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    path = f"{args.dir}/orders.parquet"
    spark.read.parquet(path).count()  # warm page cache + footer cache

    def workload():
        # per-row heavy: hash three columns + regex-extract the priority
        # digit, so the scan stage carries real CPU (a bare count would
        # hide parallelism behind metadata-only row counting)
        return (
            spark.read.parquet(path)
            .select(
                F.crc32(
                    F.concat_ws(
                        "|", F.col("o_orderkey"), F.col("o_orderstatus"),
                        F.col("o_orderpriority"),
                    )
                ).alias("h"),
                F.regexp_extract("o_orderpriority", r"^(\d)", 1)
                .cast("long")
                .alias("p"),
            )
            .agg(F.sum("h").alias("hs"), F.sum("p").alias("ps"))
            .collect()
        )

    out: dict = {}
    checks = set()
    for rung in RUNGS:
        spark.conf.set("spark.sql.files.maxPartitionBytes", rung)
        nparts = spark.read.parquet(path).rdd.getNumPartitions()
        workload()  # warm this plan shape
        walls = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            rows = workload()
            walls.append(time.monotonic() - t0)
        checks.add(tuple(str(c) for c in rows[0]))
        out[rung] = {
            "sec": round(statistics.median(walls), 3),
            "scan_partitions": nparts,
        }
    assert len(checks) == 1, f"checksum varied across rungs: {checks}"
    out["identical_results"] = True
    # the small-file trap: a sub-openCost file is ONE scan task at any
    # conf setting — only a post-scan repartition (ensure_parallelism)
    # can spread per-row-heavy work over it
    small = "/root/testdata/sf0.1/documents.parquet"
    trap = {}
    for rung in ("128m", "1m"):
        spark.conf.set("spark.sql.files.maxPartitionBytes", rung)
        trap[rung] = spark.read.parquet(small).rdd.getNumPartitions()
    out["small_file_partitions"] = trap
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
