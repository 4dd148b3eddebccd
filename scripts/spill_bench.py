#!/usr/bin/env python
"""Measure graceful degradation under memory pressure: the same shuffle
sort and hash aggregation at a comfortable heap vs a deliberately
starved one, with Spark's own spill metrics as the witness.

At 100 TB no partition sizing is ever perfect — some task somewhere
gets more rows than its share of executor memory.  The property that
makes the engine survivable is that Tungsten's operators
(UnsafeExternalSorter, the hash-agg sort fallback) SPILL to disk and
complete, degraded but correct, instead of OOM-killing the executor.
This script turns that claim into numbers:

- workload JOIN: sort-merge join of the sf10 orders twin against
  customer (broadcast disabled) into few fat shuffle partitions — the
  SMJ's per-side sorts are the UnsafeExternalSorter path, and unlike a
  bare orderBy they cannot be optimized away by EliminateSorts (an
  orderBy under an order-insensitive aggregate is removed by Catalyst,
  which would turn the workload into a no-op — found while writing
  this script);
- workload AGG: groupBy(o_orderkey) over the same rows (15 M groups —
  the exact-dedup shape, where per-group state is small but the group
  COUNT is the row count), the hash-map-overflow → sort-based-fallback
  path.  A 1.5 M-group agg (o_custkey) fits even the starved heap and
  never spills; the group count, not the per-group state, is what
  pressures the map.

Each run is its OWN JVM (driver memory is fixed at JVM start) via a
subprocess; the 16g/1g tiers are INTERLEAVED --pairs times per workload
and the per-tier median reported, because this host's minute-scale
noise bursts can make any single pair read backwards (a sequential
first version measured the starved heap "faster").  Spill bytes are
read from Spark's status REST API (the UI is enabled just for this
script), summed over stages; result rows are asserted identical across
every run of both tiers.

Usage: python scripts/spill_bench.py --dir /tmp/scale_sf10_oc
Prints one JSON line:
  {"join": {"16g": {...}, "1g": {...}}, "agg": {...}}
each leaf carrying median/all seconds + memory/disk spill bytes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = __file__.rsplit("/", 2)[0]


def run_one(data_dir: str, mem: str, workload: str, cpus: int) -> dict:
    """Child-process entry: run one workload at one heap size."""
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from kafka_streams_one_to_many_join_spark.session import get_session

    os.environ["SPARK_GRAFT_DRIVER_MEM"] = mem
    # master is explicit: get_session derives local[N] from
    # shuffle_partitions when master is omitted, which would silently
    # shrink the executor to 2 cores here — we want cpus cores CONTENDING
    # for the starved heap, with 2 fat shuffle partitions
    spark = get_session(
        f"spill-{workload}-{mem}",
        master=f"local[{cpus}]",
        shuffle_partitions=2,  # few fat partitions: the pressure case
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4099",
            # keep AQE from coalescing away the fat partitions we want
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{data_dir}/orders.parquet")
    customer = spark.read.parquet(f"{data_dir}/customer.parquet")
    orders.count(), customer.count()  # warm page cache: time compute+spill, not I/O

    t0 = time.monotonic()
    if workload == "join":
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = (
            orders.join(customer, orders.o_custkey == customer.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
                ).alias("revenue"),
            )
            .orderBy("c_mktsegment")
            .collect()
        )
    else:
        # decimal sums: exact, accumulation-order independent — a double
        # sum would checksum differently across spill orders (the
        # volume_shipping r04 lesson)
        out = (
            orders.groupBy("o_orderkey")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                F.sum("s").alias("ss"),
                F.sum("n").alias("nn"),
                F.count(F.lit(1)).alias("groups"),
            )
            .collect()
        )
    wall = round(time.monotonic() - t0, 3)

    app_id = spark.sparkContext.applicationId
    # uiWebUrl is the port Spark ACTUALLY bound — if 4099 was occupied it
    # retries 4100+ (spark.port.maxRetries) and a hardcoded URL would read
    # another app's metrics or fail outright.
    ui_base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(
        f"{ui_base}/api/v1/applications/{app_id}/stages"
    ) as r:
        stages = json.load(r)
    mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk_spill = sum(s.get("diskBytesSpilled", 0) for s in stages)
    res = {
        "sec": wall,
        "memory_spilled_mb": round(mem_spill / 1e6, 1),
        "disk_spilled_mb": round(disk_spill / 1e6, 1),
        "result": [[str(c) for c in row] for row in out],
    }
    print("SPILL_RESULT " + json.dumps(res))
    spark.stop()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_sf10_oc")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--child", nargs=2, metavar=("MEM", "WORKLOAD"), default=None)
    ap.add_argument("--pairs", type=int, default=3, help="interleaved 16g/1g pairs per workload")
    args = ap.parse_args()

    if args.child:
        run_one(args.dir, args.child[0], args.child[1], args.cpus)
        return

    def child(mem: str, workload: str) -> dict:
        p = subprocess.run(
            [
                sys.executable,
                __file__,
                "--dir",
                args.dir,
                "--cpus",
                str(args.cpus),
                "--child",
                mem,
                workload,
            ],
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_CPUS": str(args.cpus)},
        )
        line = next(
            (ln for ln in p.stdout.splitlines() if ln.startswith("SPILL_RESULT ")),
            None,
        )
        if line is None:
            raise RuntimeError(
                f"{workload}@{mem} failed rc={p.returncode}: "
                + (p.stderr or p.stdout)[-500:]
            )
        return json.loads(line[len("SPILL_RESULT ") :])

    # Interleave the heap tiers (16g,1g pairs x --pairs) and report the
    # per-tier MEDIAN: this host's minute-scale noise bursts (SCALE.md)
    # can make any single pair read backwards — a first, sequential
    # version of this script measured the starved heap FASTER than the
    # comfortable one because the 16g children drew the slow windows.
    # The spill bytes and the identical-results assertion are
    # load-independent either way.
    import statistics

    out: dict = {}
    for workload in ("join", "agg"):
        runs: dict[str, list[dict]] = {"16g": [], "1g": []}
        for _ in range(args.pairs):
            for mem in ("16g", "1g"):
                runs[mem].append(child(mem, workload))
        results = {json.dumps(r["result"]) for rs in runs.values() for r in rs}
        assert len(results) == 1, f"{workload}: results differ across heaps/runs"
        out[workload] = {
            mem: {
                "sec_median": round(statistics.median(r["sec"] for r in rs), 3),
                "sec_all": [r["sec"] for r in rs],
                "memory_spilled_mb": max(r["memory_spilled_mb"] for r in rs),
                "disk_spilled_mb": max(r["disk_spilled_mb"] for r in rs),
            }
            for mem, rs in runs.items()
        }
        out[workload]["identical_results"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
