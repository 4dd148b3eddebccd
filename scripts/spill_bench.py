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

Each runs in its OWN JVM (driver memory is fixed at JVM start) via a
subprocess: once with --mem 16g, once with --mem 1g.  Spill bytes are
read from Spark's status REST API (the UI is enabled just for this
script), summed over stages; result rows are asserted identical across
memory tiers.

Usage: python scripts/spill_bench.py --dir /tmp/scale_sf10_oc
Prints one JSON line:
  {"join": {"16g": {...}, "1g": {...}}, "agg": {...}}
each leaf carrying seconds + memory/disk spill bytes.
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
    spark = get_session(
        f"spill-{workload}-{mem}",
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
    with urllib.request.urlopen(
        f"http://localhost:4099/api/v1/applications/{app_id}/stages"
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
    args = ap.parse_args()

    if args.child:
        run_one(args.dir, args.child[0], args.child[1], args.cpus)
        return

    out: dict = {}
    for workload in ("join", "agg"):
        out[workload] = {}
        for mem in ("16g", "1g"):
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
                (
                    ln
                    for ln in p.stdout.splitlines()
                    if ln.startswith("SPILL_RESULT ")
                ),
                None,
            )
            if line is None:
                out[workload][mem] = {
                    "error": (p.stderr or p.stdout)[-500:],
                    "rc": p.returncode,
                }
            else:
                out[workload][mem] = json.loads(line[len("SPILL_RESULT ") :])
        tiers = out[workload]
        if "result" in tiers.get("16g", {}) and "result" in tiers.get("1g", {}):
            assert tiers["16g"]["result"] == tiers["1g"]["result"], (
                f"{workload}: starved run changed the result"
            )
            for t in tiers.values():
                del t["result"]
            tiers["identical_results"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
