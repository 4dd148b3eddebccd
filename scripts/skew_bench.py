#!/usr/bin/env python
"""Measure the hot-FK shuffle-join under zipfian skew: unsalted vs AQE
skew-split vs explicit salting (r09 VERDICT item 3 — the repo's skew
story was plan-asserted only; this makes it a wall-clock number).

Workload: the customer_order_totals shape — orders ⋈ customer on
o_custkey, then a per-segment revenue rollup — over the zipfian twin
(scripts/gen_scale.py --zipf-orders 1.1: rank-1 customer holds ~13% of
ALL orders).  Broadcast is disabled for the join variants: the regime
salting exists for is "dimension too big to broadcast, fact side
skewed" (operators/skew.py) — with broadcast allowed, Spark simply
broadcasts the 150k-row customer side and there is no shuffle to skew
(measured separately as the `broadcast` baseline).

AQE's skew-join defaults (256 MB skewedPartitionThresholdInBytes) are
sized for real clusters; at twin scale the hot partition is ~10 MB, so
the thresholds are scaled down proportionally (1 MB advisory / 2 MB
skew threshold ≈ the same hot-partition/threshold ratio a 100 TB run
sees with defaults).  The variants:

- broadcast      : broadcast hash join (first choice when the dim fits)
- smj_no_aqe     : shuffle join, AQE off — the victim; the hot key's
                   rows all land on ONE task
- smj_aqe_skew   : shuffle join, AQE skew-split on — runtime mitigation
- salted         : salted_one_to_many_join(buckets=16), AQE off — the
                   explicit formulation for when AQE cannot see the skew
                   (e.g. the skewed side feeds a same-key groupBy next)

All four must produce identical results (asserted on the rollup).

Usage: python scripts/skew_bench.py --dir /tmp/skew_sf1 [--cpus 8]
Prints one JSON line with per-variant median-of-3 seconds.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_one_to_many_join_spark.operators.skew import (  # noqa: E402
    salted_one_to_many_join,
)
from kafka_streams_one_to_many_join_spark.session import get_session  # noqa: E402


def rollup(joined):
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).alias(
                "revenue"
            ),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/skew_sf1")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_session("skew-bench", shuffle_partitions=4 * args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{args.dir}/orders.parquet")
    customer = spark.read.parquet(f"{args.dir}/customer.parquet")
    # warm the page cache / codegen before any timing
    orders.count(), customer.count()

    hot = (
        orders.groupBy("o_custkey").count().orderBy(F.desc("count")).first()
    )
    total = orders.count()

    def conf(pairs):
        for k, v in pairs.items():
            spark.conf.set(k, v)

    BASE = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # scaled-down AQE sizes (see module docstring) — set once, only
        # read when AQE is on
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }

    def run(tag, build, confs):
        conf({**BASE, **confs})
        times = []
        result = None
        for _ in range(args.reps):
            t0 = time.monotonic()
            out = rollup(build()).collect()
            times.append(time.monotonic() - t0)
            result = sorted((r.c_mktsegment, r.n, str(r.revenue)) for r in out)
        return {"sec": round(statistics.median(times), 3), "result": result}

    variants = {
        "broadcast": (
            lambda: orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey),
            {"spark.sql.autoBroadcastJoinThreshold": "10485760"},
        ),
        "smj_no_aqe": (
            lambda: orders.join(customer, orders.o_custkey == customer.c_custkey),
            {},
        ),
        "smj_aqe_skew": (
            lambda: orders.join(customer, orders.o_custkey == customer.c_custkey),
            {"spark.sql.adaptive.enabled": "true"},
        ),
    }
    # salting's cost is dim-side replication (×buckets), its benefit is
    # splitting the hot key ×buckets: sweep the ladder so the guidance
    # ("smallest buckets that caps the straggler") is a measurement
    for b in (4, 8, 16):
        variants[f"salted_b{b}"] = (
            lambda b=b: salted_one_to_many_join(
                orders.withColumnRenamed("o_custkey", "custkey"),
                customer.withColumnRenamed("c_custkey", "custkey"),
                fk="custkey",
                identity_cols=["o_orderkey"],
                buckets=b,
            ),
            {},
        )

    out = {
        "dir": args.dir,
        "orders": total,
        "hot_key": hot["o_custkey"],
        "hot_share": round(hot["count"] / total, 4),
        "shuffle_partitions": 4 * args.cpus,
        "variants": {},
    }
    results = {}
    for tag, (build, confs) in variants.items():
        r = run(tag, build, confs)
        out["variants"][tag] = r["sec"]
        results[tag] = r["result"]
    ref = results["broadcast"]
    for tag, res in results.items():
        assert res == ref, f"{tag} diverged from broadcast reference"
    out["results_identical"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
