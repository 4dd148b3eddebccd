#!/usr/bin/env python
"""Measure what bucketing amortizes: pay the key-shuffle once at write
time, never again on the read side (sources/bucketed.py — the batch
analog of the reference's keyed repartition topics,
``DemoApp.scala:98,107``).

Workload: orders ⋈ customer on custkey followed by a per-segment
rollup (the customer_order_totals shape), plus a groupBy(o_custkey)
aggregation — the two plan shapes whose Exchange a bucketed layout
deletes.  Broadcast is disabled for the join variants: bucketing's
regime is LARGE-LARGE repeated joins (at 100 TB neither fact side
broadcasts); when the dim fits in memory, broadcast wins and none of
this applies (operators/skew.py measures that baseline).

Variants, each median-of-``--reps``:

- join_shuffle   : plain parquet reads, SMJ with its two exchanges+sorts
- join_bucketed  : both sides bucketed — zero Exchange, zero Sort
                   (BUCKETED_READ_CONFS; plan shape asserted in
                   tests/test_plans.py)
- agg_shuffle    : groupBy(o_custkey) on plain parquet
- agg_bucketed   : same on the bucketed table — zero Exchange
- write_plain    : one-time cost of persisting both tables unbucketed
- write_bucketed : one-time cost of persisting both tables bucketed
                   (single-file sorted buckets)

The summary derives the break-even: a table joined-or-aggregated on its
bucket key N times pays off once
``N × (shuffle − bucketed) > (write_bucketed − write_plain)`` — you
were storing the data anyway, so only the write DELTA counts against
the per-query win.

All variants must produce identical rollups (asserted).

Usage: python scripts/bucket_bench.py --dir /tmp/scale_sf1 [--cpus 8]
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

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_one_to_many_join_spark.session import get_session  # noqa: E402
from kafka_streams_one_to_many_join_spark.sources.bucketed import (  # noqa: E402
    BUCKETED_READ_CONFS,
    bucketed_join_check,
    write_bucketed,
)


def timed(fn, reps: int) -> float:
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return round(statistics.median(walls), 3)


def rollup_rows(joined):
    return sorted(
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).alias(
                "revenue"
            ),
        )
        .collect()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_sf1")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="bucket_bench_")
    spark = get_session(
        "bucket-bench",
        shuffle_partitions=4 * args.cpus,
        extra_conf={"spark.sql.warehouse.dir": f"{work}/wh"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{args.dir}/orders.parquet")
    customer = spark.read.parquet(f"{args.dir}/customer.parquet")
    orders.count(), customer.count()  # warm page cache + codegen

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # one-time writes (overwrite mode keeps reps honest: same work each rep)
    def w_plain():
        orders.write.mode("overwrite").parquet(f"{work}/plain_orders")
        customer.write.mode("overwrite").parquet(f"{work}/plain_customer")

    def w_bucket():
        write_bucketed(
            orders, "orders_bk", args.buckets, "o_custkey", path=f"{work}/bk_orders"
        )
        write_bucketed(
            customer,
            "cust_bk",
            args.buckets,
            "c_custkey",
            path=f"{work}/bk_customer",
        )

    write_plain = timed(w_plain, args.reps)
    write_bucket = timed(w_bucket, args.reps)
    assert bucketed_join_check(spark, "orders_bk", "cust_bk", "o_custkey", "c_custkey")

    for k, v in BUCKETED_READ_CONFS.items():
        spark.conf.set(k, v)
    bo, bc = spark.table("orders_bk"), spark.table("cust_bk")

    def join_plain():
        return rollup_rows(orders.join(customer, orders.o_custkey == customer.c_custkey))

    def join_bucketed():
        return rollup_rows(bo.join(bc, bo.o_custkey == bc.c_custkey))

    # parity before timing
    assert join_plain() == join_bucketed(), "bucketed join changed the rollup"

    def agg(df, key):
        return (
            df.groupBy(key)
            .agg(F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(F.sum("s").alias("ss"), F.sum("n").alias("nn"))
            .collect()
        )

    res = {
        "join_shuffle": timed(join_plain, args.reps),
        "join_bucketed": timed(join_bucketed, args.reps),
        "agg_shuffle": timed(lambda: agg(orders, "o_custkey"), args.reps),
        "agg_bucketed": timed(lambda: agg(bo, "o_custkey"), args.reps),
        "write_plain": write_plain,
        "write_bucketed": write_bucket,
    }
    per_join_win = res["join_shuffle"] - res["join_bucketed"]
    write_delta = res["write_bucketed"] - res["write_plain"]
    res["break_even_joins"] = (
        round(write_delta / per_join_win, 2) if per_join_win > 0 else None
    )
    res["orders_rows"] = orders.count()
    res["buckets"] = args.buckets
    print(json.dumps(res))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
