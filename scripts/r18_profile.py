#!/usr/bin/env python
"""Phase-level profiler for the r18 sweep: time construction (the eager
materialize/collect jobs a query runs while being BUILT) separately from
the final noop action, per query, plus Spark job counts via statusTracker.

Usage: python scripts/r18_profile.py <query> [query...]   (repeats via
$SPARK_GRAFT_PROFILE_REPEATS, default 3; sf via $SPARK_GRAFT_SF_DIR)
"""
from __future__ import annotations

import os
import statistics
import sys
import time


def main() -> None:
    names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPEATS", "3"))
    import __spark_entry__ as entry
    from kafka_streams_one_to_many_join_spark.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session("r18_profile", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    st = spark.sparkContext.statusTracker()

    for name in names:
        fn = queries[name]
        # warmup (codegen, caches)
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        cons, act, jobs_c, jobs_a = [], [], [], []
        for _ in range(reps):
            spark.sparkContext._jvm.System.gc()
            j0 = len(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, sf)
            t1 = time.perf_counter()
            j1 = len(st.getJobIdsForGroup(None) or [])
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = len(st.getJobIdsForGroup(None) or [])
            cons.append(t1 - t0)
            act.append(t2 - t1)
            jobs_c.append(j1 - j0)
            jobs_a.append(j2 - j1)
        print(
            f"{name}: construct={statistics.median(cons):.3f}s "
            f"action={statistics.median(act):.3f}s "
            f"total={statistics.median(cons) + statistics.median(act):.3f}s "
            f"jobs construct={jobs_c} action={jobs_a}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
