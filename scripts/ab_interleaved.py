#!/usr/bin/env python
"""Interleaved A/B harness (the round-11/17 same-window protocol): old
(a git worktree, default HEAD) vs new (this repo) implementations of the
named roster queries, alternating sample-by-sample in ONE Spark session
so the host's day regime cancels; asserts the two sides' outputs are
row-identical before timing counts.

Usage: python scripts/ab_interleaved.py <old_tree> <rounds> <query> [query...]

Prints per-query medians (old, new, ratio) and the equality verdict.
"""
from __future__ import annotations

import importlib
import os
import statistics
import sys
import time


def _load_queries(tree: str):
    """Import <tree>'s __spark_entry__.queries() under a throwaway module
    namespace, then restore sys.modules so both trees' functions coexist."""
    saved = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k == "__spark_entry__" or k.startswith("kafka_streams_one_to_many_join_spark")
    }
    sys.path.insert(0, tree)
    importlib.invalidate_caches()
    try:
        entry = importlib.import_module("__spark_entry__")
        qs = entry.queries()
    finally:
        sys.path.remove(tree)
        for k in list(sys.modules):
            if k == "__spark_entry__" or k.startswith(
                "kafka_streams_one_to_many_join_spark"
            ):
                del sys.modules[k]
        sys.modules.update(saved)
        importlib.invalidate_caches()
    return qs


def main() -> None:
    old_tree, rounds = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    new_tree = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    old_q = _load_queries(old_tree)
    new_q = _load_queries(new_tree)

    sys.path.insert(0, new_tree)
    from kafka_streams_one_to_many_join_spark.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session("ab_interleaved", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        # equality first: sorted rows must match or the timing is moot
        a = old_q[name](spark, sf)
        b = new_q[name](spark, sf)
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        eq = ra == rb
        print(f"{name}: outputs_equal={eq} rows={len(ra)}/{len(rb)}", flush=True)
        if not eq:
            diff = [x for x in ra[:5] if x not in rb[:50]]
            print(f"  FIRST OLD-ONLY SAMPLE: {diff[:2]}")
            continue
        olds, news = [], []
        for r in range(rounds):
            for side, fn, acc in (("old", old_q[name], olds), ("new", new_q[name], news)):
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                acc.append(time.perf_counter() - t0)
        mo, mn = statistics.median(olds), statistics.median(news)
        print(
            f"{name}: old={mo:.3f}s new={mn:.3f}s ratio={mn/mo:.3f} "
            f"(samples old={[round(x,2) for x in olds]} new={[round(x,2) for x in news]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
