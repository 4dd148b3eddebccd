#!/usr/bin/env python
"""Capture .explain("formatted") for the r18-optimized queries.

Usage:  PYTHONPATH=<repo-or-worktree> python scripts/r18_plans.py <tag> [outdir]

Writes plans/r18/<query>_<tag>.txt for each query in QUERIES.  Run once
with PYTHONPATH at the pre-r18 commit (a detached worktree) for the
"before" files and once at HEAD for "after" — the judge checks plan
claims (scan counts, exchange counts, join strategies) against these.

Note: queries that checkpoint internally (materialize) EXECUTE those
stages at construction time, so their formatted plan shows the final
(post-checkpoint) stage — the per-stage plans of the truncated pieces
are audited by scripts/plan_audit.py / PLANS.md instead.  The
before/after contrast here is exactly the point: the "before" files
show the duplicated build subtrees (scan counts) the r18 checkpoints
removed from the executed plan.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

QUERIES = [
    "ann_recall",
    "simhash_near_dup",
    "simhash_clusters",
    "minhash_lsh",
    "minhash_lsh_maintained",
    "minhash_lsh_incremental",
    "join_trace",
    "ngram_jaccard",
    "source_overlap",
    "image_features",
    "dedup_clusters",
    "dedup_canonical",
    "segment_dedup_maintained",
    "ann_topk_maintained",
    "bloom_filter",
    "tfidf_top_terms",
    "split_leakage",
    "one_to_many_snapshot",
]


def main() -> None:
    tag = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18"
    )
    os.makedirs(outdir, exist_ok=True)
    import __spark_entry__ as entry
    from kafka_streams_one_to_many_join_spark.session import get_session

    spark = get_session("r18_plans", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = entry.queries()
    for name in QUERIES:
        if name not in queries:
            continue
        df = queries[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(name, tag, "written")
    spark.stop()


if __name__ == "__main__":
    main()
