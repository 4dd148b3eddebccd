#!/usr/bin/env python
"""Executor-loss experiment: what the reliable-checkpoint knob buys.

`model.materialize` defaults to `localCheckpoint` — executor-local
blocks, fastest, but documented as job-fatal if an executor dies (the
blocks have no replica and no lineage to recompute from).  The
`spark.graft.checkpointDir` / `SPARK_GRAFT_CHECKPOINT_DIR` knob switches
every site to reliable `DataFrame.checkpoint`.  This script turns that
documented contrast into an observed one, deterministically, under a
multi-JVM `local-cluster` master:

  1. build the segment projection (the segment_dedup intermediate),
     spread over 16 partitions so its pinned blocks land on BOTH
     executors, and `materialize` it (eager);
  2. SIGKILL exactly ONE executor JVM — its blocks are gone; the
     standalone Worker relaunches a fresh executor that never had them;
  3. consume the materialized frame (full count).

  control    no kill                       → expected count
  local-ckpt kill between materialize and  → JOB FAILURE: every retry of
             consume                         a task needing a lost block
                                             fails with "Checkpoint
                                             block rdd_*_* not found"
                                             (no lineage to recompute)
  reliable   same kill, checkpointDir set  → SUCCESS with the control's
                                             exact count: retries re-read
                                             the checkpoint FILES (on one
                                             machine /tmp stands in for a
                                             DFS)

An earlier kill-every-N-seconds design measured the wrong thing on a
2-executor toy cluster: continuous kills abort ANY long job by retry
exhaustion (the same task re-killed until maxFailures), which a
1000-executor cluster doesn't see.  The single deterministic kill
isolates block recoverability; retry limits stay raised so the one
ExecutorLostFailure wave from the kill itself can never be the cause.

Results print as one JSON line; the observed run is recorded in
README.md ("Multi-JVM execution").

Usage:
  SPARK_GRAFT_MASTER='local-cluster[2,4,3072]' \
      python scripts/executor_loss.py [sf_dir]    (default: /tmp/scale_sf1)
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from kafka_streams_one_to_many_join_spark.functions.dedup import (
    segment_hash_expr,
)
from kafka_streams_one_to_many_join_spark.model import load_table, materialize
from kafka_streams_one_to_many_join_spark.session import get_session


def _executor_pids() -> list[int]:
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    return sorted(
        int(line.split(None, 1)[0])
        for line in out.splitlines()
        if "CoarseGrainedExecutorBackend" in line
    )


def _kill_one_executor() -> int:
    pid = _executor_pids()[0]
    os.kill(pid, signal.SIGKILL)
    # wait for the worker to notice and relaunch (a FRESH executor JVM —
    # the killed one's localCheckpoint blocks do not come back with it)
    deadline = time.time() + 30
    while time.time() < deadline:
        pids = _executor_pids()
        if pid not in pids and len(pids) >= 2:
            break
        time.sleep(0.5)
    return pid


def _segments(spark, sf_dir: str):
    """The segment_dedup intermediate — the projection q_segment_dedup
    materializes (one (doc_id, 32-bit hash) row per 10-token window)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias(
                "_toks"
            ),
        )
        .select(
            "doc_id", F.explode(F.expr(segment_hash_expr("_toks"))).alias("seg_h")
        )
        .repartition(16)  # blocks on BOTH executors, so one loss must bite
    )


def _variant(spark, sf_dir: str, kill: bool, ckpt_dir: str | None) -> dict:
    if ckpt_dir is not None:
        spark.conf.set("spark.graft.checkpointDir", ckpt_dir)
    else:
        spark.conf.unset("spark.graft.checkpointDir")
    t0 = time.time()
    res: dict = {}
    try:
        pinned = materialize(_segments(spark, sf_dir), eager=True)
        if kill:
            res["killed_pid"] = _kill_one_executor()
        res["count"] = pinned.count()
        res["outcome"] = "success"
    except Exception as e:  # the local-ckpt variant is EXPECTED to land here
        lines = [l.strip() for l in str(e).splitlines() if l.strip()]
        res["outcome"] = "job_failed"
        # surface the diagnostic line, not the py4j wrapper: a lost
        # localCheckpoint block names itself
        res["error_head"] = next(
            (l for l in lines if "Checkpoint block" in l),
            next((l for l in lines if "Caused by" in l), lines[0] if lines else ""),
        )[:300]
        res["checkpoint_block_lost"] = any("Checkpoint block" in l for l in lines)
    res["wall_s"] = round(time.time() - t0, 1)
    return res


if __name__ == "__main__":
    master = os.environ.get("SPARK_GRAFT_MASTER", "")
    if not master.startswith("local-cluster"):
        sys.exit("set SPARK_GRAFT_MASTER=local-cluster[...] for this experiment")
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    spark = get_session(
        "executor_loss",
        shuffle_partitions=8,
        extra_conf={
            # see module docstring: the kill's own ExecutorLostFailure wave
            # must never be the abort cause — only block recoverability
            "spark.task.maxFailures": "16",
            "spark.stage.maxConsecutiveAttempts": "16",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ckpt = tempfile.mkdtemp(prefix="reliable_ckpt_")

    out = {"master": master, "sf": sf}
    out["control"] = _variant(spark, sf, kill=False, ckpt_dir=None)
    out["local_ckpt_with_kill"] = _variant(spark, sf, kill=True, ckpt_dir=None)
    out["reliable_with_kill"] = _variant(spark, sf, kill=True, ckpt_dir=ckpt)
    out["reliable_matches_control"] = (
        out["reliable_with_kill"].get("count") == out["control"].get("count")
    )
    print(json.dumps(out))
    spark.stop()
