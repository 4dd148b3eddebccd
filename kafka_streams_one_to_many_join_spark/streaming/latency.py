"""Micro-batch latency control for the stateful streaming operators.

The measured finding this module operationalizes (STREAM_BENCH.md,
rounds 11-12): stateful micro-batch latency scales with the SHUFFLE
PARTITION COUNT, not with the rows in the batch.  On identical 5k-row
micro-batches through ``symmetric_one_to_many_join``, per-batch p50 was
11.4 s at the throughput-oriented 32 shuffle partitions vs 2.42 s at 8
— every partition pays a fixed state-store open/commit plus a Python
worker round trip per micro-batch, and at small batch sizes that
per-partition constant dominates the per-row work.  Throughput
deployments want partitions ≈ cores x executors; latency deployments
want the FEWEST partitions that still hold the keyed state and batch
volume.

``latency_mode(df, shuffle_partitions=8)`` sets the one knob that
matters (``spark.sql.shuffle.partitions``) on the DataFrame's session,
and every stateful constructor in streaming/join.py and
streaming/dedup.py takes the same value as an optional
``shuffle_partitions`` argument so the choice rides with the operator
instead of with session setup code.

Operational contract (why this is a *documented* session mutation, not
a per-plan hint):

- Spark reads ``spark.sql.shuffle.partitions`` when the streaming query
  STARTS, and the stateful operator's partition count is then PINNED
  into the checkpoint — restarting the same checkpoint with a different
  value fails Spark's state metadata check.  Pick the value before
  first start; keep it for the checkpoint's life.
- The conf is session-scoped: it also affects other queries started on
  the same session AFTER this call.  For mixed latency/throughput
  deployments, isolate with ``spark.newSession()`` (same SparkContext,
  independent conf) and build each pipeline on its own session.
- Batch (non-streaming) uses of the same operators are unaffected by
  the pinning caveat — AQE re-plans batch shuffles at runtime; this
  knob matters for the micro-batch path, where AQE does not apply to
  the stateful exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: the measured latency sweet spot on local[32] at sf0.1 batch sizes
#: (STREAM_BENCH.md: p50 2.42 s vs 11.4 s at 32) — a starting point, not
#: a universal constant: size to ceil(peak keys x state row bytes /
#: executor state budget) when that exceeds 8.
LOW_LATENCY_PARTITIONS = 8


def latency_mode(
    df: DataFrame, shuffle_partitions: int = LOW_LATENCY_PARTITIONS
) -> DataFrame:
    """Pin the session's shuffle-partition count for a latency-oriented
    streaming pipeline; returns the input unchanged (the conf is read at
    query start).  See the module docstring for the checkpoint-pinning
    and session-scope contract."""
    if shuffle_partitions < 1:
        raise ValueError(
            f"shuffle_partitions must be >= 1, got {shuffle_partitions}"
        )
    df.sparkSession.conf.set(
        "spark.sql.shuffle.partitions", str(shuffle_partitions)
    )
    return df


def apply_shuffle_partitions(
    df: DataFrame, shuffle_partitions: int | None
) -> DataFrame:
    """Constructor-side hook: no-op on None (keep the session's setting),
    else identical to ``latency_mode``."""
    if shuffle_partitions is None:
        return df
    return latency_mode(df, shuffle_partitions)
