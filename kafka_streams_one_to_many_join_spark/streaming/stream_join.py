"""Declarative stream-stream joins — SURVEY.md §7.2 "streaming join v1".

Spark's built-in stream-stream equi-join IS a symmetric hash join (both
sides' state stores probed on every input row — the same mechanics the
reference hand-builds, SURVEY.md §2 O6/O7), but with APPEND semantics:
each input row joins rows that ever arrived on the other side within the
state horizon; there is no upsert ("newer value replaces older") and no
delete.  That is exactly why the custom operator in streaming/join.py
exists (the reference faced the same gap in Kafka Streams,
DemoApp.scala:57-60).  Offered here because append semantics are the right
tool when each key-version is a distinct event (clickstream enrichment,
event correlation) — and the watermark bounds both state stores.

Scale: state per side ≈ rows within the watermark horizon, partitioned by
the join key across executors; the horizon is the knob that trades
completeness against state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join on ``on``.

    Both sides get an event-time watermark so the engine can expire join
    state; outer variants additionally need the watermark to know when a
    row can be emitted unmatched.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    return lw.join(rw, on=on, how=how)


def stream_static_join(
    stream: DataFrame,
    static: DataFrame,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Stream ⋈ static table: the static side is re-read per micro-batch
    (no state at all) — the simplest enrichment join, and the reference's
    rejected first idea ("not updated when table updates",
    DemoApp.scala:57-58): updates to the static SOURCE are picked up at
    the next micro-batch, but existing output is never retracted."""
    return stream.join(static, on=on, how=how)
