"""Watermarked windowed aggregation: tumbling / sliding / session.

The reference has no time semantics at all (no timestamps, no late-data
handling — DemoApp.scala:62-63); these are the Spark built-ins that fill
that gap for the streaming side of the engine (SURVEY.md §2 "operators the
reference does NOT have", §7.2-4).  Everything here is declarative —
watermark tracking, state expiry, and late-row dropping are Structured
Streaming machinery, not custom code.

Scale posture: windowed aggregation state is partitioned by (window, keys)
across executors and expires with the watermark — state size is bounded by
(watermark horizon / window size) × |keys|, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agg_exprs(value_col: str | None) -> list[Column]:
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.avg(value_col), 4).alias("avg_value"))
    return aggs


def tumbling_agg(
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    window: str = "1 hour",
    watermark: str = "10 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Fixed windows: one state entry per (window, keys); rows later than
    the watermark are dropped, windows older than it are finalized."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), *keys)
        .agg(*_agg_exprs(value_col))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            *[c for c in (["n_events"] + (["avg_value"] if value_col else []))],
        )
    )


def sliding_agg(
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Overlapping windows: each row lands in window/slide buckets."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("win"), *keys)
        .agg(*_agg_exprs(value_col))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            *[c for c in (["n_events"] + (["avg_value"] if value_col else []))],
        )
    )


def session_agg(
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Session windows (dynamic extent, closes after ``gap`` of silence) —
    the streaming twin of operators.sessionize; session merging is engine
    machinery (adjacent sessions within gap coalesce as rows arrive)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), *keys)
        .agg(*_agg_exprs(value_col))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *keys,
            *[c for c in (["n_events"] + (["avg_value"] if value_col else []))],
        )
    )
