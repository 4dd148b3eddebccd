"""Streaming exact deduplication — the stream twin of functions.dedup.

Two variants with different state-lifetime contracts:

- **streaming_dedup**: dropDuplicates on the key columns; with a watermark
  the per-key state expires once the event-time watermark passes, bounding
  state to the watermark horizon (without one, state grows forever — only
  safe for bounded key domains, like the reference's 20 cars).
- **streaming_dedup_within_watermark**: dropDuplicatesWithinWatermark —
  dedups keys whose events arrive within the watermark delay of each
  other, the contract that matches "the same record delivered twice by an
  at-least-once source" (the reference's delivery guarantee,
  DemoApp.scala:25) without keeping a key forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence per key wins, duplicates dropped exactly.

    With ``ts_col`` the watermark bounds state; duplicate keys arriving
    after the watermark passed their first occurrence are NOT dropped —
    the deliberate trade for bounded state at 100 TB/day stream volume.
    """
    if ts_col is not None:
        events = events.withWatermark(ts_col, watermark)
    return events.dropDuplicates(keys)


def streaming_dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Dedup duplicates that arrive within the watermark delay window —
    at-least-once delivery repair with guaranteed state expiry."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
