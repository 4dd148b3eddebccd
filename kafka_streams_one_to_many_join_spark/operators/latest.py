"""latest_by_key — the batch "changelog view" of a keyed event stream.

The reference interprets every keyed topic as a table of latest values per
key, materialized in state stores via upsert (DemoApp.scala:86 aggregate,
:279 put) and delete (:226).  The batch equivalent: reduce an event table to
one row per key, the row that is maximal under an explicit ordering (the
``seq`` column of FIXTURES.md — the reference has no timestamps,
DemoApp.scala:62-63).

Scale design: implemented as ``groupBy(key).agg(max_by(payload, ord))``, NOT
a window + row_number.  Both shuffle once on the key, but the aggregate form
does map-side partial aggregation (each input partition pre-reduces to ≤ one
row per key before the exchange), so shuffle volume is O(distinct keys), not
O(events).  A window sort moves *every* event through the shuffle and then
sorts each partition — strictly worse at 100 TB.  Struct ordering in Spark
is lexicographic by field position, which gives the multi-column tiebreak
(e.g. ts DESC, event_id DESC) deterministically.

Physical note: the struct-typed aggregation buffer makes Spark pick
SortAggregate over HashAggregate (verified via .explain — UnsafeRow agg
buffers only take mutable primitives).  The partial/final split around the
exchange is preserved (``partial_max_by`` on the map side), which is the
property that matters for shuffle volume; the map-side sort is in-memory,
spillable, and far cheaper than shuffling every event.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: str | Sequence[str],
    payload: Sequence[str] | None = None,
) -> DataFrame:
    """One row per key: the payload of the event maximal under ``order_by``.

    Ties on the full ``order_by`` tuple pick the max payload struct
    (deterministic but arbitrary) — pass a unique ordering column
    (seq / event_id) as the last tiebreak to avoid relying on that.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    if payload is None:
        payload = [c for c in df.columns if c not in keys]
    agg = df.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(c) for c in order_by]),
        ).alias("_latest")
    )
    return agg.select(*keys, "_latest.*")


def latest_by_key_window(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: str | Sequence[str],
) -> DataFrame:
    """Window-function formulation (row_number()=1) — kept for tests as a
    cross-check of :func:`latest_by_key` and for callers that need *all*
    original columns including the ordering ones.  Prefer latest_by_key in
    pipelines: this variant shuffles every event, not one row per key.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
