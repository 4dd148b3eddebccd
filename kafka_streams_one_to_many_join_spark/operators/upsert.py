"""Incremental snapshot maintenance: apply a delta of upserts to a base.

The reference maintains its "tables" incrementally — each event upserts
one key in a store (DemoApp.scala:86,279) — and never recomputes from
scratch.  This operator is the batch form of that discipline: given a
materialized snapshot (one row per key, with the ordinal it was built at)
and a delta of new events, produce the refreshed snapshot WITHOUT
touching historical events.

Equivalence contract (tested): apply_upserts(snapshot(T0), events(T0,T1])
== snapshot(T1) built from all events — incremental == full recompute.

Scale: the work is O(|snapshot| + |delta|), not O(|history|); both inputs
shuffle by key once (or zero times if both are bucketed by key — see the
bucketed-join test for that layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kafka_streams_one_to_many_join_spark.operators.latest import latest_by_key


def apply_upserts(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: str | list[str],
    order_by: str,
    payload: list[str] | None = None,
) -> DataFrame:
    """Refresh a latest-per-key snapshot with a batch of new events.

    Both inputs need (keys, order_by, payload...) columns; within the
    union the greatest ``order_by`` per key wins — a delta row older than
    the snapshot row is ignored (idempotent replay), a snapshot-only key
    survives untouched, a brand-new key appears.
    """
    return latest_by_key(
        snapshot.unionByName(delta), keys=keys, order_by=order_by, payload=payload
    )
